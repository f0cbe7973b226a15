package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStreams

/** Streaming throughput rehearsal: drive the watermarked windowed
  * aggregation from the built-in rate source and report sustained
  * rows/sec from the query's own progress metrics. Not part of the driver
  * contract — the standing answer to "what does the streaming path
  * sustain?". Usage: runMain graft.StreamBench [rowsPerSecond] [seconds]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val rps = if (args.length > 0) args(0).toLong else 500000L
    val seconds = if (args.length > 1) args(1).toInt else 25
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // rate source → the events shape the engine's streaming ops expect
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", rps)
      .option("numPartitions", cpus.toInt)
      .load()
      .select(
        col("timestamp").as("ts"),
        (col("value") % 10000).as("user_id"),
        element_at(array(lit("click"), lit("view"), lit("purchase"),
          lit("error"), lit("signup")), (col("value") % 5 + 1).cast("int"))
          .as("event_type"),
        (col("value") % 100).cast("double").as("value"))
    val q = EventStreams.windowedCounts(events, watermark = "5 seconds")
      .writeStream.format("noop")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("2 seconds"))
      .start()
    Thread.sleep(seconds * 1000L)
    val progress = q.recentProgress.toSeq
    q.stop()
    // skip the first batches (start-up); average the steady tail
    val steady = progress.drop(2).filter(_.numInputRows > 0)
    val rows = steady.map(_.numInputRows).sum
    val procRate =
      if (steady.nonEmpty) steady.map(_.processedRowsPerSecond).sum / steady.size
      else 0.0
    println(s"""{"metric":"stream_rows_per_sec","value":$procRate,""" +
      s""""offered_rps":$rps,"batches":${steady.size},"rows":$rows}""")
    spark.stop()
  }
}
