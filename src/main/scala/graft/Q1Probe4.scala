package graft
import org.apache.spark.sql.functions._

/** Dev probe: does split-size tuning (maxPartitionBytes) or explicit
  * shared-subexpression pre-projection move q1's x600 wall? Scratch. */
object Q1Probe4 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x600")
    val mpb = if (args.length > 1) args(1) else "134217728"
    val spark = graft.core.GraftSession.builder("local[32]", 32)
      .config("spark.sql.files.maxPartitionBytes", mpb)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[p4] $label mpb=$mpb: best ${ts.min}%.3f  all ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    val q = SparkEntry.queries("q1_agg")(spark, dir)
    println(s"[p4] scan partitions = ${graft.core.Tables.lineitem(spark, dir).rdd.getNumPartitions}")
    time("q1")(q.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
