package graft

import org.apache.spark.sql.functions._

/** Dev probe: decompose q1's x600 wall into decode vs aggregate.
  * The replica is 64 files x ONE 5.6M-row row group, so task granularity
  * is fixed at 64 regardless of maxPartitionBytes. Scratch. */
object Q1Probe7 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x600")
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.core.Tables.lineitem(spark, dir)
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 4).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[p7] $label: best ${ts.min}%.3f  all ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    val cols7 = Seq("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_shipdate").map(col)
    time("decode7_noop")(li.select(cols7: _*)
      .write.format("noop").mode("overwrite").save())
    time("decode2_noop")(li.select(col("l_returnflag"), col("l_quantity"))
      .write.format("noop").mode("overwrite").save())
    time("groupby_count_only") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    }
    time("q1_full")(SparkEntry.queries("q1_agg")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
