package graft

import org.apache.spark.sql.functions._

/** Scratch component profiler for the quantile machinery (dev-only). */
object QProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x10")
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.core.Tables.lineitem(spark, dir)
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $label: best ${ts.min}%.3f  all ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    time("scan2col_count") {
      li.select(col("l_returnflag"), col("l_extendedprice"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    val v = col("l_extendedprice")
    val bucketed = li.select(col("l_returnflag"), v,
      shiftright(org.apache.spark.sql.graft.VectorExprs.sortableBits(v), 44).as("_b"))
    time("histogram") {
      bucketed.groupBy(col("l_returnflag"), col("_b"))
        .agg(count(lit(1)).as("_cnt"))
        .write.format("noop").mode("overwrite").save()
    }
    val hist = bucketed.groupBy(col("l_returnflag").as("_g"), col("_b"))
      .agg(count(lit(1)).as("_cnt"))
    println("hist rows = " + hist.count())
    time("full") {
      SparkEntry.queries("q_approx_quantiles")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
