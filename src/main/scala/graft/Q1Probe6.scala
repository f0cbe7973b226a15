package graft

/** Dev probe: q1 x600 at the Q1Probe5 winner (96M splits, 8k batches),
  * repeated enough to see past host noise — run under different JVMs
  * via SPARK_GRAFT_JVM to grade GC / heap choices. Scratch. */
object Q1Probe6 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x600")
    val spark = graft.core.GraftSession.builder("local[32]", 32)
      .config("spark.sql.files.maxPartitionBytes", (96L << 20).toString)
      .config("spark.sql.parquet.columnarReaderBatchSize", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries("q1_agg")(spark, dir)
    val ts = (1 to 6).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      q.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[p6] best ${ts.min}%.3f  all ${ts.map(t => f"$t%.2f").mkString(" ")}")
    spark.stop()
  }
}
