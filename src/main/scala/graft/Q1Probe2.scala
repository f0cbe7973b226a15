package graft
object Q1Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", 32)
      .config("spark.sql.files.maxPartitionBytes", args(1))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 4).foreach { _ =>
      val t0 = System.nanoTime()
      SparkEntry.queries("q1_agg")(spark, args(0))
        .write.format("noop").mode("overwrite").save()
      println(f"[q1] ${(System.nanoTime()-t0)/1e9}%.3f")
    }
    spark.stop()
  }
}
