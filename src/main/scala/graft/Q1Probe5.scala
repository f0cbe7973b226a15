package graft

/** Dev probe: grid-sweep the two scan knobs that move q1's x600 wall —
  * split size (task count / wave balance on 32 cores) and the vectorized
  * reader's batch size (per-batch decode overhead). Scratch. */
object Q1Probe5 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x600")
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def best(label: String)(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[p5] $label: best ${ts.min}%.3f  all ${ts.map(t => f"$t%.2f").mkString(" ")}")
      ts.min
    }
    val mpbs = Seq(128L << 20, 64L << 20, 96L << 20, 48L << 20)
    val batches = Seq(4096, 8192, 16384)
    for (mpb <- mpbs; b <- batches) {
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb.toString)
      spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", b.toString)
      val q = SparkEntry.queries("q1_agg")(spark, dir)
      best(s"mpb=${mpb >> 20}M batch=$b")(
        q.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
