package graft

/** Dev micro-bench: time individual SparkEntry queries on an arbitrary
  * data dir (typically the /tmp/graft_heavy/x10|x100 replicas) without
  * re-running the whole BenchHeavy suite. Same noop-sink contract as
  * BenchHeavy so numbers are comparable.
  *
  * Usage: runMain graft.TimeQuery <dir> <reps> <name> [<name> ...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        System.gc() // BenchHeavy's leveling: predecessors' heap debt
        // and deferred GC must not land inside this rep's window
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name: best ${times.min}%.3f  all ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
