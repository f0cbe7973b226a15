package graft

/** Plan-inspection tool: prints the formatted physical plan (and optionally
  * runs) a named SparkEntry query — the feedback loop for shuffle/pushdown/
  * codegen tuning. Usage: runMain graft.Explain <query> [sfDir] [run]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    if (args.length > 2 && args(2) == "run") {
      val t0 = System.nanoTime()
      println(s"rows=${df.count()} in ${(System.nanoTime() - t0) / 1e9}s")
      val t1 = System.nanoTime()
      println(s"rows=${df.count()} in ${(System.nanoTime() - t1) / 1e9}s (warm)")
    }
    spark.stop()
  }
}
