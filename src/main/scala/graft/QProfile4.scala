package graft

/** Dev probe: print the optimized plan of one query. */
object QProfile4 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val qname = if (args.length > 1) args(1) else "q_calibration"
    val spark = graft.core.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(qname)(spark, dir)
    println(df.queryExecution.optimizedPlan.toString.take(4000))
    spark.stop()
  }
}
