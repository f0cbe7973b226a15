package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Dev probe: per-stage wall times + executed plan for the quantile
  * machinery at a given data dir. Scratch-only. */
object QProfile2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x100")
    val qname = if (args.length > 1) args(1) else "q_quantile_select"
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = ArrayBuffer[(Int, String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for {s <- i.submissionTime; c <- i.completionTime}
          yield c - s).getOrElse(-1L)
        stages += ((i.stageId, i.name.take(60), ms, i.numTasks))
      }
    })
    // warm
    SparkEntry.queries(qname)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    stages.clear()
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(qname)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    println(f"[prof2] total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(500)
    stages.sortBy(-_._3).take(12).foreach { case (id, n, ms, t) =>
      println(f"[stage] $id%4d ${ms}%6d ms  tasks=$t%4d  $n")
    }
    println(df.queryExecution.executedPlan.toString.take(5000))
    spark.stop()
  }
}
