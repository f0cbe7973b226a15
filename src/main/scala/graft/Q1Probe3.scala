package graft
import org.apache.spark.sql.functions._
object Q1Probe3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x300")
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.core.Tables.lineitem(spark, dir)
    println(s"[p3] scan partitions = ${li.rdd.getNumPartitions}")
    println(s"[p3] rows = ${li.count()}")
    // per-column scan cost: decode each column alone
    for (c <- Seq("l_shipdate", "l_quantity", "l_extendedprice", "l_discount",
                  "l_tax", "l_returnflag", "l_linestatus")) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        li.select(col(c)).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[p3] col $c: ${ts.min}%.3f")
    }
    val t0 = System.nanoTime()
    li.select(col("l_shipdate"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"), col("l_linestatus"))
      .write.format("noop").mode("overwrite").save()
    println(f"[p3] all7: ${(System.nanoTime() - t0) / 1e9}%.3f")
    spark.stop()
  }
}
