package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExprs

/** Dev probe: isolate the probe-pass BHJ cost in valueAtRanks. */
object QProfile3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x100")
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val li = graft.core.Tables.lineitem(spark, dir)
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof3] $label: best ${ts.min}%.3f  all ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    val bucketed = li.select(col("l_returnflag").as("g"),
      col("l_extendedprice").as("v"),
      shiftright(VectorExprs.sortableBits(col("l_extendedprice")), 44).as("_b"))
    time("scan_bits_agg") {
      bucketed.groupBy("g", "_b").count()
        .write.format("noop").mode("overwrite").save()
    }
    // tiny static target table, same key shape (string, long)
    val targets = Seq(("A", 1234567L, 10L), ("N", 2345678L, 20L),
      ("R", 3456789L, 30L)).toDF("_tg", "_tb", "_rib")
    time("scan_bits_bhj") {
      bucketed.join(broadcast(targets),
          col("g") === col("_tg") && col("_b") === col("_tb"))
        .write.format("noop").mode("overwrite").save()
    }
    // same but joining on the long only
    val targetsL = Seq((1234567L, 10L), (2345678L, 20L)).toDF("_tb", "_rib")
    time("scan_bits_bhj_long") {
      bucketed.join(broadcast(targetsL), col("_b") === col("_tb"))
        .write.format("noop").mode("overwrite").save()
    }
    // filter-only variant (no join at all)
    time("scan_bits_filter") {
      bucketed.filter(col("_b") === 1234567L || col("_b") === 2345678L)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
