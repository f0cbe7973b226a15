package graft
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dev probe: does replacing q1's four DECIMAL(38,0) sums with exact
  * split-long sums (hi/lo 19-bit split, recombined once per group) cut
  * the aggregate cost, or is the scan the floor? Scratch-only — not a
  * query surface. */
object Q1Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_heavy/x100")
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.core.Tables.lineitem(spark, dir)
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $label: best ${ts.min}%.3f  all ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    time("q1_current") {
      SparkEntry.queries("q1_agg")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    def v(c: Column) = floor(c * 1000000.0 + 0.5)
    val q = col("l_quantity"); val ep = col("l_extendedprice")
    val di = col("l_discount"); val tx = col("l_tax")
    val disc = ep * (lit(1.0) - di); val chg = disc * (lit(1.0) + tx)
    val filtered = li.filter(col("l_shipdate") <= "2001-09-02")
    def split(c: Column, n: String): Seq[Column] = Seq(
      sum(shiftright(v(c), 19)).as(n + "_hi"),
      sum(v(c).bitwiseAND(lit((1L << 19) - 1))).as(n + "_lo"))
    val aggs: Seq[Column] =
      split(q, "sq") ++ split(ep, "sb") ++ split(disc, "sd") ++
        split(chg, "sc") :+ count(lit(1)).as("n")
    time("q1_split_long") {
      filtered.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(aggs.head, aggs.tail: _*)
        .write.format("noop").mode("overwrite").save()
    }
    // how much is the pure scan+filter floor?
    time("scan_floor") {
      filtered.select(col("l_returnflag"), col("l_linestatus"), q, ep, di, tx)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
