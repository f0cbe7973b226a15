package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.operators.AsOfJoin

/** Edge-case semantics of the as-of join that the DuckDB oracle exercises
  * only statistically: exact-timestamp ties, no-prior-match nulls, and
  * same-time right-side tiebreaks. */
class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).appName("asof-spec").getOrCreate()
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private def run(left: Seq[(Int, Int)], right: Seq[(Int, Int, String)]) = {
    val l = left.toDF("k", "t")
    val r = right.toDF("k", "t", "v")
    AsOfJoin.asOf(l, r,
        leftKey = col("k"), rightKey = col("k"),
        leftTime = col("t"), rightTime = col("t"),
        rightPayload = Seq("v" -> col("v")),
        rightTiebreak = col("v"))
      .orderBy("k", "t")
      .collect().map(row => (row.getInt(0), row.getInt(1), row.getString(2)))
  }

  test("matches the latest right row at or before each left time") {
    val got = run(
      left = Seq((1, 5), (1, 10), (1, 20)),
      right = Seq((1, 4, "a"), (1, 10, "b"), (1, 15, "c")))
    // t=5 → a (4 <= 5); t=10 → b (exact tie matches, inclusive); t=20 → c
    assert(got === Array((1, 5, "a"), (1, 10, "b"), (1, 20, "c")))
  }

  test("left rows before any right row get nulls (left-join semantics)") {
    val got = run(left = Seq((1, 1), (2, 9)), right = Seq((1, 5, "x")))
    assert(got === Array((1, 1, null), (2, 9, null)))
  }

  test("same-(key,time) right rows resolve by tiebreak, last wins") {
    val got = run(
      left = Seq((1, 10)),
      right = Seq((1, 10, "a"), (1, 10, "z"), (1, 10, "m")))
    assert(got === Array((1, 10, "z")))
  }

  test("agrees with a naive in-memory reference on generated cases") {
    // deterministic pseudo-random instance, no RNG object state
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val left = (0 until 300).map(i =>
      (Math.floorMod(mix(i), 7L).toInt, Math.floorMod(mix(i * 31 + 1), 50L).toInt))
    val right = (0 until 200).map(i =>
      (Math.floorMod(mix(i + 1000), 7L).toInt,
       Math.floorMod(mix(i * 17 + 2), 50L).toInt, s"v$i"))
    val got = run(left, right).toSeq
    val expected = left.map { case (k, t) =>
      val candidates = right.filter(r => r._1 == k && r._2 <= t)
      val best =
        if (candidates.isEmpty) null
        // operator tiebreak: latest time, then greatest tiebreak (here v-string)
        else candidates.maxBy(r => (r._2, r._3))._3
      (k, t, best)
    }.sortBy(r => (r._1, r._2))
    // compare as multisets per (k,t) — duplicate left rows are legal
    def norm(rs: Seq[(Int, Int, String)]): Map[(Int, Int), Seq[String]] =
      rs.groupBy(r => (r._1, r._2))
        .view.mapValues(_.map(r => Option(r._3).getOrElse("<none>")).sorted)
        .toMap
    assert(norm(got) === norm(expected))
  }

  test("keys never mix") {
    val got = run(
      left = Seq((1, 10), (2, 10)),
      right = Seq((1, 5, "k1"), (2, 7, "k2")))
    assert(got === Array((1, 10, "k1"), (2, 10, "k2")))
  }

  private def runFwd(left: Seq[(Int, Int)], right: Seq[(Int, Int, String)]) = {
    val l = left.toDF("k", "t")
    val r = right.toDF("k", "t", "v")
    AsOfJoin.asOfForward(l, r,
        leftKey = col("k"), rightKey = col("k"),
        leftTime = col("t"), rightTime = col("t"),
        rightPayload = Seq("v" -> col("v")),
        rightTiebreak = col("v"))
      .orderBy("k", "t")
      .collect().map(row => (row.getInt(0), row.getInt(1), row.getString(2)))
  }

  test("forward as-of matches the earliest right row at or after each left time") {
    val got = runFwd(
      left = Seq((1, 5), (1, 10), (1, 20)),
      right = Seq((1, 4, "a"), (1, 10, "b"), (1, 15, "c")))
    // t=5 → b (10 >= 5, earliest); t=10 → b (exact tie matches,
    // inclusive); t=20 → null (nothing after)
    assert(got === Array((1, 5, "b"), (1, 10, "b"), (1, 20, null)))
  }

  test("forward as-of resolves same-(key,time) right rows by tiebreak, first wins") {
    val got = runFwd(
      left = Seq((1, 10)),
      right = Seq((1, 10, "z"), (1, 10, "a"), (1, 10, "m")))
    assert(got === Array((1, 10, "a")))
  }

  private def runNearest(left: Seq[(Int, Int)], right: Seq[(Int, Int, String)]) = {
    // asOfNearest requires timestamp times (distance is a metric on
    // epoch micros, not just an ordering) — lift the int instants
    val l = left.toDF("k", "ti").withColumn("t", timestamp_micros(col("ti")))
      .select("k", "t")
    val r = right.toDF("k", "ti", "v")
      .withColumn("t", timestamp_micros(col("ti"))).select("k", "t", "v")
    AsOfJoin.asOfNearest(l, r,
        leftKey = col("k"), rightKey = col("k"),
        leftTime = col("t"), rightTime = col("t"),
        rightPayload = Seq("v" -> col("v")),
        rightTiebreak = col("v"))
      .orderBy("k", "t")
      .collect().map(row => (row.getInt(0), row.getString(2), row.getString(4)))
  }

  test("nearest as-of picks the closer side, either direction") {
    val got = runNearest(
      left = Seq((1, 10), (1, 14)),
      right = Seq((1, 4, "a"), (1, 15, "b")))
    // t=10: prev at 4 (d=6) vs next at 15 (d=5) → forward b
    // t=14: prev at 4 (d=10) vs next at 15 (d=1) → forward b
    assert(got === Array((1, "b", "f"), (1, "b", "f")))
  }

  test("nearest as-of prefers the backward match on equidistant ties") {
    val got = runNearest(
      left = Seq((1, 10)),
      right = Seq((1, 5, "early"), (1, 15, "late")))
    assert(got === Array((1, "early", "b")))
  }

  test("nearest as-of falls back to the only available direction, nulls when none") {
    val got = runNearest(
      left = Seq((1, 10), (2, 10), (3, 10)),
      right = Seq((1, 20, "fwd-only"), (2, 3, "back-only")))
    assert(got === Array((1, "fwd-only", "f"), (2, "back-only", "b"),
      (3, null, null)))
  }
}
