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

  test("keys never mix") {
    val got = run(
      left = Seq((1, 10), (2, 10)),
      right = Seq((1, 5, "k1"), (2, 7, "k2")))
    assert(got === Array((1, 10, "k1"), (2, 10, "k2")))
  }
}
