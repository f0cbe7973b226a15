package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.RangeJoin

/** The bucketized range join must equal the naive theta join exactly —
  * bucketization is a physical optimization, never a semantic one. */
class RangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).appName("range-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketized result equals the naive theta join on real events") {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
    val incidents = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), col("ts").as("inc_start"),
        (col("ts") + expr("INTERVAL 2 MINUTES")).as("inc_end"))
    val bucketized = RangeJoin.pointInInterval(clicks, incidents,
        col("click_ts"), col("inc_start"), col("inc_end"), 120)
      .select("click_id", "incident_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = clicks.join(incidents,
        col("click_ts") >= col("inc_start") && col("click_ts") < col("inc_end"))
      .select("click_id", "incident_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "test corpus produced no containment pairs")
    assert(bucketized === naive)
  }

  test("boundary semantics: start inclusive, end exclusive, 2-bucket spans") {
    import spark.implicits._
    def ts(s: String): Timestamp = Timestamp.valueOf(s)
    // interval [10:00:30, 10:02:30) deliberately straddles a 120s bucket edge
    val points = Seq(
      (1L, ts("2024-01-01 10:00:30")), // == start → in
      (2L, ts("2024-01-01 10:02:29")), // just before end → in (other bucket)
      (3L, ts("2024-01-01 10:02:30")), // == end → out
      (4L, ts("2024-01-01 10:00:29"))  // before start → out
    ).toDF("pid", "pt")
    val iv = Seq((100L, ts("2024-01-01 10:00:30"), ts("2024-01-01 10:02:30")))
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, iv, col("pt"), col("s"), col("e"), 120)
      .select("pid").as[Long].collect().sorted
    assert(got === Array(1L, 2L))
  }

  test("intervals longer than the bucket width keep their middle buckets") {
    import spark.implicits._
    def ts(s: String): Timestamp = Timestamp.valueOf(s)
    // 10-minute interval with 120s buckets: a point in a MIDDLE bucket
    // (neither the start nor the end bucket) must still pair
    val points = Seq(
      (1L, ts("2024-01-01 10:05:00")), // middle bucket
      (2L, ts("2024-01-01 10:00:10")), // start bucket
      (3L, ts("2024-01-01 10:09:59")), // end bucket
      (4L, ts("2024-01-01 10:10:00"))  // == end → out
    ).toDF("pid", "pt")
    val iv = Seq((100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")))
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, iv, col("pt"), col("s"), col("e"), 120)
      .select("pid").as[Long].collect().sorted
    assert(got === Array(1L, 2L, 3L))
  }
}
