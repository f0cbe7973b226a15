package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Range (interval-containment) join — the second join shape Spark has no
  * native operator for (after [[AsOfJoin]]): pair each left point with
  * every right interval containing it, with no equi key to hash on.
  *
  * Naive formulations are a cartesian/theta join — O(|L|·|R|) at 100 TB.
  * The scale-safe formulation bucketizes time: points map to one bucket,
  * intervals explode into the buckets they overlap (bounded when interval
  * length is bounded by a few bucket widths), and the join becomes a hash
  * equi-join on bucket id followed by the exact range predicate. Cost:
  * one shuffle of |L| + |R|·(avg buckets per interval) rows — linear, AQE
  * handles bucket skew like any other shuffle key.
  */
object RangeJoin {

  /** Join left points (at `leftTime`, micros-precision timestamp) to right
    * intervals [`start`, `end`), via bucketized equi-join. Each interval
    * explodes into EVERY bucket it covers (ceil(len/width)+1 rows), so
    * results are correct for any interval length — an interval longer
    * than `bucketWidthSec` just costs proportionally more replication.
    * Pick `bucketWidthSec` near the typical interval length so the
    * replication factor stays ~2. */
  def pointInInterval(left: DataFrame, right: DataFrame,
                      leftTime: Column, start: Column, end: Column,
                      bucketWidthSec: Long): DataFrame = {
    val width = lit(bucketWidthSec)
    val lb = left.withColumn("_bucket", floor(unix_timestamp(leftTime) / width))
    val rb = right
      .withColumn("_sb", floor(unix_timestamp(start) / width))
      .withColumn("_eb", floor(unix_timestamp(end) / width))
      .withColumn("_bucket", explode(sequence(col("_sb"), col("_eb"))))
      .drop("_sb", "_eb")
    lb.join(rb, "_bucket")
      .filter(leftTime >= start && leftTime < end)
      .drop("_bucket")
  }

  /** q_range: clicks that land inside a 2-minute "incident window" opened
    * by an error event — one row per (click, window) containment pair. */
  def qRange(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
    val incidents = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), col("ts").as("inc_start"),
        (col("ts") + expr("INTERVAL 2 MINUTES")).as("inc_end"))
    pointInInterval(clicks, incidents,
        leftTime = col("click_ts"), start = col("inc_start"), end = col("inc_end"),
        bucketWidthSec = 120)
      .select(col("click_id"), col("click_ts"), col("incident_id"), col("inc_start"))
      .orderBy(col("click_id"), col("incident_id"))
  }

  val qRangeSql: String =
    """WITH ev AS (
      |  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type
      |  FROM main.events),
      |c AS (SELECT event_id AS click_id, ts AS click_ts FROM ev WHERE event_type = 'click'),
      |i AS (SELECT event_id AS incident_id, ts AS inc_start,
      |        ts + INTERVAL 2 MINUTE AS inc_end
      |      FROM ev WHERE event_type = 'error')
      |SELECT click_id, click_ts, incident_id, inc_start
      |FROM c JOIN i ON click_ts >= inc_start AND click_ts < inc_end
      |ORDER BY click_id, incident_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_range" -> (qRange _))

  val oracles: Map[String, String] = Map(
    "q_range" -> qRangeSql)
}
