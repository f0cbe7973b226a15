package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables

/** As-of (point-in-time) join — an operator Spark has no built-in for.
  *
  * For each left row, attach the most recent right row of the same key
  * with rightTime <= leftTime (inclusive), or nulls if none — the shape
  * every feature-extraction / point-in-time-correctness pipeline needs.
  *
  * Implementation is the scale-safe sort-based formulation, composed from
  * built-in operators (SURVEY.md §3 preference (a)): tag both sides, union,
  * one hash shuffle on the key, one sort by (time, side), and a running
  * `last(right, ignoreNulls)` window. No range-condition join (which Spark
  * would execute as a broadcast-nested-loop or an exploding theta join):
  * cost is one shuffle of |L|+|R| rows regardless of time-range density,
  * and skewed keys are handled by AQE like any other shuffle.
  *
  * Ties: a right row at exactly leftTime matches (sorted before the left
  * row via the side bit in both directions). Multiple right rows at the
  * same (key, time) resolve by `rightTiebreak`, deterministically, but
  * per scan direction: [[asOf]] (backward) takes the LARGEST tiebreak
  * (the running `last` keeps the latest-sorted right), [[asOfForward]]
  * takes the SMALLEST (its reversed frame keeps the first-sorted right)
  * — each picks the right row nearest its scan direction, matching what
  * "most recent before" / "earliest after" mean under a secondary order.
  * Both behaviors are pinned in AsOfJoinSpec.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
           leftKey: Column, rightKey: Column,
           leftTime: Column, rightTime: Column,
           rightPayload: Seq[(String, Column)],
           rightTiebreak: Column = lit(0)): DataFrame = {
    val lStruct = struct(left.columns.map(col).toSeq: _*)
    val rStruct = struct(rightPayload.map { case (n, c) => c.as(n) }: _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val tbType = right.select(rightTiebreak).schema.head.dataType

    val lTagged = left.select(
      leftKey.as("_k"), leftTime.as("_t"), lit(1).as("_side"),
      lit(null).cast(tbType).as("_tb"), lStruct.as("_l"),
      lit(null).cast(rType).as("_r"))
    val rTagged = right.select(
      rightKey.as("_k"), rightTime.as("_t"), lit(0).as("_side"),
      rightTiebreak.as("_tb"), lit(null).cast(lType).as("_l"), rStruct.as("_r"))

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*") +:
        rightPayload.map { case (n, _) => col(s"_match.$n").as(n) }: _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right row of the
    * same key with rightTime >= leftTime (inclusive) — the "next event"
    * shape (time-to-conversion, next-maintenance, lookahead labels).
    * Same single-shuffle union+window structure as [[asOf]], mirrored
    * by sorting time DESCENDING so the frame stays the O(r) RUNNING
    * preceding frame (a currentRow→unboundedFollowing frame looks
    * equivalent but Spark recomputes it per row — O(r²) on a hot key).
    * Scanning later→earlier, the running `last(right, ignoreNulls)` is
    * the smallest right time seen so far, i.e. the earliest right at or
    * after the current row; rights sort before lefts at equal time
    * (inclusive match) and _tb DESC makes the smallest tiebreak win. */
  def asOfForward(left: DataFrame, right: DataFrame,
                  leftKey: Column, rightKey: Column,
                  leftTime: Column, rightTime: Column,
                  rightPayload: Seq[(String, Column)],
                  rightTiebreak: Column = lit(0)): DataFrame = {
    val lStruct = struct(left.columns.map(col).toSeq: _*)
    val rStruct = struct(rightPayload.map { case (n, c) => c.as(n) }: _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val tbType = right.select(rightTiebreak).schema.head.dataType

    val lTagged = left.select(
      leftKey.as("_k"), leftTime.as("_t"), lit(1).as("_side"),
      lit(null).cast(tbType).as("_tb"), lStruct.as("_l"),
      lit(null).cast(rType).as("_r"))
    val rTagged = right.select(
      rightKey.as("_k"), rightTime.as("_t"), lit(0).as("_side"),
      rightTiebreak.as("_tb"), lit(null).cast(lType).as("_l"), rStruct.as("_r"))

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").desc, col("_side"), col("_tb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*") +:
        rightPayload.map { case (n, _) => col(s"_match.$n").as(n) }: _*)
  }

  /** q_asof: for every click event, the user's most recent purchase at or
    * before the click — nulls for users who hadn't purchased yet. */
  def qAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
    asOf(clicks, purchases,
      leftKey = col("user_id"), rightKey = col("user_id"),
      leftTime = col("ts"), rightTime = col("ts"),
      rightPayload = Seq(
        "purchase_ts" -> col("ts"),
        "purchase_value" -> col("value")),
      rightTiebreak = col("event_id"))
      .orderBy(col("event_id"))
  }

  /** DuckDB has a native ASOF JOIN — the perfect independent oracle for
    * the sort-based reformulation. */
  val qAsofSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
      |    value, event_type
      |  FROM main.events),
      |c AS (SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts AS purchase_ts, value AS purchase_value
      |      FROM ev WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id, c.ts, c.value, p.purchase_ts, p.purchase_value
      |FROM c ASOF LEFT JOIN p
      |  ON c.user_id = p.user_id AND c.ts >= p.purchase_ts
      |ORDER BY c.event_id""".stripMargin

  /** q_asof_fwd: for every click, the user's NEXT purchase at or after
    * the click (time-to-conversion) — nulls if they never purchased
    * again. Oracle: DuckDB's native ASOF with the inequality reversed.
    * Precondition shared with q_asof: DuckDB ASOF has no payload
    * tiebreak for equal matched timestamps, so the oracle comparison
    * relies on (user_id, ts) being unique in the events data (nanosecond
    * timestamps — holds by construction in the generator); the operator
    * itself IS deterministic under ties via rightTiebreak. */
  def qAsofFwd(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
    asOfForward(clicks, purchases,
      leftKey = col("user_id"), rightKey = col("user_id"),
      leftTime = col("ts"), rightTime = col("ts"),
      rightPayload = Seq(
        "next_purchase_ts" -> col("ts"),
        "next_purchase_value" -> col("value")),
      rightTiebreak = col("event_id"))
      .orderBy(col("event_id"))
  }

  val qAsofFwdSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
      |    value, event_type
      |  FROM main.events),
      |c AS (SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts AS next_purchase_ts, value AS next_purchase_value
      |      FROM ev WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id, c.ts, c.value,
      |  p.next_purchase_ts, p.next_purchase_value
      |FROM c ASOF LEFT JOIN p
      |  ON c.user_id = p.user_id AND c.ts <= p.next_purchase_ts
      |ORDER BY c.event_id""".stripMargin

  /** Nearest as-of: for each left row, the right row of the same key
    * CLOSEST in time, either direction (sensor fusion / log alignment —
    * "attach the nearest reading"). Ties at equal distance prefer the
    * BACKWARD match (the reading that already existed at leftTime).
    *
    * ONE shuffle, not two joins: both directional matches come off the
    * same union + hash partitioning — a running `last` over the
    * ascending sort (most recent at-or-before) and another over the
    * descending sort (earliest at-or-after). Spark plans one Exchange
    * with two Sorts over it; at 100 TB that halves the wire cost of the
    * naive compose-both-as-ofs formulation. Direction choice is then a
    * pure integer projection on epoch-micros distances. */
  def asOfNearest(left: DataFrame, right: DataFrame,
                  leftKey: Column, rightKey: Column,
                  leftTime: Column, rightTime: Column,
                  rightPayload: Seq[(String, Column)],
                  rightTiebreak: Column = lit(0)): DataFrame = {
    val lStruct = struct(left.columns.map(col).toSeq: _*)
    val rStruct = struct((rightPayload.map { case (n, c) => c.as(n) } :+
      rightTime.as("_rt")): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val tbType = right.select(rightTiebreak).schema.head.dataType

    val lTagged = left.select(
      leftKey.as("_k"), leftTime.as("_t"), lit(1).as("_side"),
      lit(null).cast(tbType).as("_tb"), lStruct.as("_l"),
      lit(null).cast(rType).as("_r"))
    val rTagged = right.select(
      rightKey.as("_k"), rightTime.as("_t"), lit(0).as("_side"),
      rightTiebreak.as("_tb"), lit(null).cast(lType).as("_l"), rStruct.as("_r"))

    // backward: ascending scan, largest tiebreak wins (asOf semantics);
    // forward: descending scan, smallest tiebreak wins (asOfForward) —
    // same partitioning key, so Catalyst reuses one Exchange for both.
    val wb = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("_k"))
      .orderBy(col("_t").desc, col("_side"), col("_tb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val both = lTagged.unionByName(rTagged)
      .withColumn("_prev", last(col("_r"), ignoreNulls = true).over(wb))
      .withColumn("_next", last(col("_r"), ignoreNulls = true).over(wf))
      .filter(col("_side") === 1)
    val dPrev = unix_micros(col("_t")) - unix_micros(col("_prev._rt"))
    val dNext = unix_micros(col("_next._rt")) - unix_micros(col("_t"))
    val pick = when(col("_next").isNull, col("_prev"))
      .when(col("_prev").isNull, col("_next"))
      .when(dPrev <= dNext, col("_prev"))
      .otherwise(col("_next"))
    val dir = when(col("_prev").isNull && col("_next").isNull,
        lit(null).cast(org.apache.spark.sql.types.StringType))
      .when(col("_next").isNull, lit("b"))
      .when(col("_prev").isNull, lit("f"))
      .when(dPrev <= dNext, lit("b")).otherwise(lit("f"))
    both.withColumn("_m", pick)
      .select(col("_l.*") +:
        (rightPayload.map { case (n, _) => col(s"_m.$n").as(n) } :+
          col("_m._rt").as("matched_ts") :+ dir.as("matched_dir")): _*)
  }

  /** q_asof_nearest: for every click, the user's nearest purchase in
    * time, before OR after — equidistant ties keep the earlier
    * (backward) purchase. */
  def qAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
    asOfNearest(clicks, purchases,
      leftKey = col("user_id"), rightKey = col("user_id"),
      leftTime = col("ts"), rightTime = col("ts"),
      rightPayload = Seq("purchase_value" -> col("value")),
      rightTiebreak = col("event_id"))
      .orderBy(col("event_id"))
  }

  /** Oracle: both native ASOF directions chained, then the identical
    * distance CASE. Interval comparison in DuckDB is exact at micros, as
    * is the epoch-micros integer arithmetic on the Spark side.
    *
    * DuckDB's ASOF has NO tiebreak among right rows sharing (key, ts),
    * while [[asOfNearest]] resolves them deterministically (largest
    * event_id backward, smallest forward) — so each direction's right
    * side is pre-deduped to exactly the row the Spark tiebreak would
    * pick. Without this, duplicate same-micros purchases by one user
    * would make the compare nondeterministic. */
  val qAsofNearestSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
      |    value, event_type
      |  FROM main.events),
      |c AS (SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'click'),
      |pb0 AS (
      |  SELECT user_id, ts AS pts, value AS pval,
      |    row_number() OVER (PARTITION BY user_id, ts
      |                       ORDER BY event_id DESC) AS rn
      |  FROM ev WHERE event_type = 'purchase'),
      |pb1 AS (SELECT user_id, pts, pval FROM pb0 WHERE rn = 1),
      |pf0 AS (
      |  SELECT user_id, ts AS pts, value AS pval,
      |    row_number() OVER (PARTITION BY user_id, ts
      |                       ORDER BY event_id ASC) AS rn
      |  FROM ev WHERE event_type = 'purchase'),
      |pf1 AS (SELECT user_id, pts, pval FROM pf0 WHERE rn = 1),
      |j AS (
      |  SELECT c.event_id, c.user_id, c.ts, c.value,
      |    pb.pts AS bts, pb.pval AS bval, pf.pts AS fts, pf.pval AS fval
      |  FROM c
      |  ASOF LEFT JOIN pb1 pb ON c.user_id = pb.user_id AND c.ts >= pb.pts
      |  ASOF LEFT JOIN pf1 pf ON c.user_id = pf.user_id AND c.ts <= pf.pts)
      |SELECT event_id, user_id, ts, value,
      |  CASE WHEN fts IS NULL THEN bval WHEN bts IS NULL THEN fval
      |       WHEN ts - bts <= fts - ts THEN bval ELSE fval END AS purchase_value,
      |  CASE WHEN fts IS NULL THEN bts WHEN bts IS NULL THEN fts
      |       WHEN ts - bts <= fts - ts THEN bts ELSE fts END AS matched_ts,
      |  CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
      |       WHEN fts IS NULL THEN 'b' WHEN bts IS NULL THEN 'f'
      |       WHEN ts - bts <= fts - ts THEN 'b' ELSE 'f' END AS matched_dir
      |FROM j ORDER BY event_id""".stripMargin

  /** SCD2 (slowly-changing-dimension, type 2) join: attach to each fact
    * row the dimension VERSION that was valid at the fact's event time —
    * the warehouse-standard "customer segment as of the order date"
    * enrichment. A versioned dimension with contiguous validity
    * (valid_to of one version = valid_from of the next, last version
    * open-ended) makes SCD2 exactly a backward as-of join on valid_from,
    * so this reuses [[asOf]]'s single-shuffle union+window machinery:
    * NO interval/theta join (Spark would plan broadcast-nested-loop),
    * cost is one hash exchange of |facts|+|versions| slim rows at any
    * scale, and facts predating the key's first version get NULLs.
    *
    * The dimension here is synthesized deterministically from customer
    * (3 versions per key, valid_from/seg_code pure integer arithmetic
    * on c_custkey) so the DuckDB oracle can rebuild the identical
    * version table and verify with its native ASOF JOIN. v0 starts up
    * to (150 mod-cycle)·5 days ≈ 2 years after 1994-01-01 — the cycle
    * is 150, not 365, so the smallest test corpus (custkeys 0..149)
    * still plants keys whose first version postdates early-1995 orders
    * and the no-version-yet NULL path is exercised at every SF. Times compared as epoch-micros longs —
    * exact integer arithmetic in both engines. */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val epoch19940101Us = 757382400000000L
    val dayUs = 86400000000L
    val dim = Tables.customer(spark, dir).select(
        col("c_custkey").as("k"),
        explode(sequence(lit(0L), lit(2L))).as("v"))
      .select(col("k"), col("v"),
        (lit(epoch19940101Us) +
          ((col("k") % lit(150L)) * lit(5L) +
            col("v") * (lit(365L) + col("k") % lit(200L))) * lit(dayUs))
          .as("valid_us"),
        ((col("k") + col("v") * lit(7L)) % lit(5L)).as("seg_code"))
    // o_orderdate arrives TIMESTAMP_NTZ from parquet; the session is
    // pinned UTC so the cast is micros-identical (the Tables.events rule)
    val facts = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast(org.apache.spark.sql.types.TimestampType)
          .as("o_orderdate"))
    asOf(facts, dim,
      leftKey = col("o_custkey"), rightKey = col("k"),
      leftTime = unix_micros(col("o_orderdate")), rightTime = col("valid_us"),
      rightPayload = Seq(
        "dim_version" -> col("v"),
        "seg_code" -> col("seg_code"),
        "dim_valid_from_us" -> col("valid_us")),
      rightTiebreak = col("v"))
      .orderBy(col("o_orderkey"))
  }

  /** Oracle rebuilds the identical arithmetic version table and applies
    * DuckDB's native ASOF LEFT JOIN on the same epoch-micros longs. */
  val qScd2Sql: String =
    """WITH dim AS (
      |  SELECT c_custkey AS k, CAST(v AS BIGINT) AS v,
      |    757382400000000 + ((c_custkey % 150) * 5 +
      |      v * (365 + c_custkey % 200)) * 86400000000 AS valid_us,
      |    (c_custkey + v * 7) % 5 AS seg_code
      |  FROM customer CROSS JOIN (SELECT unnest([0,1,2]) AS v)),
      |o AS (SELECT o_orderkey, o_custkey, o_orderdate,
      |        epoch_us(o_orderdate) AS t FROM orders)
      |SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
      |  d.v AS dim_version, d.seg_code, d.valid_us AS dim_valid_from_us
      |FROM o ASOF LEFT JOIN dim d ON o.o_custkey = d.k AND o.t >= d.valid_us
      |ORDER BY o.o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof" -> (qAsof _),
    "q_asof_fwd" -> (qAsofFwd _),
    "q_asof_nearest" -> (qAsofNearest _),
    "q_scd2" -> (qScd2 _))

  val oracles: Map[String, String] = Map(
    "q_asof" -> qAsofSql,
    "q_asof_fwd" -> qAsofFwdSql,
    "q_asof_nearest" -> qAsofNearestSql,
    "q_scd2" -> qScd2Sql)
}
