package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * AQE's skew-join splitting (on by default in [[GraftSession]]) handles
  * most skew at runtime, but only for sort-merge joins and only per
  * partition. Salting is the planner-level tool for the pathological case:
  * a join or aggregation key where a handful of values carry a large share
  * of all rows (the "null key" / "default id" / stopword-shingle shape).
  */
object Skew {

  /** Equi-join `left` (large, skewed) with `right` (smaller) on `key`,
    * spreading each left key across `salts` shuffle partitions. The left
    * side gets a deterministic per-row salt; the right side is replicated
    * `salts` times. One row of join fan-out semantics, `salts`x right
    * duplication — use for moderate `salts` and a right side that fits
    * comfortably, or as the fallback when AQE skew splitting can't apply
    * (e.g. broadcast-ineligible aggregate-below-join shapes).
    *
    * The salt mixes a per-row ordinal (partition id + within-partition
    * index) with the row-content hash: fully duplicate rows — the classic
    * cause of a hot key — then spread across salts instead of colliding
    * onto one reducer, and the ordinal is still deterministic under task
    * retry (a re-executed partition replays the same rows in the same
    * order). Only inner/left join types are accepted: replicating the
    * right side would emit unmatched right rows once per salt under
    * right/full outer — semantically broken by construction. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    val norm = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")(norm),
      s"saltedJoin supports inner/left join types only, got '$joinType': " +
        "right/full outer would duplicate unmatched right rows per salt")
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(
        (monotonically_increasing_id() +: left.columns.map(col).toSeq): _*),
        lit(salts)))
    val saltedRight = right.withColumn("_salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedLeft.join(saltedRight, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. Spark's hash aggregate already does
    * map-side partial combine, which covers sum/count/min/max; this helper
    * is for aggregations that must shuffle raw rows (e.g. exact
    * count_distinct): the first phase dedupes/combines within salt shards
    * so no single reducer receives a whole hot key. */
  def saltedDistinctCount(df: DataFrame, key: String, valueCol: String,
                          salts: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(valueCol)), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(countDistinct(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n_distinct"))
}
