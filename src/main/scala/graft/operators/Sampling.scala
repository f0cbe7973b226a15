package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables

/** Deterministic sampling for training-data curation.
  *
  * Pipelines that feed training runs need samples that are (a) stratified
  * (per language/source/quality bucket) and (b) *reproducible* — the same
  * inputs must select the same rows on every run, every cluster, every
  * engine, or downstream dedup/eval work is unrepeatable. RNG-based
  * `sample()` gives neither across engines. Instead: order each stratum by
  * a cryptographic hash of the row key and take the first k — an
  * arbitrary-but-fixed "random" order both engines agree on bit-for-bit.
  *
  * Scale: one shuffle on the stratum key; rank computation uses
  * WindowGroupLimit pushdown (top-k per partition map-side before the
  * shuffle), so the shuffle carries ~k rows per stratum per mapper, not
  * the corpus. */
object Sampling {

  def stratified(df: DataFrame, stratum: Column, key: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(md5(key.cast("string")), key)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** q_sample: 20 documents per language, reproducibly pseudo-random. */
  def qSample(spark: SparkSession, dir: String): DataFrame =
    stratified(Tables.documents(spark, dir), col("lang"), col("doc_id"), 20)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("lang"), col("doc_id"))

  val qSampleSql: String =
    """SELECT doc_id, lang, source FROM (
      |  SELECT doc_id, lang, source,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 20 ORDER BY lang, doc_id""".stripMargin

  /** Uniform-in-[0,1) value derived from md5 of the row key: the first
    * 15 hex chars as a long over 16^15. Both engines round the long →
    * double conversion and divide identically (IEEE), so the value — and
    * every threshold decision on it — is bit-identical. */
  private def hashUniform(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long").cast("double") / lit(1152921504606846976.0) // 16^15

  /** Rate-based weighted stratified sampling: keep a row iff its
    * deterministic hash-uniform falls under the stratum's rate — the
    * mixture-rebalancing shape (downsample dominant languages/sources,
    * keep rare ones whole) of a training-data pipeline.
    *
    * Unlike the top-k form above this is a pure projection + filter:
    * ZERO shuffle, no window, embarrassingly parallel — the 100 TB
    * default when per-stratum counts are targets, not exact quotas.
    * Reproducible by construction: the same key draws the same uniform
    * in every engine, every run, so reruns and cross-engine audits
    * select identical rows (and rate increases are SUPERSETS: raising a
    * stratum's rate only adds rows, never swaps them — stable eval
    * splits). */
  def stratifiedByRate(df: DataFrame, stratum: Column, key: Column,
                       rates: Map[String, Double],
                       defaultRate: Double = 0.0): DataFrame = {
    val rateMap = map(rates.toSeq.sortBy(_._1).flatMap {
      case (s, r) => Seq(lit(s), lit(r)) }: _*)
    df.filter(hashUniform(key) <
      coalesce(element_at(rateMap, stratum.cast("string")), lit(defaultRate)))
  }

  /** q_sample_rate: rebalance the documents language mixture — keep 10%
    * of dominant en, all of rare fr, half of de, default 25% elsewhere. */
  def qSampleRate(spark: SparkSession, dir: String): DataFrame =
    stratifiedByRate(Tables.documents(spark, dir), col("lang"), col("doc_id"),
        Map("en" -> 0.1, "fr" -> 1.0, "de" -> 0.5), defaultRate = 0.25)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  val qSampleRateSql: String =
    """SELECT doc_id, lang, source FROM (
      |  SELECT doc_id, lang, source,
      |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
      |      / 1152921504606846976.0 AS u
      |  FROM documents)
      |WHERE u < CASE lang WHEN 'en' THEN 0.1 WHEN 'fr' THEN 1.0
      |                    WHEN 'de' THEN 0.5 ELSE 0.25 END
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample" -> (qSample _),
    "q_sample_rate" -> (qSampleRate _))

  val oracles: Map[String, String] = Map(
    "q_sample" -> qSampleSql,
    "q_sample_rate" -> qSampleRateSql)
}
