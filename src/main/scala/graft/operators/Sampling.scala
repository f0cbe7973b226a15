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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample" -> (qSample _))

  val oracles: Map[String, String] = Map(
    "q_sample" -> qSampleSql)
}
