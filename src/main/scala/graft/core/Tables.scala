package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * Every loader is a plain parquet scan: filters/column pruning applied by
  * callers push down into the scan via Catalyst (verified in PlanSpec).
  * At 100 TB these would be partitioned/bucketed tables — the operators
  * downstream only assume "a DataFrame with this schema", never a layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet's `ts` physical type has shipped in two generations:
    * TIMESTAMP(NANOS) (arrives as epoch-nanos LONG under
    * spark.sql.legacy.parquet.nanosAsLong=true, set by GraftSession —
    * truncate, not round, to micros) and TIMESTAMP(MICROS) (arrives as a
    * timestamp directly — NTZ variants cast to the session-UTC
    * TimestampType so downstream semantics are identical). The DuckDB
    * oracle is generation-agnostic: epoch_ns(ts)//1000 yields the same
    * micros either way. Branch on the SCANNED type, not the sf dir. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
