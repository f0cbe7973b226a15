package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.operators.{AsOfJoin, Dedup, Multimodal, RangeJoin, Sampling, Similarity, TextAnalysis}
import graft.queries.{Analytics, Relational, Transforms}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Analytics.queries ++ Transforms.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      Multimodal.queries ++ AsOfJoin.queries ++ RangeJoin.queries ++
      Sampling.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Analytics.oracles ++ Transforms.oracles ++
      TextAnalysis.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      Multimodal.oracles ++ AsOfJoin.oracles ++ RangeJoin.oracles ++
      Sampling.oracles
}
