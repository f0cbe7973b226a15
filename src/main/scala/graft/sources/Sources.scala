package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.transform.TransformResult

/** Source/sink surface (the pipeline endpoints the reference plugin sits
  * between in CDAP pipelines).
  *
  * Readers always take an explicit schema: at 100 TB, schema inference is
  * a full extra pass over the data, and silent type drift between files is
  * how corrupt partitions slip in. Writers default to partitioned parquet —
  * the layout downstream scans can prune by partition value — and the sink
  * for transform results materializes all three channels off one pass.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)

  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC — the other columnar interchange format warehouses hand over;
    * Spark's native vectorized reader handles it, same pruning/pushdown
    * story as parquet. Schema passed explicitly like every reader here. */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Raw-text corpus ingestion — the first mile of an LLM data pipeline
    * (crawl dumps and document drops arrive as flat files, not tables).
    * Line mode (default): one row per line, files split across tasks —
    * the scalable shape for jsonl-ish / one-doc-per-line dumps.
    * `wholeFile = true`: one row per FILE (a whole document) — NOT
    * splittable, so the parallelism unit is the file; shard upstream.
    * Every row carries `src_file` provenance (the lineage key later
    * dedup/purge stages join back on — the same role doc_id plays once
    * the corpus is tabular). */
  def rawText(spark: SparkSession, path: String,
              wholeFile: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    spark.read.option("wholetext", wholeFile.toString).text(path)
      .select(input_file_name().as("src_file"), col("value").as("text"))
  }

  /** Binary-file ingestion for multimodal payloads: (path, modTime,
    * length, content bytes) per file — the reader that feeds the mm_*
    * decode/fingerprint operators when images/audio arrive as loose
    * files rather than parquet binary columns. `glob` narrows to one
    * modality (e.g. `*.png`). One file = one row (not splittable): at
    * scale the file is the parallelism unit, which is the right grain
    * for whole-payload decodes anyway. */
  def binaryFiles(spark: SparkSession, path: String,
                  glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)

  def writeParquet(df: DataFrame, path: String,
                   partitionBy: Seq[String] = Nil,
                   mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Sorted data layout for scan-time skipping: range-partition on the
    * sort key, sort within partitions, write parquet. Each output file
    * then covers a disjoint key range, so parquet min/max column stats
    * let filtered scans skip whole files/row groups — the layout step a
    * 100 TB corpus runs once so every later query reads a sliver. */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                  mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(mode).parquet(path)
  }

  /** Bucketed managed table: pre-hash-partition the data on the join key
    * at write time. Two tables bucketed the same way join with NO
    * exchange — the shuffle is paid once at layout time instead of on
    * every query, the core trick for repeated fact-fact joins at 100 TB.
    * (Bucketed layout requires the catalog, hence saveAsTable.) */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", header.toString)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)

  def writeJsonLines(df: DataFrame, path: String,
                     mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  def writeOrc(df: DataFrame, path: String,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Materialize a transform's three channels side by side — the pipeline
    * sink shape of the reference (output port + error port + alerts). One
    * cached pass feeds all three writes. */
  def writeChannels(result: TransformResult, basePath: String): Unit = {
    result.cached()
    try {
      writeParquet(result.out, s"$basePath/out")
      writeParquet(result.errors, s"$basePath/errors")
      writeParquet(result.alerts, s"$basePath/alerts")
    } finally result.tagged.unpersist()
  }
}
