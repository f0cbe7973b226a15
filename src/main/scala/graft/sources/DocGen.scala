package graft.sources

import java.util.{Collections => JCollections}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector: a deterministic synthetic-documents generator.
  *
  * `spark.read.format("docgen").option("rows", N).option("partitions", P)`
  * produces the `documents` schema with no storage behind it — rows are
  * derived purely from their index via splitmix64, so any two reads (on
  * any cluster) see identical data. Purpose: scale testing — generate a
  * 10^9-row corpus for a shuffle/skew rehearsal without writing a byte.
  *
  * Demonstrates the full connector surface the engine supports: custom
  * TableProvider, partition planning (P independent index ranges → P
  * parallel readers, no driver bottleneck), and column-pruning pushdown
  * (SupportsPushDownRequiredColumns — `select(doc_id)` never materializes
  * text).
  */
class DocGen extends TableProvider with DataSourceRegister {
  override def shortName(): String = "docgen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocGen.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new DocGenTable()
}

object DocGen {
  val fullSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val vocab: Array[String] = Array(
    "the", "a", "data", "table", "scan", "join", "merge", "sort", "hash",
    "query", "row", "column", "batch", "stream", "spark", "fast", "slow",
    "small", "big", "window", "agg", "filter", "group", "order", "key",
    "value", "part", "line", "customer", "vector")
  private val langs = Array("en", "es", "fr", "de", "zh")

  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def textFor(id: Long): String = textFor(id, 1)

  /** `vocabMul > 1` widens the effective vocabulary by a deterministic
    * numeric suffix (30 * vocabMul distinct tokens) — the 30-word default
    * makes every doc pair share shingles, which is the right stress test
    * for LSH banding but unrealistically dense for candidate-count
    * rehearsals; a web corpus has ~1e5+ token types. */
  def textFor(id: Long, vocabMul: Int): String = textFor(id, vocabMul, 0)

  /** `docWords > 0` retargets the doc-length distribution to uniform
    * [docWords/2, 3*docWords/2) — avg `docWords` — for LONG-document
    * rehearsals (the span-dedup block HOFs are quadratic in blocks/doc
    * if an expression leaks into the lambda; 20-80-word defaults can't
    * surface that). 0 keeps the historical 20-80-word distribution. */
  def textFor(id: Long, vocabMul: Int, docWords: Int): String = {
    val h = mix(id)
    val n = if (docWords > 0) docWords / 2 + Math.floorMod(h, docWords.toLong).toInt
            else 20 + (Math.floorMod(h, 60L)).toInt
    val sb = new java.lang.StringBuilder(n * 6)
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      val hw = mix(id * 1315423911L + j)
      sb.append(vocab(Math.floorMod(hw, vocab.length.toLong).toInt))
      if (vocabMul > 1) {
        sb.append(Math.floorMod(mix(hw), vocabMul.toLong))
      }
      j += 1
    }
    sb.toString
  }

  /** Deterministic duplicate planting: with probability `dupPct`/100 a doc
    * (id >= 1000) takes the text of a "parent" doc drawn from a bounded
    * earlier window, producing corpus-scale duplicate clusters (avg
    * cluster size grows with rows/window) — the web-dup-density regime
    * the dedup pipeline must survive without broadcasting drop sets. */
  def resolveId(id: Long, dupPct: Int): Long =
    if (dupPct > 0 && id >= 1000 &&
        Math.floorMod(mix(id + 31), 100L) < dupPct)
      Math.floorMod(mix(id + 37), math.min(id, 100000L))
    else id

  def langFor(id: Long): String = langs(Math.floorMod(mix(id + 7), langs.length.toLong).toInt)
  def sourceFor(id: Long): String = "gen" + Math.floorMod(mix(id + 13), 20L)
}

class DocGenTable extends Table with SupportsRead {
  override def name(): String = "docgen"
  override def schema(): StructType = DocGen.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    JCollections.singleton(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocGenScanBuilder(options.getLong("rows", 1000L),
      options.getInt("partitions", 4),
      options.getInt("dupPct", 0),
      options.getInt("vocabMul", 1),
      options.getInt("docWords", 0))
}

class DocGenScanBuilder(rows: Long, partitions: Int, dupPct: Int,
    vocabMul: Int, docWords: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = DocGen.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new DocGenScan(rows, partitions, required, dupPct, vocabMul, docWords)
}

case class DocGenPartition(start: Long, end: Long) extends InputPartition

class DocGenScan(rows: Long, partitions: Int, required: StructType,
                 dupPct: Int, vocabMul: Int, docWords: Int = 0)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per).map(s => DocGenPartition(s, math.min(s + per, rows)))
      .toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(required, dupPct, vocabMul, docWords)
}

class DocGenReaderFactory(required: StructType, dupPct: Int,
    vocabMul: Int, docWords: Int = 0)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocGenPartition]
    // resolve required fields once per partition, not per row
    val fieldGens: Array[Long => Any] = required.fields.map(_.name match {
      case "doc_id" => (id: Long) => id
      case "text" => (id: Long) =>
        UTF8String.fromString(
          DocGen.textFor(DocGen.resolveId(id, dupPct), vocabMul, docWords))
      case "lang" => (id: Long) => UTF8String.fromString(DocGen.langFor(id))
      case "source" => (id: Long) => UTF8String.fromString(DocGen.sourceFor(id))
      case "n_chars" => (id: Long) =>
        DocGen.textFor(DocGen.resolveId(id, dupPct), vocabMul, docWords)
          .length.toLong
      case other => throw new IllegalArgumentException(s"unknown column $other")
    })
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(fieldGens.toSeq.map(_(i)))
      override def close(): Unit = ()
    }
  }
}
