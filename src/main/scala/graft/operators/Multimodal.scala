package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Multimodal (image/audio/video) column handling (SURVEY.md §2.F).
  *
  * Media payloads are opaque `binary` columns with typed metadata beside
  * them — the layout a 100 TB multimodal corpus uses (payload bytes in
  * parquet, metadata columns prunable without touching bytes). Real codec
  * libraries aren't in this container, so the *decode* step is a
  * deterministic fake, but every piece of Spark plumbing is real:
  * binary schema, batched partition-wise processing (the Scala equivalent
  * of `mapInPandas` — one buffer per batch, not per row), magic-byte
  * container sniffing, fixed-offset header parsing, and payload checksums
  * computed from the actual bytes.
  *
  * The driver oracle cannot see the bytes, so it re-derives the expected
  * metadata analytically from the same deterministic generator — the
  * query passes only if synth → sniff → parse → checksum round-trips.
  */
object Multimodal {

  val PngMagic: Array[Byte] = Array(0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
  val JpegMagic: Array[Byte] = Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
  val WavMagic: Array[Byte] = Array('R', 'I', 'F', 'F', 'W', 'A', 'V', 'E')
  private val DataLen = 64

  /** Deterministic payload for row `id`: magic (by id%3) + big-endian
    * width/height + DataLen data bytes ((id+i)%256). Stands in for real
    * media bytes; layout is what the extractor genuinely parses. */
  private def makePayload(id: Long): Array[Byte] = {
    val magic = (id % 3) match {
      case 0 => PngMagic
      case 1 => JpegMagic
      case _ => WavMagic
    }
    val width = (id % 1024 + 1).toInt
    val height = (id % 768 + 1).toInt
    val header = Array(
      (width >> 24).toByte, (width >> 16).toByte, (width >> 8).toByte, width.toByte,
      (height >> 24).toByte, (height >> 16).toByte, (height >> 8).toByte, height.toByte)
    val data = Array.tabulate(DataLen)(i => ((id + i) % 256).toByte)
    magic ++ header ++ data
  }

  /** Attach a synthesized binary payload column to the documents table. */
  def synthesize(docs: DataFrame): DataFrame = {
    val schema = StructType(docs.schema.fields :+ StructField("payload", BinaryType))
    docs.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ makePayload(r.getAs[Long]("doc_id"))))
    }(Encoders.row(schema)).toDF()
  }

  /** Textured media payload for perceptual hashing: same container
    * layout as [[makePayload]] (magic by id%3 + big-endian dims) but the
    * data section stands in for DECODED LUMA — 64 bytes drawn from md5
    * (4 digests per doc: byte i = digest(g+":"+i/16)[i%16]), which mixes
    * well enough that unrelated docs get independent fingerprints (the
    * plain ramp payload is too regular: every dHash would collide and
    * the band join would degenerate to one O(n²) bucket). Docs 2k and
    * 2k+1 share base image g=k; the odd doc perturbs ONE luma byte
    * (xor 0x80 at position k%64) — a planted near-duplicate law the
    * oracle re-derives analytically. */
  private def makeMediaPayload(id: Long): Array[Byte] = {
    val magic = (id % 3) match {
      case 0 => PngMagic
      case 1 => JpegMagic
      case _ => WavMagic
    }
    val width = (id % 1024 + 1).toInt
    val height = (id % 768 + 1).toInt
    val header = Array(
      (width >> 24).toByte, (width >> 16).toByte, (width >> 8).toByte, width.toByte,
      (height >> 24).toByte, (height >> 16).toByte, (height >> 8).toByte, height.toByte)
    val g = id / 2
    val md = java.security.MessageDigest.getInstance("MD5")
    val luma = new Array[Byte](DataLen)
    var blk = 0
    while (blk < DataLen / 16) {
      System.arraycopy(md.digest(s"$g:$blk".getBytes("UTF-8")), 0, luma, blk * 16, 16)
      blk += 1
    }
    if (id % 2 == 1) {
      val p = (g % DataLen).toInt
      luma(p) = (luma(p) ^ 0x80).toByte
    }
    magic ++ header ++ luma
  }

  /** Attach the textured (luma-bearing) payload — the input to
    * [[phash]] / [[Dedup.mediaPairs]]. */
  def synthMedia(docs: DataFrame): DataFrame = {
    val schema = StructType(docs.schema.fields :+ StructField("payload", BinaryType))
    docs.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ makeMediaPayload(r.getAs[Long]("doc_id"))))
    }(Encoders.row(schema)).toDF()
  }

  /** 64-bit difference-hash (dHash) perceptual fingerprint over the
    * payload's decoded-luma section: bit i = [luma[(i+1)%64] > luma[i]]
    * — a one-byte change in the image moves at most 2 bits, so near-
    * identical media land within the band-join hamming radius. Packed as
    * two positive 32-bit halves (ph_lo bits 0..31, ph_hi 32..63), the
    * same signed-safe carriage as [[Dedup.simhash]], so the band
    * machinery and the DuckDB oracle apply unchanged. Map-only: sniffs
    * the container magic, skips the header, reads bytes — no shuffle,
    * and at 100 TB this is the per-file decode pass feeding a cheap
    * 16-byte-per-item dedup index. */
  def phash(withPayload: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ph_lo", LongType),
      StructField("ph_hi", LongType)))
    withPayload.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val p = r.getAs[Array[Byte]](1)
        val headerOff =
          if (p.length >= 4 && p.take(4).sameElements(JpegMagic)) 12 else 16
        val luma = p.drop(headerOff)
        var lo = 0L
        var hi = 0L
        var i = 0
        while (i < 64) {
          if ((luma((i + 1) % 64) & 0xff) > (luma(i) & 0xff)) {
            if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
          }
          i += 1
        }
        Row(id, lo, hi)
      }
    }(Encoders.row(schema)).toDF()
  }

  def mmPhash(spark: SparkSession, dir: String): DataFrame =
    phash(synthMedia(Tables.documents(spark, dir))).orderBy("doc_id")

  /** Oracle rebuilds every luma byte from the generator law, then the
    * same dHash — passes only if synth, sniff, header skip, and the
    * byte-level bit packing all round-trip exactly. */
  val mmPhashSql: String =
    """WITH luma AS (
      |  SELECT doc_id, i,
      |    xor(('0x'||substr(md5(concat(doc_id // 2, ':', i // 16)),
      |                      (i % 16) * 2 + 1, 2))::BIGINT,
      |        CASE WHEN doc_id % 2 = 1 AND i = (doc_id // 2) % 64
      |             THEN 128 ELSE 0 END) AS v
      |  FROM documents, unnest(range(0, 64)) r(i)),
      |bits AS (
      |  SELECT a.doc_id, a.i, CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
      |  FROM luma a JOIN luma b
      |    ON a.doc_id = b.doc_id AND b.i = (a.i + 1) % 64)
      |SELECT doc_id,
      |  sum(CASE WHEN i < 32 THEN bit::BIGINT << i ELSE 0 END)::BIGINT AS ph_lo,
      |  sum(CASE WHEN i >= 32 THEN bit::BIGINT << (i - 32) ELSE 0 END)::BIGINT AS ph_hi
      |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Sniff container type from magic bytes and parse header metadata —
    * batched per partition (no per-row task overhead), reading only the
    * payload prefix. At scale this is a map-only stage: no shuffle, and
    * column pruning means sibling metadata-only queries never load bytes. */
  def extractMeta(withPayload: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media_type", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_bytes", IntegerType),
      StructField("data_checksum", LongType)))
    withPayload.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val p = r.getAs[Array[Byte]](1)
        val mediaType =
          if (p.length >= 8 && p.take(8).sameElements(PngMagic)) "image/png"
          else if (p.length >= 4 && p.take(4).sameElements(JpegMagic)) "image/jpeg"
          else if (p.length >= 8 && p.take(8).sameElements(WavMagic)) "audio/wav"
          else "application/octet-stream"
        val headerOff = mediaType match {
          case "image/jpeg" => 4
          case _            => 8
        }
        def be32(off: Int): Int =
          ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
            ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
        val width = be32(headerOff)
        val height = be32(headerOff + 4)
        val checksum = p.drop(headerOff + 8).foldLeft(0L)((acc, b) => acc + (b & 0xff))
        Row(id, mediaType, width, height, p.length, checksum)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** Deterministic fake of the decode→resize step (a real deployment swaps
    * in an image library here; the batching/schema contract is identical):
    * target box 32x32, aspect-preserving. */
  def resizeMeta(meta: DataFrame, box: Int = 32): DataFrame =
    meta.withColumn("scale",
        least(lit(box).cast(DoubleType) / col("width"),
          lit(box).cast(DoubleType) / col("height")))
      .withColumn("out_w", greatest(floor(col("width") * col("scale")).cast(IntegerType), lit(1)))
      .withColumn("out_h", greatest(floor(col("height") * col("scale")).cast(IntegerType), lit(1)))
      .drop("scale")

  /** Frame-sampling stub for video-like payloads: treat the data section
    * as fixed-size frames and keep every k-th (a real deployment decodes
    * with a codec here; batching, schema, and output shape are the real
    * contract). One output row per kept frame — flat, partition-parallel. */
  def frameSample(withPayload: DataFrame, frameBytes: Int = 8,
                  every: Int = 4): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    withPayload.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val p = r.getAs[Array[Byte]](1)
        val headerOff = if (id % 3 == 1) 12 else 16 // magic + dims
        val data = p.drop(headerOff)
        data.grouped(frameBytes).zipWithIndex.collect {
          case (frame, i) if i % every == 0 && frame.length == frameBytes =>
            Row(id, i, frame)
        }
      }
    }(Encoders.row(schema)).toDF()
  }

  /** Feature-extraction stub: a deterministic 16-dim embedding from the
    * payload's data section (normalized byte histogram over 16 bins). A
    * real deployment swaps the histogram for a vision/audio model; the
    * output contract (float vector column, partition-parallel, feeds
    * [[Similarity]] ANN directly) is the real thing. */
  def extractFeatures(withPayload: DataFrame, bins: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    withPayload.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val p = r.getAs[Array[Byte]](1)
        val headerOff = if (id % 3 == 1) 12 else 16
        val data = p.drop(headerOff)
        val hist = new Array[Float](bins)
        data.foreach(b => hist((b & 0xff) * bins / 256) += 1f)
        val n = math.max(data.length, 1).toFloat
        Row(id, hist.map(_ / n).toSeq)
      }
    }(Encoders.row(schema)).toDF()
  }

  def mmMeta(spark: SparkSession, dir: String): DataFrame =
    extractMeta(synthesize(Tables.documents(spark, dir))).orderBy("doc_id")

  /** Oracle re-derives metadata analytically from the generator law —
    * matches only if the byte-level synth/sniff/parse round-trip is right. */
  val mmMetaSql: String =
    """SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
      |    ELSE 'audio/wav' END AS media_type,
      |  CAST(doc_id % 1024 + 1 AS INTEGER) AS width,
      |  CAST(doc_id % 768 + 1 AS INTEGER) AS height,
      |  CAST(CASE doc_id % 3 WHEN 1 THEN 4 ELSE 8 END + 8 + 64 AS INTEGER) AS n_bytes,
      |  CAST(list_sum(list_transform(range(0, 64), i -> (doc_id + i) % 256)) AS BIGINT)
      |    AS data_checksum
      |FROM documents ORDER BY doc_id""".stripMargin

  /** mm_resize: the full synth → sniff → parse → resize-plan chain,
    * driver-checked. The decode is the documented stub, but the resize
    * ARITHMETIC (aspect-preserving fit into a box) and every byte of
    * plumbing before it are real; the oracle re-derives the expected
    * output dimensions from the generator law with the identical
    * double-precision expression. */
  def mmResize(spark: SparkSession, dir: String): DataFrame =
    resizeMeta(extractMeta(synthesize(Tables.documents(spark, dir))))
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("out_w"), col("out_h"))
      .orderBy("doc_id")

  val mmResizeSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
      |      ELSE 'audio/wav' END AS media_type,
      |    CAST(doc_id % 1024 + 1 AS INTEGER) AS width,
      |    CAST(doc_id % 768 + 1 AS INTEGER) AS height
      |  FROM documents),
      |s AS (
      |  SELECT *, least(32.0 / width, 32.0 / height) AS scale FROM m)
      |SELECT doc_id, media_type, width, height,
      |  greatest(CAST(floor(width * scale) AS INTEGER), 1) AS out_w,
      |  greatest(CAST(floor(height * scale) AS INTEGER), 1) AS out_h
      |FROM s ORDER BY doc_id""".stripMargin

  /** mm_frames: driver-checked frame sampling. The payload's data
    * section is framed (8-byte frames, keep every 4th) and each kept
    * frame's BYTES are surfaced as hex; the oracle rebuilds the exact
    * hex string from the generator law — every sampled byte is
    * verified, not just counts. */
  def mmFrames(spark: SparkSession, dir: String): DataFrame =
    frameSample(synthesize(Tables.documents(spark, dir)))
      .select(col("doc_id"), col("frame_idx"), hex(col("frame")).as("frame_hex"))
      .orderBy("doc_id", "frame_idx")

  val mmFramesSql: String =
    """SELECT doc_id, fi AS frame_idx,
      |  upper(string_agg(printf('%02x', (doc_id + fi*8 + j) % 256), '' ORDER BY j))
      |    AS frame_hex
      |FROM documents
      |CROSS JOIN (SELECT unnest([0, 4]) AS fi)
      |CROSS JOIN (SELECT unnest(range(0, 8)) AS j)
      |GROUP BY doc_id, fi
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** mm_features: driver-checked feature extraction — the 16-bin byte
    * histogram embedding, exploded tall so the oracle can rebuild every
    * weight exactly (k/64 is a power-of-two division: bit-exact in
    * float and double alike). */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(synthesize(Tables.documents(spark, dir)))
      .select(col("doc_id"), posexplode(col("embedding")))
      .toDF("doc_id", "bin", "weight")
      .select(col("doc_id"), col("bin"),
        col("weight").cast(DoubleType).as("weight"))
      .orderBy("doc_id", "bin")

  val mmFeaturesSql: String =
    """WITH bytes AS (
      |  SELECT doc_id, ((doc_id + i) % 256) // 16 AS bin
      |  FROM documents, unnest(range(0, 64)) r(i)),
      |counts AS (SELECT doc_id, bin, count(*) AS n FROM bytes GROUP BY doc_id, bin),
      |bins AS (
      |  SELECT doc_id, b AS bin FROM documents, unnest(range(0, 16)) rb(b))
      |SELECT bins.doc_id, CAST(bins.bin AS INTEGER) AS bin,
      |  CAST(coalesce(counts.n, 0) AS DOUBLE) / 64.0 AS weight
      |FROM bins LEFT JOIN counts
      |  ON bins.doc_id = counts.doc_id AND bins.bin = counts.bin
      |ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> (mmMeta _),
    "mm_resize" -> (mmResize _),
    "mm_frames" -> (mmFrames _),
    "mm_features" -> (mmFeatures _),
    "mm_phash" -> (mmPhash _))

  val oracles: Map[String, String] = Map(
    "mm_meta" -> mmMetaSql,
    "mm_resize" -> mmResizeSql,
    "mm_frames" -> mmFramesSql,
    "mm_features" -> mmFeaturesSql,
    "mm_phash" -> mmPhashSql)
}
