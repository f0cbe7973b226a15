package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Multimodal (image/audio/video) column handling (SURVEY.md §2.F).
  *
  * Media payloads are opaque `binary` columns with typed metadata beside
  * them — the layout a 100 TB multimodal corpus uses (payload bytes in
  * parquet, metadata columns prunable without touching bytes). Decode is
  * REAL where the JDK carries a lossless codec: PNG payloads are genuine
  * PNG files (encoded and decoded with `javax.imageio` — zero extra
  * dependencies) and WAV payloads are genuine RIFF/PCM files (decoded
  * with `javax.sound.sampled`). Both codecs are lossless, so the decoded
  * pixels/samples equal the deterministic generator law and the DuckDB
  * oracle re-derives every checksum analytically — the query passes only
  * if encode → sniff → DECODE → checksum round-trips through the real
  * codec. JPEG payloads are likewise genuine JPEG files (JDK `jpg`
  * codec): the oracle verifies sniff + decoded DIMENSIONS (dims survive
  * the lossy codec exactly), while decoded-pixel statistics — not
  * analytically derivable for a lossy codec — carry a documented -1
  * checksum sentinel and are asserted in OperatorsSpec (mean-abs-error
  * vs the generator law, plus encode determinism). All processing is batched
  * partition-wise (the Scala equivalent of `mapInPandas` — one buffer
  * per batch, not per row) and map-only: no shuffle, and column pruning
  * means metadata-only queries never load payload bytes.
  */
object Multimodal {

  val PngMagic: Array[Byte] = Array(0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
  val JpegMagic: Array[Byte] = Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
  val WavMagic: Array[Byte] = Array('R', 'I', 'F', 'F', 'W', 'A', 'V', 'E')
  private val DataLen = 64

  // ImageIO's default stream cache is a TEMP FILE per encode/decode call
  // — at millions of payloads that is the dominant cost (and an inode
  // churn hazard on executors). Keep everything in memory; runs once per
  // JVM when the object loads on an executor.
  javax.imageio.ImageIO.setUseCache(false)

  /** Decode one PNG with a caller-owned reader (per-partition reuse —
    * `ImageIO.read` re-scans the plugin registry and allocates a fresh
    * stream wrapper per call, which dominates at millions of rows). */
  private def readPng(reader: javax.imageio.ImageReader,
                      p: Array[Byte]): java.awt.image.BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(p))
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally iis.close()
  }

  private def pngReader(): javax.imageio.ImageReader =
    javax.imageio.ImageIO.getImageReadersByFormatName("png").next()

  private def pngWriter(): javax.imageio.ImageWriter =
    javax.imageio.ImageIO.getImageWritersByFormatName("png").next()

  // the PNG read/write helpers are codec-agnostic (they take the reader/
  // writer); JPEG just needs its own registry lookups, reused per
  // partition like the PNG ones
  private def jpegReader(): javax.imageio.ImageReader =
    javax.imageio.ImageIO.getImageReadersByFormatName("jpg").next()

  private def jpegWriter(): javax.imageio.ImageWriter =
    javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()

  /** Encode one image with a caller-owned writer (per-partition reuse —
    * the `ImageIO.write` convenience re-scans the writer registry per
    * call). */
  private def writePng(writer: javax.imageio.ImageWriter,
                       img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.write(img)
      ios.flush()
    } finally ios.close()
    baos.toByteArray
  }

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

  // ---- Real-codec synthesis (PNG via javax.imageio, WAV via RIFF/PCM) ----

  /** Deterministic grayscale PNG for row `id`: a real PNG file produced
    * by `javax.imageio` from a TYPE_BYTE_GRAY image with
    * luma(x, y) = (id + 7x + 13y) mod 256, w = id%24+8, h = id%18+6.
    * PNG is lossless, so any decoder recovers exactly these bytes —
    * which is what lets the DuckDB oracle verify a REAL decode
    * analytically. */
  private def pngImage(id: Long): java.awt.image.BufferedImage = {
    val w = (id % 24 + 8).toInt
    val h = (id % 18 + 6).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    // gray BufferedImage backs onto a flat byte buffer — fill it directly
    // (per-pixel setSample costs ~10x at millions of rows)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        data(y * w + x) = ((id + 7L * x + 13L * y) % 256).toByte
        x += 1
      }
      y += 1
    }
    img
  }

  private[graft] def makePng(id: Long): Array[Byte] =
    writePng(pngWriter(), pngImage(id))

  /** Deterministic grayscale JPEG for row `id`: the SAME generator-law
    * image as [[pngImage]] (PNG and JPEG ids never collide — id%3
    * routes them), encoded through the JDK's real `jpg` codec (output
    * starts FF D8 FF E0, byte-deterministic — spec-pinned). Decoded
    * DIMENSIONS are exact (lossy codecs preserve geometry), so the SQL
    * oracle verifies them; decoded pixels differ from the law by DCT
    * quantization and are asserted spec-side instead. */
  private[graft] def makeJpeg(id: Long): Array[Byte] =
    writePng(jpegWriter(), pngImage(id))

  /** Deterministic 8×8 grayscale PNG whose pixels ARE the given 64 luma
    * bytes (row-major) — the real-codec carrier for [[phash]]. */
  private def lumaImage(luma: Array[Byte]): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < 64) {
      raster.setSample(i % 8, i / 8, 0, luma(i) & 0xff)
      i += 1
    }
    img
  }

  private[graft] def lumaPng(luma: Array[Byte]): Array[Byte] =
    writePng(pngWriter(), lumaImage(luma))

  /** Deterministic 16-bit mono PCM WAV for row `id`: canonical 44-byte
    * RIFF header + n = id%32+16 little-endian samples with
    * sample(i) = (37·id + 101·i) mod 65536 (as the unsigned bit
    * pattern). Real WAV — [[decodeWav]] reads it back through
    * `javax.sound.sampled`. */
  private[graft] def makeWav(id: Long): Array[Byte] = {
    val n = (id % 32 + 16).toInt
    val sampleRate = 8000
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort(((37L * id + 101L * i) % 65536L).toShort)
      i += 1
    }
    bb.array()
  }

  /** Decode a WAV payload through the JDK audio stack: returns
    * (sample count, sum of unsigned 16-bit sample patterns). */
  private[graft] def decodeWav(p: Array[Byte]): (Int, Long) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(p))
    try {
      val bytes = in.readAllBytes()
      var sum = 0L
      var i = 0
      while (i + 1 < bytes.length) {
        sum += ((bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)).toLong
        i += 2
      }
      (bytes.length / 2, sum)
    } finally in.close()
  }

  /** Attach REAL media payloads: doc_id%3==0 → genuine PNG
    * ([[makePng]]), %3==1 → genuine JPEG ([[makeJpeg]]),
    * %3==2 → genuine WAV ([[makeWav]]). */
  def synthReal(docs: DataFrame): DataFrame = {
    val schema = StructType(docs.schema.fields :+ StructField("payload", BinaryType))
    docs.mapPartitions { rows =>
      val writer = pngWriter() // reused across the whole partition
      val jwriter = jpegWriter()
      rows.map { r =>
        val id = r.getAs[Long]("doc_id")
        val payload = (id % 3) match {
          case 0 => writePng(writer, pngImage(id))
          case 2 => makeWav(id)
          case _ => writePng(jwriter, pngImage(id))
        }
        Row.fromSeq(r.toSeq :+ payload)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** Attach a synthesized binary payload column to the documents table. */
  def synthesize(docs: DataFrame): DataFrame = {
    val schema = StructType(docs.schema.fields :+ StructField("payload", BinaryType))
    docs.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ makePayload(r.getAs[Long]("doc_id"))))
    }(Encoders.row(schema)).toDF()
  }

  /** Textured media payload for perceptual hashing: a REAL 8×8
    * grayscale PNG ([[lumaPng]] via javax.imageio) whose 64 pixels are
    * drawn from md5 (4 digests per doc: pixel i = digest(g+":"+i/16)
    * [i%16]), which mixes well enough that unrelated docs get
    * independent fingerprints (a plain ramp image is too regular: every
    * dHash would collide and the band join would degenerate to one
    * O(n²) bucket). Docs 2k and 2k+1 share base image g=k; the odd doc
    * perturbs ONE pixel (xor 0x80 at position k%64) — a planted
    * near-duplicate law the oracle re-derives analytically, reachable
    * only by actually decoding the PNG (lossless, so decoded pixels ==
    * the law). */
  private def mediaLuma(id: Long): Array[Byte] = {
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
    luma
  }

  /** Attach the textured (luma-bearing) real-PNG payload — the input to
    * [[phash]] / [[Dedup.mediaPairs]]. */
  def synthMedia(docs: DataFrame): DataFrame = {
    val schema = StructType(docs.schema.fields :+ StructField("payload", BinaryType))
    docs.mapPartitions { rows =>
      val writer = pngWriter() // reused across the whole partition
      rows.map(r => Row.fromSeq(r.toSeq :+
        writePng(writer, lumaImage(mediaLuma(r.getAs[Long]("doc_id"))))))
    }(Encoders.row(schema)).toDF()
  }

  /** 64-bit difference-hash (dHash) perceptual fingerprint: DECODE the
    * PNG payload with javax.imageio, read the 8×8 gray raster row-major
    * as luma, then bit i = [luma[(i+1)%64] > luma[i]] — a one-pixel
    * change in the image moves at most 2 bits, so near-identical media
    * land within the band-join hamming radius. Packed as two positive
    * 32-bit halves (ph_lo bits 0..31, ph_hi 32..63), the same
    * signed-safe carriage as [[Dedup.simhash]], so the band machinery
    * and the DuckDB oracle apply unchanged. Map-only: at 100 TB this is
    * the per-file decode pass feeding a cheap 16-byte-per-item dedup
    * index. */
  def phash(withPayload: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ph_lo", LongType),
      StructField("ph_hi", LongType)))
    withPayload.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      val reader = pngReader() // reused across the whole partition
      rows.map { r =>
        val id = r.getLong(0)
        val p = r.getAs[Array[Byte]](1)
        val img = readPng(reader, p)
        val luma = img.getRaster.getSamples(0, 0, 8, 8, 0, null: Array[Int])
        var i = 0
        var lo = 0L
        var hi = 0L
        i = 0
        while (i < 64) {
          if (luma((i + 1) % 64) > luma(i)) {
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
    * same dHash — passes only if PNG encode, REAL javax.imageio decode,
    * raster read-out, and the bit packing all round-trip exactly. */
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

  /** Sniff container type from magic bytes, then DECODE: PNG through
    * `javax.imageio` (width/height/pixels from the real decoder), WAV
    * through `javax.sound.sampled` (sample count/values from the real
    * decoder), JPEG through the JDK's real JPEG codec (geometry is
    * codec-exact; pixel content is lossy, so checksum carries the -1
    * sentinel and decoded-pixel stats are spec-asserted with a
    * tolerance instead of oracle-hashed). Output is decoded
    * content metadata: (width, height) of the decoded raster (for audio:
    * sample count × 1), n_units = pixels or samples decoded, checksum =
    * sum of decoded luma / unsigned sample patterns. Batched per
    * partition, map-only — no shuffle; at 100 TB this is the per-file
    * decode pass, and column pruning keeps metadata-only readers from
    * ever loading payload bytes. */
  def extractMeta(withPayload: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media_type", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_units", IntegerType),
      StructField("checksum", LongType)))
    withPayload.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      val reader = pngReader() // reused across the whole partition
      val jreader = jpegReader()
      rows.map { r =>
        val id = r.getLong(0)
        val p = r.getAs[Array[Byte]](1)
        val img = if (p.length >= 8 && p.take(8).sameElements(PngMagic))
          readPng(reader, p)
        else null
        if (img != null) {
          // real decode — ImageIO parsed the whole PNG, not just a header
          val w = img.getWidth
          val h = img.getHeight
          val px = img.getRaster.getSamples(0, 0, w, h, 0, null: Array[Int])
          var sum = 0L
          var i = 0
          while (i < px.length) { sum += px(i); i += 1 }
          Row(id, "image/png", w, h, w * h, sum)
        } else if (p.length >= 12 &&
            p.take(4).sameElements("RIFF".getBytes("US-ASCII")) &&
            p.slice(8, 12).sameElements("WAVE".getBytes("US-ASCII"))) {
          val (n, sum) = decodeWav(p)
          Row(id, "audio/wav", n, 1, n, sum)
        } else if (p.length >= 4 && p.take(4).sameElements(JpegMagic)) {
          // real decode through the JDK jpg codec (readPng is
          // codec-agnostic — it drives whatever reader it's handed).
          // Geometry survives the lossy codec exactly; pixel content
          // does not, so checksum carries the documented -1 sentinel
          // (decoded-pixel stats are asserted in OperatorsSpec, where a
          // tolerance can live — a SQL hash-compare can't carry one).
          val jimg = readPng(jreader, p)
          val w = jimg.getWidth
          val h = jimg.getHeight
          Row(id, "image/jpeg", w, h, w * h, -1L)
        } else {
          Row(id, "application/octet-stream", 0, 0, p.length, 0L)
        }
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
    extractMeta(synthReal(Tables.documents(spark, dir))).orderBy("doc_id")

  /** Oracle re-derives decoded metadata analytically from the generator
    * laws — it can only match if the REAL codecs round-trip: the PNG
    * checksum is the pixel-law sum, recoverable solely by actually
    * decoding the PNG bytes javax.imageio wrote; same for WAV samples. */
  val mmMetaSql: String =
    """WITH m AS (SELECT doc_id, doc_id % 3 AS k FROM documents),
      |png AS (
      |  SELECT doc_id, CAST(doc_id % 24 + 8 AS INTEGER) AS width,
      |         CAST(doc_id % 18 + 6 AS INTEGER) AS height
      |  FROM m WHERE k = 0),
      |pngout AS (
      |  SELECT p.doc_id, 'image/png' AS media_type, p.width, p.height,
      |    p.width * p.height AS n_units,
      |    CAST(sum((p.doc_id + 7*x + 13*y) % 256) AS BIGINT) AS checksum
      |  FROM png p, unnest(range(0, p.width)) rx(x),
      |       unnest(range(0, p.height)) ry(y)
      |  GROUP BY p.doc_id, p.width, p.height),
      |jout AS (
      |  SELECT doc_id, 'image/jpeg' AS media_type,
      |    CAST(doc_id % 24 + 8 AS INTEGER) AS width,
      |    CAST(doc_id % 18 + 6 AS INTEGER) AS height,
      |    CAST((doc_id % 24 + 8) * (doc_id % 18 + 6) AS INTEGER) AS n_units,
      |    CAST(-1 AS BIGINT) AS checksum
      |  FROM m WHERE k = 1),
      |wout AS (
      |  SELECT doc_id, 'audio/wav' AS media_type,
      |    CAST(doc_id % 32 + 16 AS INTEGER) AS width, 1 AS height,
      |    CAST(doc_id % 32 + 16 AS INTEGER) AS n_units,
      |    CAST(list_sum(list_transform(range(0, doc_id % 32 + 16),
      |         i -> (37*doc_id + 101*i) % 65536)) AS BIGINT) AS checksum
      |  FROM m WHERE k = 2)
      |SELECT doc_id, media_type, CAST(width AS INTEGER) AS width,
      |  CAST(height AS INTEGER) AS height, CAST(n_units AS INTEGER) AS n_units,
      |  checksum
      |FROM (SELECT * FROM pngout UNION ALL SELECT * FROM jout
      |      UNION ALL SELECT * FROM wout)
      |ORDER BY doc_id""".stripMargin

  /** mm_resize: the full synth → sniff → REAL PNG decode → resize-plan
    * chain over the image rows (resizing audio is meaningless, so WAV
    * rows are filtered). The decoded dimensions come from the actual
    * codec ([[extractMeta]]); the resize ARITHMETIC (aspect-preserving
    * fit into a box) is oracle-checked against the generator law, and
    * the pixel-level raster resize itself is spec-verified (Java2D
    * interpolated values aren't analytically derivable in SQL). */
  def mmResize(spark: SparkSession, dir: String): DataFrame =
    resizeMeta(extractMeta(synthReal(Tables.documents(spark, dir)))
        .filter(col("media_type").startsWith("image/")))
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("out_w"), col("out_h"))
      .orderBy("doc_id")

  val mmResizeSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image/png' ELSE 'image/jpeg' END
      |      AS media_type,
      |    CAST(doc_id % 24 + 8 AS INTEGER) AS width,
      |    CAST(doc_id % 18 + 6 AS INTEGER) AS height
      |  FROM documents WHERE doc_id % 3 < 2),
      |s AS (
      |  SELECT *, least(32.0 / width, 32.0 / height) AS scale FROM m)
      |SELECT doc_id, media_type, width, height,
      |  greatest(CAST(floor(width * scale) AS INTEGER), 1) AS out_w,
      |  greatest(CAST(floor(height * scale) AS INTEGER), 1) AS out_h
      |FROM s ORDER BY doc_id""".stripMargin

  /** Real raster resize (the step [[resizeMeta]] plans): decode a PNG
    * payload, scale into the box with Java2D bilinear interpolation,
    * return the resized gray raster. Spec-verified for dimensions and
    * pixel content; not part of the SQL-oracle surface because
    * interpolated values are implementation-defined. */
  private[graft] def resizePng(p: Array[Byte], box: Int = 32): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
    val scale = math.min(box.toDouble / img.getWidth, box.toDouble / img.getHeight)
    val ow = math.max(math.floor(img.getWidth * scale).toInt, 1)
    val oh = math.max(math.floor(img.getHeight * scale).toInt, 1)
    val out = new java.awt.image.BufferedImage(
      ow, oh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g = out.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, ow, oh, null)
    g.dispose()
    out
  }

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

  /** Energy-based voice-activity detection over REAL WAV payloads — the
    * audio-pipeline segmentation pass (VAD gates which spans are worth
    * transcribing/training on). Decodes PCM through `javax.sound.sampled`
    * (same real-codec contract as [[extractMeta]]), frames the signal
    * (`frameLen` samples, trailing partial frame dropped — the standard
    * framing rule), and scores each frame by summed |signed sample|;
    * a frame is voiced when its mean |s| clears `meanAbsThreshold`.
    * Integer end to end, so the oracle re-derives every energy from the
    * generator law — matching only if the real decoder round-trips.
    * Map-only (decode → flat frame rows), partition-parallel: at 100 TB
    * this is the per-file decode pass, no shuffle. */
  def vadFrames(withPayload: DataFrame, frameLen: Int = 8,
                meanAbsThreshold: Int = 16384): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("energy", LongType),
      StructField("voiced", BooleanType)))
    withPayload.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val p = r.getAs[Array[Byte]](1)
        val isWav = p.length >= 12 &&
          p.take(4).sameElements("RIFF".getBytes("US-ASCII")) &&
          p.slice(8, 12).sameElements("WAVE".getBytes("US-ASCII"))
        if (!isWav) Iterator.empty
        else {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(p))
          // the energy loop below assumes 16-bit little-endian signed
          // mono PCM; a stereo/8-bit/big-endian/float WAV would decode
          // without error and silently yield wrong frame energies, so
          // non-conforming payloads are SKIPPED, not mis-scored
          val fmt = in.getFormat
          val conforming =
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian
          if (!conforming) { in.close(); Iterator.empty }
          else {
          val bytes = try in.readAllBytes() finally in.close()
          val nFrames = bytes.length / 2 / frameLen
          (0 until nFrames).iterator.map { f =>
            var e = 0L
            var i = f * frameLen
            val end = i + frameLen
            while (i < end) {
              val u = (bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)
              e += math.abs(if (u < 32768) u else u - 65536)
              i += 1
            }
            Row(id, f, e, e > meanAbsThreshold.toLong * frameLen)
          }
          }
        }
      }
    }(Encoders.row(schema)).toDF()
  }

  def mmVad(spark: SparkSession, dir: String): DataFrame =
    vadFrames(synthReal(
        Tables.documents(spark, dir).filter(col("doc_id") % 3 === 2)))
      .orderBy("doc_id", "frame_idx")

  /** Oracle: the sample law (37·id + 101·i) mod 65536, signed, framed —
    * derivable only if javax.sound decodes the real RIFF/PCM bytes back
    * to exactly the generated samples. */
  val mmVadSql: String =
    """WITH w AS (
      |  SELECT doc_id, doc_id % 32 + 16 AS n FROM documents
      |  WHERE doc_id % 3 = 2),
      |s AS (
      |  SELECT doc_id, unnest(range(0, n)) AS i, n FROM w),
      |f AS (
      |  SELECT doc_id, CAST(i // 8 AS INTEGER) AS frame_idx,
      |    (37 * doc_id + 101 * i) % 65536 AS u
      |  FROM s WHERE i // 8 < n // 8),
      |e AS (
      |  SELECT doc_id, frame_idx,
      |    CAST(sum(abs(CASE WHEN u < 32768 THEN u ELSE u - 65536 END))
      |      AS BIGINT) AS energy
      |  FROM f GROUP BY doc_id, frame_idx)
      |SELECT doc_id, frame_idx, energy, energy > 131072 AS voiced
      |FROM e ORDER BY doc_id, frame_idx""".stripMargin

  /** Patch extraction (ViT-style patchification) over REAL-decoded PNG
    * rasters: decode through `javax.imageio`, tile the raster into
    * `patch`×`patch` cells (edge cells partial — the pad-vs-crop
    * decision made explicit by per-cell n_px), and emit each cell's
    * pixel count and exact luma sum — the vision-training preprocessing
    * pass (patch grids feed patch embeddings; per-patch stats feed
    * brightness/contrast filters). Map-only flat rows, one decode per
    * payload, no shuffle; the oracle re-derives every patch sum from
    * the pixel law, so it matches only if the real codec round-trips. */
  def patchStats(withPayload: DataFrame, patch: Int = 4): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("px", IntegerType),
      StructField("py", IntegerType),
      StructField("n_px", IntegerType),
      StructField("sum_luma", LongType)))
    withPayload.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      val reader = pngReader()
      rows.flatMap { r =>
        val id = r.getLong(0)
        val p = r.getAs[Array[Byte]](1)
        if (!(p.length >= 8 && p.take(8).sameElements(PngMagic))) Iterator.empty
        else {
          val img = readPng(reader, p)
          val w = img.getWidth
          val h = img.getHeight
          val px = img.getRaster.getSamples(0, 0, w, h, 0, null: Array[Int])
          val gx = (w + patch - 1) / patch
          val gy = (h + patch - 1) / patch
          for {
            cy <- (0 until gy).iterator
            cx <- (0 until gx).iterator
          } yield {
            val x1 = math.min((cx + 1) * patch, w)
            val y1 = math.min((cy + 1) * patch, h)
            var s = 0L
            var n = 0
            var y = cy * patch
            while (y < y1) {
              var x = cx * patch
              while (x < x1) { s += px(y * w + x); n += 1; x += 1 }
              y += 1
            }
            Row(id, cx, cy, n, s)
          }
        }
      }
    }(Encoders.row(schema)).toDF()
  }

  def mmPatches(spark: SparkSession, dir: String): DataFrame =
    patchStats(synthReal(
        Tables.documents(spark, dir).filter(col("doc_id") % 3 === 0)))
      .orderBy("doc_id", "py", "px")

  /** Oracle: the pixel law (id + 7x + 13y) mod 256 summed over each
    * patch's [4px, min(4px+4, w)) × [4py, min(4py+4, h)) cell. */
  val mmPatchesSql: String =
    """WITH m AS (
      |  SELECT doc_id, CAST(doc_id % 24 + 8 AS INTEGER) AS w,
      |    CAST(doc_id % 18 + 6 AS INTEGER) AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |cells AS (
      |  SELECT doc_id, w, h, CAST(cx AS INTEGER) AS px, CAST(cy AS INTEGER) AS py
      |  FROM m, unnest(range(0, (w + 3) // 4)) rx(cx),
      |       unnest(range(0, (h + 3) // 4)) ry(cy)),
      |pix AS (
      |  SELECT doc_id, px, py, x, y
      |  FROM cells, unnest(range(px * 4, least((px + 1) * 4, w))) ux(x),
      |       unnest(range(py * 4, least((py + 1) * 4, h))) uy(y))
      |SELECT doc_id, px, py, CAST(count(*) AS INTEGER) AS n_px,
      |  CAST(sum((doc_id + 7 * x + 13 * y) % 256) AS BIGINT) AS sum_luma
      |FROM pix GROUP BY doc_id, px, py
      |ORDER BY doc_id, py, px""".stripMargin

  // ---- shot detection -----------------------------------------------------

  /** Frame-difference shot-boundary detection — the video-pipeline
    * segmentation pass (shot boundaries decide where to sample training
    * frames; the metric is the classic sum-of-absolute-differences
    * between consecutive frames). Runs over the deterministic synthetic
    * payloads ([[synthesize]] — the mm_frames contract) framed at
    * `frameBytes`; SAD and the boundary test are pure integers, so the
    * oracle re-derives every diff from the byte law. Map-only per
    * payload + a per-doc bounded window for the consecutive pairing. */
  def shotDetect(withPayload: DataFrame, frameBytes: Int = 8,
                 threshold: Int = 100): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("diff", LongType)))
    val diffs = withPayload.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val p = r.getAs[Array[Byte]](1)
          val headerOff = if (id % 3 == 1) 12 else 16
          val nFrames = (p.length - headerOff) / frameBytes
          (1 until nFrames).iterator.map { k =>
            var d = 0L
            var j = 0
            while (j < frameBytes) {
              val a = p(headerOff + (k - 1) * frameBytes + j) & 0xff
              val b = p(headerOff + k * frameBytes + j) & 0xff
              d += math.abs(b - a)
              j += 1
            }
            Row(id, k, d)
          }
        }
      }(Encoders.row(schema)).toDF()
    diffs.select(col("doc_id"), col("frame_idx"), col("diff"),
        (col("diff") > threshold).as("is_boundary"))
      .orderBy("doc_id", "frame_idx")
  }

  def mmShots(spark: SparkSession, dir: String): DataFrame =
    shotDetect(synthesize(Tables.documents(spark, dir)))

  /** Oracle: SAD between consecutive 8-byte frames of the byte law
    * (doc_id + pos) % 256 — the diff is 8 per byte except across the
    * 256-wrap, where it is 248. */
  val mmShotsSql: String =
    """WITH f AS (
      |  SELECT doc_id, CAST(k AS INTEGER) AS frame_idx,
      |    CAST(sum(abs(
      |      CAST((doc_id + k*8 + j) % 256 AS BIGINT) -
      |      CAST((doc_id + (k-1)*8 + j) % 256 AS BIGINT))) AS BIGINT) AS diff
      |  FROM documents
      |  CROSS JOIN (SELECT unnest(range(1, 8)) AS k)
      |  CROSS JOIN (SELECT unnest(range(0, 8)) AS j)
      |  GROUP BY doc_id, k)
      |SELECT doc_id, frame_idx, diff, diff > 100 AS is_boundary
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  // ---- audio fingerprint ----------------------------------------------------

  /** Audio fingerprint over REAL-decoded PCM (the Shazam-family shape,
    * reduced to its distributable core): frame the signal (4 samples),
    * compute per-frame energies through the [[vadFrames]] decoder, and
    * pack the energy-DESCENT bits (energy_k > energy_{k+1}) into one
    * long per document — the compact signature an audio-dedup pass
    * bands on. The pairing window is per-document (≤ 12 frames by the
    * generator law), and the bit packing is exact integer arithmetic,
    * so the oracle re-derives the fingerprint from the sample law —
    * matching only if the real javax.sound decode round-trips. */
  def audioFingerprint(withPayload: DataFrame): DataFrame = {
    val e = vadFrames(withPayload, frameLen = 4)
      .select(col("doc_id"), col("frame_idx"), col("energy"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    e.withColumn("_next", lead(col("energy"), 1).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("_next").isNotNull && col("energy") > col("_next"),
            expr("shiftleft(1L, frame_idx)")).otherwise(0L)).as("fp"))
      .orderBy("doc_id")
  }

  def mmAudioFp(spark: SparkSession, dir: String): DataFrame =
    audioFingerprint(synthReal(
      Tables.documents(spark, dir).filter(col("doc_id") % 3 === 2)))

  val mmAudioFpSql: String =
    """WITH w AS (
      |  SELECT doc_id, doc_id % 32 + 16 AS n FROM documents
      |  WHERE doc_id % 3 = 2),
      |s AS (
      |  SELECT doc_id, unnest(range(0, n)) AS i, n FROM w),
      |f AS (
      |  SELECT doc_id, CAST(i // 4 AS INTEGER) AS frame_idx,
      |    (37 * doc_id + 101 * i) % 65536 AS u
      |  FROM s WHERE i // 4 < n // 4),
      |e AS (
      |  SELECT doc_id, frame_idx,
      |    CAST(sum(abs(CASE WHEN u < 32768 THEN u ELSE u - 65536 END))
      |      AS BIGINT) AS energy
      |  FROM f GROUP BY doc_id, frame_idx),
      |b AS (
      |  SELECT doc_id, frame_idx, energy,
      |    lead(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS nxt
      |  FROM e)
      |SELECT doc_id, count(*) AS n_frames,
      |  CAST(sum(CASE WHEN nxt IS NOT NULL AND energy > nxt
      |    THEN 1::BIGINT << frame_idx ELSE 0 END) AS BIGINT) AS fp
      |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- blur / sharpness score ----------------------------------------------

  /** Variance-of-Laplacian sharpness score over REAL-decoded PNG
    * rasters — the classic blur filter an image-training pipeline runs
    * before anything expensive (a defocused/blank image has a flat
    * Laplacian response; OpenCV's `cv2.Laplacian(...).var()` is this
    * statistic). For each interior pixel the 4-neighbor Laplacian is
    * lap = 4·l − l_left − l_right − l_up − l_down; the per-image score
    * is Σ lap² / n_interior — exact integer moments and ONE terminal
    * division (the Simpson/diversity lesson), so the oracle re-derives
    * it from the pixel law and matches only if the real javax.imageio
    * decode round-trips. Map-only: one decode per payload, no shuffle;
    * at 100 TB this is a per-file decode pass emitting ~32 bytes/image. */
  def blurScore(withPayload: DataFrame,
                threshold: Double = 10000.0): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_interior", LongType),
      StructField("lap_sq_sum", LongType)))
    withPayload.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      val reader = pngReader() // reused across the whole partition
      rows.map { r =>
        val id = r.getLong(0)
        val img = readPng(reader, r.getAs[Array[Byte]](1))
        val w = img.getWidth
        val h = img.getHeight
        val l = img.getRaster.getSamples(0, 0, w, h, 0, null: Array[Int])
        var s = 0L
        var n = 0L
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            val lap = 4L * l(y * w + x) -
              l(y * w + x - 1) - l(y * w + x + 1) -
              l((y - 1) * w + x) - l((y + 1) * w + x)
            s += lap * lap
            n += 1
            x += 1
          }
          y += 1
        }
        Row(id, n, s)
      }
    }(Encoders.row(schema)).toDF()
      .select(col("doc_id"), col("n_interior"), col("lap_sq_sum"),
        (col("lap_sq_sum").cast(DoubleType) /
          col("n_interior").cast(DoubleType)).as("sharpness"))
      .withColumn("is_blurry", col("sharpness") < threshold)
      .orderBy("doc_id")
  }

  def mmBlur(spark: SparkSession, dir: String): DataFrame =
    blurScore(synthReal(
      Tables.documents(spark, dir).filter(col("doc_id") % 3 === 0)))

  /** Oracle: the ramp law luma(x,y) = (id + 7x + 13y) mod 256 makes
    * every in-range Laplacian cancel to 0; only mod-256 wraps in a
    * neighbor contribute (±256 per wrapped term), so lap² counts wrap
    * boundaries — derivable analytically, but only reachable through
    * an exact decode of the real PNG. */
  val mmBlurSql: String =
    """WITH m AS (
      |  SELECT doc_id, CAST(doc_id % 24 + 8 AS BIGINT) AS w,
      |         CAST(doc_id % 18 + 6 AS BIGINT) AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (
      |  SELECT doc_id,
      |    4*((doc_id + 7*x + 13*y) % 256)
      |      - ((doc_id + 7*(x-1) + 13*y) % 256)
      |      - ((doc_id + 7*(x+1) + 13*y) % 256)
      |      - ((doc_id + 7*x + 13*(y-1)) % 256)
      |      - ((doc_id + 7*x + 13*(y+1)) % 256) AS lap
      |  FROM m, unnest(range(1, w-1)) rx(x), unnest(range(1, h-1)) ry(y))
      |SELECT doc_id, count(*) AS n_interior,
      |  CAST(sum(lap*lap) AS BIGINT) AS lap_sq_sum,
      |  CAST(sum(lap*lap) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS sharpness,
      |  CAST(sum(lap*lap) AS DOUBLE) / CAST(count(*) AS DOUBLE) < 10000.0
      |    AS is_blurry
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_blur" -> (mmBlur _),
    "mm_shots" -> (mmShots _),
    "mm_audio_fp" -> (mmAudioFp _),
    "mm_meta" -> (mmMeta _),
    "mm_resize" -> (mmResize _),
    "mm_frames" -> (mmFrames _),
    "mm_features" -> (mmFeatures _),
    "mm_phash" -> (mmPhash _),
    "mm_vad" -> (mmVad _),
    "mm_patches" -> (mmPatches _))

  val oracles: Map[String, String] = Map(
    "mm_blur" -> mmBlurSql,
    "mm_shots" -> mmShotsSql,
    "mm_audio_fp" -> mmAudioFpSql,
    "mm_meta" -> mmMetaSql,
    "mm_resize" -> mmResizeSql,
    "mm_frames" -> mmFramesSql,
    "mm_features" -> mmFeaturesSql,
    "mm_phash" -> mmPhashSql,
    "mm_vad" -> mmVadSql,
    "mm_patches" -> mmPatchesSql)
}
