package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.queries.Relational
import graft.streaming.EventStreams

/** Streaming == batch equivalence on the events table: the same windowed
  * aggregations computed via readStream + availableNow must match the
  * batch queries the DuckDB oracle already checks. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).appName("streaming-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def checkpoint(): String =
    Files.createTempDirectory("graft-ckpt").toString

  /** The file-stream source needs a directory; stage the single test
    * parquet file into one. */
  private lazy val eventsDir: String = {
    val d = Files.createTempDirectory("graft-events")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streaming tumbling-window counts equal the batch aggregation") {
    val q = EventStreams.windowedCounts(EventStreams.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val stream = spark.table("wc").orderBy("window_start", "event_type").collect()
    val batch = Relational.stWindowAgg(spark, dir).collect()
    assert(stream.length === batch.length)
    assert(stream.map(_.toSeq) === batch.map(_.toSeq))
  }

  test("stream-maintained window counts rank to the batch top-k") {
    // st_topk's split: streaming maintains the windowed COUNTS (state =
    // windows x types, independent of event volume); the rank is a
    // read-time projection over that table — applied HERE via the same
    // shared rankWindowTopk stage the batch query uses, so stream and
    // batch cannot drift.
    val q = EventStreams.windowedCounts(EventStreams.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("wtk")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val stream = Relational.rankWindowTopk(spark.table("wtk"), 3).collect()
    val batch = Relational.stTopk(spark, dir).collect()
    assert(stream.length === batch.length)
    assert(stream.map(_.toSeq) === batch.map(_.toSeq))
  }

  test("streaming session windows equal the batch session_window aggregation") {
    // Append-mode session windows emit only once the watermark passes
    // session end, AND emission in batch k uses the watermark computed at
    // the end of batch k-1 — so flushing EVERY real session needs TWO
    // far-future sentinel files (user -1), processed one file per
    // micro-batch: the final batch's effective watermark is then
    // sentinel1 − delay, past every real session's end.
    val d = Files.createTempDirectory("graft-sess-events")
    val ev0 = d.resolve("events.parquet")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), ev0)
    val maxTs = Tables.events(spark, dir).agg(max(col("ts"))).head.getTimestamp(0)
    import spark.implicits._
    // sentinels must carry a real parquet TIMESTAMP ts column — a file
    // whose ts physical type diverges from readEvents' declared schema
    // is silently skipped by the file source (observed: 0 rows read →
    // watermark stuck one session short)
    def sentinel(days: Long, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-sess-sent")
      Seq((-days,
          new java.sql.Timestamp(maxTs.getTime + days * 24 * 3600 * 1000),
          -1L, "view", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).iterator()
      var src: java.nio.file.Path = null
      while (f.hasNext) { val p = f.next(); if (p.toString.endsWith(".parquet")) src = p }
      Files.copy(src, d.resolve(name))
    }
    sentinel(30, "s1.parquet")
    sentinel(60, "s2.parquet")
    // deterministic batch order: file source orders by modification time
    java.nio.file.Files.setLastModifiedTime(ev0,
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
    java.nio.file.Files.setLastModifiedTime(d.resolve("s1.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000010000L))
    java.nio.file.Files.setLastModifiedTime(d.resolve("s2.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000020000L))
    // NOTE: the user_id >= 0 sentinel cut must happen CLIENT-side — as a
    // DataFrame filter it is a grouping-column predicate, so Catalyst
    // pushes it below the aggregation AND the EventTimeWatermark node,
    // and the sentinel then never advances the watermark (observed: the
    // last two sessions never flush).
    val q = EventStreams.sessionCounts(
        EventStreams.readEvents(spark, d.toString, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val stream = spark.table("sess").filter(col("user_id") >= 0)
      .orderBy("user_id", "session_start").collect()
    val batch = graft.queries.Analytics.stSession(spark, dir).collect()
    assert(stream.length === batch.length,
      s"session count mismatch: stream ${stream.length} vs batch ${batch.length}")
    assert(stream.map(_.toSeq) === batch.map(_.toSeq),
      "streamed sessions diverged from the batch twin")
  }

  test("streaming anomaly state equals the batch two-phase split") {
    // the feed is replayed as 3 event-time-ordered slices (one per
    // micro-batch) — the anomaly law is prefix-dependent, so this is
    // the real cross-batch state-carry test, not just re-aggregation
    import org.apache.spark.sql.expressions.Window
    val d = Files.createTempDirectory("graft-anom-events")
    val ev = Tables.events(spark, dir)
      .withColumn("_sl", ntile(3).over(
        Window.orderBy(col("ts"), col("event_id"))))
    def slice(sl: Int, name: String, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-anom-slice")
      ev.filter(col("_sl") === sl).drop("_sl")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val it = java.nio.file.Files.list(tmp).iterator()
      var src: java.nio.file.Path = null
      while (it.hasNext) {
        val p = it.next(); if (p.toString.endsWith(".parquet")) src = p
      }
      Files.copy(src, d.resolve(name))
      java.nio.file.Files.setLastModifiedTime(d.resolve(name),
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    slice(1, "a.parquet", 1000000000000L)
    slice(2, "b.parquet", 1000000010000L)
    slice(3, "c.parquet", 1000000020000L)
    val q = EventStreams.anomalyState(
        EventStreams.readEvents(spark, d.toString, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("anomst")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val emitted = spark.table("anomst")
    // every key emits once per micro-batch it appears in — more rows
    // than keys proves the state actually crossed batch boundaries
    assert(emitted.count() > emitted.select("event_type").distinct().count())
    // n_events is monotone per key, so max(struct) is the final state
    val stream = emitted.groupBy("event_type")
      .agg(max(struct(col("n_events"), col("n_anomalies"))).as("m"))
      .select(col("event_type"), col("m.n_events"), col("m.n_anomalies"))
      .orderBy("event_type").collect()
    val batch = Relational.stAnomaly(spark, dir).collect()
    assert(batch.map(_.getLong(2)).sum > 0, "no anomalies in the feed")
    assert(stream.map(_.toSeq) === batch.map(_.toSeq))
  }

  test("kafka wire projection round-trips and feeds the stateful plans unchanged") {
    // batch leg: events → (key, value) bytes → events must be lossless
    // (ts travels as epoch micros; key is the user_id bytes that keep a
    // keyed topic per-entity ordered)
    val ev = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val wire = EventStreams.toKafkaRecords(ev)
      .withColumn("topic", lit("events"))
      .withColumn("partition", lit(0))
      .withColumn("offset", monotonically_increasing_id())
      .withColumn("timestamp", current_timestamp())
      .withColumn("timestampType", lit(0))
    assert(wire.schema("key").dataType === org.apache.spark.sql.types.BinaryType)
    assert(wire.schema("value").dataType === org.apache.spark.sql.types.BinaryType)
    val back = EventStreams.fromKafkaRecords(wire)
      .orderBy("event_id").collect()
    val orig = ev.orderBy("event_id").collect()
    assert(back.map(_.toSeq) === orig.map(_.toSeq),
      "wire codec is not lossless")
    // options builder: the full broker config is code, not prose
    val opts = EventStreams.kafkaOptions("broker:9092", "events",
      maxOffsetsPerTrigger = Some(100000L))
    assert(opts("kafka.bootstrap.servers") === "broker:9092")
    assert(opts("subscribe") === "events")
    assert(opts("startingOffsets") === "earliest")
    assert(opts("failOnDataLoss") === "false")
    assert(opts("maxOffsetsPerTrigger") === "100000")
    // streaming leg: the SAME projection applied to a stream (file
    // source standing in for the broker) must feed windowedCounts to
    // the exact batch answer — proving a deployment is only the
    // format-string swap
    val q = EventStreams.windowedCounts(
        EventStreams.fromKafkaRecords(
          EventStreams.toKafkaRecords(EventStreams.readEvents(spark, eventsDir))
            .withColumn("timestamp", current_timestamp())))
      .writeStream.format("memory").queryName("kwc")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val stream = spark.table("kwc").orderBy("window_start", "event_type").collect()
    val batch = Relational.stWindowAgg(spark, dir).collect()
    assert(stream.map(_.toSeq) === batch.map(_.toSeq),
      "kafka-projected stream diverged from the batch twin")
  }

  test("streaming quality funnel equals the batch drop attribution") {
    val q = EventStreams.qualityFunnel(EventStreams.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("qf")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val stream = spark.table("qf").orderBy("window_start", "stage").collect()
    val batch = Relational.stFunnel(spark, dir).collect()
    assert(stream.length === batch.length)
    assert(stream.map(_.toSeq) === batch.map(_.toSeq))
  }

  test("streaming ingest-time sampling selects the identical event set as batch") {
    val q = EventStreams.sampledEvents(EventStreams.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("samp")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val stream = spark.table("samp").orderBy("event_id").collect()
    val batch = graft.operators.Sampling.stSample(spark, dir).collect()
    assert(stream.length === batch.length)
    assert(stream.map(_.toSeq) === batch.map(_.toSeq))
  }

  test("streaming session windows (append + watermark) match batch sessions") {
    val q = EventStreams.sessionWindows(EventStreams.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("sw")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val emitted = spark.table("sw").collect().map(_.toSeq).toSet
    val batch = Relational.qSessionize(spark, dir).collect().map(_.toSeq).toSet
    // append mode only finalizes sessions ending before the terminal
    // watermark; everything emitted must be a real session, and nearly all
    // sessions (all but those near max ts) must be emitted
    assert(emitted.subsetOf(batch))
    assert(emitted.size >= (batch.size * 9) / 10,
      s"only ${emitted.size}/${batch.size} sessions finalized")
  }

  test("state carries across micro-batches (maxFilesPerTrigger=1)") {
    // split events into 4 files → 4 micro-batches; the windowed counts
    // must still equal the batch aggregation, proving incremental state
    val d = Files.createTempDirectory("graft-events-multi")
    Tables.events(spark, dir)
      .withColumn("ts", unix_micros(col("ts")) * 1000) // back to raw long nanos
      .repartition(4)
      .write.parquet(d.toString + "/files")
    val q = EventStreams.windowedCounts(
        EventStreams.readEvents(spark, d.toString + "/files", Some(1)))
      .writeStream.format("memory").queryName("wcm")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(q.asInstanceOf[org.apache.spark.sql.streaming.StreamingQuery]
      .lastProgress != null)
    val stream = spark.table("wcm").orderBy("window_start", "event_type").collect()
    val batch = Relational.stWindowAgg(spark, dir).collect()
    assert(stream.map(_.toSeq) === batch.map(_.toSeq))
  }

  test("stream-stream join (purchase attribution) equals the batch join") {
    val src = EventStreams.readEvents(spark, eventsDir)
    val q = EventStreams.purchaseAttribution(
        src.filter(col("event_type") === "click"),
        src.filter(col("event_type") === "purchase"))
      .writeStream.format("memory").queryName("pa")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val stream = spark.table("pa").collect().map(_.toSeq).toSet
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
    val purchases = ev.filter(col("event_type") === "purchase")
    val batch = EventStreams.purchaseAttribution(clicks, purchases)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    assert(stream === batch)
  }

  test("streaming writes land in a parquet sink (file sink end-to-end)") {
    val src = EventStreams.readEvents(spark, eventsDir)
    val outDir = Files.createTempDirectory("graft-sink").toString
    val q = EventStreams.purchaseAttribution(
        src.filter(col("event_type") === "click"),
        src.filter(col("event_type") === "purchase"))
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint())
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val written = spark.read.parquet(outDir).collect().map(_.toSeq).toSet
    val ev = Tables.events(spark, dir)
    val batch = EventStreams.purchaseAttribution(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"))
      .collect().map(_.toSeq).toSet
    assert(written.nonEmpty)
    assert(written === batch)
  }

  test("shard export sink: a replayed micro-batch rewrites byte-identical shards, no dupes") {
    import java.nio.file.{Files => F, Paths}
    import scala.jdk.CollectionConverters._
    val outDir = Files.createTempDirectory("graft-shards").toString
    val q = EventStreams.shardExportSink(
      EventStreams.readEvents(spark, eventsDir), outDir, checkpoint(),
      nShards = 4, availableNow = true)
    q.awaitTermination(120000)
    // key shard files by their (batch, shard) DIRS — file names carry a
    // fresh task UUID per write, so identity must come from the layout
    def shardFiles(): Map[String, Array[Byte]] = {
      val st = F.walk(Paths.get(outDir))
      try st.iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => p.getParent.toString.stripPrefix(outDir) -> F.readAllBytes(p))
        .toMap
      finally st.close()
    }
    val before = shardFiles()
    assert(before.size === 4, s"expected 4 shard files, got ${before.keySet}")
    val total = spark.read.parquet(s"$outDir/batch=0").count()
    assert(total > 0)
    // forced replay of micro-batch 0 — at-least-once redelivery: the
    // SAME input with the SAME batchId must replace, not append. The
    // batch loader over the same staged file is the stream's batch twin.
    EventStreams.upsertShardBatch(
      graft.core.Tables.events(spark, eventsDir), 0L, outDir, nShards = 4)
    val after = shardFiles()
    assert(after.keySet === before.keySet, "replay changed the shard layout")
    after.foreach { case (k, bytes) =>
      assert(java.util.Arrays.equals(bytes, before(k)),
        s"replayed shard $k is not byte-identical")
    }
    assert(spark.read.parquet(s"$outDir/batch=0").count() === total,
      "replay duplicated shard rows")
  }

  test("streaming dedup drops redelivered events across micro-batches") {
    // simulate at-least-once delivery: the full feed plus every 10th
    // event again, split over multiple files → multiple micro-batches,
    // so dedup state must carry across batch boundaries
    val d = Files.createTempDirectory("graft-events-dup")
    val raw = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    raw.union(raw.filter(pmod(col("event_id"), lit(10)) === 0))
      .withColumn("ts", unix_micros(col("ts")) * 1000) // back to raw long nanos
      .repartition(4)
      .write.parquet(d.toString + "/files")
    val q = EventStreams.dedupEvents(
        EventStreams.readEvents(spark, d.toString + "/files", Some(1)),
        watermark = "365 days") // all redeliveries inside the horizon
      .writeStream.format("memory").queryName("dd")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("dd").select("event_id").collect().map(_.getLong(0))
    assert(streamed.length === streamed.distinct.length, "duplicates survived")
    assert(streamed.toSet === raw.select("event_id").collect().map(_.getLong(0)).toSet)
  }

  test("event-time timeout finalizes idle sessions and evicts their state") {
    val d = Files.createTempDirectory("graft-sessions")
    val streamDir = d.resolve("files")
    Files.createDirectory(streamDir)
    import spark.implicits._
    def writeFile(name: String, rows: Seq[(Long, Long, Long)], mtime: Long): Unit = {
      val df = rows.toDF("event_id", "ts", "user_id")
        .withColumn("event_type", lit("click"))
        .withColumn("value", lit(1.0))
        .withColumn("props", lit("{}"))
      val tmp = Files.createTempDirectory("graft-sess-tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst.get
      val dst = streamDir.resolve(name)
      Files.copy(part, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val min = 60L * 1000000000L // one minute in raw nanos
    val base = 24 * 60 * min // keep clear of the epoch-zero initial watermark
    // user 1: three events ending at t=2min (file A, processed first);
    // user 2: one event at t=60min (file B) — advancing the watermark far
    // past user 1's last event + the 10-minute gap
    val now = System.currentTimeMillis()
    writeFile("a.parquet",
      Seq((1L, base, 1L), (2L, base + 1 * min, 1L), (3L, base + 2 * min, 1L)),
      now - 60000)
    writeFile("b.parquet", Seq((4L, base + 60 * min, 2L)), now)
    val q = EventStreams.expiringSessions(
        EventStreams.readEvents(spark, streamDir.toString, Some(1)))
      .writeStream.format("memory").queryName("es")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("es").collect()
    // exactly user 1 finalized (timer fired when the watermark passed
    // 2min + 10min gap); user 2's session is still open — no emission
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L), s"got: ${rows.mkString(",")}")
    assert(rows(0).getLong(1) === 3L)
  }

  test("mixture sampling and int8 quantization run unchanged on a stream") {
    // rate-based sampling and quantization are stateless projections, so
    // the SAME operator code runs on readStream input — the streaming
    // ingest shape of mixture construction (sample at ingest, store
    // quantized embeddings). Streamed result must equal batch exactly.
    val d = Files.createTempDirectory("graft-stream-docs")
    val docsDir = "/root/testdata/sf0.001"
    Files.copy(java.nio.file.Paths.get(s"$docsDir/documents.parquet"),
      d.resolve("documents.parquet"))
    val batchDocs = Tables.documents(spark, docsDir)
    val streamDocs = spark.readStream
      .schema(batchDocs.schema)
      .parquet(d.toString)
    val q = graft.operators.Sampling.stratifiedByRate(
        streamDocs, col("lang"), col("doc_id"),
        Map("en" -> 0.1, "fr" -> 1.0), defaultRate = 0.25)
      .select(col("doc_id"), col("lang"))
      .writeStream.format("memory").queryName("mix")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("mix").collect().map(_.toSeq).toSet
    val batch = graft.operators.Sampling.stratifiedByRate(
        batchDocs, col("lang"), col("doc_id"),
        Map("en" -> 0.1, "fr" -> 1.0), defaultRate = 0.25)
      .select(col("doc_id"), col("lang")).collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // quantization as a streaming projection over the embeddings table
    val e = Files.createTempDirectory("graft-stream-emb")
    Files.copy(java.nio.file.Paths.get(s"$docsDir/embeddings.parquet"),
      e.resolve("embeddings.parquet"))
    val batchEmb = Tables.embeddings(spark, docsDir)
    val q2 = graft.operators.Similarity.quantizeInt8(
        spark.readStream.schema(batchEmb.schema).parquet(e.toString))
      .writeStream.format("memory").queryName("qemb")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val sq = spark.table("qemb").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq, r.getDouble(2))).toSet
    val bq = graft.operators.Similarity.quantizeInt8(batchEmb).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq, r.getDouble(2))).toSet
    assert(sq === bq)
    assert(sq.nonEmpty)
  }

  test("checkpoint recovery: restart on the same checkpoint is exactly-once, state intact") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-ckpt-recovery")
    val streamDir = d.resolve("files")
    Files.createDirectory(streamDir)
    val ckpt = checkpoint()
    val outDir = Files.createTempDirectory("graft-ckpt-out").toString
    def writeFile(name: String, ids: Seq[Long], mtime: Long): Unit = {
      val df = ids.toDF("event_id")
        .withColumn("ts", lit(86400L * 1000000000L) + col("event_id") * 1000000000L)
        .withColumn("user_id", col("event_id") % 7)
        .withColumn("event_type", lit("click"))
        .withColumn("value", lit(1.0))
        .withColumn("props", lit("{}"))
      val tmp = Files.createTempDirectory("graft-ckpt-tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst.get
      val dst = streamDir.resolve(name)
      Files.copy(part, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    def runToCompletion(): Unit = {
      val q = EventStreams.dedupEvents(
          EventStreams.readEvents(spark, streamDir.toString, Some(1)),
          watermark = "365 days")
        .select("event_id", "user_id")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt) // SAME checkpoint both runs
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    val now = System.currentTimeMillis()
    // run 1: events 1..100, then the query terminates (= stop/kill between
    // micro-batches; the checkpoint holds source offsets + dedup state)
    writeFile("a.parquet", 1L to 100L, now - 60000)
    runToCompletion()
    // run 2, same checkpoint: new events 101..150 PLUS redelivered 1..10.
    // Exactly-once requires the restarted query to (a) not reprocess file
    // a, (b) drop the redelivered ids via RECOVERED dedup state, (c) not
    // duplicate anything already committed to the sink manifest
    writeFile("b.parquet", (101L to 150L) ++ (1L to 10L), now)
    runToCompletion()
    val got = spark.read.parquet(outDir).select("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got.length === got.distinct.length,
      s"restart duplicated ${got.length - got.distinct.length} rows")
    assert(got.toSet === (1L to 150L).toSet,
      s"missing: ${(1L to 150L).toSet.diff(got.toSet)}")
  }

  test("streaming near-dup pairs equal the batch band join, across micro-batches") {
    import graft.streaming.DedupStream
    import spark.implicits._
    // split the corpus into 2 files → 2 micro-batches, so pairs spanning
    // the boundary prove the per-bucket signature state carries over
    val d = Files.createTempDirectory("graft-docs-stream")
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val maxId = docs0.agg(max(col("doc_id"))).head().getLong(0)
    // adversarial extras in BOTH engines' input: two null-text docs (the
    // batch explode(split(null)) emits no signature — the stream must
    // likewise emit no DocSig, or null→"" would pair them hamming-0 with
    // each other and with the empty-text doc) and one empty-text doc (one
    // empty token = a real signature in both engines)
    val extras = Seq((maxId + 1, null: String), (maxId + 2, null: String),
      (maxId + 3, "")).toDF("doc_id", "text")
    val docs = docs0.union(extras)
    val half = docs0.count() / 2
    docs.filter(col("doc_id") < half).coalesce(1)
      .write.parquet(d.resolve("p1").toString)
    docs.filter(col("doc_id") >= half).coalesce(1)
      .write.parquet(d.resolve("p2").toString)
    val stream = DedupStream.signatures(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d.toString + "/*")
        .select(col("doc_id"), col("text")).as[(Long, String)])
    val q = DedupStream.nearDupPairs(DedupStream.bandDocs(stream))
      .writeStream.format("memory").queryName("ndp")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("ndp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batch = graft.operators.Dedup.simhashPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(batch.nonEmpty, "corpus has no near-dup pairs to find")
    assert(streamed === batch,
      s"streamed pairs diverged: missing=${(batch -- streamed).size} " +
        s"extra=${(streamed -- batch).size}")
  }

  test("streaming CDC state machine converges to the batch log apply") {
    // 4 files → 4 micro-batches: latest-by-ts must be associative across
    // any batch split, and live must equal the batch tombstone filter
    val d = Files.createTempDirectory("graft-events-cdc")
    Tables.events(spark, dir)
      .withColumn("ts", unix_micros(col("ts")) * 1000)
      .repartition(4)
      .write.parquet(d.toString + "/files")
    val q = EventStreams.cdcState(
        EventStreams.readEvents(spark, d.toString + "/files", Some(1)))
      .writeStream.format("memory").queryName("cdc")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val stream = spark.table("cdc")
      .withColumn("rn", monotonically_increasing_id())
      .groupBy("user_id")
      .agg(max_by(struct(col("last_ts"), col("value"), col("n_ops"),
        col("n_deletes"), col("live")), col("rn")).as("s"))
      .filter(col("s.live"))
      .select(col("user_id"), col("s.last_ts"), col("s.value"),
        col("s.n_ops"), col("s.n_deletes"))
      .orderBy("user_id").collect()
    val batch = Relational.qCdcApply(spark, dir).collect()
    assert(stream.map(_.toSeq) === batch.map(_.toSeq))
  }

  test("streaming CDC matches batch on DUPLICATE-ts logs (struct-max tiebreak)") {
    import spark.implicits._
    // duplicate (user_id, ts) rows force the tiebreak: the streaming
    // state update must mirror batch cdcApply's max(struct(ts, op,
    // value)) — op compared on ts tie, value (nulls first) on op tie —
    // for ANY arrival/batch split, not rely on generator ts uniqueness
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def ts(s: Int) = new java.sql.Timestamp(base.getTime + s * 1000L)
    val log = Seq(
      // user 1: same-ts upsert vs delete — 'purchase' < 'error'? No:
      // 'error' < 'purchase' lexically, so the purchase wins the tie
      (1L, ts(10), "error", Some(1.0)),
      (1L, ts(10), "purchase", Some(5.0)),
      // user 2: delete wins the tie ('view' < ... no — 'error' loses to
      // 'view'); plant the reverse: newest ts IS the delete
      (2L, ts(10), "view", Some(2.0)),
      (2L, ts(11), "error", None),
      // user 3: same (ts, op), values null vs non-null — non-null wins
      // (None < Some in the struct order)
      (3L, ts(10), "view", None),
      (3L, ts(10), "view", Some(9.0)),
      // user 4: three-way same-ts pileup across different batches
      (4L, ts(10), "click", Some(1.0)),
      (4L, ts(10), "view", Some(1.0)),
      (4L, ts(10), "error", Some(1.0))
    ).toDF("user_id", "ts", "event_type", "value")
      .select(lit(0L).as("event_id"), unix_micros(col("ts")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
    val d = Files.createTempDirectory("graft-cdc-dup")
    // ts written as nanos long, matching readEvents' long branch
    log.withColumn("ts", col("ts") * 1000)
      .repartition(3).write.parquet(d.toString + "/files")
    val q = EventStreams.cdcState(
        EventStreams.readEvents(spark, d.toString + "/files", Some(1)))
      .writeStream.format("memory").queryName("cdc_dup")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val stream = spark.table("cdc_dup")
      .withColumn("rn", monotonically_increasing_id())
      .groupBy("user_id")
      .agg(max_by(struct(col("last_ts"), col("value"), col("n_ops"),
        col("n_deletes"), col("live")), col("rn")).as("s"))
      .filter(col("s.live"))
      .select(col("user_id"), col("s.last_ts"), col("s.value"),
        col("s.n_ops"), col("s.n_deletes"))
      .orderBy("user_id").collect()
    val batchDf = Relational.cdcApply(
      spark.read.parquet(d.toString + "/files")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000"))))
      .orderBy("user_id").collect()
    assert(stream.map(_.toSeq) === batchDf.map(_.toSeq),
      s"duplicate-ts tiebreak diverged:\n stream=${stream.mkString("\n ")}" +
        s"\n batch=${batchDf.mkString("\n ")}")
  }

  test("mapGroupsWithState running totals converge to batch per-user totals") {
    val q = EventStreams.runningUserTotals(EventStreams.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("ut")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // last update per user wins
    val finalRows = spark.table("ut")
      .withColumn("rn", monotonically_increasing_id())
      .groupBy("user_id").agg(max_by(struct(col("n_events"), col("total_value")), col("rn")).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.total_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = Tables.events(spark, dir).groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(finalRows === batch)
  }

  // ---- genuinely UNBOUNDED source (rate) -------------------------------
  // The file-source tests above replay a finite directory; these prove the
  // same watermark+window and custom-state plans execute on a source with
  // no end-of-input — the execution shape of a message-bus ingest (offsets
  // per trigger, stream never "completes", state bounded by watermark).

  test("watermarked window aggregation runs on an unbounded (rate) source") {
    val q = EventStreams.windowedCounts(
        EventStreams.unboundedEvents(spark, rowsPerSecond = 2000),
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("unb_wc")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      // two catch-up passes with wall time between them: the second batch
      // has new rows available only because the source is unbounded
      Thread.sleep(1000)
      q.processAllAvailable()
      Thread.sleep(1500)
      q.processAllAvailable()
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 2,
        s"expected multiple non-empty micro-batches, got ${batches.length}")
      val rows = spark.table("unb_wc").collect()
      assert(rows.nonEmpty)
      // the deterministic value->event_type mapping survives the stream
      val types = rows.map(_.getString(1)).toSet
      assert(types.subsetOf(Set("view", "click", "purchase")))
      // the windowed aggregate is stateful: the plan carries a state store
      assert(q.lastProgress.stateOperators.nonEmpty)
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates across micro-batches of an unbounded source") {
    val q = EventStreams.runningUserTotals(
        EventStreams.unboundedEvents(spark, rowsPerSecond = 2000, nUsers = 7))
      .writeStream.format("memory").queryName("unb_ut")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      Thread.sleep(1000)
      q.processAllAvailable()
      Thread.sleep(1500)
      q.processAllAvailable()
      val upd = spark.table("unb_ut")
        .withColumn("rn", monotonically_increasing_id()).collect()
      assert(upd.nonEmpty)
      // state carried forward: some user's running count strictly grew
      // between its first and last emitted update
      val byUser = upd.groupBy(_.getLong(0)).values
      assert(byUser.exists { rs =>
        val sorted = rs.sortBy(_.getLong(3))
        sorted.last.getLong(1) > sorted.head.getLong(1)
      }, "no user's running n_events grew across micro-batches")
      // rate rows are consecutive longs: per-user counts are a fair
      // round-robin over nUsers=7, so max running counts differ by <= 1
      val finals = byUser.map(_.maxBy(_.getLong(3)).getLong(1)).toSeq
      assert(finals.max - finals.min <= 1,
        s"round-robin user assignment skewed: $finals")
    } finally q.stop()
  }

  test("left-outer attribution: unmatched purchases emit null rows only after watermark passage") {
    // Three controlled micro-batches over MemoryStreams. The unmatched
    // purchase P1 may NOT emit while a matching click could still
    // arrive; Spark finalizes it only once the (next-batch) watermark
    // passes its event time, so its null row must appear in batch 3 —
    // not 1, not 2 — while the matched purchase P2 emits immediately.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    implicit val ctx: org.apache.spark.sql.classic.SQLContext = cs.sqlContext
    import cs.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val out = EventStreams.purchaseAttributionOuter(
      clicks.toDF().toDF("event_id", "user_id", "ts"),
      purchases.toDF().toDF("event_id", "user_id", "ts"),
      watermark = "5 minutes")
    val q = out.writeStream.format("memory").queryName("pao")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint()).start()
    try {
      def rows() = spark.table("pao").collect()
      def nullRows() = rows().filter(_.isNullAt(3)) // click_id null
      // batch 1: P1 (user 1) has no click; C1 belongs to another user
      purchases.addData((100L, 1L, ts("2026-01-01 10:00:00")))
      clicks.addData((200L, 2L, ts("2026-01-01 10:00:00")))
      q.processAllAvailable()
      assert(rows().isEmpty,
        s"nothing is final in batch 1: ${rows().mkString(",")}")
      // batch 2: a MATCHED pair (user 3). The match emits now; P1
      // still waits — the global watermark (min over both streams,
      // 10:04 - 5 min = 9:59) has not passed its 10:00 event time, so
      // "no click arrived" is not yet provable.
      clicks.addData((201L, 3L, ts("2026-01-01 10:02:00")))
      purchases.addData((101L, 3L, ts("2026-01-01 10:04:00")))
      q.processAllAvailable()
      assert(rows().exists(r => r.getLong(0) == 101L && r.getLong(3) == 201L),
        "matched purchase did not emit in its own micro-batch")
      assert(nullRows().isEmpty,
        "unmatched purchase emitted BEFORE the watermark passed its event time")
      // batch 3: BOTH streams advance to 11:00 (the watermark is the
      // min across streams — a lagging side holds everyone back), so
      // the watermark moves to 10:55, past P1's 10:00: its null row is
      // finally provable and must emit. P3 (user 8, no click) becomes
      // the new pending tail and must NOT emit.
      clicks.addData((202L, 9L, ts("2026-01-01 11:00:00")))
      purchases.addData((102L, 8L, ts("2026-01-01 11:00:00")))
      q.processAllAvailable()
      val nr = nullRows()
      assert(nr.length == 1 && nr.head.getLong(0) == 100L,
        s"expected exactly P1's null row after watermark passage: ${nr.mkString(",")}")
      assert(nr.head.isNullAt(4), "click_ts not null on the unmatched row")
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        "expected >= 3 non-empty micro-batches")
    } finally q.stop()
  }

  test("left-outer attribution stream equals its batch twin away from the watermark tail") {
    // File-source replay: matched rows equal the batch left-join
    // restricted to matches; null rows equal the batch unmatched set
    // for purchases the FINAL watermark could finalize (p_ts < max ts
    // - delay). The tail purchases are the only permitted difference —
    // a finite replay cannot prove their clicks will never arrive.
    // default trigger + processAllAvailable (NOT AvailableNow, which
    // terminates before the trailing no-data batch that applies the
    // final watermark and flushes the outer state)
    val src = EventStreams.readEvents(spark, eventsDir)
    val q = EventStreams.purchaseAttributionOuter(
        src.filter(col("event_type") === "click"),
        src.filter(col("event_type") === "purchase"))
      .writeStream.format("memory").queryName("pao_file")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint()).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("pao_file").collect()
    val ev = Tables.events(spark, dir)
    val batch = EventStreams.purchaseAttributionOuter(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase")).collect()
    val gotMatched = got.filter(!_.isNullAt(3)).map(_.toSeq).toSet
    val batchMatched = batch.filter(!_.isNullAt(3)).map(_.toSeq).toSet
    assert(gotMatched === batchMatched, "matched rows diverge from batch")
    // the final watermark is min over BOTH sides' per-source maxima,
    // minus the 10 s delay; only purchases strictly older are provably
    // unmatched in a finite replay
    val maxClick = ev.filter(col("event_type") === "click")
      .agg(max(col("ts"))).head.getTimestamp(0).getTime
    val maxPurch = ev.filter(col("event_type") === "purchase")
      .agg(max(col("ts"))).head.getTimestamp(0).getTime
    val horizon = math.min(maxClick, maxPurch) - 10000L
    val gotNull = got.filter(_.isNullAt(3)).map(_.toSeq).toSet
    val batchNullFinal = batch.filter(r => r.isNullAt(3) &&
      r.getTimestamp(2).getTime < horizon).map(_.toSeq).toSet
    assert(batchNullFinal.nonEmpty, "test corpus has no finalizable unmatched purchases")
    assert(batchNullFinal.subsetOf(gotNull), "a finalizable null row failed to emit")
    // nothing emits that batch doesn't have
    val batchNullAll = batch.filter(_.isNullAt(3)).map(_.toSeq).toSet
    assert(gotNull.subsetOf(batchNullAll), "stream emitted a null row batch disagrees with")
  }

  test("full-outer attribution: both null sides emit on their own watermark horizons") {
    // The two-sided funnel audit. Eviction horizons are ASYMMETRIC: an
    // unmatched purchase is final once the watermark passes p_ts (no
    // future click can satisfy click_ts <= p_ts), but an unmatched
    // CLICK is final only once the watermark passes click_ts + the
    // 10-minute attribution window (a purchase could still arrive
    // anywhere inside it). Four controlled micro-batches prove both
    // horizons: P1's null-click row lands in batch 3 (wm 10:07 >
    // 10:00) while C1 still waits; C1's null-purchase row lands only
    // in batch 4 (wm 10:55 > 10:10).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    implicit val ctx: org.apache.spark.sql.classic.SQLContext = cs.sqlContext
    import cs.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val out = EventStreams.purchaseAttributionFull(
      clicks.toDF().toDF("event_id", "user_id", "ts"),
      purchases.toDF().toDF("event_id", "user_id", "ts"),
      watermark = "5 minutes")
    val q = out.writeStream.format("memory").queryName("paf")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint()).start()
    try {
      def rows() = spark.table("paf").collect()
      def nullClick() = rows().filter(_.isNullAt(3))  // purchase, no click
      def nullPurchase() = rows().filter(_.isNullAt(0)) // click, no purchase
      // batch 1: P1 (user 1) never gets a click; C1 (user 2) never
      // gets a purchase
      purchases.addData((100L, 1L, ts("2026-01-01 10:00:00")))
      clicks.addData((300L, 2L, ts("2026-01-01 10:00:00")))
      q.processAllAvailable()
      assert(rows().isEmpty, s"nothing is final in batch 1: ${rows().mkString(",")}")
      // batch 2: a matched pair (user 3) emits immediately; neither
      // null side is provable yet (wm = 9:57)
      clicks.addData((301L, 3L, ts("2026-01-01 10:02:00")))
      purchases.addData((101L, 3L, ts("2026-01-01 10:04:00")))
      q.processAllAvailable()
      assert(rows().exists(r => !r.isNullAt(0) && !r.isNullAt(3) &&
        r.getLong(0) == 101L && r.getLong(3) == 301L),
        "matched pair did not emit in its own micro-batch")
      assert(nullClick().isEmpty && nullPurchase().isEmpty,
        "a null row emitted before its watermark horizon")
      // batch 3: both streams advance to 10:12 -> wm 10:07. P1 (10:00)
      // is past its horizon and emits; C1 needs wm > 10:10 and waits.
      clicks.addData((302L, 9L, ts("2026-01-01 10:12:00")))
      purchases.addData((102L, 8L, ts("2026-01-01 10:12:00")))
      q.processAllAvailable()
      assert(nullClick().exists(_.getLong(0) == 100L),
        "unmatched purchase did not emit after the watermark passed p_ts")
      assert(nullPurchase().isEmpty,
        "unmatched click emitted BEFORE the watermark passed click_ts + window")
      // batch 4: advance to 11:00 -> wm 10:55 > 10:10: C1's
      // null-purchase row is finally provable
      clicks.addData((303L, 9L, ts("2026-01-01 11:00:00")))
      purchases.addData((103L, 8L, ts("2026-01-01 11:00:00")))
      q.processAllAvailable()
      val np = nullPurchase()
      assert(np.exists(r => r.getLong(3) == 300L),
        s"expected C1's null-purchase row after its horizon: ${np.mkString(",")}")
      val c1 = np.filter(_.getLong(3) == 300L).head
      assert(c1.isNullAt(2), "purchase_ts not null on the unmatched click row")
      assert(c1.getLong(1) == 2L, "user_id must coalesce from the click side")
    } finally q.stop()
  }

  test("full-outer attribution stream equals its batch twin away from the watermark tail") {
    val src = EventStreams.readEvents(spark, eventsDir)
    val q = EventStreams.purchaseAttributionFull(
        src.filter(col("event_type") === "click"),
        src.filter(col("event_type") === "purchase"))
      .writeStream.format("memory").queryName("paf_file")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint()).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("paf_file").collect()
    val ev = Tables.events(spark, dir)
    val batch = EventStreams.purchaseAttributionFull(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase")).collect()
    def matched(rs: Array[org.apache.spark.sql.Row]) =
      rs.filter(r => !r.isNullAt(0) && !r.isNullAt(3)).map(_.toSeq).toSet
    assert(matched(got) === matched(batch), "matched rows diverge from batch")
    val maxClick = ev.filter(col("event_type") === "click")
      .agg(max(col("ts"))).head.getTimestamp(0).getTime
    val maxPurch = ev.filter(col("event_type") === "purchase")
      .agg(max(col("ts"))).head.getTimestamp(0).getTime
    val horizon = math.min(maxClick, maxPurch) - 10000L
    // purchase-side nulls: final when wm passed p_ts
    val gotNullC = got.filter(_.isNullAt(3)).map(_.toSeq).toSet
    val batchNullCFinal = batch.filter(r => r.isNullAt(3) &&
      r.getTimestamp(2).getTime < horizon).map(_.toSeq).toSet
    assert(batchNullCFinal.nonEmpty, "corpus has no finalizable unmatched purchases")
    assert(batchNullCFinal.subsetOf(gotNullC), "a finalizable null-click row failed to emit")
    assert(gotNullC.subsetOf(batch.filter(_.isNullAt(3)).map(_.toSeq).toSet))
    // click-side nulls: final when wm passed click_ts + the 10-min window
    val gotNullP = got.filter(_.isNullAt(0)).map(_.toSeq).toSet
    val batchNullPFinal = batch.filter(r => r.isNullAt(0) &&
      r.getTimestamp(4).getTime + 600000L < horizon).map(_.toSeq).toSet
    assert(batchNullPFinal.nonEmpty, "corpus has no finalizable unconverted clicks")
    assert(batchNullPFinal.subsetOf(gotNullP), "a finalizable null-purchase row failed to emit")
    assert(gotNullP.subsetOf(batch.filter(_.isNullAt(0)).map(_.toSeq).toSet))
  }
}
