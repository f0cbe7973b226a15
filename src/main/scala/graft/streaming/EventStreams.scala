package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming surface over the events stream (SURVEY.md §5).
  *
  * The same declarative transforms as the batch queries, lifted onto
  * `readStream`: tumbling-window counts and session windows with event-time
  * watermarks (partial aggregation + state-store backed, so 100 TB/day of
  * events shards by key across executors), plus a
  * `mapGroupsWithState` operator for custom per-key state the built-in
  * windows can't express. Batch twins of the window aggregations live in
  * [[graft.queries.Relational]] (q_sessionize, st_window_agg) so the DuckDB
  * oracle can check the arithmetic; StreamingSpec checks stream==batch.
  */
object EventStreams {

  /** Raw events schema as the parquet reader sees it with
    * nanosAsLong=true when `ts` is physically TIMESTAMP(NANOS) (it
    * arrives as epoch-nanos LONG). Newer testdata generations write
    * TIMESTAMP(MICROS); see [[readEvents]]. */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet files (the
    * file-stream source requires a directory — new files appearing in it
    * become new micro-batches), ts normalized to a micros TimestampType
    * exactly like the batch loader (Tables.events). A stream needs its
    * schema up front, so the physical `ts` generation (nanos LONG vs
    * micros TIMESTAMP — the testdata has shipped both) is sniffed from
    * the existing files' footers with a batch schema peek: for nanos,
    * declare LONG and truncate (not round) to micros; for micros,
    * declare TimestampType directly (explicit schema overrides NTZ
    * inference, and session-UTC makes the wall-clock values identical). */
  def readEvents(spark: SparkSession, eventsDir: String,
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val tsIsNanosLong =
      spark.read.parquet(eventsDir).schema("ts").dataType == LongType
    val schema =
      if (tsIsNanosLong) rawSchema
      else StructType(rawSchema.map(f =>
        if (f.name == "ts") f.copy(dataType = TimestampType) else f))
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val raw = reader.parquet(eventsDir)
    if (tsIsNanosLong)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }

  /** Genuinely UNBOUNDED events source: Spark's `rate` source (a
    * continuously generating stream with no end-of-input, the same
    * unbounded execution semantics as a message-bus source — micro-batch
    * offsets tracked per trigger, no file listing, never "caught up")
    * mapped onto the events schema. Every stateful plan in this module
    * (watermark+window, session windows, mapGroupsWithState,
    * dropDuplicatesWithinWatermark) accepts this stream unchanged, which
    * is the substance of a Kafka swap: a broker source differs only in
    * the format string and connection options, not in the query plan,
    * watermarking, or state management. The mapping is deterministic in
    * `value` so tests can predict per-key arithmetic; `ts` is the
    * source's own monotone event time, so watermarks advance as they
    * would on a live feed. */
  def unboundedEvents(spark: SparkSession, rowsPerSecond: Int = 500,
                      nUsers: Int = 97): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        pmod(col("value"), lit(nUsers.toLong)).as("user_id"),
        element_at(
          array(lit("view"), lit("click"), lit("purchase")),
          (pmod(col("value"), lit(3L)) + 1).cast("int")).as("event_type"),
        (pmod(col("value"), lit(1000L)) / lit(10.0)).as("value"),
        lit("{}").as("props"))

  // ---- broker (Kafka-shape) ingest ------------------------------------
  // A message-bus deployment differs from the file/rate sources ONLY in
  // (a) the reader's format string + connection options and (b) the
  // key/value-bytes projection. Both are code here — swapping a CDAP-style
  // pipeline onto a real broker is `kafkaEvents(spark, servers, topic)`,
  // one line, no plan changes — and StreamingSpec drives the IDENTICAL
  // projection off the file source (the sandbox has no broker; the
  // projection, options and payload codec are what a broker adds).

  /** The exact columns `format("kafka")` emits (Spark's
    * KafkaSourceProvider contract): key/value as raw bytes plus the
    * broker position/timestamp metadata. */
  val kafkaWireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** JSON payload schema of one event on the wire: `ts` travels as
    * epoch-MICROS long (integer-exact both directions; ISO strings
    * round-trip timezone pain, raw nanos overflow JS consumers). */
  val kafkaValueSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Reader options for a broker deployment. `failOnDataLoss=false` is
    * the production default (a compacted/expired offset should degrade,
    * not kill the query); `maxOffsetsPerTrigger` is the per-micro-batch
    * row budget — the broker twin of maxFilesPerTrigger, and the knob
    * that keeps catch-up batches executor-memory-sized at 100 TB/day. */
  def kafkaOptions(bootstrapServers: String, topic: String,
                   startingOffsets: String = "earliest",
                   maxOffsetsPerTrigger: Option[Long] = None,
                   failOnDataLoss: Boolean = false): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> failOnDataLoss.toString) ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  /** Wire → events-schema projection: value bytes are UTF-8 JSON
    * decoded against [[kafkaValueSchema]] (a declared schema — never
    * inference — so a malformed producer row nulls its fields instead
    * of corrupting the batch schema); event time comes from the PAYLOAD
    * (`ts_us`), falling back to broker append time for producers that
    * don't stamp one. Works identically on a batch DataFrame of the
    * same wire shape (the spec path). */
  def fromKafkaRecords(records: DataFrame): DataFrame =
    records
      .select(from_json(col("value").cast(StringType), kafkaValueSchema).as("e"),
        col("timestamp"))
      .select(
        col("e.event_id").as("event_id"),
        coalesce(timestamp_micros(col("e.ts_us")), col("timestamp")).as("ts"),
        col("e.user_id").as("user_id"),
        col("e.event_type").as("event_type"),
        col("e.value").as("value"),
        col("e.props").as("props"))

  /** Events → wire projection for the producer side (writeStream
    * format("kafka")): key = user_id bytes, so a keyed topic preserves
    * per-entity order — the property [[cdcState]] and every
    * mapGroupsWithState consumer rely on across partitions. */
  def toKafkaRecords(events: DataFrame): DataFrame =
    events.select(
      col("user_id").cast(StringType).cast(BinaryType).as("key"),
      to_json(struct(
        col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("user_id"),
        col("event_type"),
        col("value"),
        col("props"))).cast(BinaryType).as("value"))

  /** The one-call broker ingest — on a deployment with the Kafka
    * connector on the classpath this is the whole swap: every stateful
    * plan in this module accepts the result unchanged. */
  def kafkaEvents(spark: SparkSession, bootstrapServers: String,
                  topic: String,
                  startingOffsets: String = "earliest",
                  maxOffsetsPerTrigger: Option[Long] = None): DataFrame =
    fromKafkaRecords(spark.readStream.format("kafka")
      .options(kafkaOptions(bootstrapServers, topic, startingOffsets,
        maxOffsetsPerTrigger))
      .load())

  /** Ingest-time sampling — streaming twin of Sampling.stSample,
    * filtering on the SHARED deterministic keep predicate
    * (Sampling.eventSampleKeep; one definition, the stFunnel pattern).
    * Stateless: no watermark, no state store, exactly incremental, and
    * the streamed selection is bit-identical to a batch replay of the
    * same events — the shape an ingest pipeline uses to downsample a
    * firehose before anything stateful runs. */
  def sampledEvents(events: DataFrame): DataFrame =
    events.filter(graft.operators.Sampling.eventSampleKeep)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  /** Tumbling 1-hour counts per event type — streaming twin of
    * Relational.stWindowAgg. */
  def windowedCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(24, 6))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Per-user session aggregation — streaming twin of
    * Analytics.stSession: the IDENTICAL session_window(ts, 30 min)
    * aggregate over an unbounded source. Session windows MERGE in the
    * state store as late members arrive; the watermark closes a session
    * once event time passes its end + delay, so state is bounded by
    * OPEN sessions only — the per-user session is the unit of state,
    * never the user's history. */
  def sessionCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(24, 6))).cast(DoubleType)
          .as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n"), col("total_value"))

  /** Windowed stream-quality funnel — streaming twin of
    * Relational.stFunnel: per 1-hour window, first-failing drop
    * attribution through the shared filter cascade. The stage expression
    * is a stateless projection and the count a windowed aggregate, so
    * the stream is exactly incremental (stream == batch asserted in
    * StreamingSpec). */
  def qualityFunnel(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .withColumn("stage", graft.queries.Relational.funnelStage)
      .groupBy(window(col("ts"), "1 hour"), col("stage"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("stage"),
        graft.queries.Relational.funnelFilterName(col("stage")).as("filter"),
        col("n"))

  /** Session windows (10-minute gap) per user — streaming twin of
    * Relational.qSessionize. */
  def sessionWindows(events: DataFrame, watermark: String = "10 seconds"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(24, 6))).cast(DoubleType).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Stream-stream inner join with event-time bounds: purchases attributed
    * to a click by the same user within the preceding 10 minutes. Both
    * sides are watermarked and the join condition bounds event-time skew,
    * so the state store retains only a sliding window of each side —
    * bounded memory at any throughput. */
  def purchaseAttribution(clicks: DataFrame, purchases: DataFrame,
                          watermark: String = "10 seconds"): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    c.join(p,
        col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 10 MINUTES"))
      .drop("p_user")
  }

  /** Stream-stream LEFT OUTER attribution: every purchase emits —
    * joined to each same-user click in the preceding `windowSpec`, or
    * (the rows an attribution user asks about first) ONCE with null
    * click columns when no such click exists. Spark's watermark-driven
    * outer semantics: a matched purchase emits in the micro-batch that
    * pairs it; an UNMATCHED purchase is held in the state store until
    * the watermark passes purchase_ts + delay (only then can "no click
    * arrived" be final) and emits its null row in that later batch —
    * StreamingSpec drives this across micro-batches with a
    * MemoryStream. State stays bounded exactly as in the inner join:
    * both sides are watermarked and the join condition bounds
    * event-time skew, so each side retains a sliding window only. */
  def purchaseAttributionOuter(clicks: DataFrame, purchases: DataFrame,
                               watermark: String = "10 seconds",
                               windowSpec: String = "10 MINUTES"): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("event_id").as("purchase_id"),
        col("user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    p.join(c,
        col("user_id") === col("c_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr(s"INTERVAL $windowSpec"),
        "left_outer")
      .drop("c_user")
  }

  /** Stream-stream FULL OUTER attribution — the two-sided funnel
    * audit: every purchase emits (with its clicks, or once with null
    * click columns), AND every click that never converted emits once
    * with null purchase columns — the other half
    * [[purchaseAttributionOuter]] cannot express. Watermark-driven on
    * BOTH sides: a matched pair emits in the micro-batch that pairs
    * it; an unmatched purchase emits its null-click row once the
    * watermark passes purchase_ts + delay; an unmatched click is held
    * until the watermark passes click_ts + `windowSpec` + delay (only
    * then can "no purchase followed within the window" be final) and
    * emits its null-purchase row in that later batch — StreamingSpec
    * drives both emissions across micro-batches. State stays bounded
    * exactly as in the inner join: the range condition bounds
    * event-time skew, so each side retains a sliding window only. */
  def purchaseAttributionFull(clicks: DataFrame, purchases: DataFrame,
                              watermark: String = "10 seconds",
                              windowSpec: String = "10 MINUTES"): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    p.join(c,
        col("p_user") === col("c_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr(s"INTERVAL $windowSpec"),
        "full_outer")
      .select(col("purchase_id"),
        coalesce(col("p_user"), col("c_user")).as("user_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"))
  }

  /** Exactly-once restoration over an at-least-once event feed:
    * duplicate event_ids arriving within the watermark are dropped
    * (state per key is evicted once the watermark passes, so state is
    * bounded by the redelivery horizon, not the stream's lifetime).
    * Batch twin with a DuckDB oracle: Relational.stDedup. */
  def dedupEvents(events: DataFrame, watermark: String = "10 seconds"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  case class SessionState(n: Long, lastMs: Long)
  case class FinalizedSession(user_id: Long, n_events: Long,
                              last_ts: java.sql.Timestamp)

  /** Idle-session finalization via flatMapGroupsWithState with an
    * EVENT-TIME TIMEOUT — the state-store capability windows can't
    * express: emit nothing while a key is active, then exactly one
    * summary record when the watermark passes `gapMs` beyond the key's
    * last event, removing its state. This is how per-key state stays
    * bounded on an unbounded key space: every idle key is evicted by
    * the timer, not by a full-state sweep. */
  def expiringSessions(events: DataFrame, gapMs: Long = 600000L,
                       watermark: String = "10 seconds"): Dataset[FinalizedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, FinalizedSession](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, batch, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              FinalizedSession(user, s.n, new java.sql.Timestamp(s.lastMs)))
          } else {
            val times = batch.map(_._2.getTime).toSeq
            val prev = state.getOption.getOrElse(SessionState(0L, 0L))
            val updated = SessionState(
              prev.n + times.size, math.max(prev.lastMs, times.max))
            state.update(updated)
            state.setTimeoutTimestamp(updated.lastMs + gapMs)
            Iterator.empty
          }
      }
  }

  case class UserEvent(user_id: Long, value: Double)
  case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Idempotent shard upsert for ONE micro-batch — the foreachBatch body
    * of [[shardExportSink]], public so a replay is directly testable.
    * The streaming twin of q_shuffle_export (same deterministic
    * [[graft.operators.Sampling.shuffleExport]] hash-shard + position)
    * with q_upsert's replace-don't-append discipline: the batch writes
    * to `outDir/batch=<batchId>` in OVERWRITE mode, so re-delivery of a
    * micro-batch (failure replay — foreachBatch's at-least-once
    * contract) REPLACES its own output instead of duplicating shard
    * rows. Determinism end to end: shard and pos are pure hash
    * arithmetic, rows are hash-partitioned by shard and sorted by
    * (shard, pos) before the write, and parquet encodes the same rows
    * in the same order to the same bytes — so a replayed batch is
    * byte-identical (spec-pinned), which is what makes downstream
    * trainers' resume-from-shards safe. At 100 TB: one hash shuffle per
    * batch, per-shard file sizing via nShards — no global state, no
    * read-modify-write of previous batches. */
  def upsertShardBatch(batch: DataFrame, batchId: Long, outDir: String,
                       nShards: Int = 8): Unit = {
    if (batch.isEmpty) return // an empty replay must not wipe a batch dir
    graft.operators.Sampling.shuffleExport(batch, col("event_id"), nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(s"$outDir/batch=$batchId")
  }

  /** Streaming shard export: readStream → foreachBatch →
    * [[upsertShardBatch]]. Output layout outDir/batch=<id>/shard=<s>/
    * is the training-export contract with batch provenance kept — a
    * consumer unions batch dirs (or compacts them in a later batch
    * job) and reads each shard in pos order. */
  def shardExportSink(events: DataFrame, outDir: String,
                      checkpoint: String, nShards: Int = 8,
                      availableNow: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) =>
        upsertShardBatch(b, id, outDir, nShards))
    (if (availableNow)
      w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else w).start()
  }

  case class CdcOp(user_id: Long, ts: java.sql.Timestamp,
                   event_type: String, value: Option[Double])
  case class CdcSt(ts: java.sql.Timestamp, op: String, value: Option[Double],
                   n_ops: Long, n_deletes: Long)
  case class CdcRow(user_id: Long, last_ts: java.sql.Timestamp,
                    value: Option[Double], n_ops: Long, n_deletes: Long,
                    live: Boolean)

  /** Streaming CDC consumer — the stateful twin of
    * [[graft.queries.Relational.cdcApply]]: per entity, keep the
    * LATEST-by-event-time op across micro-batches (constant state per
    * key: one (ts, op, value) triple + two counters), emit the entity's
    * current materialization after every batch with `live=false` while
    * a DELETE is the newest op. The winner is max over the TOTAL order
    * (ts, op, value) — the same struct-max the batch path takes, so
    * duplicate-ts logs converge identically — and a max over a total
    * order is associative, so any micro-batch split converges to
    * exactly the batch log-apply
    * (spec-pinned); `live` rows toggle as tombstones arrive and later
    * upserts resurrect — the Debezium-consumer behavior q_cdc_apply
    * freezes at end-of-log. */
  def cdcState(log: DataFrame): Dataset[CdcRow] = {
    val spark = log.sparkSession
    import spark.implicits._
    log.select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[CdcOp]
      .groupByKey(_.user_id)
      .mapGroupsWithState[CdcSt, CdcRow] {
        (user: Long, batch: Iterator[CdcOp], state: GroupState[CdcSt]) =>
          var st = state.getOption.getOrElse(
            CdcSt(new java.sql.Timestamp(0L), "", None, 0L, 0L))
          batch.foreach { op =>
            // winner rule mirrors batch cdcApply's max(struct(ts, op,
            // value)) EXACTLY, tiebreak included: on equal ts compare
            // op (binary — event types are ASCII, where UTF-8 byte
            // order == String.compareTo), then value with NULL-first
            // struct-field semantics (None < Some). Generator ts are
            // unique, but the streaming/batch equivalence must not
            // depend on that.
            val cmp = {
              val byTs = op.ts.compareTo(st.ts)
              if (byTs != 0) byTs
              else {
                val byOp = op.event_type.compareTo(st.op)
                if (byOp != 0) byOp
                else (op.value, st.value) match {
                  case (None, None) => 0
                  case (None, _) => -1
                  case (_, None) => 1
                  case (Some(a), Some(b)) => java.lang.Double.compare(a, b)
                }
              }
            }
            val newer = st.n_ops == 0L || cmp > 0
            st = CdcSt(
              if (newer) op.ts else st.ts,
              if (newer) op.event_type else st.op,
              if (newer) op.value else st.value,
              st.n_ops + 1L,
              st.n_deletes + (if (op.event_type == "error") 1L else 0L))
          }
          state.update(st)
          CdcRow(user, st.ts, st.value, st.n_ops, st.n_deletes,
            st.op != "error")
      }
  }

  /** Exact running moments per event type for the streaming anomaly
    * twin — Σv and Σv² as decimal STRINGS because the state must hold
    * arbitrary-magnitude integers (the default BigDecimal encoder's
    * (38,18) scale would cap Σv² at 20 integer digits). */
  case class AnomalyState(n: Long, s: String, s2: String, anomalies: Long)
  case class AnomalyCount(event_type: String, n_events: Long,
                          n_anomalies: Long)

  /** Streaming twin of Relational.stAnomaly: per-event-type z-score
    * anomaly counting via flatMapGroupsWithState. State per key is the
    * exact integer moment triple (n, Σv, Σv²) plus the running anomaly
    * count — CONSTANT size regardless of event volume — and each event
    * is judged by the SAME scalar law (Relational.anomalousLaw) the
    * batch two-phase split evaluates columnar-side, so stream and batch
    * cannot drift. Rows are applied in (ts, event_id) order within each
    * micro-batch; cross-batch event-time order is the replay's contract
    * (StreamingSpec splits the feed into time-ordered files). */
  def anomalyState(events: DataFrame, warmup: Int = 30,
                   k: Int = 3): Dataset[AnomalyCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tm"),
        floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("v"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AnomalyState, AnomalyCount](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, Long, Long, Long)],
         state: GroupState[AnomalyState]) =>
          val st0 = state.getOption.getOrElse(AnomalyState(0L, "0", "0", 0L))
          var n = st0.n
          var s = BigInt(st0.s)
          var s2 = BigInt(st0.s2)
          var an = st0.anomalies
          it.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, _, _, v) =>
            if (graft.queries.Relational.anomalousLaw(n, s, s2, v, warmup, k))
              an += 1
            n += 1
            s += v
            s2 += BigInt(v) * v
          }
          state.update(AnomalyState(n, s.toString, s2.toString, an))
          Iterator(AnomalyCount(key, n, an))
      }
  }

  /** Custom keyed state via mapGroupsWithState: running per-user event
    * count and value total — the shape (arbitrary state + arbitrary update
    * logic) that windowed aggregation can't express. State lives in the
    * state store, sharded by key: constant memory per key, any number of
    * keys across a cluster. */
  def runningUserTotals(events: DataFrame): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotals, UserTotals] {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(user, 0L, 0.0))
          val updated = batch.foldLeft(prev) { (acc, e) =>
            UserTotals(user, acc.n_events + 1, acc.total_value + e.value)
          }
          state.update(updated)
          updated
      }
  }
}
