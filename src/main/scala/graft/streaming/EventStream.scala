package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface for the events stream — the capability
  * upgrade over the reference's chunked iteration (SURVEY §2.8: the
  * reference has no watermark/event-time model; `to_deltalake_streaming`
  * is its only batch-commit primitive, `s3/_write_deltalake.py:139-226`).
  *
  * The same aggregation plans as `graft.ops.TimeSeries` run here under a
  * watermark: tumbling/sliding `window()` and `session_window()` with
  * late-data drop, micro-batch sinks via foreachBatch. At scale this is
  * the standard shuffle-per-microbatch stateful topology; state lives in
  * the HDFS/RocksDB state store keyed by (window, key).
  */
object EventStream {

  /** The events schema with `ts` as stored when the files carry parquet
    * TIMESTAMP(NANOS) (ns surfaces as long — see `graft.Tables.events`;
    * [[readEvents]] swaps in the actual physical type it finds). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos as long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Release the persisted blocks of a localCheckpoint'ed Dataset
    * (r17, advice fix): the checkpoint RDD is persisted DIRECTLY (not
    * through the CacheManager), so `Dataset.unpersist()` on it is a
    * no-op and each micro-batch's checkpoint blocks would linger until
    * ContextCleaner GC in a long-running stream. Unpersist the
    * underlying RDD instead; non-checkpointed plans fall through to the
    * regular unpersist. */
  private def releaseLocalCheckpoint(
      df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => df.unpersist()
    }

  /** File-source stream over event parquet files, ts normalized to µs
    * TimestampType. `dir` may be a testdata sf directory (only
    * `events.parquet` is read — globbing the whole directory would apply
    * this schema to the other tables) or a dedicated stream directory.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // glob form: the file stream source requires a directory or glob,
    // not a bare file path
    val path =
      if (new java.io.File(s"$dir/events.parquet").exists) s"$dir/events*.parquet"
      else dir
    // a file stream must declare its schema up front, so resolve the
    // physical ts encoding from the files already present (batch schema
    // inference over the same glob) — the testdata has shipped both
    // INT64-nanos and native TIMESTAMP encodings (see Tables.events).
    // An as-yet-empty stream directory defaults to the nanos-long form.
    val tsType = scala.util.Try(
      spark.read.parquet(path).schema.apply("ts").dataType
    ).getOrElse(LongType)
    val schema = StructType(rawSchema.fields.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    graft.Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(path), "ts")
  }

  /** Tumbling-window aggregate with a watermark: counts + exact sums per
    * (hour, event_type); late events beyond 30 minutes are dropped. */
  def tumblingAgg(events: DataFrame,
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(10,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows (30-minute gap) per user — the stateful operator the
    * batch `TimeSeries.sessionize` mirrors via gaps-and-islands. */
  def sessionAgg(events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Drain a streaming aggregate into an in-memory table and block until
    * every available file is processed — the synchronous smoke-test
    * harness (production uses foreachBatch into a dataset sink). */
  def runToMemory(agg: DataFrame, name: String,
      outputMode: String = "append"): Unit = {
    val q = agg.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Custom stateful sessionization via `flatMapGroupsWithState` — the
    * arbitrary-state API (`KeyValueGroupedDataset`, SURVEY §2.8 streaming
    * note) for session semantics `session_window` can't express (here:
    * emit a session record the moment it exceeds `maxEvents`, plus on
    * timeout). State per user is (count, start, last); event-time timeout
    * closes idle sessions against the watermark.
    */
  final case class SessEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessState(n: Long, lastMs: Long)
  final case class SessOut(user_id: Long, n_events: Long)
  final case class SpendEvent(user_id: Long, value: Double)
  final case class SpendTotal(user_id: Long, total: Double, n: Long)

  /** Stream-STREAM interval join — the attribution shape (click →
    * purchase within an hour, per user) running fully incrementally:
    * both sides watermarked, the join condition carrying the event-time
    * interval so Spark bounds BOTH join states and evicts them as the
    * watermark advances. This is the streaming twin of
    * [[graft.ops.AsOf.clickToPurchase]]'s batch as-of join; at 100 TB/
    * day the state held at any instant is one watermark-window of keys
    * per side, never the history. Inner join + append mode: each match
    * emits exactly once. */
  def intervalJoin(clicks: DataFrame, purchases: DataFrame,
      maxGap: String = "1 hour"): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("ts").as("click_ts"),
        col("value").as("click_value"))
      .withWatermark("click_ts", "30 minutes")
    val p = purchases
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "30 minutes")
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"interval $maxGap"))
      .select(col("user_id"), col("click_ts"), col("purchase_ts"),
        col("click_value"), col("purchase_value"))
  }

  def statefulSessions(events: org.apache.spark.sql.DataFrame,
      maxEvents: Int = 50): org.apache.spark.sql.Dataset[SessOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    // the watermarked timestamp column must survive into the grouped
    // dataset (event-time metadata rides on the TimestampType column)
    events.withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessOut(user, s.n))
          } else {
            var s = state.getOption.getOrElse(SessState(0L, 0L))
            val emitted = scala.collection.mutable.ArrayBuffer.empty[SessOut]
            rows.foreach { e =>
              s = SessState(s.n + 1, math.max(s.lastMs, e.ts.getTime))
              if (s.n >= maxEvents) {
                emitted += SessOut(user, s.n)
                s = SessState(0L, s.lastMs)
              }
            }
            if (s.n > 0) {
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + 30 * 60 * 1000)
            } else state.remove()
            emitted.iterator
          }
      }
  }

  /** STREAMING exact dedup bounded by the watermark
    * (`dropDuplicatesWithinWatermark`, SPARK-42931): the streaming
    * twin of the batch `dedup_exact` path — an ingestion stream whose
    * source can re-deliver (at-least-once Kafka, retried batches)
    * emits each key once per watermark window, and the dedup STATE is
    * evicted as the watermark passes, so state size follows the
    * out-of-orderness bound, never the stream's history. The shape a
    * 100 TB/day training-data ingest needs: without the watermark
    * bound, `dropDuplicates` on a stream retains every key forever. */
  def dedupWithinWatermark(events: DataFrame,
      keys: Seq[String] = Seq("event_id"),
      delay: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Per-user RUNNING TOTALS via `transformWithState` — Spark 4's
    * arbitrary-stateful-processing API (the successor of
    * `flatMapGroupsWithState`, SPARK-46815): a [[TotalsProcessor]]
    * holds one typed [[org.apache.spark.sql.streaming.ValueState]]
    * cell per user and emits the updated lifetime total + event count
    * each micro-batch a user appears in. State is keyed and
    * incremental — at 100 TB/day the store holds one small record per
    * ACTIVE user, maintained by the RocksDB state store provider the
    * API requires (set `spark.sql.streaming.stateStore.providerClass`
    * to `RocksDBStateStoreProvider` on the session). */
  def runningTotals(events: DataFrame)
      : org.apache.spark.sql.Dataset[SpendTotal] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value"))
      .as[SpendEvent]
      .groupByKey(_.user_id)
      .transformWithState(new TotalsProcessor(),
        TimeMode.None(), OutputMode.Append())
  }

  /** The stateful processor behind [[runningTotals]]: one ValueState
    * per key, no timers (`TimeMode.None`). */
  final class TotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, SpendEvent, SpendTotal] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[SpendTotal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SpendTotal]("totals",
        org.apache.spark.sql.Encoders.product[SpendTotal], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SpendEvent],
        timerValues: TimerValues): Iterator[SpendTotal] = {
      val prev = Option(state.get())
        .getOrElse(SpendTotal(key, 0.0, 0L))
      var total = prev.total
      var n = prev.n
      rows.foreach { e => total += e.value; n += 1 }
      val out = SpendTotal(key, total, n)
      state.update(out)
      Iterator.single(out)
    }
  }

  /** foreachBatch sink appending micro-batches to a parquet dataset —
    * the `to_deltalake_streaming` analogue (each batch is one atomic
    * directory commit via the file committer). */
  def runToDataset(agg: DataFrame, path: String,
      checkpoint: String): StreamingQuery =
    agg.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.io.DatasetWriter.toParquet(batch, path,
          mode = graft.io.DatasetWriter.Append)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** foreachBatch sink appending micro-batches to a REAL Delta table
    * with SetTransaction idempotency — the delta streaming-sink
    * contract: every batch commits carrying `txn = (appId, batchId)`,
    * so a batch REPLAYED after a checkpoint rollback/loss SKIPS at the
    * table instead of duplicating. Spark's replay guarantee is
    * at-least-once; the watermark turns it into exactly-once at the
    * table (PROTOCOL.md "Transaction Identifiers" — what
    * [[graft.io.DeltaLogWriter.write]]'s txn parameter implements). */
  def runToDeltaExactlyOnce(agg: DataFrame, path: String,
      checkpoint: String, appId: String): StreamingQuery =
    agg.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val c = graft.io.DeltaLogWriter.write(batch, path,
          txn = Some((appId, id)))
        // An idempotently SKIPPED replay returns without executing the
        // batch — but stateful upstream operators (the watermark dedup)
        // must still commit their state stores for this batch id, or
        // Spark 4.1's per-batch commit validation fails the restarted
        // query (STATE_STORE_COMMIT_VALIDATION_FAILED — caught by
        // StreamIngestFailureSpec's kill-between-commits scenario).
        // numFiles == 0 means skipped or empty; forcing an empty batch
        // is free, so force rather than distinguish.
        if (c.numFiles == 0) batch.queryExecution.toRdd.count()
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** STREAMING curation ingestion — the round's curation gates are
    * stateless codegen'd maps, so they compose directly into
    * Structured Streaming: Gopher word-level quality gate (a map-side
    * filter, ZERO state) → doc_id [[dedupWithinWatermark]] (state
    * bounded by the delay window) → [[runToDeltaExactlyOnce]] (one
    * SetTransaction action per micro-batch; replays are idempotent at
    * the table). Input: a streaming (doc_id, lang, text, ts) frame.
    * The 100 TB/day shape: per-record cost is the gate's token
    * lambdas, dedup state holds only in-watermark doc ids, and no
    * stage ever holds the corpus. */
  def curationIngest(docs: DataFrame, path: String, checkpoint: String,
      appId: String, delay: String = "30 minutes",
      stopWords: Seq[String] = graft.ops.Curation.GopherStopWords)
      : StreamingQuery = {
    val gated = graft.ops.Curation.gopherGate(docs, stopWords = stopWords)
    runToDeltaExactlyOnce(
      dedupWithinWatermark(gated, Seq("doc_id"), delay),
      path, checkpoint, appId)
  }

  /** STREAMING incremental fuzzy dedup — the round-13 daily loop at
    * micro-batch cadence. Per micro-batch:
    * [[graft.ops.Dedup.dedupBatch]] (within-batch exact) →
    * [[graft.ops.Dedup.probeFrames]] against base index ∪ stream
    * layer (batch BROADCAST on both joins, the index never shuffles) →
    * admit `novel` → [[graft.ops.Dedup.writeStreamIndexBatch]]
    * (replay-idempotent per-batch overwrite) → Delta append with
    * SetTransaction (exactly-once at the table).
    *
    * Crash-safety is the pair of invariants, not luck:
    *  1. the probe EXCLUDES stream-layer partitions `batch_id >=
    *     current` (a crashed attempt may have written its own layer);
    *     with that cut, admitted docs are a deterministic function of
    *     replayed input, so
    *  2. the index write is an idempotent overwrite of THIS batch's
    *     partition, and the table commit is SetTransaction-skipped —
    *     any crash point between the two re-converges on restart.
    * Probed-but-rejected docs never land anywhere; admitted docs land
    * exactly once in both the table and the index.
    *
    * Ingest contract (same as the batch daily loop,
    * [[graft.ops.Dedup.updateDedupIndex]]): doc_ids increase across
    * batches relative to the indexed corpus — that is what makes the
    * accumulated index row-identical to a fresh rebuild over
    * corpus ∪ admitted (min-doc_id group representatives never move),
    * which StreamDedupIndexSpec asserts.
    *
    * `foldEvery` > 0 schedules [[graft.ops.Dedup.foldStreamIndex]]
    * INSIDE the loop's lifecycle: at the start of every Nth batch the
    * accumulated stream layers `batch_id < current` fold into the base
    * index — the maintenance that otherwise depended on caller
    * discipline between runs. The batch boundary is the one point
    * where the fold's inputs are quiescent by construction, and the
    * fold is re-run idempotent, so a crash DURING it just replays the
    * batch and re-folds (kill-during-fold spec'd in
    * StreamDedupIndexSpec). Probe semantics are unchanged: the folded
    * rows move from the stream-layer union into the base index, which
    * the probe reads either way.
    *
    * `vacuumKeep` is the fold's retention: the loop itself pins
    * nothing across batches (sequential micro-batches), so the default
    * 2 keeps one version of headroom for an external ad-hoc probe
    * pinned at the pre-fold snapshot. Deployments whose external
    * probes can span MORE than one fold boundary (long analytical
    * reads against the live index — see the Dedup scaladoc's retention
    * note) must raise it to cover the longest probe's fold-boundary
    * span. */
  def ingestDedupIncremental(docs: DataFrame, path: String,
      checkpoint: String, appId: String, indexPath: String,
      streamIndexPath: String, minEst: Double = 0.5,
      foldEvery: Int = 0, vacuumKeep: Int = 2,
      batchGate: DataFrame => DataFrame = identity,
      checkpointGated: Boolean = false,
      onFold: (SparkSession, Long) => Unit = (_, _) => ()): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        import graft.ops.Dedup
        if (foldEvery > 0 && id > 0 && id % foldEvery == 0) {
          Dedup.foldStreamIndex(spark, indexPath, streamIndexPath,
            uptoBatch = id)
          // reclaim the versions each fold supersedes, or a long-running
          // stream accumulates old index files forever (retention is
          // the caller's vacuumKeep — see scaladoc). Crash anywhere
          // here is safe: fold is re-run idempotent and vacuum
          // completes on its next scheduled pass.
          Dedup.vacuumDedupIndex(spark, indexPath,
            keepVersions = vacuumKeep)
          // fold-cadence maintenance hook (r16): re-pin stateful gate
          // inputs (e.g. the CCNet model, curationIngestV3) at the one
          // point where batches are quiescent by construction. Must be
          // deterministic given (id, external state) — a crash during
          // the hook replays the batch and re-runs it.
          onFold(spark, id)
        }
        // batchGate runs on the BATCH frame (micro-batch scope), so it
        // may aggregate — the hook for per-document gates that need a
        // groupBy (the repetition rules), impossible on the streaming
        // frame itself. Determinism contract: gate output must be a
        // pure function of the batch (replays re-gate identically).
        // checkpointGated (r16): `deduped` feeds BOTH the probe and
        // the admit join. When the gate is expensive (the V3
        // pipeline's gate carries the whole pinned-CCNet scoring
        // chain), localCheckpoint pins one evaluation per batch
        // instead of one per reference — measured stream_curate_v3
        // p50 5.4 -> 4.2 s/batch. For CHEAP gates it is a net LOSS
        // (measured stream_dedup_ingest +1 s/batch: the extra
        // materialization job + the checkpointed frame's pessimistic
        // size statistics flipping the probe's broadcast decision), so
        // the default stays streamed and only curationIngestV3 opts
        // in.
        val deduped0 = Dedup.dedupBatch(
          batchGate(batch).select("doc_id", "text"))
        val deduped =
          if (checkpointGated) deduped0.localCheckpoint() else deduped0
        val (sh, sb) = Dedup.streamIndexFrames(spark, streamIndexPath, id)
        val (bh, bb) = Dedup.readDedupIndex(spark, indexPath)
        val hashes = bh.unionByName(sh)
        val bands = bb.unionByName(sb)
        val verdicts = Dedup.probeFrames(spark, deduped, hashes, bands,
          minEst)
        // both sinks consume `admitted`; pin one evaluation
        val admitted = deduped.join(
          verdicts.where(col("verdict") === "novel").select("doc_id"),
          "doc_id").localCheckpoint()
        try {
          Dedup.writeStreamIndexBatch(admitted, streamIndexPath, id)
          val c = graft.io.DeltaLogWriter.write(admitted, path,
            txn = Some((appId, id)))
          // replayed-and-skipped batches still force upstream state
          // commits (see runToDeltaExactlyOnce)
          if (c.numFiles == 0) batch.queryExecution.toRdd.count()
        } finally {
          releaseLocalCheckpoint(admitted)
          if (checkpointGated) releaseLocalCheckpoint(deduped)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** The COMPOSED streaming curation pipeline — what a production
    * ingest actually runs: Gopher word-level quality gate (stateless
    * codegen'd map, junk never reaches the probe) →
    * [[ingestDedupIncremental]] (within-batch exact dedup → index
    * probe → admit novel, exactly-once at the table, replay-idempotent
    * at the index). Composition is free: the gate is a filter on the
    * same micro-batch frame, so it adds zero state and zero shuffles
    * to the dedup loop's plan. */
  def curationIngestDeduped(docs: DataFrame, path: String,
      checkpoint: String, appId: String, indexPath: String,
      streamIndexPath: String, minEst: Double = 0.5,
      minWords: Int = 50, maxWords: Int = 100000,
      stopWords: Seq[String] = graft.ops.Curation.GopherStopWords,
      foldEvery: Int = 0, vacuumKeep: Int = 2): StreamingQuery =
    ingestDedupIncremental(
      graft.ops.Curation.gopherGate(docs, minWords, maxWords, stopWords),
      path, checkpoint, appId, indexPath, streamIndexPath, minEst,
      foldEvery, vacuumKeep)

  /** The FULL composed streaming curation pipeline (round 15): EVERY
    * stateless rule — Gopher word rules, C4 line/page rules, the
    * Gopher repetition thresholds
    * ([[graft.ops.Curation.fullStatelessGate]]) — ahead of the
    * incremental dedup loop. The per-row rules would fuse into the
    * streaming frame directly; the repetition rules are a per-DOCUMENT
    * aggregation, so the whole gate runs as the loop's `batchGate`
    * (micro-batch scope — batch frames may aggregate, and per-doc
    * grouping keys mean zero cross-batch state). Batch and stream
    * apply the SAME function, so gating is result-identical by
    * construction (StreamCurationFullSpec pins it, across a fold
    * boundary). */
  def curationIngestFull(docs: DataFrame, path: String,
      checkpoint: String, appId: String, indexPath: String,
      streamIndexPath: String, minEst: Double = 0.5,
      minWords: Int = 50, maxWords: Int = 100000,
      stopWords: Seq[String] = graft.ops.Curation.GopherStopWords,
      foldEvery: Int = 0, vacuumKeep: Int = 2): StreamingQuery =
    ingestDedupIncremental(docs, path, checkpoint, appId, indexPath,
      streamIndexPath, minEst, foldEvery, vacuumKeep,
      batchGate = b => graft.ops.Curation.fullStatelessGate(
        b, minWords, maxWords, stopWords))

  /** The V3 streaming curation pipeline (round 16) — the batch
    * [[graft.ops.Curation.curatePipelineV3]] recipe's streaming form,
    * with its one STATEFUL stage made stream-safe by pinning: full
    * stateless gate (Gopher word + C4 + repetition rules) → CCNet
    * perplexity selection under a PINNED model
    * ([[graft.ops.Curation.scorePplPinned]] — LM counts and tercile
    * cutoffs frozen at [[graft.ops.Curation.trainPplModel]] time, so
    * selection is a pure per-document function and batch==stream by
    * construction) → incremental fuzzy dedup (probe → admit novel →
    * layer append), exactly-once at the Delta table.
    *
    * CCNet itself runs a FIXED KenLM with fixed cutoffs — the pin IS
    * the production semantics, not an approximation. The model may be
    * RE-PINNED at fold cadence (`repin` — retrain from the grown
    * historic corpus; published as one atomic SnapshotTree swap, so a
    * concurrent batch scores one generation): batches before the fold
    * boundary select under the old model, batches after under the
    * new, which is what the batch-equivalence spec pins
    * (StreamCurationV3Spec). Replay caveat (shared with the dedup
    * index): admitted docs are a function of (batch, model version,
    * index state) — a crashed batch replaying AFTER an unrelated
    * re-pin may re-select differently; keep the repin cadence tied to
    * foldEvery (quiescent boundaries) as here, where the replay
    * re-runs the fold and re-pin first and converges.
    *
    * Per-batch cost at scale: the gate is batch-local; scoring reads
    * only the batch's token buckets of the model ([[scorePplPinned]]'s
    * pruned scan) with the BATCH side broadcast; the probe reads the
    * index term buckets — nothing scans the historic corpus, so
    * per-batch p50 stays flat as the historic index and model grow
    * (tools/stream_v3_flat.scala). */
  def curationIngestV3(docs: DataFrame, path: String,
      checkpoint: String, appId: String, indexPath: String,
      streamIndexPath: String, pplModelPath: String,
      minEst: Double = 0.5, minWords: Int = 50, maxWords: Int = 100000,
      stopWords: Seq[String] = graft.ops.Curation.GopherStopWords,
      foldEvery: Int = 0, vacuumKeep: Int = 2,
      repin: (SparkSession, Long) => Unit = (_, _) => (),
      gate: Option[DataFrame => DataFrame] = None): StreamingQuery =
    ingestDedupIncremental(docs, path, checkpoint, appId, indexPath,
      streamIndexPath, minEst, foldEvery, vacuumKeep,
      batchGate = { b =>
        // default gate = the full stateless rule set. `gate` overrides
        // it for corpora whose SHAPE rules out a rule class — the
        // synthetic benchmark corpus is single-line unpunctuated text,
        // so the C4 page rule (>= 3 terminal-punctuated lines) keeps
        // nothing there and the bench mirrors the batch V3 recipe's
        // gopherGate-only gate instead
        val gated = gate.getOrElse((d: DataFrame) =>
          graft.ops.Curation.fullStatelessGate(
            d, minWords, maxWords, stopWords))(b)
        val keep = graft.ops.Curation.scorePplPinned(
            gated.select(col("doc_id"), col("lang"), col("text")),
            pplModelPath)
          .filter(col("ppl_bucket") =!= "tail")
          .select(col("doc_id"))
        gated.join(keep, Seq("doc_id"))
      },
      // the V3 gate carries the full scoring chain — evaluate it once
      // per batch (see ingestDedupIncremental's checkpointGated note)
      checkpointGated = true,
      onFold = repin)

  /** `to_deltalake_streaming`'s SINGLE-transaction semantics
    * (`s3/_write_deltalake.py:139-226`: every micro-batch of the run
    * commits as ONE table version): batches stage into per-batch data
    * dirs of a [[graft.table.TxnLog]] table, invisible until the stream
    * finishes, then one manifest publishes them all atomically. A crash
    * mid-stream leaves the table at its prior version with only inert
    * staged dirs behind. Runs the stream to completion and returns the
    * committed snapshot. */
  def runToTxnTableSingleCommit(agg: DataFrame, path: String,
      checkpoint: String): graft.table.TxnLog.Snapshot = {
    val spark = agg.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val staged = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = agg.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val dir = s"files/stream-${java.util.UUID.randomUUID()}"
        batch.write.mode("overwrite")
          .parquet(new org.apache.hadoop.fs.Path(root, dir).toString)
        staged.add(dir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val dirs = scala.jdk.CollectionConverters
      .CollectionHasAsScala(staged).asScala.toSeq
    graft.table.TxnLog.commitStagedDirs(spark, path, dirs,
      op = "streaming-append")
  }
}
