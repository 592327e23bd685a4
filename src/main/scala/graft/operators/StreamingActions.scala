package graft.operators

import graft.core._
import graft.sources._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative continuous-ingestion dedup: a Structured Streaming query
  * reads the input DataObject, and every micro-batch runs a store-backed
  * incremental dedup transformer ([[IncrementalDedupTransformer]] /
  * [[IncrementalMediaDedupTransformer]]) against the fingerprint STORE
  * DataObject — only store-novel rows reach the output, and the store
  * grows by exactly the batch's novel signatures (per-batch work scales
  * with the increment: the batch is decoded once, the corpus' payloads are
  * never an input, and per-batch store I/O is O(novel), never O(store)).
  *
  * The reference ships the batch-incremental half of this contract
  * (DeduplicateAction merge mode, `sdl-core/.../DeduplicateAction.scala:50`
  * "work scales with the increment") and a streaming harness
  * (`SparkStreamingMode.scala:40-57`); this action is their composition —
  * a surface the reference leaves to hand-wiring.
  *
  * EXACTLY-ONCE on top of the checkpoint's at-least-once: foreachBatch can
  * re-run a micro-batch whose writes completed but whose checkpoint commit
  * didn't. Both sinks are therefore keyed by `batchIdColumn` and written
  * with DYNAMIC PARTITION OVERWRITE — a replayed batch overwrites its own
  * partition instead of duplicating rows. Output and store DataObjects
  * MUST be partitioned by `batchIdColumn` (validated in prepare/init).
  * This is the same defect class the VersionedTable MERGE path guards with
  * txn markers; partition-overwrite is the Hadoop-FS-native equivalent.
  *
  * Wiring: the transformer's `batchInput` names the streaming INPUT
  * DataObject, `storeInput` the store DataObject, `novelOutput` the output
  * DataObject. `mode` supplies checkpoint/trigger/input options (same
  * HOCON surface as [[graft.operators.modes.SparkStreamingMode]] wiring).
  *
  * Cache discipline: the transformer persists its per-batch signature
  * frame into `ctx.persistedFrames`; [[processBatch]] sweeps those entries
  * after the batch's writes land, so a long-running stream holds at most
  * one batch's cache registrations at a time. */
case class StreamingIncrementalDedupAction(
    id: String,
    transformer: IncrementalStoreDfsTransformer,
    mode: graft.operators.modes.SparkStreamingMode,
    batchIdColumn: String = "ingest_batch",
    override val executionCondition: Option[Condition] = None,
    override val metricsFailCondition: Option[String] = None)
  extends Action with StreamingMetricsSupport {

  private def inputId: String = transformer.batchInput
  private def storeId: String = transformer.storeInput
  private def outputId: String = transformer.novelKey
  require(outputId != inputId,
    s"Action $id: the transformer needs novelOutput set to the output DataObject id " +
      "(distinct from the streaming input)")
  require(!batchIdColumn.startsWith("_") && !batchIdColumn.startsWith("."),
    s"Action $id: batchIdColumn '$batchIdColumn' would create hidden partition " +
      "directories that Spark's file listing silently skips")
  def inputIds: Seq[String] = Seq(inputId)
  def outputIds: Seq[String] = Seq(outputId, storeId)

  /** Per-micro-batch observability (the reference records streaming
    * progress per batch through SparkStreamingQueryListener into run
    * state, `sdl-core/.../metrics/SparkStreamingQueryListener.scala`,
    * `DataFrameActionImpl.scala:427-433`): recorded AFTER the batch's
    * writes land, KEYED BY batchId — a replayed micro-batch overwrites
    * its own entry, so the metrics are idempotent exactly like the
    * sinks. Counts come from the writes' own Observation instrumentation
    * (novel/store-delta rows are free) plus one delta-bounded
    * `batch.count()`; dupRows = input − novel (intra-batch + store dups
    * combined — every dropped row is a duplicate by construction). */
  case class MicroBatchMetrics(inputRows: Long, dupRows: Long, novelRows: Long,
                               storeDeltaRows: Long, durationMillis: Long)
  /** batchId → metrics of its LAST (re-)execution; thread-safe because
    * foreachBatch runs on the streaming thread while callers read from
    * the exec thread. BOUNDED: only the most recent
    * [[metricsRetention]] batches are kept — a continuous
    * (ProcessingTime) stream would otherwise grow one entry per
    * micro-batch for the process lifetime. */
  @transient lazy val streamMetrics =
    new scala.collection.concurrent.TrieMap[Long, MicroBatchMetrics]
  /** per-batch metric entries retained (oldest evicted past this) */
  def metricsRetention: Int = 1024
  /** Run-level totals across EVERY batch — complete where the bounded
    * detail map is not: past `metricsRetention` batches only the DETAIL
    * entries are evicted, the totals keep counting (a >1024-batch
    * AvailableNow run previously undercounted its final SubFeed metrics
    * with no indication). Replay-idempotent while the replayed batch's
    * entry is retained: the replaced entry's contribution is subtracted
    * before the new one is added (replays only ever target batches at the
    * checkpoint frontier — an EVICTED batchId is ≥ metricsRetention
    * commits behind it and cannot be re-delivered). -1 sentinel fields
    * (Observation unavailable) never enter a sum. */
  case class RunTotals(batches: Long = 0L, inputRows: Long = 0L, dupRows: Long = 0L,
                       novelRows: Long = 0L, storeDeltaRows: Long = 0L)
  @transient private var totals = RunTotals()
  @transient private lazy val totalsLock = new Object
  def runTotals: RunTotals = totalsLock.synchronized(totals)
  /** record one (re-)executed batch: detail entry keyed by batchId
    * (bounded), totals adjusted for replacement, oldest detail evicted */
  private def record(batchId: Long, m: MicroBatchMetrics): Unit = totalsLock.synchronized {
    val prev = streamMetrics.put(batchId, m)
    def pos(v: Long): Long = if (v >= 0) v else 0L
    val p = prev.getOrElse(MicroBatchMetrics(-1, -1, -1, -1, 0))
    totals = RunTotals(
      batches = totals.batches + (if (prev.isEmpty) 1 else 0),
      inputRows = totals.inputRows - pos(p.inputRows) + pos(m.inputRows),
      dupRows = totals.dupRows - pos(p.dupRows) + pos(m.dupRows),
      novelRows = totals.novelRows - pos(p.novelRows) + pos(m.novelRows),
      storeDeltaRows = totals.storeDeltaRows - pos(p.storeDeltaRows) + pos(m.storeDeltaRows))
    if (streamMetrics.size > metricsRetention)
      streamMetrics.keys.toSeq.sorted.dropRight(metricsRetention)
        .foreach(streamMetrics.remove)
  }

  /** The snapshot plumbing lives in [[StreamingMetricsSupport]] (shared
    * with every SparkStreamingMode action since r19); this action feeds it
    * the foreachBatch-derived totals and per-batch detail, serialized on
    * [[totalsLock]] — the listener thread (every progress event), the exec
    * thread (first-batch snapshot + run-end), and the sync path all call
    * concurrently. */
  override protected def streamPersistLock: Object = totalsLock
  override protected def streamTotalsSnapshot: Map[String, Long] = {
    val t = runTotals
    Map("microBatches" -> t.batches, "inputRows" -> t.inputRows,
      "dupRows" -> t.dupRows, "novelRows" -> t.novelRows,
      "storeDeltaRows" -> t.storeDeltaRows)
  }
  override protected def streamBatchesSnapshot: Seq[(Long, Map[String, Long])] =
    streamMetrics.readOnlySnapshot().toSeq.map { case (b, m) =>
      b -> Map("inputRows" -> m.inputRows, "dupRows" -> m.dupRows,
        "novelRows" -> m.novelRows, "storeDeltaRows" -> m.storeDeltaRows,
        "durationMillis" -> m.durationMillis)
    }

  private def sinkObject(doId: String)(implicit ctx: ActionPipelineContext): SparkFileDataObject =
    ctx.registry.dataObject(doId) match {
      case f: SparkFileDataObject =>
        // the STORE sink may nest the blocking-key prefix UNDER the batch
        // key (transformer storePartitions > 0): replay idempotence only
        // needs batchId as the LEADING partition — dynamic overwrite
        // still rewrites exactly the batch's own (batchId, pfx) leaves,
        // and the prefix level is what lets the pair join prune store
        // files by the delta's bucket set
        val allowed =
          if (doId == storeId) Seq(Seq(batchIdColumn), Seq(batchIdColumn, "store_pfx"))
          else Seq(Seq(batchIdColumn))
        require(allowed.contains(f.partitions),
          s"Action $id: sink ${f.id} must be partitioned by '$batchIdColumn' (got " +
            s"${f.partitions.mkString("[", ",", "]")}) — the batchId-keyed dynamic partition " +
            "overwrite is what makes a replayed micro-batch idempotent" +
            (if (doId == storeId) s"; the store may add 'store_pfx' as a second level" else ""))
        f
      case other => throw new IllegalArgumentException(
        s"Action $id: sink ${other.id} must be a file DataObject (partitioned by '$batchIdColumn')")
    }

  override def init(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] = {
    ctx.registry.dataObject(inputId) match {
      case _: CanCreateStreamingDataFrame => ()
      case other => throw new IllegalArgumentException(
        s"Action $id: input ${other.id} cannot create a streaming DataFrame")
    }
    sinkObject(outputId); sinkObject(storeId)
    Seq(SubFeed(outputId, isStreaming = true), SubFeed(storeId, isStreaming = true))
  }

  /** One micro-batch: dedup `batch` against the store's current state,
    * write novel rows + the store delta, both batchId-keyed. Public so a
    * replay spec can run the same (batch, batchId) twice and assert the
    * second pass changes nothing. */
  def processBatch(batch: DataFrame, batchId: Long)(implicit ctx: ActionPipelineContext): Unit = {
    // the batch-path rerun-after-commit guard does not apply here: BOTH
    // sinks are batchId-keyed dynamic partition overwrites, so a replayed
    // micro-batch is idempotent by construction (and the guard's per-batch
    // fingerprint job would be pure overhead on every trigger)
    transformer.skipRerunGuard = true
    // the store's current state = every batch partition appended so far,
    // EXCLUDING this batch's own partition: foreachBatch replays after a
    // crash mid-store-commit, and a partially-committed partition for THIS
    // batchId would classify its own first-poster rows as duplicates — the
    // dynamic overwrite would then rewrite the output partition WITHOUT
    // them (silent loss). Filtering the replayed id out makes the replay
    // recompute the identical novel set and deterministically overwrite
    // both partitions regardless of partial prior commits. The partition
    // key is transport, not signature — drop it after the filter.
    val store = ctx.registry.dataObject(storeId) match {
      case f: SparkFileDataObject if f.exists =>
        // STRING comparison on the partition key: once housekeeping
        // re-bins old batches under a coarse value (e.g. 'old'/'2024-01')
        // the inferred partition type is string, and an ANSI bigint cast
        // of those values would fail the whole read — the batch's own
        // partition name is exactly batchId.toString on disk either way.
        // NULL-SAFE (<=>): a hand-migrated or schema-merged store row with
        // a NULL batch key must stay IN the dedup corpus — plain =!=
        // evaluates to NULL there and silently drops the row (the
        // NULL-prefix-kept discipline of pruneStoreByPrefix)
        Some(f.getDataFrame()
          .where(!(col(batchIdColumn).cast("string") <=> lit(batchId.toString)))
          .drop(batchIdColumn))
      case _ => None
    }
    val t0 = System.currentTimeMillis()
    val outs = transformer.transform(Map(inputId -> batch) ++ store.map(storeId -> _))
    try {
      def writeKeyed(doId: String, df: DataFrame): ActionMetrics =
        sinkObject(doId).writeDataFrame(df.withColumn(batchIdColumn, lit(batchId)),
          Seq.empty, Some(SdlSaveMode.OverwriteOptimized))
      val novelWrite = writeKeyed(outputId, outs(transformer.novelKey))
      // the store delta's lineage READS the store object it is appended to
      // (the pair join) — an eager localCheckpoint materializes the
      // delta-sized frame against the PRE-write store state and cuts the
      // plan, so the partition overwrite never sees its own path as input
      val storeWrite = writeKeyed(storeId, outs(storeId).localCheckpoint(true))
      // one delta-bounded count; novel/store rows ride the writes for free.
      // recordsWritten = -1 is the Observation-unavailable sentinel —
      // propagate -1 for the derived dupRows too instead of computing
      // inputRows - (-1) nonsense that would corrupt the run-level sums
      val inputRows = batch.count()
      record(batchId, MicroBatchMetrics(
        inputRows = inputRows,
        dupRows = if (novelWrite.recordsWritten >= 0) inputRows - novelWrite.recordsWritten
                  else -1L,
        novelRows = novelWrite.recordsWritten,
        storeDeltaRows = storeWrite.recordsWritten,
        durationMillis = System.currentTimeMillis() - t0))
    } finally {
      // unpersist-per-batch: release THIS transformer's per-batch cache
      // registrations now that both writes landed (a long-lived stream
      // must not accumulate one cached frame per micro-batch). Scoped to
      // this action's batch-input prefix — a sibling streaming action in
      // the same DAG run must not lose its in-flight frames to our sweep.
      ctx.persistedFrames.keys.filter(_.startsWith(s"__graft_inc_${inputId}.")).toSeq
        .foreach(k => ctx.persistedFrames.remove(k).foreach(_.unpersist(false)))
    }
  }

  override def exec(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] = {
    val input = ctx.registry.dataObject(inputId) match {
      case s: CanCreateStreamingDataFrame => s
      case other => throw new IllegalArgumentException(
        s"Action $id: input ${other.id} cannot create a streaming DataFrame")
    }
    sinkObject(outputId); sinkObject(storeId)
    val stream = input.getStreamingDataFrame(mode.inputOptions, None)
    val query = stream.writeStream
      .trigger(mode.trigger)
      .option("checkpointLocation", mode.checkpointLocation)
      .queryName(id)
      .foreachBatch { (batch: DataFrame, batchId: Long) => processBatch(batch, batchId) }
      .start()
    mode.triggerType match {
      case "Once" | "AvailableNow" =>
        query.awaitTermination()
        // the RUN TOTALS feed the action metrics — complete across any
        // detail-map eviction (the per-batch map stays readable on
        // [[streamMetrics]] for the retained tail)
        val t = runTotals
        persistStreamMetrics()
        Seq(SubFeed(outputId, isStreaming = true,
          metrics = Some(ActionMetrics(
            recordsWritten = t.novelRows,
            observedMetrics = Map(
              "microBatches" -> t.batches, "inputRows" -> t.inputRows,
              "dupRows" -> t.dupRows, "novelRows" -> t.novelRows,
              "storeDeltaRows" -> t.storeDeltaRows)))),
          SubFeed(storeId, isStreaming = true))
      case _ =>
        // async (ProcessingTime): exec returns after the first batch, so
        // the run-state file is the only place later batches' metrics can
        // land — refresh it on every progress event for THIS query (the
        // reference's SparkStreamingQueryListener contract); the listener
        // unregisters itself when the query dies
        registerStreamMetricsListener(query)
        // same first-batch wait discipline as CopyAction.execStreaming
        val deadline = System.currentTimeMillis() + mode.firstBatchTimeoutSec * 1000L
        while (!query.recentProgress.exists(_.numInputRows >= 0) && query.isActive &&
               System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        query.exception.foreach(throw _)
        // first snapshot immediately (the listener may have missed the
        // first batch's progress event — registration raced the trigger)
        persistStreamMetrics()
        Seq(SubFeed(outputId, isStreaming = true), SubFeed(storeId, isStreaming = true))
    }
  }
}
