package graft.operators

import graft.core._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, StreamingQueryProgress}

/** Continuous run-metrics persistence for ANY streaming action — the
  * reference feeds run state continuously through a
  * StreamingQueryListener for every streaming action
  * (`sdl-core/.../metrics/SparkStreamingQueryListener.scala`,
  * `DataFrameActionImpl.scala:427-433`); this trait is the shared half of
  * what [[StreamingIncrementalDedupAction]] pioneered, so a plain
  * [[CopyAction]] under `SparkStreamingMode` gets the same treatment.
  *
  * The snapshot lands at `<runStateDir>/streaming/<actionId>.json` after
  * every progress event and is folded into the authoritative run-state
  * artifact by [[graft.core.RunStateStore]]'s absorb pass. It is STAMPED
  * with the writing run's runId/attemptId: a ProcessingTime stream can
  * outlive its launching run, and a later run whose action does not
  * refresh the snapshot (skipped on no-data, or converted to a batch
  * action under the same id) must not inherit the previous run's totals —
  * the absorb pass skips snapshots from another run.
  *
  * Write mechanics: atomic temp-then-rename, SERIALIZED on
  * [[streamPersistLock]] (the listener thread, the exec thread, and the
  * sync path all call concurrently; two interleaved temp-then-renames to
  * one snapshot lose the race on local ChecksumFs, whose Rename.OVERWRITE
  * is exists-check/delete/rename, NOT atomic). The snapshot is monotonic,
  * so on a residual destination race last-writer-wins is correct: retry
  * once after clearing the destination. ANY other failure drops the
  * snapshot, never the stream — observability must not fail the action. */
trait StreamingMetricsSupport { self: Action =>
  /** run totals to persist (implementer-defined metric names) */
  protected def streamTotalsSnapshot: Map[String, Long]
  /** optional per-batch detail (batchId → metrics), newest retained */
  protected def streamBatchesSnapshot: Seq[(Long, Map[String, Long])] = Seq.empty
  /** serializes snapshot writes across listener/exec/sync threads */
  protected def streamPersistLock: Object
  /** hook: each progress event of a registered query, before the snapshot
    * refresh — progress-derived accumulators override this */
  protected def onStreamProgress(p: StreamingQueryProgress): Unit = ()

  def persistStreamMetrics()(implicit ctx: ActionPipelineContext): Unit = streamPersistLock.synchronized {
    ctx.runStateDir.foreach { d =>
      import org.apache.hadoop.fs.Path
      val target = new Path(d, s"streaming/$id.json")
      val fs = target.getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.createObjectNode()
      root.put("action", id)
      // the writer's run coordinates — the absorb pass's staleness check
      root.put("runId", ctx.runId); root.put("attemptId", ctx.attemptId)
      val tn = root.putObject("totals")
      streamTotalsSnapshot.toSeq.sortBy(_._1).foreach { case (k, v) => tn.put(k, v) }
      val batches = streamBatchesSnapshot
      if (batches.nonEmpty) {
        val bn = root.putObject("batches")
        batches.sortBy(_._1).foreach { case (b, m) =>
          val n = bn.putObject(b.toString)
          m.toSeq.sortBy(_._1).foreach { case (k, v) => n.put(k, v) }
        }
      }
      // the WHOLE write-then-rename sequence is best-effort: any failure
      // (quota, transient FS, permissions — not just the rename races
      // handled specifically below) deletes the tmp and drops the
      // snapshot rather than propagating to the exec/listener call sites
      // and failing a healthy stream
      val tmp = new Path(target.getParent, s"._${id}.tmp_${java.util.UUID.randomUUID().toString.take(8)}")
      try {
        fs.mkdirs(target.getParent)
        val out = fs.create(tmp, true)
        try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
        finally out.close()
        def renameOver(): Unit =
          try {
            val fc = org.apache.hadoop.fs.FileContext.getFileContext(target.toUri,
              ctx.spark.sparkContext.hadoopConfiguration)
            fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          } catch {
            case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
              if (fs.exists(target)) fs.delete(target, false)
              fs.rename(tmp, target); ()
          }
        try renameOver()
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException |
               _: java.nio.file.FileAlreadyExistsException =>
            if (fs.exists(target)) fs.delete(target, false); renameOver()
        }
      } catch {
        case scala.util.control.NonFatal(_) =>
          try fs.delete(tmp, false) catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }

  /** Refresh the snapshot on every progress event of `query` (async
    * ProcessingTime streams have no run-end to aggregate at); the listener
    * unregisters itself when the query dies. No-op without a configured
    * runStateDir. */
  protected def registerStreamMetricsListener(query: StreamingQuery)
                                             (implicit ctx: ActionPipelineContext): Unit =
    if (ctx.runStateDir.isDefined) {
      val listener = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
          if (e.progress.id == query.id) { onStreamProgress(e.progress); persistStreamMetrics() }
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
          if (e.id == query.id) ctx.spark.streams.removeListener(this)
      }
      ctx.spark.streams.addListener(listener)
    }
}

/** Progress-event accumulator for actions whose micro-batches are driven
  * by Spark itself (a plain streaming sink, no foreachBatch hook): totals
  * derived from [[StreamingQueryProgress]], keyed by batchId so a replayed
  * micro-batch overwrites its own entry instead of double-counting —
  * the same idempotence discipline as
  * [[StreamingIncrementalDedupAction.streamMetrics]]. Bounded at
  * [[progressRetention]] entries (totals would drift after eviction of a
  * later-replayed batch, but replays only target the checkpoint frontier
  * — an evicted batchId is ≥1024 commits behind it). */
trait ProgressStreamMetrics extends StreamingMetricsSupport { self: Action =>
  @transient private lazy val batchProgress =
    new scala.collection.concurrent.TrieMap[Long, (Long, Long)]
  @transient protected lazy val streamPersistLock = new Object
  protected def progressRetention: Int = 1024
  override protected def onStreamProgress(p: StreamingQueryProgress): Unit = {
    batchProgress.put(p.batchId,
      (p.numInputRows, Option(p.sink).map(_.numOutputRows).getOrElse(-1L)))
    if (batchProgress.size > progressRetention)
      batchProgress.keys.toSeq.sorted.dropRight(progressRetention).foreach(batchProgress.remove)
  }
  /** drain a finished/polled query's recentProgress (sync triggers never
    * register a listener; async registration can race the first batch) */
  protected def drainRecentProgress(query: StreamingQuery): Unit =
    query.recentProgress.foreach(onStreamProgress)
  override protected def streamTotalsSnapshot: Map[String, Long] = {
    val vs = batchProgress.readOnlySnapshot().values.toSeq
    Map(
      "microBatches" -> vs.size.toLong,
      "inputRows" -> vs.map(_._1).sum,
      // -1 = sink did not report (Observation-unavailable sentinel
      // discipline): excluded from the sum, never subtracted
      "recordsWritten" -> vs.map(_._2).filter(_ >= 0).sum)
  }
}
