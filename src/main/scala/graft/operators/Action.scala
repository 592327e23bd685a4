package graft.operators

import graft.core._
import graft.sources._
import org.apache.spark.sql.DataFrame

/** Node of the pipeline DAG: reads input DataObjects, transforms, writes
  * output DataObjects. Reference:
  * `sdl-core/workflow/action/Action.scala:157-244` (prepare/init/exec hooks).
  */
trait Action {
  def id: String
  def inputIds: Seq[String]
  def outputIds: Seq[String]
  /** Optional execution mode computing the increment to process (reference
    * `executionMode` attribute of Action). */
  def executionMode: Option[graft.operators.modes.ExecutionMode] = None
  /** Custom skip/run decision over input SubFeeds (reference
    * `Action.executionCondition:89-101`): when set it REPLACES the default
    * "skip if any input is skipped" rule — e.g.
    * `!inputSubFeeds.src1.isSkipped or !inputSubFeeds.src2.isSkipped`
    * lets a union action run on partial inputs. */
  def executionCondition: Option[Condition] = None
  /** Fail the action AFTER exec when any metric row matches this SQL
    * predicate over (dataObjectId, key, value) — reference
    * `Action.metricsFailCondition:119`. E.g.
    * `key = 'records_written' and value = 0`. */
  def metricsFailCondition: Option[String] = None

  /** Phase Prepare: config/endpoint checks. */
  def prepare(implicit ctx: ActionPipelineContext): Unit = {
    (inputIds ++ outputIds).foreach(ctx.registry.dataObject(_).prepare)
  }
  /** Phase Init: full lazy traversal — builds DataFrames, propagates
    * schemas, no data movement. */
  def init(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed]
  /** Phase Exec: move data. */
  def exec(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed]
}

/** Shared logic of DataFrame actions: assemble input DataFrames, apply the
  * execution-mode filter, run the transformer chain, write outputs.
  * Reference: `workflow/action/ActionSubFeedsImpl.scala:83-189` +
  * `DataFrameActionImpl.scala`.
  */
abstract class DataFrameAction extends Action {
  def transformers: Seq[DfTransformer]
  def saveMode: Option[SdlSaveMode] = None
  /** fine-grained clauses for `saveMode: merge` (delete/update/insert
    * conditions, column restrictions, value overrides, additional join
    * predicate) — reference `DataFrameActionImpl.saveModeOptions` /
    * `SDLSaveMode.scala:126-146` */
  def saveModeOptions: Option[SaveModeMergeOptions] = None
  /** Cut the Catalyst lineage at this action's outputs: downstream actions
    * re-read from the written DataObject instead of extending this
    * action's plan (reference `DataFrameActionImpl.breakDataFrameLineage:58`).
    * For 100-action DAGs the accumulated plan otherwise grows unboundedly —
    * analysis/optimization time blows up long before data does. */
  def breakDataFrameLineage: Boolean = false

  /** apply [[breakDataFrameLineage]] to an exec-phase output SubFeed */
  protected def maybeBreakLineage(sf: SubFeed): SubFeed =
    if (breakDataFrameLineage) sf.copy(dataFrame = None) else sf

  /** Init-phase lineage cut: schema must still propagate (the output may
    * not exist yet, so downstream can't re-read), but the accumulated plan
    * need not — substitute an empty frame carrying only the schema. */
  protected def maybeBreakLineageInit(sf: SubFeed)(implicit ctx: ActionPipelineContext): SubFeed =
    if (breakDataFrameLineage)
      sf.copy(dataFrame = sf.dataFrame.map(df =>
        ctx.spark.createDataFrame(ctx.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)))
    else sf

  /** current committed state of a DataObject, if any exists — the shared
    * dispatch for read-modify-write patterns (stateful actions, recursive
    * inputs). Covers file, tick-tock and catalog/JDBC table objects. */
  protected def readCurrentStateIfExists(doId: String)(implicit ctx: ActionPipelineContext): Option[DataFrame] =
    ctx.registry.dataObject(doId) match {
      case f: SparkFileDataObject if f.exists => Some(f.getDataFrame())
      case tt: TickTockHiveTableDataObject if tt.isTableExisting => Some(tt.getDataFrame())
      case t: TableDataObject if t.isTableExisting => Some(t.getDataFrame())
      case v: VersionedTableDataObject if v.latestVersion.isDefined => Some(v.getDataFrame())
      case _ => None
    }

  protected def readInput(doId: String, pvs: Seq[PartitionValues])
                         (implicit ctx: ActionPipelineContext): DataFrame =
    ctx.registry.dataObject(doId) match {
      case c: CanCreateDataFrame => c.getDataFrame(pvs)
      case other => throw new IllegalArgumentException(s"DataObject ${other.id} cannot create DataFrames")
    }

  /** Fold the 1:1 transformer chain — one Catalyst plan, no materialization
    * between steps (reference `DataFrameActionImpl.applyTransformers:487-495`). */
  protected def applyTransformers(df: DataFrame, doId: String)
                                 (implicit ctx: ActionPipelineContext): DataFrame =
    transformers.foldLeft(df)((acc, t) => t.transform(acc, doId))

  protected def writeOutput(doId: String, df: DataFrame, pvs: Seq[PartitionValues])
                           (implicit ctx: ActionPipelineContext): ActionMetrics = {
    // Auto-cache multi-consumer outputs (reference DataFrameActionImpl.
    // writeSubFeed:456-462): persist BEFORE the write so the write itself
    // populates the cache and each downstream consumer reads blocks
    // instead of recomputing the producer's plan. Skipped when lineage is
    // broken anyway (consumers re-read from storage) or for streaming
    // frames. The DAG unpersists once the last consumer completes.
    if (!breakDataFrameLineage && !df.isStreaming &&
        ctx.dataFrameReuseCounts.getOrElse(doId, 0) >= 2 &&
        df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // recorded at persist time so the DAG can unpersist even if this
      // action fails past this point and never publishes its results
      ctx.persistedFrames(doId) = df
    }
    ctx.registry.dataObject(doId) match {
      // merge dispatches here so the action-level clauses reach the sink —
      // writeDataFrame's signature carries only the mode
      case m: CanMergeDataFrame with TableDataObject if saveMode.contains(SdlSaveMode.Merge) =>
        val pk = m.table.primaryKey.getOrElse(throw new IllegalArgumentException(
          s"$id: saveMode merge needs table.primaryKey on ${m.id}"))
        m.mergeDataFrame(df, pk, saveModeOptions.getOrElse(SaveModeMergeOptions()))
      case w: CanWriteDataFrame => w.writeDataFrame(df, pvs, saveMode)
      case other => throw new IllegalArgumentException(s"DataObject ${other.id} cannot write DataFrames")
    }
  }

  /** Apply execution mode to compute the partitions/filter to process. */
  protected def applyExecutionMode(in: SubFeed)(implicit ctx: ActionPipelineContext): SubFeed =
    executionMode.fold(in) { m => m.apply(this, in) }
}

/** 1:1 copy with transformer chain. Reference
  * `sdl-core/workflow/action/CopyAction.scala:48-107`. */
case class CopyAction(
    id: String, inputId: String, outputId: String,
    transformers: Seq[DfTransformer] = Seq.empty,
    /** delete the copied input data after a successful write (reference
      * `CopyAction.deleteDataAfterRead`): read partitions when the run was
      * partitioned, everything otherwise — the file-handoff pattern */
    deleteDataAfterRead: Boolean = false,
    override val saveMode: Option[SdlSaveMode] = None,
    override val executionMode: Option[graft.operators.modes.ExecutionMode] = None,
    override val executionCondition: Option[Condition] = None,
    override val metricsFailCondition: Option[String] = None,
    override val breakDataFrameLineage: Boolean = false,
    override val saveModeOptions: Option[SaveModeMergeOptions] = None)
  extends DataFrameAction with ProgressStreamMetrics {

  def inputIds: Seq[String] = Seq(inputId)
  def outputIds: Seq[String] = Seq(outputId)

  /** returns (output subfeed, INPUT partition values) — deletion after a
    * partitioned copy must target the input's partitions, not the
    * transformer-mapped output ones */
  private def buildOutput(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): (SubFeed, Seq[PartitionValues]) = {
    val in0 = subFeeds.find(_.dataObjectId == inputId)
      .getOrElse(SubFeed(inputId))
    val in = applyExecutionMode(in0)
    val df = in.dataFrame.getOrElse(readInput(inputId, in.partitionValues))
    val out = applyTransformers(df, inputId)
    (SubFeed(outputId, Some(out), transformers.foldLeft(in.partitionValues)((pvs, t) => t.transformPartitionValues(pvs))),
      in.partitionValues)
  }

  /** deleteDataAfterRead needs a file input — checked at INIT and before
    * any exec side effect (the reference constrains it at config time): an
    * unsupported input must fail before the output write commits, not
    * after, or the run dies post-write with the input intact. */
  private def validateDeleteDataAfterRead(implicit ctx: ActionPipelineContext): Unit =
    if (deleteDataAfterRead) ctx.registry.dataObject(inputId) match {
      case _: graft.sources.SparkFileDataObject => ()
      case other => throw new IllegalArgumentException(
        s"Action $id: deleteDataAfterRead requires a file input — ${other.id} doesn't support deleting data")
    }

  override def init(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] = {
    validateDeleteDataAfterRead
    val (out, _) = buildOutput(subFeeds)
    ctx.registry.dataObject(outputId) match {
      case w: CanWriteDataFrame => w.initWrite(out.dataFrame.get)
      case _ => ()
    }
    Seq(maybeBreakLineageInit(out))
  }

  override def exec(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] =
    executionMode match {
      case Some(m: graft.operators.modes.SparkStreamingMode) => execStreaming(m)
      case _ =>
        validateDeleteDataAfterRead
        val (out, inPvs) = buildOutput(subFeeds)
        val metrics = writeOutput(outputId, out.dataFrame.get, out.partitionValues)
        // only AFTER the write committed (reference postExecSuccess)
        if (deleteDataAfterRead) ctx.registry.dataObject(inputId) match {
          case p: graft.sources.SparkFileDataObject if p.partitions.nonEmpty && inPvs.nonEmpty =>
            p.deletePartitions(inPvs)
          case f: graft.sources.SparkFileDataObject => f.deleteAll
          case other => throw new IllegalStateException(
            s"Action $id: input ${other.id} doesn't support deleting data")
        }
        Seq(maybeBreakLineage(out.copy(metrics = Some(metrics))))
    }

  /** Structured Streaming execution (reference
    * `DataFrameActionImpl.scala:410-455`): synchronous triggers
    * (Once/AvailableNow) await termination per DAG run; ProcessingTime
    * starts a long-lived query and awaits only the first micro-batch like
    * the reference. */
  private def execStreaming(m: graft.operators.modes.SparkStreamingMode)
                           (implicit ctx: ActionPipelineContext): Seq[SubFeed] = {
    val in = m.apply(this, SubFeed(inputId))
    val transformed = applyTransformers(in.dataFrame.get, inputId)
    val sink = ctx.registry.dataObject(outputId) match {
      case w: graft.sources.CanWriteStreamingDataFrame => w
      case other => throw new IllegalArgumentException(s"${other.id} cannot write streams")
    }
    // the action's save mode rides along as an option so table sinks can
    // pick their per-micro-batch write path (merge vs append)
    val optionsWithMode = m.outputOptions ++
      saveMode.map(sm => "graft.saveMode" -> sm.toString.toLowerCase)
    val query = sink.writeStreamingDataFrame(transformed, m.trigger, optionsWithMode,
      m.checkpointLocation, queryName = id, m.outputMode)
    m.triggerType match {
      case "Once" | "AvailableNow" =>
        query.awaitTermination()
        // run totals from the drained progress history (batchId-keyed, so
        // a replayed micro-batch never double-counts) — persisted to the
        // run-state snapshot so the authoritative artifact carries them
        drainRecentProgress(query)
        persistStreamMetrics()
        val totals = streamTotalsSnapshot
        Seq(SubFeed(outputId, isStreaming = true,
          metrics = Some(ActionMetrics(
            recordsWritten =
              Option(query.lastProgress).map(_.sink.numOutputRows).getOrElse(-1L),
            observedMetrics = totals))))
      case _ =>
        // async: await the FIRST completed micro-batch so downstream sees
        // data — NOT processAllAvailable(), which blocks until the source is
        // drained and so never returns under a continuously-producing
        // source (Spark's own scaladoc warns it may block forever); poll
        // recentProgress for the first batch instead, bounded. Later
        // batches' metrics can only land in the run-state snapshot —
        // refresh it on every progress event (the reference's
        // SparkStreamingQueryListener covers EVERY streaming action).
        registerStreamMetricsListener(query)
        val deadline = System.currentTimeMillis() + m.firstBatchTimeoutSec * 1000L
        while (!query.recentProgress.exists(_.numInputRows >= 0) && query.isActive &&
               System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        query.exception.foreach(throw _)
        // drain what landed before the listener registered (the first
        // batch's progress event can race registration), then snapshot
        drainRecentProgress(query)
        persistStreamMetrics()
        Seq(SubFeed(outputId, isStreaming = true))
    }
  }
}

/** N inputs → M outputs through a chain of N:M transformers. Reference
  * `CustomDataFrameAction.scala:54-124`. */
case class CustomDataFrameAction(
    id: String, inputIds: Seq[String], outputIds: Seq[String],
    dfsTransformers: Seq[DfsTransformer],
    override val saveMode: Option[SdlSaveMode] = None,
    override val executionCondition: Option[Condition] = None,
    override val metricsFailCondition: Option[String] = None,
    /** outputs of THIS action readable as additional inputs (reference
      * `CustomDataFrameAction.recursiveInputIds:69-73`) — running totals,
      * self-referencing aggregates. Their writes are staged automatically
      * (the plan reads the object being overwritten). */
    recursiveInputIds: Seq[String] = Seq.empty,
    override val breakDataFrameLineage: Boolean = false,
    override val saveModeOptions: Option[SaveModeMergeOptions] = None,
    /** execution mode applied to [[mainInputId]] (reference
      * `CustomDataFrameAction.executionMode` via its mainInput contract):
      * partition-diff / incremental-state selection of the increment. Its
      * [[graft.operators.modes.ExecutionMode.batchIdentity]] also defaults
      * the batch key of any incremental transformer whose
      * `novelBatchKeyColumn` is set without an explicit value — config-only
      * exactly-once novel output. */
    override val executionMode: Option[graft.operators.modes.ExecutionMode] = None,
    /** the input the execution mode narrows (default: first of inputIds) */
    mainInputId: Option[String] = None)
  extends DataFrameAction {

  def transformers: Seq[DfTransformer] = Seq.empty
  require(mainInputId.forall(inputIds.contains),
    s"Action $id: mainInputId must be one of inputIds")
  require(recursiveInputIds.forall(outputIds.contains),
    s"Action $id: recursiveInputIds must be outputs of this action")
  // the incremental dedup transformers emit a store DELTA under their
  // store key — wired with the default overwrite the store would be
  // silently TRUNCATED to the last batch's novelties (dedup quietly stops
  // deduplicating). Fail at construction, the only place both the
  // transformer and the action's save mode are visible.
  require(!dfsTransformers.exists {
      case t: IncrementalStoreDfsTransformer => recursiveInputIds.contains(t.storeInput)
      case _ => false
    } || saveMode.contains(SdlSaveMode.Append),
    s"Action $id: an incremental dedup transformer emits a store DELTA for its recursive " +
      "store output — wire the action with saveMode = Append (a plain overwrite would " +
      "truncate the store to the last batch's novel rows)")

  private def mainInput: String = mainInputId.getOrElse(inputIds.head)

  private def buildOutputs(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Map[String, DataFrame] = {
    val byId = subFeeds.map(sf => sf.dataObjectId -> sf).toMap
    // the execution mode narrows the MAIN input (increment selection) and
    // names the increment: its batch identity defaults the batch key of
    // any incremental transformer without an explicit one, BEFORE the
    // transformer chain runs (keyNovel reads the effective value)
    val appliedMain: Option[SubFeed] = executionMode.map { m =>
      val applied = m.apply(this, byId.getOrElse(mainInput, SubFeed(mainInput)))
      val derived = m.batchIdentity(this, applied)
      dfsTransformers.foreach {
        case t: IncrementalStoreDfsTransformer => t.derivedNovelBatchKeyValue = derived
        case _ => ()
      }
      applied
    }
    val regular: Map[String, DataFrame] = inputIds.map { inId =>
      val sf = if (inId == mainInput) appliedMain.orElse(byId.get(inId)) else byId.get(inId)
      inId -> sf.flatMap(_.dataFrame)
        .getOrElse(readInput(inId, sf.map(_.partitionValues).getOrElse(Seq.empty)))
    }.toMap
    // recursive inputs read the CURRENT state of this action's own outputs;
    // absent state (first run) is skipped — the transformer sees no entry
    val recursive: Map[String, DataFrame] =
      recursiveInputIds.flatMap(rId => readCurrentStateIfExists(rId).map(rId -> _)).toMap
    // fold the N:M chain (reference DataFrameActionImpl.scala:487-495)
    dfsTransformers.foldLeft(regular ++ recursive)((acc, t) => acc ++ t.transform(acc))
  }

  /** novel outputs an incremental transformer keyed by a batch column
    * (novelKey → key column): written with DYNAMIC PARTITION OVERWRITE so
    * a guard-permitted rerun (a run that failed between the novel write
    * and the store append) overwrites its own partition instead of
    * re-appending the same rows — the streaming action's idempotent-sink
    * layout on the batch path. A def, not a val: the key VALUE may be
    * derived per run from the execution mode's batch identity. */
  private def batchKeyedNovel: Map[String, String] = dfsTransformers.collect {
    case t: IncrementalStoreDfsTransformer
      if t.novelBatchKeyColumn.isDefined && t.effectiveNovelBatchKeyValue.isDefined =>
      t.novelKey -> t.novelBatchKeyColumn.get
  }.toMap

  private def writeBatchKeyedNovel(outId: String, keyCol: String, df: DataFrame)
                                  (implicit ctx: ActionPipelineContext): ActionMetrics =
    ctx.registry.dataObject(outId) match {
      case f: SparkFileDataObject =>
        require(f.partitions.headOption.contains(keyCol),
          s"Action $id: novel sink ${f.id} must be partitioned by '$keyCol' (got " +
            s"${f.partitions.mkString("[", ",", "]")}) — the batch-keyed dynamic partition " +
            "overwrite is what makes the guard-permitted rerun idempotent; without the " +
            "partition the overwrite would truncate the sink to the current batch")
        f.writeDataFrame(df, Seq.empty, Some(SdlSaveMode.OverwriteOptimized))
      case other => throw new IllegalArgumentException(
        s"Action $id: batch-keyed novel sink ${other.id} must be a file DataObject " +
          s"partitioned by '$keyCol'")
    }

  override def init(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] = {
    val outs = buildOutputs(subFeeds)
    outputIds.map { outId =>
      val df = outs.getOrElse(outId,
        throw new IllegalStateException(s"Action $id: transformer chain did not produce output '$outId'"))
      ctx.registry.dataObject(outId) match {
        case w: CanWriteDataFrame => w.initWrite(df)
        case _ => ()
      }
      maybeBreakLineageInit(SubFeed(outId, Some(df)))
    }
  }

  override def exec(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] = {
    val outs = buildOutputs(subFeeds)
    // NON-recursive outputs write FIRST: their plans may read a recursive
    // sibling's current state, which the staged swap below replaces —
    // executing them before the swap keeps the files they reference alive.
    // (Two recursive outputs could read EACH OTHER — unsequenceable;
    // rejected rather than silently corrupted.)
    require(recursiveInputIds.size <= 1,
      s"Action $id: at most one recursive output is supported")
    val ordered = outputIds.sortBy(recursiveInputIds.contains) // false < true
    val written = ordered.map { outId =>
      val recursive = recursiveInputIds.contains(outId)
      val df = outs(outId)
      val metrics =
        if (recursive)
          // plan reads this very object → staged write; with Append the
          // increment is MOVED in (O(increment) I/O — the store-growth
          // discipline), otherwise staged overwrite of the full state
          ctx.registry.dataObject(outId) match {
            case w: CanWriteDataFrame if saveMode.contains(SdlSaveMode.Append) =>
              w.writeDataFrameStagedAppend(df)
            case w: CanWriteDataFrame => w.writeDataFrameStaged(df)
            case other => throw new IllegalArgumentException(s"${other.id} cannot write DataFrames")
          }
        else batchKeyedNovel.get(outId) match {
          case Some(keyCol) => writeBatchKeyedNovel(outId, keyCol, df)
          case None => writeOutput(outId, df, Seq.empty)
        }
      // a recursive output's plan reads files the staged swap just REPLACED
      // — downstream must re-read the committed state, so its lineage is
      // always cut (same mechanism as breakDataFrameLineage)
      val out = SubFeed(outId, if (recursive) None else Some(df), metrics = Some(metrics))
      outId -> maybeBreakLineage(out)
    }.toMap
    outputIds.map(written)
  }
}

/** Copy files 1:1 between file-based DataObjects without interpreting
  * content. Reference `FileTransferAction.scala:49-118`. Implemented with
  * Hadoop FS streams on the driver for small control files; large-scale
  * binary movement should use RawFileDataObject + distributed write.
  */
case class FileTransferAction(id: String, inputId: String, outputId: String)
  extends Action {
  def inputIds: Seq[String] = Seq(inputId)
  def outputIds: Seq[String] = Seq(outputId)

  override def init(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] =
    Seq(SubFeed(outputId))

  override def exec(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] = {
    import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
    val (src, dst) = (ctx.registry.dataObject(inputId), ctx.registry.dataObject(outputId))
    // a FileRef PAIR transfers through the transports (SFTP-shaped remote
    // → landing zone, incremental by modification-time watermark) — the
    // reference's FileTransferAction serves FileRef DataObjects the same
    // way (`FileTransferAction.scala:49-118`); with `fileRef` objects in
    // HOCON this makes the remote-download pipeline config-only
    (src, dst) match {
      case (s: graft.sources.FileRefDataObject, d: graft.sources.FileRefDataObject) =>
        val moved = s.transferTo(d)
        return Seq(SubFeed(outputId,
          metrics = Some(ActionMetrics(recordsWritten = moved.size.toLong))))
      case _ => ()
    }
    def pathOf(d: DataObject): Path = d match {
      case f: SparkFileDataObject => new Path(f.path)
      case r: RawFileDataObject => new Path(r.path)
      case other => throw new IllegalArgumentException(s"${other.id} is not file-based")
    }
    val conf = ctx.spark.sparkContext.hadoopConfiguration
    val (sp, dp) = (pathOf(src), pathOf(dst))
    val (sfs, dfs) = (sp.getFileSystem(conf), dp.getFileSystem(conf))
    // idempotent overwrite: when dp already exists as a directory (re-run),
    // FileUtil.copy's checkDest would NEST the source under dp/<srcName>,
    // silently duplicating data — copy the source's CHILDREN onto dp
    // instead, replacing same-named targets
    val n =
      if (sfs.getFileStatus(sp).isDirectory && dfs.exists(dp)) {
        dfs.mkdirs(dp)
        sfs.listStatus(sp).forall { c =>
          val target = new Path(dp, c.getPath.getName)
          if (dfs.exists(target)) dfs.delete(target, true)
          FileUtil.copy(sfs, c.getPath, dfs, target, false, true, conf)
        }
      } else FileUtil.copy(sfs, sp, dfs, dp, false, true, conf)
    Seq(SubFeed(outputId, metrics = Some(ActionMetrics(recordsWritten = if (n) 1 else 0))))
  }
}

/** Run a shell command as a DAG node. Reference `CustomScriptAction.scala`
  * + `workflow/action/script/CmdScript.scala`. */
case class CustomScriptAction(id: String, cmd: Seq[String],
    inputIds: Seq[String] = Seq.empty, outputIds: Seq[String] = Seq.empty)
  extends Action {
  override def init(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] =
    outputIds.map(SubFeed(_))
  override def exec(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] = {
    val exit = new ProcessBuilder(cmd: _*).inheritIO().start().waitFor()
    require(exit == 0, s"Action $id: script exited with $exit")
    outputIds.map(SubFeed(_))
  }
}
