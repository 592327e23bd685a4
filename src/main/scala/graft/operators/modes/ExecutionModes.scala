package graft.operators.modes

import graft.core._
import graft.sources._
import graft.operators.Action
import org.apache.spark.sql.functions._

/** Execution modes compute the increment (partitions or filter) an action
  * should process. Reference: `sdl-core/workflow/action/executionMode/`.
  * At 100 TB these are THE mechanism that keeps each run proportional to
  * new data instead of the full table.
  */
trait ExecutionMode extends Serializable {
  /** Narrow the input SubFeed (select partitions / attach filtered DataFrame). */
  def apply(action: Action, in: SubFeed)(implicit ctx: ActionPipelineContext): SubFeed
  /** Called by the DAG after the action's exec succeeded (and its
    * metricsFailCondition passed): advance watermarks / move processed
    * files. Reference `ExecutionMode.postExec` — without this hook the
    * incremental modes silently reprocess everything every run. */
  def postExec(action: Action)(implicit ctx: ActionPipelineContext): Unit = ()
  /** Called by the DAG when the action's exec FAILED or was skipped after
    * `apply` ran: release any shared state `apply` installed (read bounds,
    * file snapshots) WITHOUT advancing watermarks — otherwise a failed run
    * leaks a bounded read view into sibling actions that share the input. */
  def postExecFailed(action: Action)(implicit ctx: ActionPipelineContext): Unit = ()

  /** A STABLE, filesystem-safe identity of the increment `apply` selected
    * this run: re-running the SAME batch (a recovery rerun before the
    * mode's state advanced) yields the same token; the next increment
    * yields a different one. None when the mode has no natural batch
    * identity (ProcessAll, streaming, custom). Drives config-only
    * exactly-once novel sinks — the enclosing action defaults an
    * incremental transformer's `novelBatchKeyValue` to this token, so a
    * guard-permitted rerun overwrites its own batch partition instead of
    * re-appending (reference batch-identity sources: PartitionDiffMode's
    * selected partition values `PartitionDiffMode.scala:61-170`, the
    * incremental modes' state tokens). */
  def batchIdentity(action: Action, applied: SubFeed)
                   (implicit ctx: ActionPipelineContext): Option[String] = None
}

object ExecutionMode {
  /** Partition-directory-safe batch token: raw state strings (offset JSON,
    * ISO timestamps with colons) would create illegal or unwieldy
    * partition values — keep a readable prefix, replace unsafe chars, and
    * disambiguate anything shortened with a hash of the full string. */
  def sanitizeBatchToken(s: String): String = {
    val cleaned = s.map(c => if (c.isLetterOrDigit || c == '=' || c == '_' || c == '.' || c == '-') c else '+')
    if (cleaned.length <= 64 && cleaned == s) cleaned
    else {
      val h1 = scala.util.hashing.MurmurHash3.stringHash(s)
      val h2 = scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c)
      cleaned.take(40) + "~" + java.lang.Long.toHexString(
        ((h1.toLong & 0xffffffffL) << 32) | (h2.toLong & 0xffffffffL))
    }
  }
}

/** Thrown when a mode determines there is nothing to process; the DAG marks
  * the action (and dependents without other inputs) skipped. Reference
  * `NoDataToProcessWarning`. */
case class NoDataToProcessWarning(actionId: String, msg: String) extends RuntimeException(msg)

/** Process everything, ignore any incoming partition selection. Reference
  * `ExecutionMode.scala:114` (ProcessAllMode). */
case class ProcessAllMode() extends ExecutionMode {
  override def apply(action: Action, in: SubFeed)(implicit ctx: ActionPipelineContext): SubFeed =
    in.copy(partitionValues = Seq.empty, dataFrame = None)
}

/** Guard: fail when no partition values given at runtime. Reference
  * `ExecutionMode.scala:149` (FailIfNoPartitionValuesMode). */
case class FailIfNoPartitionValuesMode() extends ExecutionMode {
  override def apply(action: Action, in: SubFeed)(implicit ctx: ActionPipelineContext): SubFeed = {
    require(in.partitionValues.nonEmpty, s"Action ${action.id}: no partition values given but FailIfNoPartitionValuesMode set")
    in
  }
}

/** Expression data for [[PartitionDiffMode]]'s condition/selection
  * expressions — the reference's `PartitionDiffModeExpressionData`
  * contract (`PartitionDiffMode.scala:150-170`): plain Spark SQL over
  * these four fields, evaluated on a one-row Dataset. */
case class PartitionDiffExpressionData(
    givenPartitionValues: Seq[Map[String, String]],
    inputPartitionValues: Seq[Map[String, String]],
    outputPartitionValues: Seq[Map[String, String]],
    selectedPartitionValues: Seq[Map[String, String]])

/** Process partitions present in the main input but missing in the main
  * output. Reference `executionMode/PartitionDiffMode.scala:61-170`.
  *
  * @param partitionColNb        only compare the first n partition columns
  * @param nbOfPartitionValuesPerRun batch size per run (oldest first)
  * @param applyCondition  SQL over [[PartitionDiffExpressionData]] gating
  *        the mode; DEFAULT (reference :93-94): apply only when NO
  *        partition values were given — explicitly requested partitions
  *        win over the diff
  * @param failConditionOnMissingInput fail the run when the INPUT lists
  *        no partitions at all (an empty landing zone that should never
  *        be empty) instead of skipping with NoData
  * @param failCondition   SQL over [[PartitionDiffExpressionData]]
  *        (selected populated) — true aborts the run (e.g. guard against
  *        processing more than N partitions, or an unexpected gap)
  * @param selectExpression SQL over [[PartitionDiffExpressionData]]
  *        returning `array<map<string,string>>` — replaces the selected
  *        set (e.g. `slice(selectedPartitionValues, -1, 1)` = newest only)
  * @param alternativeOutputId diff against this object's partitions
  *        instead of the main output's (reference
  *        `ExecutionModeWithMainInputOutput.alternativeOutputId`)
  */
case class PartitionDiffMode(
    partitionColNb: Option[Int] = None,
    nbOfPartitionValuesPerRun: Option[Int] = None,
    failConditionOnMissingInput: Boolean = false,
    applyCondition: Option[String] = None,
    failCondition: Option[String] = None,
    selectExpression: Option[String] = None,
    alternativeOutputId: Option[String] = None) extends ExecutionMode {

  private def eval[T](expression: String, data: PartitionDiffExpressionData,
                      as: org.apache.spark.sql.Row => T)(implicit ctx: ActionPipelineContext): T = {
    val spark = ctx.spark
    import spark.implicits._
    as(Seq(data).toDS().selectExpr(expression).head())
  }
  private def maps(r: org.apache.spark.sql.Row): Seq[Map[String, String]] =
    r.getSeq[Map[String, String]](0)

  override def apply(action: Action, in: SubFeed)(implicit ctx: ActionPipelineContext): SubFeed = {
    val given = in.partitionValues.map(_.elements)
    val doApply = applyCondition match {
      case Some(c) => eval(c, PartitionDiffExpressionData(given, Seq.empty, Seq.empty, Seq.empty),
        _.getBoolean(0))
      // reference default: explicitly requested partitions win over the diff
      case None => in.partitionValues.isEmpty
    }
    if (!doApply) return in
    val input = ctx.registry.dataObject(action.inputIds.head) match {
      case p: CanHandlePartitions => p
      case o => throw new IllegalArgumentException(s"PartitionDiffMode needs partitioned input, got ${o.id}")
    }
    val output = ctx.registry.dataObject(alternativeOutputId.getOrElse(action.outputIds.head)) match {
      case p: CanHandlePartitions => p
      case o => throw new IllegalArgumentException(s"PartitionDiffMode needs partitioned output, got ${o.id}")
    }
    val cols = partitionColNb.map(n => input.partitions.take(n)).getOrElse(input.partitions)
    // the diff KEY is the intersection of the compared input columns and
    // the output's partition columns: with disjoint layouts the sets
    // could never match and every partition would silently reprocess
    // every run — fail loudly instead; with a coarser output (out=(dt),
    // in=(dt,hour)) a dt present in the output means that dt was
    // processed, so the diff compares on dt and selects at `cols`
    // granularity
    val keyCols = cols.filter(output.partitions.contains)
    require(keyCols.nonEmpty,
      s"PartitionDiffMode: compared input partition columns ${cols.mkString(",")} share no " +
        s"column with output partitions ${output.partitions.mkString(",")} — the diff could never match")
    def truncate(pv: PartitionValues, to: Seq[String]): PartitionValues =
      PartitionValues(pv.elements.view.filterKeys(to.contains).toMap)
    val inFull = input.listPartitions
    if (inFull.isEmpty && failConditionOnMissingInput) throw new IllegalStateException(
      s"Action ${action.id}: PartitionDiffMode found NO partitions at input (failConditionOnMissingInput)")
    val inParts = inFull.map(truncate(_, cols)).distinct
    val outKeys = output.listPartitions.map(truncate(_, keyCols)).toSet
    val outParts = output.listPartitions.map(truncate(_, cols)).toSet
    // deterministic oldest-first ordering (reference PartitionValues
    // ordering) — listing order is whatever the FS returns
    val missing0 = inParts.filter(pv => !outKeys.contains(truncate(pv, keyCols)))
      .sortBy(_.asPath(cols))
    val batched = nbOfPartitionValuesPerRun.map(missing0.take).getOrElse(missing0)
    val selected = selectExpression match {
      case Some(se) =>
        eval(se, PartitionDiffExpressionData(given, inParts.map(_.elements),
          outParts.toSeq.map(_.elements), batched.map(_.elements)), maps)
          .map(PartitionValues(_))
      case None => batched
    }
    failCondition.foreach { fc =>
      val failed = eval(fc, PartitionDiffExpressionData(given, inParts.map(_.elements),
        outParts.toSeq.map(_.elements), selected.map(_.elements)), _.getBoolean(0))
      if (failed) throw new IllegalStateException(
        s"Action ${action.id}: PartitionDiffMode failCondition '$fc' matched " +
          s"(selected=${selected.map(_.asPath(cols)).mkString(",")})")
    }
    if (selected.isEmpty) throw NoDataToProcessWarning(action.id, s"no new partitions for ${action.id}")
    in.copy(partitionValues = selected, dataFrame = None)
  }

  /** batch identity = the selected partition values (canonically ordered):
    * a recovery rerun re-diffs to the SAME missing partitions (the failed
    * run wrote nothing to the diffed output), the next increment selects
    * different ones */
  override def batchIdentity(action: Action, applied: SubFeed)
                            (implicit ctx: ActionPipelineContext): Option[String] =
    Some(applied.partitionValues).filter(_.nonEmpty).map { pvs =>
      ExecutionMode.sanitizeBatchToken(
        pvs.map(_.elements.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(","))
          .sorted.mkString("+"))
    }
}

/** High-watermark on a compare column: read `max(compareCol)` from the
  * output, filter input to `compareCol > lastMax`. Reference
  * `DataFrameIncrementalMode.scala:42-111`. The filter is a plain `where`
  * so it pushes down to the parquet scan (only row groups beyond the
  * watermark are read).
  */
case class DataFrameIncrementalMode(compareCol: String) extends ExecutionMode {
  override def apply(action: Action, in: SubFeed)(implicit ctx: ActionPipelineContext): SubFeed = {
    val inputDf = ctx.registry.dataObject(action.inputIds.head) match {
      case c: CanCreateDataFrame => c.getDataFrame(Seq.empty)
      case o => throw new IllegalArgumentException(s"${o.id} cannot create DataFrame")
    }
    // Init phase propagates SCHEMA only — the watermark filter doesn't
    // change it, so the max-agg scan and the emptiness probe (two real
    // Spark jobs over a potentially huge output/input) run ONLY in exec
    if (!ctx.isExecPhase) return in.withDataFrame(inputDf)
    val output = ctx.registry.dataObject(action.outputIds.head)
    val watermark = output match {
      case c: CanCreateDataFrame =>
        val existsData = output match {
          case f: SparkFileDataObject => f.exists
          // a fresh table target must mean "no watermark yet" — probing it
          // with getDataFrame would throw TABLE_OR_VIEW_NOT_FOUND on the
          // very first incremental run
          case t: graft.sources.TableDataObject => t.isTableExisting
          // same contract for the versioned table: an empty log is "no
          // watermark yet", not an error
          case v: graft.sources.VersionedTableDataObject => v.latestVersion.isDefined
          case _ => true
        }
        if (existsData)
          c.getDataFrame(Seq.empty).agg(max(col(compareCol))).collect().headOption.flatMap(r => Option(r.get(0)))
        else None
      case _ => None
    }
    val filtered = watermark.fold(inputDf)(w => inputDf.where(col(compareCol) > lit(w)))
    // Empty increment MUST skip the action (reference
    // DataFrameIncrementalMode.scala:89/106): with save mode Overwrite an
    // empty write would destroy the existing output AND the watermark in it.
    if (filtered.isEmpty)
      throw NoDataToProcessWarning(action.id, s"no data above watermark ${watermark.getOrElse("-")} for ${action.id}")
    in.withDataFrame(filtered)
  }
}

/** Source DataObject keeps a state string (file mod-time, offsets, …) in
  * the run state. Reference `DataObjectStateIncrementalMode.scala:31-60`.
  *
  * The mod-time watermark is snapshotted when the READ is set up, not
  * after it: `apply` bounds the exec read with `modifiedBefore = T` (T =
  * wall clock at plan build) and `postExec` persists `T - 1ms` as the next
  * run's `modifiedAfter`. Both Spark filters are strict, so run N reads
  * `t < T` and run N+1 reads `t > T-1ms` ⇔ `t ≥ T` at FS millisecond
  * granularity — adjacent half-open windows with no gap and no overlap.
  * A file landing DURING the exec read is excluded by the upper bound and
  * picked up next run; re-listing after the write (the previous design)
  * would have skipped it forever. Sources with self-managed offsets
  * (Kafka/JDBC) advance their own state instead. */
case class DataObjectStateIncrementalMode() extends ExecutionMode {
  /** watermark to persist after a successful exec: read-snapshot T - 1ms */
  @transient private var pendingState: Option[String] = None

  private def fmt(millis: Long)(implicit ctx: ActionPipelineContext): String = {
    // modifiedAfter/Before are parsed in the SESSION timezone — format the
    // state string in the same zone or the threshold shifts
    val zone = java.time.ZoneId.of(ctx.spark.conf.get(
      "spark.sql.session.timeZone", java.util.TimeZone.getDefault.getID))
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")
      .withZone(zone).format(java.time.Instant.ofEpochMilli(millis))
  }

  override def apply(action: Action, in: SubFeed)(implicit ctx: ActionPipelineContext): SubFeed = {
    ctx.registry.dataObject(action.inputIds.head) match {
      case f: SparkFileDataObject =>
        if (ctx.isExecPhase) {
          val t = System.currentTimeMillis()
          f.setReadUpperBound(Some(fmt(t)))
          pendingState = Some(fmt(t - 1))
        }
        in
      case inc: CanCreateIncrementalOutput =>
        // state is loaded/saved by the DAG run (RunStateStore); offset-based
        // sources manage their own increment
        in
      case o => throw new IllegalArgumentException(s"${o.id} does not support incremental state")
    }
  }

  /** Persist the read-time watermark and drop the read bound so later
    * consumers of the same DataObject see an unbounded view again. */
  override def postExec(action: Action)(implicit ctx: ActionPipelineContext): Unit =
    ctx.registry.dataObject(action.inputIds.head) match {
      case f: SparkFileDataObject =>
        pendingState.foreach(s => f.setState(Some(s)))
        pendingState = None
        f.setReadUpperBound(None)
      case _ => ()
    }

  /** Failure/skip: drop the read bound WITHOUT persisting the watermark —
    * the run consumed nothing, and the shared DataObject must not keep
    * serving a truncated view to sibling actions. */
  override def postExecFailed(action: Action)(implicit ctx: ActionPipelineContext): Unit =
    ctx.registry.dataObject(action.inputIds.head) match {
      case f: SparkFileDataObject =>
        pendingState = None
        f.setReadUpperBound(None)
      case _ => ()
    }

  /** batch identity = the COMMITTED lower-bound state (everything-after-W
    * names the increment): stable across a recovery rerun — the watermark
    * only advances in postExec after success — and different once it has.
    * (The read-time UPPER bound is wall clock and deliberately excluded:
    * it changes on every rerun of the same batch.) */
  override def batchIdentity(action: Action, applied: SubFeed)
                            (implicit ctx: ActionPipelineContext): Option[String] =
    ctx.registry.dataObject(action.inputIds.head) match {
      case inc: CanCreateIncrementalOutput =>
        Some(ExecutionMode.sanitizeBatchToken("since_" + inc.getState.getOrElse("epoch")))
      case _ => None
    }
}

/** Process files then delete (or archive) them — the landing-zone pattern.
  * Reference `FileIncrementalMoveMode.scala:89-135`.
  *
  * File-granular: `apply` snapshots the data files present at plan-build
  * time and attaches a DataFrame reading EXACTLY those files; `postExec`
  * moves/deletes only that snapshot. A file landing between the read and
  * postExec is neither read nor moved — it is ingested by the next run.
  * (Moving the whole directory instead — the naive design — silently
  * destroys late-landing files without ever ingesting them.) */
case class FileIncrementalMoveMode(archivePath: Option[String] = None) extends ExecutionMode {
  /** files captured by the exec-phase apply, consumed by postExec */
  @transient private var processedFiles: Seq[String] = Seq.empty

  override def apply(action: Action, in: SubFeed)(implicit ctx: ActionPipelineContext): SubFeed =
    ctx.registry.dataObject(action.inputIds.head) match {
      case f: SparkFileDataObject =>
        val files = f.listDataFiles
        if (files.isEmpty) throw NoDataToProcessWarning(action.id, s"no files to process for ${action.id}")
        if (ctx.isExecPhase) processedFiles = files
        in.withDataFrame(f.getDataFrameForFiles(files))
      case _ => in
    }

  /** called by the DAG after a successful write; moves only the snapshot */
  override def postExec(action: Action)(implicit ctx: ActionPipelineContext): Unit = {
    import org.apache.hadoop.fs.Path
    ctx.registry.dataObject(action.inputIds.head) match {
      case f: SparkFileDataObject =>
        val conf = ctx.spark.sparkContext.hadoopConfiguration
        val base = new Path(f.path)
        val fs = base.getFileSystem(conf)
        // qualify BOTH sides before prefix-stripping: a relative configured
        // path never prefixes the FS-qualified listing paths, which would
        // silently archive under the full absolute path instead of the
        // partition-relative one
        val baseUri = fs.makeQualified(base).toUri.getPath
        archivePath.foreach(a => require(fs.mkdirs(new Path(a)),
          s"FileIncrementalMoveMode: cannot create archive dir $a"))
        processedFiles.foreach { file =>
          val src = new Path(file)
          archivePath match {
            case Some(a) =>
              // preserve the path relative to the source base so partitioned
              // layouts don't collide in the archive; re-archiving an
              // identically-named file overwrites (idempotent re-run)
              val rel = fs.makeQualified(src).toUri.getPath.stripPrefix(baseUri).stripPrefix("/")
              val dest = new Path(a, rel)
              Option(dest.getParent).foreach(fs.mkdirs)
              if (fs.exists(dest)) require(fs.delete(dest, false),
                s"FileIncrementalMoveMode: cannot replace $dest")
              require(fs.rename(src, dest),
                s"FileIncrementalMoveMode: rename $src -> $dest failed")
            case None =>
              require(fs.delete(src, false),
                s"FileIncrementalMoveMode: delete $src failed")
          }
          // the sibling checksum file is metadata of the moved file only
          val crc = new Path(src.getParent, s".${src.getName}.crc")
          if (fs.exists(crc)) fs.delete(crc, false)
        }
        processedFiles = Seq.empty // (failure path clears via postExecFailed)
        // drop writer markers and, if nothing else landed since the
        // snapshot, the now-empty directory tree (non-recursive deletes:
        // they succeed only when genuinely empty, so a late-landing file
        // keeps its directory alive)
        if (fs.exists(base)) {
          val success = new Path(base, "_SUCCESS")
          if (fs.exists(success)) {
            fs.delete(success, false)
            val scrc = new Path(base, "._SUCCESS.crc")
            if (fs.exists(scrc)) fs.delete(scrc, false)
          }
          def pruneEmptyDirs(p: Path): Unit = {
            fs.listStatus(p).filter(_.isDirectory).foreach(d => pruneEmptyDirs(d.getPath))
            if (fs.listStatus(p).isEmpty) fs.delete(p, false)
          }
          pruneEmptyDirs(base)
        }
      case _ => ()
    }
  }

  /** Failure/skip: forget the snapshot WITHOUT moving anything — the
    * files were not successfully consumed and must be re-read next run. */
  override def postExecFailed(action: Action)(implicit ctx: ActionPipelineContext): Unit =
    processedFiles = Seq.empty
}

/** Committed-offset incremental consumption of a Kafka topic. Reference
  * `sdl-kafka/.../KafkaStateIncrementalMode.scala` (consumer-group commit).
  * Exec-phase `apply` snapshots the topic's CURRENT end offsets, attaches a
  * bounded read [committed, end) — so rows landing during the run are
  * excluded and picked up next run, the same no-gap/no-overlap window
  * discipline as DataObjectStateIncrementalMode — and `postExec` commits
  * the end snapshot as the new consumer state. First run starts from the
  * object's configured `startingOffsets` (default earliest). State rides
  * the CanCreateIncrementalOutput plumbing, so the RunStateStore persists
  * it across process restarts like any other incremental source.
  * @param delayedMaxTimestampExpr optional Spark SQL expression returning
  *        a timestamp (reference `KafkaStateIncrementalMode.scala:39`);
  *        when set, end offsets are bounded to frames with
  *        `timestamp <= expr` — e.g. `now() - interval 1 hour` leaves a
  *        late-arrival safety margin that the NEXT run picks up. */
case class KafkaStateIncrementalMode(delayedMaxTimestampExpr: Option[String] = None)
  extends ExecutionMode {
  @transient private var pendingState: Option[String] = None

  override def apply(action: Action, in: SubFeed)(implicit ctx: ActionPipelineContext): SubFeed =
    ctx.registry.dataObject(action.inputIds.head) match {
      case k: graft.sources.KafkaTopicDataObject =>
        if (ctx.isExecPhase) {
          val start = k.getState.getOrElse(k.startingOffsets)
          val maxTs = delayedMaxTimestampExpr.map(e =>
            ctx.spark.sql(s"SELECT CAST(($e) AS TIMESTAMP)").head.getTimestamp(0))
          val end = k.currentEndOffsets(maxTs)
          pendingState = Some(end)
          in.copy(dataFrame = Some(k.getDataFrameBetween(start, end)))
        } else in
      case o => throw new IllegalArgumentException(
        s"${o.id} is not a KafkaTopicDataObject — KafkaStateIncrementalMode needs one")
    }

  override def postExec(action: Action)(implicit ctx: ActionPipelineContext): Unit =
    ctx.registry.dataObject(action.inputIds.head) match {
      case k: graft.sources.KafkaTopicDataObject =>
        pendingState.foreach(s => k.setState(Some(s)))
        pendingState = None
      case _ => ()
    }

  /** batch identity = the COMMITTED start offsets (the consume-from point
    * names the increment): stable until postExec commits the end snapshot.
    * A rerun that finds MORE rows landed (a later end snapshot) still
    * overwrites the same batch partition with the superset — exactly-once
    * per offset either way. */
  override def batchIdentity(action: Action, applied: SubFeed)
                            (implicit ctx: ActionPipelineContext): Option[String] =
    ctx.registry.dataObject(action.inputIds.head) match {
      case k: graft.sources.KafkaTopicDataObject =>
        Some(ExecutionMode.sanitizeBatchToken("from_" + k.getState.getOrElse(k.startingOffsets)))
      case _ => None
    }
}

/** Committed-version incremental CDC consumption of a
  * [[graft.sources.VersionedTableDataObject]] — the lakehouse CHANGE
  * DATA FEED as a batch-incremental source (the consumer side of the
  * q100 CDC-sink story; Delta's streaming source / CDF read has the
  * same contract). Exec-phase `apply` snapshots the table's CURRENT
  * version and attaches `changesBetween(committed, current)` — typed
  * insert/update/delete rows computed from ONLY the files that changed,
  * never a snapshot scan; commits landing during the run surface next
  * run (no-gap/no-overlap). The FIRST run emits the initial snapshot as
  * `insert` rows (Delta `startingVersion=0` semantics). `postExec`
  * commits the consumed version through the RunStateStore. */
case class CdcIncrementalMode() extends ExecutionMode {
  @transient private var pendingState: Option[String] = None

  override def apply(action: Action, in: SubFeed)(implicit ctx: ActionPipelineContext): SubFeed =
    ctx.registry.dataObject(action.inputIds.head) match {
      case v: graft.sources.VersionedTableDataObject =>
        val to = v.latestVersion.getOrElse(
          throw NoDataToProcessWarning(action.id, s"${v.id}: no committed versions yet"))
        val from = v.getState.map(_.toInt)
        if (ctx.isExecPhase && from.contains(to))
          throw NoDataToProcessWarning(action.id, s"${v.id}: no commits since version $to")
        val df = from match {
          case Some(f) if f != to => v.changesBetween(f, Some(to))
          case None => v.getDataFrameAsOf(Some(to))
            .withColumn("_change_type", org.apache.spark.sql.functions.lit("insert"))
          case _ => // init phase with no new data: schema-only frame
            v.getDataFrameAsOf(Some(to))
              .withColumn("_change_type", org.apache.spark.sql.functions.lit("insert"))
              .limit(0)
        }
        if (ctx.isExecPhase) pendingState = Some(to.toString)
        in.copy(dataFrame = Some(df))
      case o => throw new IllegalArgumentException(
        s"${o.id} is not a VersionedTableDataObject — CdcIncrementalMode needs one")
    }

  override def postExec(action: Action)(implicit ctx: ActionPipelineContext): Unit =
    ctx.registry.dataObject(action.inputIds.head) match {
      case v: graft.sources.VersionedTableDataObject =>
        pendingState.foreach(s => v.setState(Some(s)))
        pendingState = None
      case _ => ()
    }

  /** batch identity = the COMMITTED from-version: stable until postExec
    * commits the consumed version; a rerun spanning extra commits
    * overwrites the same batch partition with the superset. */
  override def batchIdentity(action: Action, applied: SubFeed)
                            (implicit ctx: ActionPipelineContext): Option[String] =
    ctx.registry.dataObject(action.inputIds.head) match {
      case v: graft.sources.VersionedTableDataObject =>
        Some(ExecutionMode.sanitizeBatchToken("fromver_" + v.getState.getOrElse("initial")))
      case _ => None
    }
}

/** Structured Streaming execution. Reference `SparkStreamingMode.scala:40-57`.
  * trigger semantics: None => async ProcessingTime(intervalSec), Once => one
  * synchronous micro-batch per DAG run. */
case class SparkStreamingMode(
    checkpointLocation: String,
    triggerType: String = "Once", // Once | ProcessingTime | AvailableNow
    triggerIntervalSec: Option[Long] = None,
    outputMode: String = "append",
    inputOptions: Map[String, String] = Map.empty,
    outputOptions: Map[String, String] = Map.empty,
    /** how long a ProcessingTime action waits for the query's FIRST
      * micro-batch before handing control downstream (the query keeps
      * running async either way) */
    firstBatchTimeoutSec: Long = 60L) extends ExecutionMode {
  override def apply(action: Action, in: SubFeed)(implicit ctx: ActionPipelineContext): SubFeed = {
    val input = ctx.registry.dataObject(action.inputIds.head) match {
      case s: CanCreateStreamingDataFrame => s
      case o => throw new IllegalArgumentException(s"${o.id} cannot create streaming DataFrame")
    }
    in.copy(dataFrame = Some(input.getStreamingDataFrame(inputOptions, None)), isStreaming = true)
  }
  def trigger: org.apache.spark.sql.streaming.Trigger = triggerType match {
    case "Once" => org.apache.spark.sql.streaming.Trigger.Once()
    case "AvailableNow" => org.apache.spark.sql.streaming.Trigger.AvailableNow()
    case "ProcessingTime" => org.apache.spark.sql.streaming.Trigger.ProcessingTime(
      java.util.concurrent.TimeUnit.SECONDS.toMillis(triggerIntervalSec.getOrElse(10L)))
    case other => throw new IllegalArgumentException(s"unknown trigger $other")
  }
}

/** User-defined mode. Reference `CustomMode.scala:39-61`. */
case class CustomMode(fn: (Action, SubFeed, ActionPipelineContext) => SubFeed) extends ExecutionMode {
  override def apply(action: Action, in: SubFeed)(implicit ctx: ActionPipelineContext): SubFeed =
    fn(action, in, ctx)
}

/** User logic selects the PARTITIONS to process. Reference
  * `CustomPartitionMode.scala:40-85` (user class maps input/output
  * partition listings to the set to run). The returned values ride the
  * SubFeed as the read filter, so the input scan prunes to exactly those
  * partitions — selection is metadata-only, no data pass. */
case class CustomPartitionMode(fn: (Action, ActionPipelineContext) => Seq[PartitionValues]) extends ExecutionMode {
  override def apply(action: Action, in: SubFeed)(implicit ctx: ActionPipelineContext): SubFeed =
    in.copy(partitionValues = fn(action, ctx))
}
