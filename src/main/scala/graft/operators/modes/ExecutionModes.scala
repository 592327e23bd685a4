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

/** Process partitions present in the main input but missing in the main
  * output. Reference `executionMode/PartitionDiffMode.scala:61-170`.
  *
  * @param partitionColNb        only compare the first n partition columns
  * @param nbOfPartitionValuesPerRun batch size per run (oldest first)
  * @param applyCondition        SQL over struct(givenPartitionValues…) gating the mode
  */
case class PartitionDiffMode(
    partitionColNb: Option[Int] = None,
    nbOfPartitionValuesPerRun: Option[Int] = None,
    failConditionOnMissingInput: Boolean = false) extends ExecutionMode {

  override def apply(action: Action, in: SubFeed)(implicit ctx: ActionPipelineContext): SubFeed = {
    val input = ctx.registry.dataObject(action.inputIds.head) match {
      case p: CanHandlePartitions => p
      case o => throw new IllegalArgumentException(s"PartitionDiffMode needs partitioned input, got ${o.id}")
    }
    val output = ctx.registry.dataObject(action.outputIds.head) match {
      case p: CanHandlePartitions => p
      case o => throw new IllegalArgumentException(s"PartitionDiffMode needs partitioned output, got ${o.id}")
    }
    val cols = partitionColNb.map(n => input.partitions.take(n)).getOrElse(input.partitions)
    def truncate(pv: PartitionValues): PartitionValues =
      PartitionValues(pv.elements.view.filterKeys(cols.contains).toMap)
    val inParts = input.listPartitions.map(truncate).distinct
    val outParts = output.listPartitions.map(truncate).toSet
    val missing0 = inParts.filterNot(outParts.contains)
    val missing = nbOfPartitionValuesPerRun
      .map(n => missing0.sortBy(_.asPath(cols)).take(n)).getOrElse(missing0)
    if (missing.isEmpty) throw NoDataToProcessWarning(action.id, s"no new partitions for ${action.id}")
    in.copy(partitionValues = missing, dataFrame = None)
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
    val output = ctx.registry.dataObject(action.outputIds.head)
    val watermark = output match {
      case c: CanCreateDataFrame =>
        val existsData = output match {
          case f: SparkFileDataObject => f.exists
          // a fresh table target must mean "no watermark yet" — probing it
          // with getDataFrame would throw TABLE_OR_VIEW_NOT_FOUND on the
          // very first incremental run
          case t: graft.sources.TableDataObject => t.isTableExisting
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
  * the run state. Reference `DataObjectStateIncrementalMode.scala:31-60`. */
case class DataObjectStateIncrementalMode() extends ExecutionMode {
  override def apply(action: Action, in: SubFeed)(implicit ctx: ActionPipelineContext): SubFeed = {
    ctx.registry.dataObject(action.inputIds.head) match {
      case inc: CanCreateIncrementalOutput =>
        // state is loaded/saved by the DAG run (RunStateStore); mode itself
        // just requires the capability.
        in
      case o => throw new IllegalArgumentException(s"${o.id} does not support incremental state")
    }
  }
  /** Advance the file-object watermark to the max data-file modification
    * time just processed — the next run's read then carries
    * `modifiedAfter` and touches only newer files. Strictly-after
    * semantics match Spark's filter and the reference: the boundary file
    * itself is excluded. A file landing between the exec read and this
    * listing with an older-or-equal mod time would be skipped — the same
    * inherent race the reference's mod-time increments have; sources with
    * self-managed offsets (Kafka/JDBC) advance their own state instead. */
  override def postExec(action: Action)(implicit ctx: ActionPipelineContext): Unit =
    ctx.registry.dataObject(action.inputIds.head) match {
      case f: SparkFileDataObject =>
        val p = new org.apache.hadoop.fs.Path(f.path)
        val fs = p.getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) {
          val it = fs.listFiles(p, true)
          var maxT = -1L
          while (it.hasNext) {
            val s = it.next()
            val n = s.getPath.getName
            if (!n.startsWith("_") && !n.startsWith("."))
              maxT = math.max(maxT, s.getModificationTime)
          }
          // modifiedAfter is parsed in the SESSION timezone — format the
          // state string in the same zone or the threshold shifts
          val zone = java.time.ZoneId.of(ctx.spark.conf.get(
            "spark.sql.session.timeZone", java.util.TimeZone.getDefault.getID))
          if (maxT >= 0) f.setState(Some(
            java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")
              .withZone(zone).format(java.time.Instant.ofEpochMilli(maxT))))
        }
      case _ => ()
    }
}

/** Process files then delete (or archive) inputs. Reference
  * `FileIncrementalMoveMode.scala`. */
case class FileIncrementalMoveMode(archivePath: Option[String] = None) extends ExecutionMode {
  override def apply(action: Action, in: SubFeed)(implicit ctx: ActionPipelineContext): SubFeed = in
  /** called by the DAG after a successful write */
  override def postExec(action: Action)(implicit ctx: ActionPipelineContext): Unit = {
    import org.apache.hadoop.fs.Path
    ctx.registry.dataObject(action.inputIds.head) match {
      case f: SparkFileDataObject =>
        val conf = ctx.spark.sparkContext.hadoopConfiguration
        val src = new Path(f.path)
        val fs = src.getFileSystem(conf)
        archivePath match {
          case Some(a) => fs.rename(src, new Path(a))
          case None => fs.delete(src, true)
        }
      case _ => ()
    }
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
    outputOptions: Map[String, String] = Map.empty) extends ExecutionMode {
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
