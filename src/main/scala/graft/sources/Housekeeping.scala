package graft.sources

import graft.core._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Housekeeping on partitioned DataObjects. Reference:
  * `sdl-core/definitions/HousekeepingMode.scala:49-151`
  * (`PartitionRetentionMode`, `PartitionArchiveCompactionMode`) and
  * `util/misc/CompactionUtil.scala` (132 LoC).
  *
  * Both modes operate on the PARTITION LIST (driver-side, thousands of
  * rows) to decide, and on Spark scans to move data — a retention sweep of
  * a 100 TB table deletes directories without reading them; archiving
  * reads only the partitions being re-binned.
  */
sealed trait HousekeepingMode {
  def exec(obj: SparkFileDataObject)(implicit ctx: ActionPipelineContext): Unit
}

/** Delete partitions for which `retentionCondition` (SQL boolean over the
  * partition columns, e.g. `dt >= '2024-01-01'`) is false.
  *
  * `streamingCheckpoint`: set it when the object is a STREAMING sink keyed
  * by `batchIdColumn` ([[graft.operators.StreamingIncrementalDedupAction]]'s
  * layout) — the mode then reads the checkpoint's commit log and refuses to
  * touch any partition the stream could still replay (batchId >= the last
  * committed one), regardless of what `retentionCondition` says. Without
  * the clamp an over-aggressive condition can delete/re-bin a partition a
  * replay is about to overwrite — and a re-binned partition's rows lose
  * their batchId, so the replay's own-partition exclusion no longer hides
  * them and the batch sees its own rows as store content (the silent
  * first-poster-loss class). */
case class PartitionRetentionMode(retentionCondition: String,
                                  streamingCheckpoint: Option[String] = None,
                                  batchIdColumn: String = "ingest_batch") extends HousekeepingMode {
  override def exec(obj: SparkFileDataObject)(implicit ctx: ActionPipelineContext): Unit = {
    val expired = Housekeeping.clampToCheckpoint(
      Housekeeping.evalPartitions(obj.listPartitions, obj.partitions,
        s"NOT ($retentionCondition)"),
      streamingCheckpoint, batchIdColumn, obj)
    obj.deletePartitions(expired)
  }
}

/** Re-bin old partitions into coarser archive partitions and/or compact
  * partition files.
  *
  * @param archiveCondition SQL boolean over partition cols selecting
  *                         partitions to archive
  * @param archiveExpression SQL `named_struct(...)` over partition cols
  *                          computing the TARGET partition values
  * @param compactCondition  SQL boolean selecting partitions to rewrite
  *                          into `compactNumFiles` files
  * @param streamingCheckpoint clamp for streaming sinks — partitions the
  *                          checkpoint can still replay (`batchIdColumn`
  *                          >= last committed batch) are never archived,
  *                          compacted, or re-binned, whatever the
  *                          conditions select (see
  *                          [[PartitionRetentionMode.streamingCheckpoint]])
  */
case class PartitionArchiveCompactionMode(
    archiveCondition: Option[String] = None,
    archiveExpression: Option[String] = None,
    compactCondition: Option[String] = None,
    compactNumFiles: Int = 1,
    streamingCheckpoint: Option[String] = None,
    batchIdColumn: String = "ingest_batch") extends HousekeepingMode {

  override def exec(obj: SparkFileDataObject)(implicit ctx: ActionPipelineContext): Unit = {
    archiveCondition.zip(archiveExpression).foreach { case (cond, exprStr) =>
      val toArchive = Housekeeping.clampToCheckpoint(
        Housekeeping.evalPartitions(obj.listPartitions, obj.partitions, cond),
        streamingCheckpoint, batchIdColumn, obj)
      if (toArchive.nonEmpty) {
        val targets = Housekeeping.evalStruct(toArchive, obj.partitions, exprStr)
        toArchive.zip(targets).filter { case (src, tgt) => src != tgt }
          .groupBy(_._2).foreach { case (target, group) =>
            val sources = group.map(_._1)
            val df = obj.getDataFrame(sources)
            // re-stamp partition columns to the archive values — as STRINGS:
            // partition dirs are strings on disk, and casting an archive
            // value (e.g. '2024-01') into an inferred finer type (DateType
            // from '2024-01-01' dirs) would null it into the hive default
            // partition
            val restamped = target.elements.foldLeft(df) { case (d, (c, v)) =>
              d.withColumn(c, lit(v))
            }
            obj.writeDataFrame(restamped, Seq(target), Some(SdlSaveMode.Append))
            obj.deletePartitions(sources)
          }
      }
    }
    compactCondition.foreach { cond =>
      val toCompact = Housekeeping.clampToCheckpoint(
        Housekeeping.evalPartitions(obj.listPartitions, obj.partitions, cond),
        streamingCheckpoint, batchIdColumn, obj)
      toCompact.foreach { pv =>
        val df = obj.getDataFrame(Seq(pv)).repartition(compactNumFiles)
        // stage-and-swap the single partition directory
        Housekeeping.rewritePartition(obj, pv, df)
      }
    }
  }
}

/** Compact an UNPARTITIONED DataObject's directory once it has accumulated
  * at least `minFiles` data files — the append-only fingerprint/signature
  * STORE shape: every ingestion batch moves one file set in
  * ([[SparkFileDataObject.writeDataFrameStagedAppend]]), so after N batches
  * the store is N file sets of mostly-tiny files. Triggered from the write
  * path's housekeeping hook; rewrites the whole directory into
  * `targetNumFiles` via the staged swap (read committed state → staging →
  * atomic-ish swap), so a crash mid-compaction leaves the old store intact.
  *
  * Cost note: a triggered compaction reads+writes the FULL store (that is
  * what compaction is); with the `minFiles` threshold the amortized cost
  * per appended batch is O(store / minFiles). Size `minFiles` so that
  * rewrites stay rare relative to batches (e.g. 64 for per-minute batches),
  * or partition the store by an ingest-batch bucket and use
  * [[PartitionArchiveCompactionMode]] to re-bin old partitions instead —
  * that keeps every rewrite bounded by a bucket, not the store. */
case class FileCompactionMode(minFiles: Int = 16, targetNumFiles: Int = 1)
  extends HousekeepingMode {
  require(minFiles >= 2 && targetNumFiles >= 1, "FileCompactionMode: minFiles >= 2, targetNumFiles >= 1")
  override def exec(obj: SparkFileDataObject)(implicit ctx: ActionPipelineContext): Unit = {
    require(obj.partitions.isEmpty,
      s"FileCompactionMode on ${obj.id}: directory compaction is for unpartitioned stores — " +
        "partitioned objects should re-bin via PartitionArchiveCompactionMode")
    if (obj.exists && obj.listDataFiles.size >= minFiles)
      obj.writeDataFrameStaged(obj.getDataFrame().repartition(targetNumFiles))
  }
}

object Housekeeping {
  /** The last batchId the Structured Streaming checkpoint at `cp` has
    * COMMITTED — the largest numeric file name under `<cp>/commits/`
    * (the commit log writes one file per completed batch; on restart the
    * stream re-runs everything AFTER it). None when the checkpoint or its
    * commit log doesn't exist yet. Driver-side listing only — the
    * checkpoint is small by construction. */
  def lastCommittedBatchId(cp: String)(implicit ctx: ActionPipelineContext): Option[Long] = {
    import org.apache.hadoop.fs.Path
    val commits = new Path(cp, "commits")
    val fs = commits.getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(commits)) None
    else fs.listStatus(commits).toSeq
      .flatMap(st => st.getPath.getName.toLongOption)
      .maxOption
  }

  /** Drop from `selected` every partition the stream at
    * `streamingCheckpoint` could still REPLAY: batchId >= the last
    * committed batch (the last committed one itself stays protected too —
    * the conservative boundary costs one extra partition and removes any
    * dependence on commit-write ordering). Replayable partitions must not
    * be deleted, re-binned, or rewritten: a replay overwrites exactly its
    * own `batchIdColumn` leaf and excludes it from the store view —
    * housekeeping that moved those rows under another value breaks both
    * halves of that contract. Conservative on the edges: no commit log
    * yet → EVERYTHING is replayable (act on nothing); a partition value
    * that doesn't parse as a batchId → protected. No-op when
    * `streamingCheckpoint` is unset (the batch-path modes). */
  def clampToCheckpoint(selected: Seq[PartitionValues], streamingCheckpoint: Option[String],
                        batchIdColumn: String, obj: SparkFileDataObject)
                       (implicit ctx: ActionPipelineContext): Seq[PartitionValues] =
    streamingCheckpoint match {
      case None => selected
      case Some(cp) =>
        require(obj.partitions.contains(batchIdColumn),
          s"Housekeeping on ${obj.id}: streamingCheckpoint clamp needs the object " +
            s"partitioned by '$batchIdColumn' (got ${obj.partitions.mkString("[", ",", "]")})")
        lastCommittedBatchId(cp) match {
          case None => Seq.empty // nothing committed yet — everything replayable
          case Some(last) => selected.filter(pv =>
            pv.elements.get(batchIdColumn).flatMap(_.toLongOption).exists(_ < last))
        }
    }

  /** evaluate a SQL boolean over the partition columns, returning matching
    * partition values (driver-side list, Spark-evaluated expression) */
  def evalPartitions(pvs: Seq[PartitionValues], cols: Seq[String], condition: String)
                    (implicit ctx: ActionPipelineContext): Seq[PartitionValues] = {
    if (pvs.isEmpty) return Seq.empty
    df(pvs, cols).where(expr(condition)).collect().toSeq
      .map(r => PartitionValues(cols.map(c => c -> r.getAs[String](c)).toMap))
  }

  /** evaluate a named_struct expression over partition cols per partition */
  def evalStruct(pvs: Seq[PartitionValues], cols: Seq[String], structExpr: String)
                (implicit ctx: ActionPipelineContext): Seq[PartitionValues] = {
    df(pvs, cols).select(expr(structExpr).as("t")).collect().toSeq.map { r =>
      val s = r.getStruct(0)
      PartitionValues(s.schema.fieldNames.map(f => f -> String.valueOf(s.getAs[Any](f))).toMap)
    }
  }

  private def df(pvs: Seq[PartitionValues], cols: Seq[String])
                (implicit ctx: ActionPipelineContext): DataFrame = {
    val rows = pvs.map(pv => Row.fromSeq(cols.map(pv.elements.getOrElse(_, null))))
    ctx.spark.createDataFrame(
      ctx.spark.sparkContext.parallelize(rows, 1),
      StructType(cols.map(StructField(_, StringType))))
  }

  /** rewrite ONE partition's files from `df` via stage-and-swap */
  def rewritePartition(obj: SparkFileDataObject, pv: PartitionValues, df: DataFrame)
                      (implicit ctx: ActionPipelineContext): Unit = {
    import org.apache.hadoop.fs.Path
    val rel = pv.asPath(obj.partitions)
    require(rel.nonEmpty, s"DataObject ${obj.id}: cannot rewrite unpartitioned path this way")
    val partDir = new Path(obj.path, rel)
    // HIDDEN staging dir (underscore prefix): a sibling named
    // 'dt=X_graft_compact' would be visible to concurrent reads during
    // the swap window (rows doubled, phantom partition value) and to
    // listPartitions forever after a crash — '_' dirs are excluded by
    // Spark's file listing and this object's own filters
    val staging = new Path(obj.path, s"_graft_compact_${rel.replace('/', '_')}")
    val fs = partDir.getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)
    // write WITHOUT partition columns (they're encoded in the path)
    df.drop(obj.partitions: _*).write.format(obj.format).options(obj.options)
      .mode("overwrite").save(staging.toString)
    // Hadoop delete/rename fail by returning false — unchecked, a failed
    // swap would silently lose the partition
    require(fs.delete(partDir, true) || !fs.exists(partDir),
      s"DataObject ${obj.id}: compaction could not delete $partDir")
    require(fs.rename(staging, partDir),
      s"DataObject ${obj.id}: compaction rename $staging -> $partDir failed; data preserved in staging")
  }
}
