package graft.sources

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.hadoop.fs.{FileSystem, Path}

/** Named dataset: location + format (+ connection). Capabilities are mixed
  * in as traits exactly like the reference
  * (`sdl-core/workflow/dataobject/DataObject.scala:1-166`).
  */
trait DataObject {
  def id: String
  /** Config/endpoint validation; called in phase Prepare. */
  def prepare(implicit ctx: ActionPipelineContext): Unit = ()
}

/** Reference `CanCreateDataFrame.scala`. */
trait CanCreateDataFrame { this: DataObject =>
  def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                  (implicit ctx: ActionPipelineContext): DataFrame
}

/** Reference `CanWriteDataFrame.scala`. */
trait CanWriteDataFrame { this: DataObject =>
  def writeDataFrame(df: DataFrame, partitionValues: Seq[PartitionValues] = Seq.empty,
                     saveMode: Option[SdlSaveMode] = None)
                    (implicit ctx: ActionPipelineContext): ActionMetrics
  /** Init-phase hook: validate schema without moving data. */
  def initWrite(df: DataFrame)(implicit ctx: ActionPipelineContext): Unit = ()
  /** Overwrite with a plan that may READ THIS OBJECT's current data
    * (dedup/historize read-modify-write). Plain Overwrite would truncate
    * the source before the plan runs (JDBC drops the table first; Hive
    * refuses). Sinks with a real staging path override this; the fallback
    * materializes the plan into the block manager before overwriting.
    * Reference solves the same with TickTockHiveTableDataObject:94-173. */
  def writeDataFrameStaged(df: DataFrame)(implicit ctx: ActionPipelineContext): ActionMetrics = {
    import org.apache.spark.storage.StorageLevel
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    cached.count() // force full materialization — the write below must not re-read this object
    try writeDataFrame(cached, Seq.empty, Some(SdlSaveMode.Overwrite))
    finally cached.unpersist()
  }
  /** APPEND an increment computed from a plan that may READ THIS OBJECT's
    * current data — the store-growth shape of incremental dedup: the delta
    * is derived from a join against the store being grown. Per-call write
    * volume is O(increment), never O(current state) — the staged-overwrite
    * alternative rewrites the full store every batch, which under
    * continuous ingestion is quadratic cumulative I/O. Sinks with a real
    * staging path override this; the fallback materializes the increment
    * into the block manager before appending. */
  def writeDataFrameStagedAppend(df: DataFrame)(implicit ctx: ActionPipelineContext): ActionMetrics = {
    import org.apache.spark.storage.StorageLevel
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    cached.count() // force materialization — the append must not re-read this object mid-write
    try writeDataFrame(cached, Seq.empty, Some(SdlSaveMode.Append))
    finally cached.unpersist()
  }
}

/** Reference `CanCreateStreamingDataFrame.scala`. */
trait CanCreateStreamingDataFrame { this: DataObject =>
  def getStreamingDataFrame(options: Map[String, String], schema: Option[StructType])
                           (implicit ctx: ActionPipelineContext): DataFrame
}

/** Reference `CanWriteStreamingDataFrame` (part of CanWriteDataFrame in ref). */
trait CanWriteStreamingDataFrame { this: DataObject =>
  def writeStreamingDataFrame(df: DataFrame, trigger: org.apache.spark.sql.streaming.Trigger,
                              options: Map[String, String], checkpointLocation: String,
                              queryName: String, outputMode: String = "append")
                             (implicit ctx: ActionPipelineContext): org.apache.spark.sql.streaming.StreamingQuery
}

/** Upsert by primary key. Reference `CanMergeDataFrame.scala:24`. */
trait CanMergeDataFrame { this: DataObject =>
  def mergeDataFrame(df: DataFrame, joinCols: Seq[String],
                     options: SaveModeMergeOptions = SaveModeMergeOptions())
                    (implicit ctx: ActionPipelineContext): ActionMetrics
}

/** Schema evolution on write. Reference `CanEvolveSchema.scala`. */
trait CanEvolveSchema { this: DataObject => }

/** Partition handling. Reference `CanHandlePartitions.scala:52-96`. */
trait CanHandlePartitions { this: DataObject =>
  def partitions: Seq[String]
  def listPartitions(implicit ctx: ActionPipelineContext): Seq[PartitionValues]
  def deletePartitions(pvs: Seq[PartitionValues])(implicit ctx: ActionPipelineContext): Unit = ()
  /** expression evaluated per partition-values row to select partitions to keep */
  def retentionCondition: Option[String] = None
}

/** Source supports incremental output via stored state (offsets, mod-time…).
  * Reference `CanCreateIncrementalOutput.scala`. */
trait CanCreateIncrementalOutput { this: DataObject =>
  def setState(state: Option[String])(implicit ctx: ActionPipelineContext): Unit
  def getState: Option[String]
}

/** Base for Hadoop-FS-backed file DataObjects: path handling, partition
  * dir listing/pruning, save modes, filename column, mod-time increments.
  * Reference: `sdl-core/workflow/dataobject/SparkFileDataObject.scala:60-596`
  * and `HadoopFileDataObject`.
  *
  * Scale notes:
  *  - reads use one `.load(basePath)` plus partition *filters* (never a
  *    driver-side list of files) so Catalyst prunes directories and the
  *    scan parallelism follows `spark.sql.files.maxPartitionBytes`;
  *  - `OverwriteOptimized` maps to Spark dynamic partition overwrite so a
  *    100 TB table is never fully rewritten for a 1-partition load.
  */
abstract class SparkFileDataObject extends DataObject
    with CanCreateDataFrame with CanWriteDataFrame with CanHandlePartitions
    with CanCreateStreamingDataFrame with CanWriteStreamingDataFrame
    with CanCreateIncrementalOutput {

  def path: String
  def format: String
  def options: Map[String, String] = Map.empty
  def partitions: Seq[String] = Seq.empty
  def schemaMin: Option[StructType] = None
  def schema: Option[StructType] = None
  /** If set, adds a column with the input file name (reference
    * `SparkFileDataObject.filenameColumn`). */
  def filenameColumn: Option[String] = None
  /** Repartition to this many files per written partition (reference
    * `util/hdfs/SparkRepartitionDef.scala`). */
  def numberOfTasksPerPartition: Option[Int] = None
  /** row-level constraints checked during write (reference attaches them to
    * the DataObject config, `Constraint.scala`) */
  def constraints: Seq[graft.quality.Constraint] = Seq.empty
  /** dataset-level expectations validated on write (reference
    * `Expectation.scala`) */
  def expectations: Seq[graft.quality.Expectation] = Seq.empty
  /** post-write housekeeping (partition retention / archive+compaction),
    * reference `HousekeepingMode.scala:49-151` */
  def housekeepingMode: Option[HousekeepingMode] = None

  protected var incrementalState: Option[String] = None
  override def setState(state: Option[String])(implicit ctx: ActionPipelineContext): Unit =
    incrementalState = state
  override def getState: Option[String] = incrementalState

  /** '_'/'.'-prefixed names are HIDDEN to Spark's file listing (and to
    * [[exists]]): a partition column named `_x` writes `_x=...`
    * directories that every subsequent read silently skips — the data
    * looks lost with no error anywhere. Fail loudly at first read/write
    * instead (lazy, not constructor-time: subclass vals aren't
    * initialized during the superclass constructor). */
  private lazy val partitionNamesValidated: Unit =
    partitions.foreach(p => require(!p.startsWith("_") && !p.startsWith("."),
      s"DataObject $id: partition column '$p' would create '_'/'.'-prefixed directories, " +
        "which Spark's file listing treats as hidden — every read would silently skip " +
        "the written data; use a name without a leading underscore/dot"))

  /** Exclusive mod-time upper bound for reads (`modifiedBefore`), set by
    * DataObjectStateIncrementalMode for the duration of one exec read so
    * the persisted watermark and the data actually read agree exactly —
    * files landing during the read fall outside the bound and are picked
    * up by the next run instead of being silently skipped. */
  protected var readUpperBound: Option[String] = None
  def setReadUpperBound(ts: Option[String]): Unit = readUpperBound = ts

  /** guards against housekeeping re-triggering itself via its own writes */
  @transient protected var inHousekeeping: Boolean = false

  protected def hadoopPath = new Path(path)
  protected def fs(implicit ctx: ActionPipelineContext): FileSystem =
    hadoopPath.getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)

  override def prepare(implicit ctx: ActionPipelineContext): Unit = {
    // like reference SparkFileDataObject.prepare: verify path parent accessible
    ()
  }

  /** schema-on-read formats benefit from the persisted schema file (no
    * inference scan); self-describing formats carry their own */
  private def isSelfDescribing: Boolean =
    format == "parquet" || format == "orc" || format == "avro"

  /** formats whose readers resolve columns BY NAME and null-fill missing
    * ones when given an explicit schema — the property append-evolution
    * relies on (csv is positional, avro strict about missing fields) */
  private def schemaEvolvable: Boolean =
    format == "parquet" || format == "orc" || format == "json"

  private def samplePath = new Path(hadoopPath, ".sample")

  /** Schema inference from a persisted `.sample` data file (reference
    * `SparkFileDataObject.scala:133-136,162-170`): one tiny file read
    * instead of a full-directory inference scan. Used only when neither a
    * declared schema nor a persisted schema file is available. */
  private def inferSchemaFromSample(implicit ctx: ActionPipelineContext): Option[StructType] =
    if (!fs.exists(samplePath)) None
    else try Some(ctx.spark.read.format(format).options(options).load(samplePath.toString).schema)
    catch { case _: Exception => None }

  /** Persist a small `.sample` data file for later inference-free reads
    * (reference creates it through file-based actions when no schema is
    * defined). Reads back a bounded slice of the just-written data. */
  def persistSample(sampleSize: Int = 20)(implicit ctx: ActionPipelineContext): Unit =
    if (!isSelfDescribing && exists)
      ctx.spark.read.format(format).options(options).load(path).limit(sampleSize)
        .coalesce(1).write.format(format).options(options)
        .mode("overwrite").save(samplePath.toString)

  protected def reader(implicit ctx: ActionPipelineContext) = {
    val r = ctx.spark.read.format(format).options(options)
    // incremental by file modification time (reference SparkFileDataObject.scala:241-254)
    val r1 = incrementalState.fold(r)(ts => r.option("modifiedAfter", ts))
    val r2 = readUpperBound.fold(r1)(ts => r1.option("modifiedBefore", ts))
    // resolution order mirrors the reference (SparkFileDataObject.scala:125-140):
    // declared schema → persisted schema file → sample-file inference →
    // full inference scan. Parquet/orc ALSO consult the persisted schema:
    // after an append-evolution the union schema lives there, and footer
    // inference from one file would silently drop the other files' columns.
    val effectiveSchema = schema.orElse(
      if (isSelfDescribing && !schemaEvolvable) None
      else if (isSelfDescribing) SchemaUtil.readPersistedSchema(path)
      else SchemaUtil.readPersistedSchema(path).orElse(inferSchemaFromSample))
    effectiveSchema.fold(r2)(s => r2.schema(s))
  }

  override def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                           (implicit ctx: ActionPipelineContext): DataFrame = {
    partitionNamesValidated
    if (!exists) {
      // empty frame with declared schema, mirrors reference handling of missing data
      val s = schema.orElse(schemaMin).getOrElse(
        throw new IllegalStateException(s"DataObject $id: path $path does not exist and no schema defined"))
      return ctx.spark.createDataFrame(ctx.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    }
    val base =
      if (partitions.nonEmpty) reader.option("basePath", path).load(path)
      else reader.load(path)
    // partition pruning: emit a filter; Catalyst turns it into directory pruning
    val pruned = PartitionValues.filterExpr(partitionValues).fold(base)(base.filter _)
    val named = filenameColumn.fold(pruned)(c => pruned.withColumn(c, input_file_name()))
    validateSchemaMin(named)
    named
  }

  /** Recursive listing of the data files under `path` (hidden/_-prefixed
    * components excluded, same rule as [[exists]]) — the snapshot
    * FileIncrementalMoveMode reads and later consumes. */
  def listDataFiles(implicit ctx: ActionPipelineContext): Seq[String] =
    if (!fs.exists(hadoopPath)) Seq.empty
    else {
      val baseUri = hadoopPath.toUri.getPath
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = fs.listFiles(hadoopPath, true)
      while (it.hasNext) {
        val st = it.next()
        val rel = st.getPath.toUri.getPath.stripPrefix(baseUri).stripPrefix("/")
        if (rel.split('/').forall(c => !c.startsWith("_") && !c.startsWith(".")))
          out += st.getPath.toString
      }
      out.toSeq
    }

  /** Read EXACTLY the given files (a [[listDataFiles]] snapshot) — the
    * file-granular read FileIncrementalMoveMode pins its postExec move to,
    * so files landing after the snapshot are neither read nor consumed. */
  def getDataFrameForFiles(files: Seq[String])(implicit ctx: ActionPipelineContext): DataFrame = {
    require(files.nonEmpty, s"DataObject $id: empty file list")
    val base =
      if (partitions.nonEmpty) reader.option("basePath", path).load(files: _*)
      else reader.load(files: _*)
    val named = filenameColumn.fold(base)(c => base.withColumn(c, input_file_name()))
    validateSchemaMin(named)
    named
  }

  /** true only if the path holds actual data files — an existing-but-empty
    * directory (fresh target) must read as "no existing data" or reads of
    * it fail schema inference (reference `SparkFileDataObject` no-data
    * handling). Hidden/_-prefixed files (_SUCCESS, .crc) don't count. */
  def exists(implicit ctx: ActionPipelineContext): Boolean =
    fs.exists(hadoopPath) && {
      val it = fs.listFiles(hadoopPath, true)
      val baseUri = hadoopPath.toUri.getPath
      var found = false
      while (!found && it.hasNext) {
        // hidden check applies to every path component under the base
        // (e.g. files inside a .schema/ metadata dir are not data)
        val rel = it.next().getPath.toUri.getPath.stripPrefix(baseUri).stripPrefix("/")
        found = rel.split('/').forall(c => !c.startsWith("_") && !c.startsWith("."))
      }
      found
    }

  protected def validateSchemaMin(df: DataFrame): Unit = schemaMin.foreach { s =>
    val missing = s.fields.filterNot(f => df.schema.fieldNames.contains(f.name))
    require(missing.isEmpty, s"DataObject $id: columns ${missing.map(_.name).mkString(",")} missing (schemaMin)")
  }

  override def initWrite(df: DataFrame)(implicit ctx: ActionPipelineContext): Unit =
    validateSchemaMin(df)

  override def writeDataFrame(df: DataFrame, partitionValues: Seq[PartitionValues] = Seq.empty,
                              saveMode: Option[SdlSaveMode] = None)
                             (implicit ctx: ActionPipelineContext): ActionMetrics = {
    partitionNamesValidated
    validateSchemaMin(df)
    val mode = saveMode.getOrElse(SdlSaveMode.Overwrite)
    val t0 = System.currentTimeMillis()
    // append-evolution (CanEvolveSchema, parquet/orc): align a drifted feed
    // to the union schema and persist it so reads see every file's columns
    // (footer inference from one file would silently drop the others');
    // changed column TYPES need a rewrite, not an append
    // Drift compare excludes partition columns on BOTH sides: they live in
    // directory names, not data files, so their read-side types come from
    // directory inference (dt='2024-01-01' reads back as date while the feed
    // carries string) and their read-side position is always trailing — a
    // partitioned append with identical file schemas would otherwise
    // false-trip the drift check.
    def driftSchemas(): (StructType, StructType) = {
      val dropExisting = partitions.toSet ++ filenameColumn.toSet
      val existing = StructType(getDataFrame().schema.fields
        .filterNot(f => dropExisting.contains(f.name)))
      val feed = StructType(df.schema.fields.filterNot(f => partitions.contains(f.name)))
      (existing, feed)
    }
    val dfEff =
      if (mode == SdlSaveMode.Append && schemaEvolvable &&
          this.isInstanceOf[CanEvolveSchema] && exists) {
        val (existingSchema, feedSchema) = driftSchemas()
        if (!graft.functions.SchemaEvolution.hasSchemaChanged(existingSchema, feedSchema)) df
        else {
          val merged = graft.functions.SchemaEvolution.mergedSchema(existingSchema, feedSchema)
          val typeChanged = existingSchema.fields.filter(f =>
            merged.fields.exists(m => m.name == f.name && m.dataType != f.dataType))
          require(typeChanged.isEmpty,
            s"DataObject $id: append with changed column types " +
              s"${typeChanged.map(_.name).mkString(",")} requires a rewrite (use Overwrite)")
          // re-attach partition columns (excluded from the compare) so
          // partitionBy still finds them in the aligned frame
          val target = StructType(
            merged.fields ++ df.schema.fields.filter(f => partitions.contains(f.name)))
          graft.functions.SchemaEvolution.alignTo(df, target)
        }
      } else if (mode == SdlSaveMode.Append && exists &&
          !this.isInstanceOf[RelaxedCsvFileDataObject]) {
        // non-evolvable formats must match: csv is positional (one schema
        // cannot read mixed-header files — old rows would misparse into the
        // wrong columns), avro is strict about missing fields. Avro/json
        // resolve fields by NAME, so column order is not drift for them;
        // csv keeps order-sensitivity. RelaxedCsv is exempt — drifting
        // headers are its whole purpose.
        val (existingSchema, feedSchema) = driftSchemas()
        def byName(s: StructType) = StructType(s.fields.sortBy(_.name))
        val (e, n) =
          if (format == "csv") (existingSchema, feedSchema)
          else (byName(existingSchema), byName(feedSchema))
        require(!graft.functions.SchemaEvolution.hasSchemaChanged(e, n),
          s"DataObject $id: append with a drifted schema on format '$format' would corrupt " +
            "reads — use Overwrite, or a parquet/orc object for append-evolution")
        df
      } else df
    // data quality: constraints ride along the write (raise_error on
    // violation), Job-scope expectations via a second observe — zero scans
    val constrained = graft.quality.DataQualityValidation.applyConstraints(dfEff, constraints)
    val (instrumented, expObs) =
      graft.quality.DataQualityValidation.observeExpectations(constrained, expectations)
    // count via observe so we don't pay a second scan for metrics
    val obs = org.apache.spark.sql.Observation(s"graft_write_${id}_${System.nanoTime()}")
    val observed = instrumented.observe(obs, count(lit(1)).as("records_written"))
    val repartitioned = numberOfTasksPerPartition.fold(observed) { n =>
      if (partitions.nonEmpty) observed.repartition(n, partitions.map(col): _*)
      else observed.repartition(n)
    }
    val writer0 = repartitioned.write.format(format).options(options)
    // pin the overwrite mode PER WRITE: the writer option overrides the
    // session conf, so a concurrent JDBC/Hive dynamic overwrite (which
    // must set the SESSION conf for its analysis-time check) can never
    // leak dynamic semantics into this static overwrite — partitions
    // absent from the feed are meant to be dropped here
    val writer = if (partitions.nonEmpty)
      writer0.partitionBy(partitions: _*).option("partitionOverwriteMode", "static")
    else writer0
    // stage metrics per write (reference SparkStageMetricsListener)
    val (_, stageMetrics) = StageMetrics.collect(ctx.spark.sparkContext, id) {
      mode match {
        case SdlSaveMode.OverwriteOptimized if partitions.nonEmpty =>
          // dynamic partition overwrite: only rewrite partitions present in df
          writer.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .save(path)
        case SdlSaveMode.OverwritePreserveDirectories =>
          // full overwrite that deletes FILES but keeps the directory tree
          // (partition-dir ACLs/ownership survive) — mapping this to plain
          // Spark overwrite would drop the directories with their ACLs,
          // which is the one thing the mode exists to prevent (reference
          // SDLSaveMode.OverwritePreserveDirectories). The new data is
          // staged under a hidden subdir FIRST (underscore prefix → invisible
          // to reads), so a mid-write failure leaves the old data intact;
          // only the delete+move tail is non-atomic.
          val staging = new org.apache.hadoop.fs.Path(hadoopPath, "_staging_overwrite")
          if (fs.exists(staging)) fs.delete(staging, true)
          writer.mode("overwrite").save(staging.toString)
          // collect the old file list FULLY before deleting — deleting while
          // iterating listFiles is filesystem-dependent
          val stagingPrefix = staging.toUri.getPath
          val oldFiles = {
            val b = Seq.newBuilder[org.apache.hadoop.fs.Path]
            val it = fs.listFiles(hadoopPath, true)
            while (it.hasNext) {
              val p = it.next().getPath
              if (!p.toUri.getPath.startsWith(stagingPrefix + "/")) b += p
            }
            b.result()
          }
          // every delete/rename result is CHECKED: the old data is gone by
          // the time the moves run, so a silently-false rename (racing
          // writer recreating dest, cross-FS path) would be invisible data
          // loss — failing loudly here leaves the staging dir intact with
          // the complete new data for manual recovery
          oldFiles.foreach(p => require(fs.delete(p, false),
            s"DataObject $id: OverwritePreserveDirectories could not delete old file $p"))
          // move staged files into their final locations, creating only
          // directories that don't already exist
          val staged = {
            val b = Seq.newBuilder[org.apache.hadoop.fs.Path]
            val it = fs.listFiles(staging, true)
            while (it.hasNext) b += it.next().getPath
            b.result()
          }
          staged.foreach { p =>
            val rel = p.toUri.getPath.stripPrefix(stagingPrefix).stripPrefix("/")
            val dest = new org.apache.hadoop.fs.Path(hadoopPath, rel)
            if (!fs.exists(dest.getParent)) fs.mkdirs(dest.getParent)
            require(fs.rename(p, dest),
              s"DataObject $id: OverwritePreserveDirectories could not move staged file $p to $dest " +
                "(new data remains under the staging dir)")
          }
          fs.delete(staging, true)
        case m =>
          writer.mode(SdlSaveMode.toSpark(m)).save(path)
      }
    }
    val rows = try obs.get("records_written").asInstanceOf[Long] catch { case _: Throwable => -1L }
    // persist schema for schema-stable later reads (reference
    // SparkFileDataObject .schema/currentSchema.json); parquet/orc persist
    // it too so reads resolve the UNION schema after append-evolution
    if (!isSelfDescribing || schemaEvolvable) SchemaUtil.persistSchema(path, dfEff.schema)
    // reentrancy guard: archive/compaction re-bins partitions through
    // writeDataFrame on THIS object — without the flag that nested write
    // would trigger housekeeping again, recursing until the partition list
    // stabilizes (or doesn't)
    if (!inHousekeeping) {
      inHousekeeping = true
      try housekeepingMode.foreach(_.exec(this))
      finally inHousekeeping = false
    }
    val jobMetrics = expObs.map(o =>
      graft.quality.DataQualityValidation.evaluateObserved(o, expectations)).getOrElse(Map.empty)
    val tableMetrics =
      if (graft.quality.DataQualityValidation.needsTableEvaluation(expectations))
        graft.quality.DataQualityValidation.evaluateAgainstTable(getDataFrame(), expectations, partitions)
      else Map.empty[String, Any]
    val duration = System.currentTimeMillis() - t0
    val rateMetrics =
      graft.quality.DataQualityValidation.evaluateTransferRate(expectations, rows, duration)
    ActionMetrics(recordsWritten = rows, durationMillis = duration,
      observedMetrics = jobMetrics ++ tableMetrics ++ rateMetrics ++ stageMetrics)
  }

  /** Overwrite `path` with a DataFrame *derived from this object's own
    * data* (dedup/historize read-modify-write): stage to a sibling dir,
    * then swap. Plain `save(path)` would fail ("cannot overwrite a path
    * that is also being read from") or corrupt on failure. The reference
    * solves the same problem with `TickTockHiveTableDataObject:94-173`
    * (alternating tick/tock locations); staging+rename is the
    * Hadoop-FS-native equivalent (rename = metadata op).
    */
  override def writeDataFrameStaged(df: DataFrame)(implicit ctx: ActionPipelineContext): ActionMetrics = {
    val t0 = System.currentTimeMillis()
    // same quality instrumentation as the plain write path — a staged
    // write must not silently skip constraints/expectations
    validateSchemaMin(df)
    val constrained = graft.quality.DataQualityValidation.applyConstraints(df, constraints)
    val (instrumented, expObs) =
      graft.quality.DataQualityValidation.observeExpectations(constrained, expectations)
    val staging = new Path(path + "_graft_staging")
    val obs = org.apache.spark.sql.Observation(s"graft_stage_${id}_${System.nanoTime()}")
    val observed = instrumented.observe(obs, count(lit(1)).as("records_written"))
    // same opt-in task/file-count control as the plain write path
    val repartitioned = numberOfTasksPerPartition.fold(observed) { n =>
      if (partitions.nonEmpty) observed.repartition(n, partitions.map(col): _*)
      else observed.repartition(n)
    }
    val w0 = repartitioned.write.format(format).options(options)
    val w = if (partitions.nonEmpty) w0.partitionBy(partitions: _*) else w0
    w.mode("overwrite").save(staging.toString)
    // the SWAP WINDOW (sidecar carry + delete + rename + schema/sidecar
    // re-persist) runs under the same cross-process writer lease as the
    // staged-append commit: a compaction rewrite racing another process's
    // append would otherwise interleave — the appender's moves land into
    // a path the swap is about to delete wholesale. Taken AFTER the
    // staged Spark write so the TTL covers only this window.
    StoreMeta.withLease(path, s"stagedOverwrite:$id") {
      // the swap below deletes .schema/ wholesale — carry the store-meta
      // sidecar across it (a FileCompactionMode rewrite of a signature
      // store would otherwise destroy the signing-parameter/rerun-guard
      // record, and the next run would silently re-bootstrap it from the
      // CURRENT config — the exact drift the sidecar exists to catch)
      val storeMeta = StoreMeta.read(path)
      // Hadoop delete/rename signal failure by RETURNING FALSE — unchecked,
      // a failed swap would report success while the path sits empty and
      // the data lives on in the staging dir (silent total loss)
      require(fs.delete(hadoopPath, true) || !fs.exists(hadoopPath),
        s"DataObject $id: staged swap could not delete $hadoopPath")
      require(fs.rename(staging, hadoopPath),
        s"DataObject $id: staged swap rename $staging -> $hadoopPath failed; data preserved in staging")
      // the swap deleted the previous .schema file — re-persist so the next
      // schema-on-read doesn't fall back to inference and drift types
      if (!isSelfDescribing || schemaEvolvable) SchemaUtil.persistSchema(path, df.schema)
      storeMeta.foreach(StoreMeta.write(path, _))
    }
    val jobMetrics = expObs.map(o =>
      graft.quality.DataQualityValidation.evaluateObserved(o, expectations)).getOrElse(Map.empty)
    val rows = try obs.get("records_written").asInstanceOf[Long] catch { case _: Throwable => -1L }
    ActionMetrics(rows, System.currentTimeMillis() - t0, observedMetrics = jobMetrics)
  }

  /** Append an increment whose plan READS this object (store-growth): the
    * increment is written to a sibling staging dir while the current files
    * stay untouched, then the staged DATA files are MOVED in (rename =
    * metadata op; Spark part-file names carry a per-job UUID, so moved
    * files never collide with existing ones). Per-call write volume is
    * O(increment) — the whole point of the append-shaped store discipline;
    * partition subdirectories are preserved relative to the staging root.
    * Schema drift is NOT evolved here (a fingerprint/signature store's
    * schema is fixed by construction); appends with a changed schema fail
    * the next read rather than silently mixing — keep store schemas
    * stable.
    *
    * Crash/concurrency protocol (the VACUUM-style reclaim pattern; renames
    * are per-file, so a crash mid-move leaves a PARTIAL increment applied
    * — recovery must complete it, never discard the evidence):
    *  - every call stages under a UNIQUE sibling dir; a
    *    `_graft_commit_ready` marker is created only after the staged
    *    write fully succeeded, so marker-less leftovers are uncommitted
    *    garbage and marked leftovers are committed increments whose moves
    *    may be incomplete;
    *  - on entry, leftover staging dirs YOUNGER than
    *    [[SparkFileDataObject.stagingReclaimAgeMs]] fail LOUDLY (a
    *    concurrent appender is likely mid-flight — deleting its staging
    *    would corrupt its append; stores are single-writer by contract and
    *    the loser must not proceed);
    *  - leftovers OLDER than the age guard are reclaimed: marked ones get
    *    their remaining moves COMPLETED (the increment was committed —
    *    finishing is the only lossless resolution; in the dedup flow a
    *    rerun would otherwise classify the partially-appended ids as
    *    already-stored and drop their rows from the novel output), then
    *    unmarked ones are deleted (nothing was moved yet — the marker is
    *    strictly ordered after the staged write). */
  override def writeDataFrameStagedAppend(df: DataFrame)(implicit ctx: ActionPipelineContext): ActionMetrics = {
    val t0 = System.currentTimeMillis()
    validateSchemaMin(df)
    val constrained = graft.quality.DataQualityValidation.applyConstraints(df, constraints)
    val (instrumented, expObs) =
      graft.quality.DataQualityValidation.observeExpectations(constrained, expectations)
    reclaimOrFailLeftoverStaging()
    val staging = new Path(path + "_graft_staging_append_" +
      java.util.UUID.randomUUID().toString.take(8))
    val obs = org.apache.spark.sql.Observation(s"graft_stage_append_${id}_${System.nanoTime()}")
    val observed = instrumented.observe(obs, count(lit(1)).as("records_written"))
    // opt-in file-count hygiene, crucial for prefix-partitioned stores: a
    // delta append without it writes (tasks × touched prefixes) tiny
    // files; with numberOfTasksPerPartition = 1 it writes one file per
    // touched prefix per batch
    val repartitioned = numberOfTasksPerPartition.fold(observed) { n =>
      if (partitions.nonEmpty) observed.repartition(n, partitions.map(col): _*)
      else observed.repartition(n)
    }
    val w0 = repartitioned.write.format(format).options(options)
    val w = if (partitions.nonEmpty) w0.partitionBy(partitions: _*) else w0
    w.mode("overwrite").save(staging.toString)
    // the COMMIT WINDOW (sidecar merge + marker + file moves) runs under
    // the store's cross-process writer LEASE: within the JVM the DAG
    // serializes same-store actions, but a second pipeline PROCESS
    // committing against this store would interleave sidecar merges and
    // file moves silently — the lease makes the documented single-writer
    // contract enforced (a concurrent committer waits briefly, then fails
    // loudly; a crashed holder's lease goes stale after the TTL). Taken
    // AFTER the staged Spark write so the TTL covers only this window.
    StoreMeta.withLease(path, s"stagedAppend:$id") {
      // rerun-guard state rides the commit: the transformer registered the
      // batch's fingerprint as a pending sidecar update — make it durable
      // AFTER the staged write succeeded (a failed write must stay
      // rerunnable) and BEFORE the commit marker (once the marker exists the
      // increment WILL reach the store — recovery completes the moves — so
      // from that point a rerun of the same batch must fail loudly; the only
      // residual window is a crash between this merge and the marker, which
      // reclaims the unmarked staging and fails the rerun loudly too — a
      // recoverable false positive, never silent loss)
      ctx.pendingStoreMetaUpdates.remove(id).foreach(upd => StoreMeta.merge(path, upd))
      // COMMIT POINT: the staged increment is complete — from here recovery
      // completes the moves instead of discarding the staging dir
      fs.create(new Path(staging, SparkFileDataObject.commitMarker), true).close()
      moveStagedAppendFiles(staging)
      // cleanup delete CHECKED but non-fatal: the increment is fully moved,
      // so a false return (transient FS) only leaves marker-bearing residue
      // — reclaimOrFailLeftoverStaging deletes data-less marked dirs
      // regardless of age, so the next append is never wedged behind the
      // age guard by our own leftovers
      if (!fs.delete(staging, true) && fs.exists(staging))
        System.err.println(s"[graft] DataObject $id: staged-append cleanup of $staging " +
          "returned false; residue will be reclaimed on the next append")
    }
    if (!isSelfDescribing || schemaEvolvable) SchemaUtil.persistSchema(path, df.schema)
    // an append-only store accumulates one file set per batch — let the
    // object's housekeeping (e.g. FileCompactionMode) re-bin when due,
    // with the same reentrancy guard as the plain write path
    if (!inHousekeeping) {
      inHousekeeping = true
      try housekeepingMode.foreach(_.exec(this))
      finally inHousekeeping = false
    }
    val jobMetrics = expObs.map(o =>
      graft.quality.DataQualityValidation.evaluateObserved(o, expectations)).getOrElse(Map.empty)
    val rows = try obs.get("records_written").asInstanceOf[Long] catch { case _: Throwable => -1L }
    ActionMetrics(rows, System.currentTimeMillis() - t0, observedMetrics = jobMetrics)
  }

  /** move staged DATA files into the object's path (skip _SUCCESS /
    * hidden committer files / the commit marker), preserving
    * partition-relative paths; every rename result is CHECKED — a
    * silently-false rename would lose part of the increment */
  private def moveStagedAppendFiles(staging: Path)(implicit ctx: ActionPipelineContext): Unit = {
    if (!fs.exists(hadoopPath)) fs.mkdirs(hadoopPath)
    val stagingPrefix = staging.toUri.getPath
    val staged = {
      val b = Seq.newBuilder[Path]
      val it = fs.listFiles(staging, true)
      while (it.hasNext) {
        val p = it.next().getPath
        if (!p.getName.startsWith("_") && !p.getName.startsWith(".")) b += p
      }
      b.result()
    }
    staged.foreach { p =>
      val rel = p.toUri.getPath.stripPrefix(stagingPrefix).stripPrefix("/")
      val dest = new Path(hadoopPath, rel)
      if (!fs.exists(dest.getParent)) fs.mkdirs(dest.getParent)
      require(fs.rename(p, dest),
        s"DataObject $id: staged append could not move $p to $dest " +
          "(increment preserved under the staging dir)")
    }
  }

  /** the recovery half of the staged-append protocol — see
    * [[writeDataFrameStagedAppend]] */
  private def reclaimOrFailLeftoverStaging()(implicit ctx: ActionPipelineContext): Unit = {
    val parent = hadoopPath.getParent
    if (parent == null || !fs.exists(parent)) return
    val prefix = hadoopPath.getName + "_graft_staging_append"
    val now = System.currentTimeMillis()
    fs.listStatus(parent).filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .foreach { st =>
        val age = now - st.getModificationTime
        // a marker-bearing dir with NO data files left is fully-moved
        // residue (the post-move cleanup delete returned false — Hadoop
        // signals failure by return value): it cannot be a mid-flight
        // appender (the marker is ordered after the staged write and
        // every data file was already renamed in), so reclaim it
        // regardless of age instead of wedging the single-writer
        // pipeline behind the age guard
        val marked = fs.exists(new Path(st.getPath, SparkFileDataObject.commitMarker))
        def hasDataFiles: Boolean = {
          val it = fs.listFiles(st.getPath, true)
          var found = false
          while (!found && it.hasNext) {
            val name = it.next().getPath.getName
            if (!name.startsWith("_") && !name.startsWith(".")) found = true
          }
          found
        }
        if (marked && !hasDataFiles)
          fs.delete(st.getPath, true)
        else if (age < SparkFileDataObject.stagingReclaimAgeMs)
          throw new IllegalStateException(
            s"DataObject $id: found in-flight staging dir ${st.getPath} " +
              s"(age ${age / 1000}s < reclaim guard " +
              s"${SparkFileDataObject.stagingReclaimAgeMs / 1000}s) — a concurrent appender " +
              "is likely mid-flight; stores are single-writer. Retry after it finishes, or " +
              "reclaim manually if it crashed: complete the moves if " +
              s"${SparkFileDataObject.commitMarker} exists in the dir, else delete it")
        else if (marked) {
          // committed increment, crashed mid-move: complete it (renames
          // already applied are gone from staging — only the remainder moves)
          moveStagedAppendFiles(st.getPath)
          fs.delete(st.getPath, true)
        } else
          // uncommitted: the staged WRITE crashed; nothing was moved (the
          // marker is strictly ordered after the write) — discard safely
          fs.delete(st.getPath, true)
      }
  }

  override def listPartitions(implicit ctx: ActionPipelineContext): Seq[PartitionValues] = {
    if (partitions.isEmpty || !exists) return Seq.empty
    // recursive dir listing, one level per partition col (reference
    // SparkFileDataObject partition listing via PartitionLayout)
    def list(p: Path, cols: Seq[String], acc: Map[String, String]): Seq[PartitionValues] = cols match {
      case Nil => Seq(PartitionValues(acc))
      case c +: rest =>
        fs.listStatus(p).toSeq.filter(_.isDirectory)
          .map(_.getPath).filter(_.getName.startsWith(c + "="))
          .flatMap(d => list(d, rest, acc + (c -> d.getName.stripPrefix(c + "="))))
    }
    list(hadoopPath, partitions, Map.empty)
  }

  override def deletePartitions(pvs: Seq[PartitionValues])(implicit ctx: ActionPipelineContext): Unit =
    pvs.foreach { pv =>
      val rel = pv.asPath(partitions)
      if (rel.nonEmpty) fs.delete(new Path(hadoopPath, rel), true)
    }

  /** Delete all data files/partition directories (reference
    * `FileRefDataObject.deleteAll`, used by `deleteDataAfterRead`);
    * metadata sidecars (_schema, .sample) survive so the object stays
    * readable-by-schema after the handoff. */
  def deleteAll(implicit ctx: ActionPipelineContext): Unit =
    if (fs.exists(hadoopPath))
      fs.listStatus(hadoopPath).map(_.getPath)
        .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
        .foreach(p => fs.delete(p, true))

  override def getStreamingDataFrame(extraOptions: Map[String, String], userSchema: Option[StructType])
                                    (implicit ctx: ActionPipelineContext): DataFrame = {
    val s = userSchema.orElse(schema).getOrElse(
      throw new IllegalArgumentException(s"DataObject $id: streaming read needs a schema"))
    ctx.spark.readStream.format(format).options(options ++ extraOptions).schema(s).load(path)
  }

  override def writeStreamingDataFrame(df: DataFrame, trigger: org.apache.spark.sql.streaming.Trigger,
                                       extraOptions: Map[String, String], checkpointLocation: String,
                                       queryName: String, outputMode: String = "append")
                                      (implicit ctx: ActionPipelineContext): org.apache.spark.sql.streaming.StreamingQuery = {
    val w0 = df.writeStream.format(format).options(options ++ extraOptions)
      .option("checkpointLocation", checkpointLocation)
      .outputMode(outputMode).trigger(trigger).queryName(queryName)
    val w = if (partitions.nonEmpty) w0.partitionBy(partitions: _*) else w0
    w.start(path)
  }
}

object SparkFileDataObject {
  /** marker created in a staged-append dir AFTER its staged write fully
    * succeeded — its presence means "committed, complete the moves", its
    * absence "uncommitted garbage, safe to discard" (see
    * [[SparkFileDataObject.writeDataFrameStagedAppend]]) */
  val commitMarker = "_graft_commit_ready"
  /** leftover staging dirs younger than this are treated as a CONCURRENT
    * appender (fail loudly) rather than a crash (reclaim) — the vacuum
    * pattern's age guard. Overridable for tests via the system property;
    * production appends finish in well under an hour or have bigger
    * problems. */
  def stagingReclaimAgeMs: Long =
    sys.props.get("graft.staging.reclaimAgeMs").map(_.toLong).getOrElse(3600000L)
}

/** Parquet files. Reference `ParquetFileDataObject.scala` (79 LoC). */
case class ParquetFileDataObject(
    id: String, path: String,
    override val partitions: Seq[String] = Seq.empty,
    override val schema: Option[StructType] = None,
    override val schemaMin: Option[StructType] = None,
    override val options: Map[String, String] = Map.empty,
    override val filenameColumn: Option[String] = None,
    override val numberOfTasksPerPartition: Option[Int] = None,
    override val constraints: Seq[graft.quality.Constraint] = Seq.empty,
    override val expectations: Seq[graft.quality.Expectation] = Seq.empty,
    override val housekeepingMode: Option[HousekeepingMode] = None)
  extends SparkFileDataObject with CanEvolveSchema {
  val format = "parquet"
}

/** CSV files: delimiter/quote/header/inferSchema options. Reference
  * `CsvFileDataObject.scala:68-103`. */
case class CsvFileDataObject(
    id: String, path: String,
    csvOptions: Map[String, String] = Map.empty,
    override val partitions: Seq[String] = Seq.empty,
    override val schema: Option[StructType] = None,
    override val schemaMin: Option[StructType] = None,
    override val filenameColumn: Option[String] = None,
    override val numberOfTasksPerPartition: Option[Int] = None)
  extends SparkFileDataObject {
  val format = "csv"
  // reference defaults: header=true, inferSchema=true when no schema given
  override val options: Map[String, String] =
    Map("header" -> "true", "delimiter" -> ",", "quote" -> "\"") ++
      (if (schema.isEmpty) Map("inferSchema" -> "true") else Map.empty) ++ csvOptions
}

/** JSON lines (or multiline) files. Reference `JsonFileDataObject.scala`. */
case class JsonFileDataObject(
    id: String, path: String,
    jsonOptions: Map[String, String] = Map.empty,
    override val partitions: Seq[String] = Seq.empty,
    override val schema: Option[StructType] = None)
  extends SparkFileDataObject with CanEvolveSchema {
  val format = "json"
  override val options: Map[String, String] = jsonOptions
}

/** Avro files. Reference `AvroFileDataObject.scala`. Spark 4 bundles the
  * avro classes in spark-sql but not its DataSourceRegister entry; this
  * library ships the service registration
  * (`META-INF/services/...DataSourceRegister`) so `format("avro")`
  * resolves — fully functional at runtime, round-trip tested. */
case class AvroFileDataObject(
    id: String, path: String,
    override val partitions: Seq[String] = Seq.empty,
    override val schema: Option[StructType] = None)
  extends SparkFileDataObject {
  val format = "avro"
}

/** ORC files (not in reference; natural on Spark). */
case class OrcFileDataObject(
    id: String, path: String,
    override val partitions: Seq[String] = Seq.empty,
    override val schema: Option[StructType] = None)
  extends SparkFileDataObject with CanEvolveSchema {
  val format = "orc"
}

/** Opaque files read as `binaryFile` (path, modificationTime, length,
  * content). Reference `RawFileDataObject.scala` treats them as FileRefs;
  * on Spark the binaryFile source gives us a DataFrame view for free and is
  * the substrate for multimodal (image/audio/video) columns.
  */
case class RawFileDataObject(id: String, path: String,
    pathGlobFilter: Option[String] = None)
  extends DataObject with CanCreateDataFrame {
  override def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                           (implicit ctx: ActionPipelineContext): DataFrame = {
    val r = ctx.spark.read.format("binaryFile")
    pathGlobFilter.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }
}

/** User-supplied Scala logic producing a DataFrame. Reference
  * `CustomDfDataObject.scala` + `spark/customlogic/CustomDfCreator.scala`. */
case class CustomDfDataObject(id: String, creator: SparkSession => DataFrame)
  extends DataObject with CanCreateDataFrame {
  override def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                           (implicit ctx: ActionPipelineContext): DataFrame = creator(ctx.spark)
}

/** User-supplied DataFrame creator for CONFIG-driven pipelines — the
  * reflective half of [[CustomDfDataObject]] (reference
  * `spark/customlogic/CustomDfCreator.scala`: a `className` in HOCON
  * resolves to an implementation, `options` pass through). Implement with
  * a no-arg constructor. */
trait CustomDfCreator extends Serializable {
  def exec(spark: SparkSession, options: Map[String, String]): DataFrame
}

object CustomDfDataObject {
  /** resolve `className` to a [[CustomDfCreator]] at CONFIG-PARSE time —
    * a typo fails the parse, not the first exec (reference instantiates
    * through CustomCodeUtil the same way) */
  def fromClassName(id: String, className: String,
                    options: Map[String, String] = Map.empty): CustomDfDataObject = {
    val creator =
      try Class.forName(className).getDeclaredConstructor().newInstance()
        .asInstanceOf[CustomDfCreator]
      catch {
        case e: ClassNotFoundException => throw new IllegalArgumentException(
          s"DataObject $id: creator class '$className' not found", e)
        case e: ClassCastException => throw new IllegalArgumentException(
          s"DataObject $id: '$className' does not implement graft.sources.CustomDfCreator", e)
      }
    CustomDfDataObject(id, s => creator.exec(s, options))
  }
}
