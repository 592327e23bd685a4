package graft.sources

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Table-like DataObject with db/name/primaryKey identity. Reference
  * `sdl-core/workflow/dataobject/TableDataObject.scala`. */
trait TableDataObject extends DataObject with CanCreateDataFrame with CanWriteDataFrame
    with CanWriteStreamingDataFrame {
  def table: Table
  def isTableExisting(implicit ctx: ActionPipelineContext): Boolean

  /** Streaming write via `foreachBatch`: every micro-batch goes through the
    * BATCH write path, so the table's transactional semantics — staged
    * swaps, MERGE upsert on the primary key — apply per batch. This is the
    * reference's streaming-write behavior for transactional table sinks
    * (`DeltaLakeTableDataObject` streams via its normal write), expressed
    * with Spark's standard foreachBatch pattern. The action passes its
    * save mode as option `graft.saveMode` (`merge` upserts on the table's
    * primaryKey; anything else appends). */
  override def writeStreamingDataFrame(df: DataFrame,
                                       trigger: org.apache.spark.sql.streaming.Trigger,
                                       extraOptions: Map[String, String], checkpointLocation: String,
                                       queryName: String, outputMode: String = "append")
                                      (implicit ctx: ActionPipelineContext): org.apache.spark.sql.streaming.StreamingQuery = {
    val merge = extraOptions.get("graft.saveMode").exists(_.equalsIgnoreCase("merge"))
    val writeBatch: (DataFrame, Long) => Unit = (batch, _) =>
      if (merge) this match {
        case m: CanMergeDataFrame =>
          val pk = table.primaryKey.getOrElse(throw new IllegalArgumentException(
            s"DataObject $id: streaming merge needs table.primaryKey"))
          m.mergeDataFrame(batch, pk)
          ()
        case _ => throw new IllegalArgumentException(
          s"DataObject $id: streaming merge requested but sink cannot merge")
      }
      else { writeDataFrame(batch, saveMode = Some(SdlSaveMode.Append)); () }
    df.writeStream
      .foreachBatch(writeBatch)
      .option("checkpointLocation", checkpointLocation)
      .outputMode(outputMode).trigger(trigger).queryName(queryName)
      .start()
  }
}

/** Join-based MERGE (upsert) semantics computed as a new table state —
  * used to emulate `MERGE INTO` for stores without a transactional merge
  * (plain parquet / Hive-format tables). Semantics follow the reference's
  * `SaveModeMergeOptions` mapping to Delta merge
  * (`sdl-core/definitions/SDLSaveMode.scala:126-146`):
  * whenMatched(deleteCondition).delete / whenMatched(updateCondition)
  * .update(updateColumns) / whenNotMatched(insertCondition).insert.
  * Conditions reference `existing.*` / `new.*`.
  *
  * Scale: one shuffle join on the merge key; with AQE this broadcasts when
  * the feed is small. A real lakehouse sink (Delta/Iceberg) replaces the
  * full rewrite with file-level conflict resolution, but the *plan shape*
  * (join on key + conditional projection) is identical.
  */
object MergeEmulation {
  def computeMergedState(existing: DataFrame, feed: DataFrame, joinCols: Seq[String],
                         opts: SaveModeMergeOptions = SaveModeMergeOptions()): DataFrame = {
    val cols = existing.columns.toSeq
    // presence markers, NOT key-column nullability: the join matches keys
    // null-safely (<=>), so a legitimate NULL first key column would read
    // as "side absent" and the merge would silently DROP the existing row
    // (and never insert the feed row)
    val eMark = "_graft_e_present"
    val nMark = "_graft_n_present"
    val joined = existing.withColumn(eMark, lit(true)).alias("existing").join(
      feed.withColumn(nMark, lit(true)).alias("new"),
      joinCols.map(k => col(s"existing.`$k`") <=> col(s"new.`$k`")).reduce(_ and _) &&
        opts.additionalMergePredicate.map(expr).getOrElse(lit(true)),
      "full")
    val eExists = col(s"existing.`$eMark`").isNotNull
    val nExists = col(s"new.`$nMark`").isNotNull
    val del = opts.deleteCondition.map(expr).getOrElse(lit(false))
    val upd = opts.updateCondition.map(expr).getOrElse(lit(true))
    // second matched clause (reference DeltaLakeTableDataObject.scala:433-436):
    // evaluated in clause order, i.e. only when the primary update clause's
    // condition was false — pair it with an explicit updateCondition
    val updExisting = opts.updateExistingCondition.map(expr).getOrElse(lit(false))
    val ins = opts.insertCondition.map(expr).getOrElse(lit(true))
    val updateCols = if (opts.updateColumns.nonEmpty) opts.updateColumns else cols.filterNot(joinCols.contains)

    def updatedRec: Column = struct(cols.map { c =>
      (if (updateCols.contains(c)) col(s"new.`$c`") else col(s"existing.`$c`")).as(c)
    }: _*)
    def updatedAllRec: Column = struct(cols.map(c => col(s"new.`$c`").as(c)): _*)
    def insertedRec: Column = struct(cols.map { c =>
      val v =
        if (opts.insertValuesOverride.contains(c)) expr(opts.insertValuesOverride(c))
        else if (opts.insertColumnsToIgnore.contains(c)) lit(null)
        else col(s"new.`$c`")
      v.as(c)
    }: _*)
    def existingRec: Column = struct(cols.map(c => col(s"existing.`$c`").as(c)): _*)

    val result = when(eExists and nExists,
        when(del, lit(null)) // matched + deleteCondition → drop
          .when(upd, updatedRec) // matched + updateCondition → update
          .when(updExisting, updatedAllRec) // 2nd matched clause → update ALL columns
          .otherwise(existingRec)) // matched, no condition met → keep
      .when(eExists and !nExists, existingRec) // unmatched existing → keep
      .when(!eExists and nExists, when(ins, insertedRec)) // new → insert if condition
    joined.select(result.as("r")).where(col("r").isNotNull).select(col("r.*"))
  }

  /** Merge-on-read decomposition of the SAME merge semantics: instead of
    * the full rewritten state, return (tombstone positions, appended
    * records) — the existing side must carry its scan position in
    * `_graft_dv_rel`/`_graft_dv_ri`. A matched row whose delete/update
    * clause fires is TOMBSTONED (and its updated version appended); a
    * matched row with no firing clause stays live IN PLACE (no tombstone,
    * no output — the copy-on-write path re-emits it, same final state);
    * unmatched existing rows are untouched. Work is O(matched + feed),
    * never O(touched files). */
  def computeMergeOps(existingTagged: DataFrame, feed: DataFrame, joinCols: Seq[String],
                      opts: SaveModeMergeOptions = SaveModeMergeOptions())
      : (DataFrame, DataFrame) = {
    val posCols = Seq("_graft_dv_rel", "_graft_dv_ri")
    val cols = existingTagged.columns.toSeq.filterNot(posCols.contains)
    val eMark = "_graft_e_present"
    val nMark = "_graft_n_present"
    val joined = existingTagged.withColumn(eMark, lit(true)).alias("existing").join(
      feed.withColumn(nMark, lit(true)).alias("new"),
      joinCols.map(k => col(s"existing.`$k`") <=> col(s"new.`$k`")).reduce(_ and _) &&
        opts.additionalMergePredicate.map(expr).getOrElse(lit(true)),
      "full")
    val eExists = col(s"existing.`$eMark`").isNotNull
    val nExists = col(s"new.`$nMark`").isNotNull
    // clause conditions coalesce NULL → false: the copy-on-write when-chain
    // treats a NULL condition as not-fired, but here `del` also appears
    // NEGATED (`!del`) and in the tombstone disjunction, where SQL
    // three-valued logic would otherwise tombstone a row (NULL or true =
    // true) while suppressing its updated append (NULL and ... = NULL) —
    // silently losing the row where copy-on-write updates it
    val del = coalesce(opts.deleteCondition.map(expr).getOrElse(lit(false)), lit(false))
    val upd = coalesce(opts.updateCondition.map(expr).getOrElse(lit(true)), lit(false))
    val updExisting = coalesce(opts.updateExistingCondition.map(expr).getOrElse(lit(false)), lit(false))
    val ins = coalesce(opts.insertCondition.map(expr).getOrElse(lit(true)), lit(false))
    val updateCols = if (opts.updateColumns.nonEmpty) opts.updateColumns else cols.filterNot(joinCols.contains)
    def updatedRec: Column = struct(cols.map { c =>
      (if (updateCols.contains(c)) col(s"new.`$c`") else col(s"existing.`$c`")).as(c)
    }: _*)
    def updatedAllRec: Column = struct(cols.map(c => col(s"new.`$c`").as(c)): _*)
    def insertedRec: Column = struct(cols.map { c =>
      val v =
        if (opts.insertValuesOverride.contains(c)) expr(opts.insertValuesOverride(c))
        else if (opts.insertColumnsToIgnore.contains(c)) lit(null)
        else col(s"new.`$c`")
      v.as(c)
    }: _*)
    // the two consumers re-evaluate the join independently (the caller
    // persists the feed; the existing side is a pruned touched-file scan)
    // — two bounded scans still beat one full rewrite of the touched files
    val clauseFires = del or upd or updExisting
    val tombstones = joined
      .where(eExists and nExists and clauseFires)
      .select(col(s"existing.`_graft_dv_rel`").as("file"),
        col(s"existing.`_graft_dv_ri`").as("row_index"))
    val additions = joined
      .select(when(eExists and nExists and !del,
          when(upd, updatedRec).when(updExisting, updatedAllRec))
        .when(!eExists and nExists, when(ins, insertedRec)).as("r"))
      .where(col("r").isNotNull).select(col("r.*"))
    (tombstones, additions)
  }
}

/** Scope `partitionOverwriteMode=dynamic` to one write: the analysis-time
  * self-overwrite check consults the SESSION conf (writer options are
  * ignored there), so the conf must be set — and restored, or every later
  * static overwrite silently keeps stale partitions. */
private[sources] object DynamicOverwrite {
  private val Key = "spark.sql.sources.partitionOverwriteMode"
  /** The conf flip is session-global, so two concurrent partitioned writes
    * on the DAG's execution pool could interleave flip/restore: one
    * action's restore-to-static landing mid-write of another turns its
    * dynamic overwrite into a static one that deletes untouched
    * partitions. Serialize the whole flip-write-restore window. */
  private val lock = new Object
  def apply[T](ctx: ActionPipelineContext)(body: => T): T = lock.synchronized {
    val prev = ctx.spark.conf.getOption(Key)
    ctx.spark.conf.set(Key, "dynamic")
    try body
    finally prev match {
      case Some(v) => ctx.spark.conf.set(Key, v)
      case None => ctx.spark.conf.unset(Key)
    }
  }
}

/** Hive/catalog table (metastore or in-memory catalog). Reference
  * `HiveTableDataObject.scala` + `util/hive/HiveUtil.scala:69-138`.
  * Stats via ANALYZE TABLE feed Catalyst's CBO — matters for join reorder
  * at scale.
  */
case class HiveTableDataObject(
    id: String, table: Table,
    override val partitions: Seq[String] = Seq.empty,
    format: String = "parquet",
    analyzeTableAfterWrite: Boolean = false,
    bucketCols: Seq[String] = Seq.empty,
    numBuckets: Int = 0)
  extends TableDataObject with CanHandlePartitions with CanMergeDataFrame with CanEvolveSchema {

  require(bucketCols.isEmpty == (numBuckets == 0),
    "bucketCols and numBuckets must be set together")

  /** Hash-bucketed layout: tables bucketed on their join/agg key by the
    * same bucket count join and aggregate WITHOUT a shuffle (the scan
    * reports the bucket hash as its output partitioning) — the storage-
    * level answer to a repeated 100 TB join. Buckets are also sorted so
    * one-file-per-bucket reads skip the sort of a sort-merge join. */
  private def bucketed[T](w: org.apache.spark.sql.DataFrameWriter[T]): org.apache.spark.sql.DataFrameWriter[T] =
    if (bucketCols.nonEmpty)
      w.bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
        .sortBy(bucketCols.head, bucketCols.tail: _*)
    else w

  private def stagingName = table.fullName + "_graft_staging"
  private def backupName = table.fullName + "_graft_old"

  /** Crash recovery for the staged swap: if a failure hit between
    * "rename target away" and "rename staging in", the backup still holds
    * the complete previous state — restore it so readers keep serving the
    * old state (reference guards failed writes the same way,
    * `SparkFileDataObject.scala:537-542`). */
  private def recoverSwap()(implicit ctx: ActionPipelineContext): Unit =
    if (!ctx.spark.catalog.tableExists(table.fullName) && ctx.spark.catalog.tableExists(backupName))
      ctx.spark.sql(s"ALTER TABLE $backupName RENAME TO ${table.fullName}")

  override def isTableExisting(implicit ctx: ActionPipelineContext): Boolean = {
    recoverSwap()
    ctx.spark.catalog.tableExists(table.fullName)
  }

  override def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                           (implicit ctx: ActionPipelineContext): DataFrame = {
    recoverSwap()
    val df = ctx.spark.table(table.fullName)
    PartitionValues.filterExpr(partitionValues).fold(df)(df.filter _)
  }

  override def writeDataFrame(df: DataFrame, partitionValues: Seq[PartitionValues] = Seq.empty,
                              saveMode: Option[SdlSaveMode] = None)
                             (implicit ctx: ActionPipelineContext): ActionMetrics = {
    val t0 = System.currentTimeMillis()
    val mode = saveMode.getOrElse(SdlSaveMode.Overwrite)
    val obs = org.apache.spark.sql.Observation(s"graft_write_${id}_${System.nanoTime()}")
    val observed = df.observe(obs, count(lit(1)).as("records_written"))
    val w0 = bucketed(observed.write.format(format))
    val w = if (partitions.nonEmpty) w0.partitionBy(partitions: _*) else w0
    mode match {
      // without this, merge fell into the catch-all OVERWRITE below —
      // silently replacing the table instead of upserting
      case SdlSaveMode.Merge =>
        return mergeDataFrame(df, table.primaryKey.getOrElse(
          throw new IllegalArgumentException(s"$id: merge needs table.primaryKey")))
      case SdlSaveMode.Append if isTableExisting &&
          graft.functions.SchemaEvolution.hasSchemaChanged(
            ctx.spark.table(table.fullName).schema, df.schema) =>
        // CanEvolveSchema: a drifted feed appends after evolving the TABLE —
        // new columns are added to the catalog (old rows read them as null),
        // dropped columns are kept and null-filled in the feed. Type changes
        // need a rewrite, not an append — fail loudly rather than corrupt.
        val existing = ctx.spark.table(table.fullName).schema
        val merged = graft.functions.SchemaEvolution.mergedSchema(existing, df.schema)
        val typeChanged = existing.fields.filter(f =>
          merged.fields.exists(m => m.name == f.name && m.dataType != f.dataType))
        require(typeChanged.isEmpty,
          s"$id: append with changed column types ${typeChanged.map(_.name).mkString(",")} " +
            "requires a rewrite (use Overwrite)")
        val added = merged.fields.filterNot(f => existing.fieldNames.contains(f.name))
        if (added.nonEmpty)
          ctx.spark.sql(s"ALTER TABLE ${table.fullName} ADD COLUMNS (" +
            added.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ") + ")")
        val aligned = graft.functions.SchemaEvolution.alignTo(observed, merged)
        val wa0 = bucketed(aligned.write.format(format))
        val wa = if (partitions.nonEmpty) wa0.partitionBy(partitions: _*) else wa0
        wa.mode("append").saveAsTable(table.fullName)
      case SdlSaveMode.Append => w.mode("append").saveAsTable(table.fullName)
      case SdlSaveMode.OverwriteOptimized if partitions.nonEmpty && isTableExisting =>
        // dynamic partition overwrite; the session conf must be set (the
        // analysis-time self-overwrite check ignores writer options) but is
        // RESTORED afterwards so later static overwrites keep their semantics
        DynamicOverwrite(ctx) {
          observed.write.mode("overwrite").insertInto(table.fullName)
        }
      case _ => w.mode("overwrite").saveAsTable(table.fullName)
    }
    if (analyzeTableAfterWrite)
      ctx.spark.sql(s"ANALYZE TABLE ${table.fullName} COMPUTE STATISTICS")
    val rows = try obs.get("records_written").asInstanceOf[Long] catch { case _: Throwable => -1L }
    ActionMetrics(rows, System.currentTimeMillis() - t0)
  }

  /** Overwrite with a plan that may read this table itself: stage to a temp
    * table (materializing the plan), then swap. The swap is
    * rename-away / rename-in / drop-backup — every crash window leaves a
    * complete copy recoverable by `recoverSwap()` (the former DROP+RENAME
    * had a window where the table was simply gone). */
  override def writeDataFrameStaged(df: DataFrame)(implicit ctx: ActionPipelineContext): ActionMetrics = {
    val t0 = System.currentTimeMillis()
    ctx.spark.sql(s"DROP TABLE IF EXISTS $stagingName")
    val obs = org.apache.spark.sql.Observation(s"graft_stage_${id}_${System.nanoTime()}")
    val observed = df.observe(obs, count(lit(1)).as("records_written"))
    val w0 = bucketed(observed.write.format(format))
    val w = if (partitions.nonEmpty) w0.partitionBy(partitions: _*) else w0
    w.mode("overwrite").saveAsTable(stagingName)
    ctx.spark.sql(s"DROP TABLE IF EXISTS $backupName")
    if (ctx.spark.catalog.tableExists(table.fullName))
      ctx.spark.sql(s"ALTER TABLE ${table.fullName} RENAME TO $backupName")
    ctx.spark.sql(s"ALTER TABLE $stagingName RENAME TO ${table.fullName}")
    ctx.spark.sql(s"DROP TABLE IF EXISTS $backupName")
    val rows = try obs.get("records_written").asInstanceOf[Long] catch { case _: Throwable => -1L }
    ActionMetrics(rows, System.currentTimeMillis() - t0)
  }

  override def mergeDataFrame(df: DataFrame, joinCols: Seq[String],
                              options: SaveModeMergeOptions = SaveModeMergeOptions())
                             (implicit ctx: ActionPipelineContext): ActionMetrics = {
    val t0 = System.currentTimeMillis()
    if (!isTableExisting)
      return writeDataFrame(df, Seq.empty, Some(SdlSaveMode.Overwrite))
    if (partitions.nonEmpty) {
      // Partition-scoped merge: only partitions TOUCHED by the feed are
      // read and rewritten — at 100 TB an incremental load pays for its
      // partitions, not the whole table. Assumes merge keys don't move rows
      // across partitions (same constraint Hive/Delta partitioned merges
      // carry in practice). Mirrors the reference's partition-pruning
      // philosophy (`SparkFileDataObject.scala:265-294`).
      val touched = df.select(partitions.map(c => col(c).cast("string")): _*).distinct()
        .collect().map(r => PartitionValues(partitions.zipWithIndex.map { case (c, i) => c -> r.getString(i) }.toMap)).toSeq
      val existingTouched = getDataFrame(touched)
      val merged = MergeEmulation.computeMergedState(existingTouched, df, joinCols, options)
      // materialize before insertInto: the plan reads the target table
      val cached = merged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mergedRows = try {
        val n = cached.count()
        // insertInto is position-based: project to the catalog column order;
        // dynamic overwrite with the session conf restored after the write
        val tableCols = ctx.spark.table(table.fullName).columns
        DynamicOverwrite(ctx) {
          cached.select(tableCols.map(c => col(s"`$c`")).toIndexedSeq: _*)
            .write.mode("overwrite").insertInto(table.fullName)
        }
        // dynamic overwrite only replaces partitions PRESENT in the output;
        // a touched partition emptied by deleteCondition must be dropped
        if (options.deleteCondition.isDefined) {
          val remaining = cached.select(partitions.map(c => col(c).cast("string")): _*).distinct()
            .collect().map(r => partitions.zipWithIndex.map { case (c, i) => c -> r.getString(i) }.toMap).toSet
          touched.map(_.elements).filterNot(remaining.contains).foreach { pv =>
            val spec = pv.map { case (k, v) => s"$k='${v.replace("'", "''")}'" }.mkString(", ")
            ctx.spark.sql(s"ALTER TABLE ${table.fullName} DROP IF EXISTS PARTITION ($spec)")
          }
        }
        n
      } finally cached.unpersist()
      ActionMetrics(mergedRows, System.currentTimeMillis() - t0)
    } else {
      val merged = MergeEmulation.computeMergedState(getDataFrame(), df, joinCols, options)
      val staged = writeDataFrameStaged(merged)
      ActionMetrics(staged.recordsWritten, System.currentTimeMillis() - t0)
    }
  }

  override def listPartitions(implicit ctx: ActionPipelineContext): Seq[PartitionValues] = {
    if (partitions.isEmpty || !isTableExisting) return Seq.empty
    ctx.spark.sql(s"SHOW PARTITIONS ${table.fullName}").collect().toSeq.map { r =>
      PartitionValues(r.getString(0).split('/').map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> v
      }.toMap)
    }
  }
}

/** JDBC table: Spark jdbc read, temp-table + SQL MERGE upsert over the
  * connection, pre/post SQL. Reference `JdbcTableDataObject.scala:92-449`,
  * merge statement built as in `util/misc/SQLUtil.scala`.
  */
case class JdbcTableDataObject(
    id: String, table: Table, connection: JdbcConnection,
    preReadSql: Option[String] = None, postWriteSql: Option[String] = None,
    jdbcOptions: Map[String, String] = Map.empty,
    /** SQL type for auto-created String columns. Several dialects map
      * StringType to a LOB type (Derby: CLOB) that the engine then refuses
      * to COMPARE — which breaks every merge condition over a string
      * column. Default is the Derby VARCHAR maximum so arbitrary app
      * strings fit; values beyond it fail the write LOUDLY (truncation
      * error), at which point set a type fit for the target engine — or
      * empty string to keep the dialect's (possibly non-comparable) LOB
      * default for long-text tables that never merge on strings. */
    stringColumnType: String = "VARCHAR(32672)")
  extends TableDataObject with CanMergeDataFrame {

  /** `createTableColumnTypes` mapping String columns to a comparable SQL
    * type for any table THIS object creates (target and merge temp). */
  private def stringColTypes(df: DataFrame): Option[String] = {
    if (stringColumnType.isEmpty) return None
    val ss = df.schema.fields.filter(_.dataType == org.apache.spark.sql.types.StringType)
    if (ss.isEmpty) None else Some(ss.map(f => s"${f.name} $stringColumnType").mkString(", "))
  }

  private def withStringTypes(w: org.apache.spark.sql.DataFrameWriter[Row], df: DataFrame) =
    stringColTypes(df).fold(w)(t => w.option("createTableColumnTypes", t))

  private def withConnection[T](f: java.sql.Connection => T): T = {
    Class.forName(connection.driver)
    val props = new java.util.Properties()
    connection.resolvedUser.foreach(props.setProperty("user", _))
    connection.resolvedPassword.foreach(props.setProperty("password", _))
    val c = java.sql.DriverManager.getConnection(connection.url, props)
    try f(c) finally c.close()
  }

  private def readerOpts: Map[String, String] =
    Map("url" -> connection.url, "driver" -> connection.driver) ++
      connection.resolvedUser.map("user" -> _) ++
      connection.resolvedPassword.map("password" -> _) ++ jdbcOptions

  override def isTableExisting(implicit ctx: ActionPipelineContext): Boolean =
    withConnection { c =>
      val rs = c.getMetaData.getTables(null, table.db.map(_.toUpperCase).orNull, table.name.toUpperCase, null)
      try rs.next() finally rs.close()
    }

  override def prepare(implicit ctx: ActionPipelineContext): Unit =
    preReadSql.foreach(sql => withConnection(_.createStatement().execute(sql)))

  override def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                           (implicit ctx: ActionPipelineContext): DataFrame =
    ctx.spark.read.format("jdbc").options(readerOpts)
      .option("dbtable", table.fullName).load()

  override def writeDataFrame(df: DataFrame, partitionValues: Seq[PartitionValues] = Seq.empty,
                              saveMode: Option[SdlSaveMode] = None)
                             (implicit ctx: ActionPipelineContext): ActionMetrics = {
    val t0 = System.currentTimeMillis()
    val mode = saveMode.getOrElse(SdlSaveMode.Append)
    mode match {
      case SdlSaveMode.Merge =>
        val m = mergeDataFrame(df, table.primaryKey.getOrElse(
          throw new IllegalArgumentException(s"$id: merge needs primaryKey")))
        // postWriteSql runs after EVERY write mode, merge included
        postWriteSql.foreach(sql => withConnection(_.createStatement().execute(sql)))
        return m
      case m =>
        val obs = org.apache.spark.sql.Observation(s"graft_jdbc_${id}_${System.nanoTime()}")
        withStringTypes(df.observe(obs, count(lit(1)).as("records_written"))
          .write.format("jdbc").options(readerOpts)
          .option("dbtable", table.fullName).mode(SdlSaveMode.toSpark(m)), df).save()
        postWriteSql.foreach(sql => withConnection(_.createStatement().execute(sql)))
        return ActionMetrics(
          try obs.get("records_written").asInstanceOf[Long] catch { case _: Throwable => -1L },
          System.currentTimeMillis() - t0)
    }
  }

  /** Overwrite with a plan that may read this table itself. Spark's JDBC
    * overwrite DROPS the target before executing the plan, so a lazy
    * read-modify-write would read an empty table and silently lose all
    * history. Stage the plan into a temp JDBC table first (the plan still
    * reads the intact target), then swap the content in ONE transaction
    * (DELETE + INSERT...SELECT + commit) — a crash before commit rolls
    * back and the old state keeps serving, matching the Hive path's
    * recoverSwap guarantee on databases' own ACID. */
  override def writeDataFrameStaged(df: DataFrame)(implicit ctx: ActionPipelineContext): ActionMetrics = {
    val t0 = System.currentTimeMillis()
    val tmpFull = table.db.map(_ + ".").getOrElse("") + table.name + "_graft_staging"
    val obs = org.apache.spark.sql.Observation(s"graft_jdbc_stage_${id}_${System.nanoTime()}")
    withStringTypes(df.observe(obs, count(lit(1)).as("records_written"))
      .write.format("jdbc").options(readerOpts)
      .option("dbtable", tmpFull).mode("overwrite"), df).save()
    def stagedRows: Long =
      try obs.get("records_written").asInstanceOf[Long] catch { case _: Throwable => -1L }
    if (!isTableExisting) {
      val staged = ctx.spark.read.format("jdbc").options(readerOpts)
        .option("dbtable", tmpFull).load()
      withStringTypes(staged.write.format("jdbc").options(readerOpts)
        .option("dbtable", table.fullName).mode("overwrite"), staged).save()
      withConnection(_.createStatement().execute(s"DROP TABLE $tmpFull"))
      return ActionMetrics(stagedRows, System.currentTimeMillis() - t0)
    }
    withConnection { c =>
      c.setAutoCommit(false)
      try {
        val st = c.createStatement()
        st.execute(s"DELETE FROM ${table.fullName}")
        // Explicit column lists on both sides: a transformer may have
        // reordered columns vs the target DDL, and a positional SELECT *
        // would silently swap same-typed columns.
        val colList = df.columns.map(c0 => "\"" + c0 + "\"").mkString(", ")
        st.execute(
          s"INSERT INTO ${table.fullName} ($colList) SELECT $colList FROM $tmpFull")
        c.commit()
      } catch { case e: Throwable => c.rollback(); throw e }
      finally c.setAutoCommit(true)
    }
    withConnection(_.createStatement().execute(s"DROP TABLE $tmpFull"))
    ActionMetrics(stagedRows, System.currentTimeMillis() - t0)
  }

  /** Translate a SaveModeMergeOptions condition — SQL over the
    * `existing.*` / `new.*` aliases — into the generated statement's
    * `t.*` / `s.*` aliases, quoting the column identifier (Spark's JDBC
    * writer creates quoted original-case columns, so an unquoted
    * reference would case-fold and miss on ANSI engines). */
  private def xlate(cond: String): String = {
    def rewrite(seg: String): String =
      seg.replaceAll("""\bexisting\.`([^`]+)`""", "t.\"$1\"")
         .replaceAll("""\bnew\.`([^`]+)`""", "s.\"$1\"")
         .replaceAll("""\bexisting\.([A-Za-z_][A-Za-z0-9_]*)""", "t.\"$1\"")
         .replaceAll("""\bnew\.([A-Za-z_][A-Za-z0-9_]*)""", "s.\"$1\"")
    // single-quoted SQL string literals pass through VERBATIM — a literal
    // like 'new.order' must not be rewritten into an alias reference
    val literal = "'(?:[^']|'')*'".r
    val out = new StringBuilder
    var last = 0
    for (m <- literal.findAllMatchIn(cond)) {
      out.append(rewrite(cond.substring(last, m.start))).append(m.matched)
      last = m.end
    }
    out.append(rewrite(cond.substring(last)))
    out.toString
  }

  /** Reference pattern `JdbcTableDataObject.scala:375-400`: write feed to a
    * temp table, then one `MERGE INTO` statement over the JDBC connection.
    * The statement honors the FULL SaveModeMergeOptions contract with the
    * same clause-order semantics as [[MergeEmulation.computeMergedState]]
    * (ANSI MERGE evaluates WHEN clauses in order): delete → conditional
    * update → second all-columns update (updateExistingCondition) →
    * conditional insert with overrides; additionalMergePredicate joins
    * the ON clause. This is what lets DeduplicateAction's and
    * HistorizeAction's merge modes run unchanged against a JDBC sink. */
  override def mergeDataFrame(df: DataFrame, joinCols: Seq[String],
                              options: SaveModeMergeOptions = SaveModeMergeOptions())
                             (implicit ctx: ActionPipelineContext): ActionMetrics = {
    val t0 = System.currentTimeMillis()
    val tmpName = table.name + "_graft_tmp"
    val tmpFull = table.db.map(_ + ".").getOrElse("") + tmpName
    withStringTypes(df.write.format("jdbc").options(readerOpts)
      .option("dbtable", tmpFull).mode("overwrite"), df).save()
    val cols = df.columns.toSeq
    // ANSI double-quoted identifiers: Spark's JDBC writer creates columns
    // quoted in their original (lower) case, so unquoted references would
    // upper-case-fold and miss (Derby/Postgres/HSQLDB semantics)
    def q(c: String) = "\"" + c + "\""
    val onClause = (joinCols.map(k => s"t.${q(k)} = s.${q(k)}") ++
      options.additionalMergePredicate.map(p => s"(${xlate(p)})")).mkString(" AND ")
    val updCols = (if (options.updateColumns.nonEmpty) options.updateColumns
                   else cols.filterNot(joinCols.contains))
    val updClause = updCols.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
    // insert honors both the ignore list and value overrides (an override
    // wins over ignore, matching MergeEmulation.insertedRec)
    val insCols = cols.filter(c => !options.insertColumnsToIgnore.contains(c) ||
      options.insertValuesOverride.contains(c))
    def insValue(c: String) =
      options.insertValuesOverride.get(c).map(xlate).getOrElse("s." + q(c))
    val clauses = Seq.newBuilder[String]
    options.deleteCondition.foreach(d => clauses += s"WHEN MATCHED AND (${xlate(d)}) THEN DELETE")
    val updGuard = options.updateCondition.map(u => s" AND (${xlate(u)})").getOrElse("")
    clauses += s"WHEN MATCHED$updGuard THEN UPDATE SET $updClause"
    // second matched clause: all columns — reachable only when the primary
    // update clause's condition was false (ANSI clause-order semantics)
    options.updateExistingCondition.foreach { u =>
      val allClause = cols.filterNot(joinCols.contains)
        .map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
      clauses += s"WHEN MATCHED AND (${xlate(u)}) THEN UPDATE SET $allClause"
    }
    val insGuard = options.insertCondition.map(i => s" AND (${xlate(i)})").getOrElse("")
    clauses += s"WHEN NOT MATCHED$insGuard THEN INSERT (${insCols.map(q).mkString(", ")}) " +
      s"VALUES (${insCols.map(insValue).mkString(", ")})"
    val mergeSql =
      s"MERGE INTO ${table.fullName} t USING $tmpFull s ON ($onClause)\n" +
        clauses.result().mkString("\n")
    // executeUpdate's affected-row count IS the merge metric (JDBC spec;
    // Derby counts updated+inserted rows) — no extra query needed
    val affected = withConnection { c =>
      val n = c.createStatement().executeUpdate(mergeSql)
      c.createStatement().execute(s"DROP TABLE $tmpFull")
      n.toLong
    }
    ActionMetrics(affected, System.currentTimeMillis() - t0)
  }
}

/** Virtual DataObject listing PK violations of all registered tables with a
  * primary key. Reference `PKViolatorsDataObject.scala` using
  * `GenericDataFrame.getPKviolators:152`. */
case class PKViolatorsDataObject(id: String) extends DataObject with CanCreateDataFrame {
  override def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                           (implicit ctx: ActionPipelineContext): DataFrame = {
    import graft.functions.Relational
    val frames = ctx.registry.allDataObjects.collect {
      case t: TableDataObject if t.table.primaryKey.exists(_.nonEmpty) && t.isTableExisting =>
        val pk = t.table.primaryKey.get
        Relational.getPKviolators(t.getDataFrame(), pk)
          .select(
            lit(t.id).as("data_object_id"),
            lit(t.table.fullName).as("table_name"),
            lit(pk.mkString(",")).as("primary_key"),
            to_json(struct(col("*"))).as("row_json"))
    }
    frames.reduceOption(_ unionByName _).getOrElse(
      ctx.spark.emptyDataFrame
        .withColumn("data_object_id", lit(""))
        .withColumn("table_name", lit(""))
        .withColumn("primary_key", lit(""))
        .withColumn("row_json", lit("")))
  }
}

/** Export registered DataObject metadata as a DataFrame (catalog/lineage).
  * Reference `DataObjectsExporterDataObject.scala`. */
case class DataObjectsExporterDataObject(id: String) extends DataObject with CanCreateDataFrame {
  override def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                           (implicit ctx: ActionPipelineContext): DataFrame = {
    val rows = ctx.registry.allDataObjects.map { d =>
      val m = ctx.registry.metadata(d.id)
      (d.id, d.getClass.getSimpleName,
        d match { case f: SparkFileDataObject => f.path; case t: TableDataObject => t.table.fullName; case _ => "" },
        m.flatMap(_.name).orNull, m.flatMap(_.description).orNull,
        m.flatMap(_.layer).orNull, m.flatMap(_.subjectArea).orNull,
        m.map(_.tags.mkString(",")).orNull)
    }
    import ctx.spark.implicits._
    rows.toDF("id", "type", "location", "name", "description", "layer", "subject_area", "tags")
  }
}

/** Export registered Action metadata as a DataFrame (lineage edges).
  * Reference `ActionsExporterDataObject.scala`. */
case class ActionsExporterDataObject(id: String) extends DataObject with CanCreateDataFrame {
  override def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                           (implicit ctx: ActionPipelineContext): DataFrame = {
    val rows = ctx.registry.allActions.map { a =>
      (a.id, a.getClass.getSimpleName, a.inputIds.mkString(","), a.outputIds.mkString(","))
    }
    import ctx.spark.implicits._
    rows.toDF("id", "type", "input_ids", "output_ids")
  }
}
