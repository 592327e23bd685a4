package graft.sources

import graft.core._
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Snapshot-versioned parquet table with a file-level transaction log —
  * the from-scratch stand-in for the lakehouse features of the reference's
  * `DeltaLakeTableDataObject` (`sdl-deltalake/.../DeltaLakeTableDataObject
  * .scala:102-450`: time travel, OPTIMIZE, VACUUM) that are untestable
  * in-env for lack of the delta jars. The MECHANISM is the public Delta
  * design: an ordered log of commits, each listing files added/removed;
  * a snapshot at version V is (∪ added) − (∪ removed) over commits ≤ V;
  * readers never list the data directory, only the log.
  *
  * Scale notes:
  * - Appends and merges commit ONLY the files they touch; a snapshot read
  *   at 100 TB plans from the log manifest (kilobytes) instead of a
  *   recursive listing of millions of objects — the same reason Delta
  *   scales on object stores.
  * - `optimize()` rewrites data into `targetFileCount` files as a new
  *   commit (bin-packing compaction); older versions still time-travel to
  *   the pre-compaction files until `vacuum(retainVersions)` drops
  *   unreferenced files and truncates the log.
  * - Log commits are tiny driver-side JSON writes (control plane); data
  *   always moves through distributed parquet jobs.
  */
case class VersionedTableDataObject(id: String, path: String,
                                    primaryKey: Seq[String] = Seq.empty)
  extends DataObject with CanCreateDataFrame with CanWriteDataFrame with CanMergeDataFrame
  with CanWriteStreamingDataFrame {

  private def fs(implicit ctx: ActionPipelineContext) =
    new Path(path).getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)
  private def logDir = new Path(path, "_graft_log")

  /** `schema` = the table's DDL as of this commit (union-evolved on
    * append, like the reference's persisted union schema) — snapshot reads
    * apply it instead of trusting whichever file's footer Spark samples. */
  private case class Commit(version: Int, added: Seq[String], removed: Seq[String],
                            schema: Option[String])

  private def readLog(implicit ctx: ActionPipelineContext): Seq[Commit] = {
    if (!fs.exists(logDir)) return Seq.empty
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    fs.listStatus(logDir).map(_.getPath).filter(_.getName.endsWith(".json"))
      .sortBy(_.getName).map { p =>
        val n = om.readTree(readFully(p))
        import scala.jdk.CollectionConverters._
        Commit(n.get("version").asInt,
          n.get("added").elements().asScala.map(_.asText).toSeq,
          n.get("removed").elements().asScala.map(_.asText).toSeq,
          Option(n.get("schema")).map(_.asText))
      }.toSeq
  }

  private def readFully(p: Path)(implicit ctx: ActionPipelineContext): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  private def writeCommit(c: Commit)(implicit ctx: ActionPipelineContext): Unit = {
    def esc(x: String) = "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def arr(xs: Seq[String]) = xs.map(esc).mkString("[", ",", "]")
    val schemaField = c.schema.map(s => s""","schema":${esc(s)}""").getOrElse("")
    val json = s"""{"version":${c.version},"added":${arr(c.added)},"removed":${arr(c.removed)}$schemaField}"""
    // zero-padded name keeps lexicographic == numeric commit order
    val tmp = new Path(logDir, f"_tmp_${c.version}%08d.json")
    val dst = new Path(logDir, f"${c.version}%08d.json")
    fs.mkdirs(logDir)
    val out = fs.create(tmp, false)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
    // rename-commit: concurrent writers race on the same version name and
    // exactly one rename wins (the object-store analogue is put-if-absent)
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(s"DataObject $id: commit ${c.version} conflicts")
  }

  /** Live file set at `asOfVersion` (latest when None). */
  private def snapshotFiles(asOfVersion: Option[Int])(implicit ctx: ActionPipelineContext): Seq[String] = {
    val log = readLog
    require(log.nonEmpty, s"DataObject $id: no committed versions at $path")
    val upTo = asOfVersion.map(v => log.filter(_.version <= v)).getOrElse(log)
    require(upTo.nonEmpty, s"DataObject $id: version ${asOfVersion.get} predates the log")
    val removed = upTo.flatMap(_.removed).toSet
    upTo.flatMap(_.added).filterNot(removed)
  }

  def latestVersion(implicit ctx: ActionPipelineContext): Option[Int] =
    readLog.lastOption.map(_.version)

  override def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                           (implicit ctx: ActionPipelineContext): DataFrame =
    getDataFrameAsOf(None)

  /** Time-travel read: the table exactly as of `version`, under that
    * version's committed schema (older files null-fill later columns —
    * append-evolution semantics without per-file footer sampling). */
  def getDataFrameAsOf(version: Option[Int])(implicit ctx: ActionPipelineContext): DataFrame = {
    val files = snapshotFiles(version)
    require(files.nonEmpty, s"DataObject $id: empty snapshot")
    val log = readLog
    val upTo = version.map(v => log.filter(_.version <= v)).getOrElse(log)
    val schema = upTo.reverse.collectFirst { case Commit(_, _, _, Some(s)) => s }
    val reader = ctx.spark.read
    schema.fold(reader)(s =>
        reader.schema(org.apache.spark.sql.types.StructType.fromDDL(s)))
      .parquet(files.map(f => s"$path/$f"): _*)
  }

  /** Stage `df` as parquet files under a fresh `vNNN-xxxx/` subdir and
    * return their table-relative paths. */
  private def stage(df: DataFrame, version: Int)(implicit ctx: ActionPipelineContext): Seq[String] = {
    val sub = f"v$version%08d-${java.util.UUID.randomUUID.toString.take(8)}"
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$path/$sub")
    fs.listStatus(new Path(path, sub)).map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
      .map(n => s"$sub/$n").toSeq
  }

  override def writeDataFrame(df: DataFrame, partitionValues: Seq[PartitionValues] = Seq.empty,
                              saveMode: Option[SdlSaveMode] = None)
                             (implicit ctx: ActionPipelineContext): ActionMetrics = {
    val t0 = System.currentTimeMillis()
    val log = readLog
    val v = log.lastOption.map(_.version + 1).getOrElse(0)
    val added = stage(df, v)
    val append = saveMode.contains(SdlSaveMode.Append)
    val removed = if (append) Seq.empty else snapshotIfAny(log)
    // schema evolution on append: committed schema = previous ∪ new (the
    // persisted-union-schema rule file objects use); overwrite resets it
    val prevSchema = log.reverse.collectFirst { case Commit(_, _, _, Some(s)) => s }
    val schema = prevSchema match {
      case Some(p) if append =>
        val prev = org.apache.spark.sql.types.StructType.fromDDL(p)
        val extra = df.schema.filterNot(f => prev.exists(_.name.equalsIgnoreCase(f.name)))
        org.apache.spark.sql.types.StructType(prev.fields ++ extra).toDDL
      case _ => df.schema.toDDL
    }
    writeCommit(Commit(v, added, removed, Some(schema)))
    ActionMetrics(recordsWritten = -1, durationMillis = System.currentTimeMillis() - t0)
  }

  /** Copy-on-write gives staged self-overwrite for free: the new version's
    * files are fully written (reading the CURRENT snapshot) before the
    * commit supersedes them — no block-manager materialization needed. */
  override def writeDataFrameStaged(df: DataFrame)(implicit ctx: ActionPipelineContext): ActionMetrics =
    writeDataFrame(df, saveMode = Some(SdlSaveMode.Overwrite))

  private def snapshotIfAny(log: Seq[Commit]): Seq[String] = {
    val removed = log.flatMap(_.removed).toSet
    log.flatMap(_.added).filterNot(removed)
  }

  /** MERGE as a commit: new table state computed by [[MergeEmulation]]
    * (same SaveModeMergeOptions semantics as the reference's Delta merge),
    * committed as supersede-all. A real file-level merge would rewrite
    * only files containing matched keys; the LOG mechanics are identical. */
  override def mergeDataFrame(df: DataFrame, joinCols: Seq[String],
                              options: SaveModeMergeOptions = SaveModeMergeOptions())
                             (implicit ctx: ActionPipelineContext): ActionMetrics = {
    val merged = MergeEmulation.computeMergedState(getDataFrame(), df, joinCols, options)
    writeDataFrame(merged, saveMode = Some(SdlSaveMode.Overwrite))
  }

  /** Streaming sink: each micro-batch is one log commit — append by
    * default, MERGE upsert on the primary key when the action rides
    * `graft.saveMode=merge` (the lakehouse CDC-sink pattern; Delta's
    * streaming write is the same per-batch transaction shape). */
  override def writeStreamingDataFrame(df: DataFrame, trigger: org.apache.spark.sql.streaming.Trigger,
                                       options: Map[String, String], checkpointLocation: String,
                                       queryName: String, outputMode: String = "append")
                                      (implicit ctx: ActionPipelineContext): org.apache.spark.sql.streaming.StreamingQuery = {
    val merge = options.get("graft.saveMode").exists(_.equalsIgnoreCase("merge"))
    val writeBatch: (DataFrame, Long) => Unit = (batch, _) =>
      if (merge) {
        require(primaryKey.nonEmpty, s"DataObject $id: streaming merge needs primaryKey")
        if (latestVersion.isEmpty) { writeDataFrame(batch); () }
        else mergeDataFrame(batch, primaryKey)
        ()
      } else { writeDataFrame(batch, saveMode = Some(SdlSaveMode.Append)); () }
    df.writeStream
      .foreachBatch(writeBatch)
      .option("checkpointLocation", checkpointLocation)
      .outputMode(outputMode).trigger(trigger).queryName(queryName)
      .start()
  }

  /** Compaction (reference Delta OPTIMIZE): rewrite the live snapshot into
    * `targetFileCount` files as a new commit. Data identical, file count
    * drops; prior versions still resolve to the pre-compaction files. */
  def optimize(targetFileCount: Int)(implicit ctx: ActionPipelineContext): Int = {
    val log = readLog
    val live = snapshotIfAny(log)
    val v = log.last.version + 1
    val current = getDataFrame()
    val added = stage(current.repartition(targetFileCount), v)
    writeCommit(Commit(v, added, live, Some(current.schema.toDDL)))
    added.size
  }

  /** Retention (reference Delta VACUUM): drop log entries older than the
    * last `retainVersions` commits and physically delete files no longer
    * referenced by any retained snapshot. Time travel before the horizon
    * then fails loudly (as in Delta after VACUUM). */
  def vacuum(retainVersions: Int)(implicit ctx: ActionPipelineContext): Seq[String] = {
    val log = readLog
    val cut = log.map(_.version).sorted.takeRight(retainVersions).headOption.getOrElse(0)
    val (old, kept) = log.partition(_.version < cut)
    if (old.isEmpty) return Seq.empty
    // files referenced by any retained snapshot (= live at some version >= cut):
    // everything added at >= cut, plus the carried-over base = snapshot(cut-? ) —
    // compute as snapshot at `cut`'s predecessor state folded into the first
    // retained commit: simplest correct form is files live at ANY retained version.
    val retainedLive = kept.map(_.version)
      .flatMap(v => snapshotFiles(Some(v))).toSet
    val deletable = (old.flatMap(_.added).toSet -- retainedLive).toSeq.sorted
    deletable.foreach(f => fs.delete(new Path(path, f), false))
    // rebase: fold the pre-horizon history into a synthetic base commit at
    // version `cut` listing exactly snapshot(cut)'s files, then drop old logs
    val baseFiles = snapshotFiles(Some(cut))
    val baseSchema = log.filter(_.version <= cut).reverse
      .collectFirst { case Commit(_, _, _, Some(s)) => s }
    old.foreach(c => fs.delete(new Path(logDir, f"${c.version}%08d.json"), false))
    fs.delete(new Path(logDir, f"$cut%08d.json"), false)
    writeCommit(Commit(cut, baseFiles, Seq.empty, baseSchema))
    // later retained commits stay as-is: their removed-lists reference only
    // files present in the rebased base or in retained adds (removal of an
    // already-gone name is a no-op in snapshot resolution)
    deletable
  }
}
