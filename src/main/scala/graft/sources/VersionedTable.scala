package graft.sources

import graft.core._
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.sources.{Filter, EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, In, IsNull, IsNotNull, And, Or, Not}
import org.apache.hadoop.fs.Path

/** Snapshot-versioned parquet table with a file-level transaction log —
  * the from-scratch stand-in for the lakehouse features of the reference's
  * `DeltaLakeTableDataObject` (`sdl-deltalake/.../DeltaLakeTableDataObject
  * .scala:102-450`: time travel, MERGE, OPTIMIZE, VACUUM) that are
  * untestable in-env for lack of the delta jars. The MECHANISM is the
  * public Delta design: an ordered log of commits, each listing files
  * added/removed plus PER-FILE STATS (row count, per-column min/max/null
  * count harvested from the parquet footers); a snapshot at version V is
  * (∪ added) − (∪ removed) over commits ≤ V; readers never list the data
  * directory, only the log.
  *
  * Scale notes:
  * - MERGE is file-pruned, not copy-the-table: update-key bounds intersect
  *   the per-file min/max ranges from the log (driver-side, O(files), zero
  *   data I/O), then an exact key semi-join over only the candidate files
  *   finds the files actually containing matched keys. Only those files are
  *   rewritten; every other file is carried by reference. A streaming CDC
  *   micro-batch therefore costs O(touched files), not O(table) — the same
  *   findTouchedFiles design Delta's MERGE uses.
  * - Reads data-skip: `getDataFrameFiltered` evaluates pushed predicates
  *   against the same per-file stats and plans only surviving files — the
  *   read-side half of the stats story (Delta data skipping).
  * - Stats come from parquet FOOTERS (kilobytes per file, driver-side,
  *   O(files) — never a second scan of the data), which also yields exact
  *   `recordsWritten` metrics for free.
  * - `optimize()` rewrites data into `targetFileCount` files as a new
  *   commit (bin-packing compaction); older versions still time-travel to
  *   the pre-compaction files until `vacuum(retainVersions)` drops
  *   unreferenced files and truncates the log.
  * - Log commits are tiny driver-side JSON writes (control plane); data
  *   always moves through distributed parquet jobs.
  */
case class VersionedTableDataObject(id: String, path: String,
                                    primaryKey: Seq[String] = Seq.empty,
                                    checkpointInterval: Int = 10,
                                    /** partition columns (the Delta `partitionValues` design):
                                      * values live in the LOG, not the data files — partition
                                      * deletes are metadata-only commits, dynamic partition
                                      * overwrite supersedes exactly the written partitions, and
                                      * partition filters prune at plan time without reading a
                                      * footer */
                                    partitions: Seq[String] = Seq.empty,
                                    /** materialize per-commit change rows under `_graft_cdc/`
                                      * (the public Delta CDF design: DML writes change data files
                                      * alongside data files), making the table a STREAMING CDC
                                      * source via [[getStreamingDataFrame]] — Spark's file stream
                                      * source handles offsets/checkpointing, so a consumer needs
                                      * no state plumbing. Requires `primaryKey`. */
                                    changeDataFeed: Boolean = false,
                                    /** merge-on-read DELETE (the public Delta deletion-vector
                                      * design): [[deleteWhere]] records matching (file, row_index)
                                      * positions under `_graft_dv/` instead of rewriting the
                                      * touched files — a delete costs O(matched rows), not
                                      * O(touched-file rewrite); every read anti-joins the active
                                      * DV set. OPTIMIZE rewrites files clean; VACUUM sweeps only
                                      * unreferenced tombstone dirs. */
                                    deletionVectors: Boolean = false,
                                    /** name-mapped physical columns (the public Delta column-
                                      * mapping design): every column gets an immutable
                                      * writer-unique PHYSICAL name at creation; the log carries
                                      * the logical→physical map. [[renameColumn]] and
                                      * [[dropColumn]] are then METADATA-ONLY commits — renaming
                                      * or dropping a column on a 100 TB table moves zero data
                                      * bytes, and a column re-added after a drop gets a fresh
                                      * physical name so the dropped data can never resurrect.
                                      * Must be chosen at table creation (existing physical names
                                      * are immutable). */
                                    columnMapping: Boolean = false,
                                    /** generated columns (the public Delta GENERATED ALWAYS AS
                                      * design): logical column → SQL generation expression over
                                      * the feed's other columns. A write that OMITS the column
                                      * gets it populated inside the write plan (no extra scan);
                                      * a write that PROVIDES it is validated row-by-row against
                                      * the expression (raise_error, like a CHECK constraint).
                                      * The headline use is a generated PARTITION column
                                      * (`day -> "CAST(ts AS DATE)"`): writers never supply it,
                                      * and source-column filters still skip files because this
                                      * table logs per-file min/max for the SOURCE column too —
                                      * the log-backed stats give what Delta needs expression
                                      * inference for. */
                                    generatedColumns: Seq[(String, String)] = Seq.empty,
                                    /** identity columns (the public Delta GENERATED ALWAYS AS
                                      * IDENTITY design): LongType columns the WRITE PLAN
                                      * populates with unique, strictly-increasing values —
                                      * never dense (gaps are the contract; uniqueness comes
                                      * from base + monotonically_increasing_id, coordination-
                                      * free across a cluster). The log carries a per-column
                                      * high-water mark ("idhw"); the next write starts above
                                      * it, derived from the staged files' OWN footer stats
                                      * (no extra scan). GENERATED ALWAYS: feeds may not
                                      * provide the column; MERGE is refused on identity
                                      * tables (the Delta contract); RESTORE never lowers the
                                      * mark, so reused versions cannot collide. */
                                    identityColumns: Seq[String] = Seq.empty,
                                    /** optimized write (the public Delta/Databricks
                                      * optimizeWrite design): shuffle the staged data by the
                                      * partition columns before partitionBy, so each partition
                                      * value is written by ONE task — without it a W-task
                                      * write into P partition values sprays up to W×P small
                                      * files (the classic small-files explosion; at 1000
                                      * executors × daily partitions that is the difference
                                      * between 365 files and 365,000). Trade: one extra
                                      * shuffle, and a skewed partition value serializes into
                                      * one task (Delta bins by size to mitigate; callers with
                                      * heavy skew should pre-salt or leave this off). */
                                    optimizedWrite: Boolean = false,
                                    /** row-level CHECK constraints enforced during every write,
                                      * merge and update (the Delta CHECK-constraint/invariant
                                      * design: raise_error rides the write plan, zero extra
                                      * scans) */
                                    constraints: Seq[graft.quality.Constraint] = Seq.empty,
                                    /** dataset-level expectations validated around writes, same
                                      * machinery as the file/table objects (reference attaches
                                      * them to DeltaLakeTableDataObject the same way) */
                                    expectations: Seq[graft.quality.Expectation] = Seq.empty)
  extends DataObject with CanCreateDataFrame with CanWriteDataFrame with CanMergeDataFrame
  with CanWriteStreamingDataFrame with CanCreateStreamingDataFrame
  with CanCreateIncrementalOutput with CanHandlePartitions {

  require(!changeDataFeed || primaryKey.nonEmpty,
    s"DataObject $id: changeDataFeed requires primaryKey (the CDF diff joins on it)")

  /** last version consumed by [[graft.operators.modes.CdcIncrementalMode]]
    * — rides the RunStateStore like every other incremental source */
  @transient private var consumedVersion: Option[String] = None
  override def setState(state: Option[String])(implicit ctx: ActionPipelineContext): Unit =
    consumedVersion = state
  override def getState: Option[String] = consumedVersion

  private def fs(implicit ctx: ActionPipelineContext) =
    new Path(path).getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)
  private def logDir = new Path(path, "_graft_log")

  /** Spark's on-disk sentinel for a NULL partition value
    * (`PartitioningUtils.DEFAULT_PARTITION_NAME`). The LOG stores the
    * sentinel verbatim (the directory-name truth); every read-side
    * boundary — the FileIndex partition row, `listPartitions`, stats —
    * translates it back to null. */
  private val NullPartitionName = "__HIVE_DEFAULT_PARTITION__"

  /** Does a file's logged partition values match a caller's partition
    * spec? A null (or sentinel) spec value selects the null partition.
    * Spec keys are LOGICAL; the logged pv keys are physical. */
  private def pvMatches(filePv: Map[String, String], spec: PartitionValues,
                        colMap: Map[String, String] = Map.empty): Boolean =
    spec.elements.forall { case (k, v) =>
      val want = if (v == null) NullPartitionName else v
      filePv.get(colMap.getOrElse(k, k)).contains(want)
    }

  /** Per-file footer stats: row count + file size + canonical-string
    * min/max and null count per (supported, ≤64-char) top-level column.
    * Canonical encoding: integral/date(days)/timestamp(micros)/boolean as
    * decimal longs, float/double as doubles, strings verbatim — so
    * compares stay exact and type-directed without re-parsing parquet
    * types at prune time. `bytes` lets the read-side FileIndex synthesize
    * FileStatus entries from the LOG — planning a snapshot performs zero
    * filesystem RPCs (the Delta property that matters on object stores). */
  private[graft] case class FileStat(rows: Long, min: Map[String, String],
                                     max: Map[String, String], nulls: Map[String, Long],
                                     bytes: Long = 0L,
                                     /** raw partition values of this file (one partition per
                                       * file — partitionBy staging guarantees it) */
                                     pv: Map[String, String] = Map.empty)

  /** `schema` = the table's DDL as of this commit (union-evolved on
    * append, like the reference's persisted union schema) — snapshot reads
    * apply it instead of trusting whichever file's footer Spark samples.
    * `stats` keys are table-relative paths of this commit's added files;
    * absent stats (older log formats, footerless files) degrade to
    * "always a candidate" — pruning is strictly an optimization. */
  /** `ts` = commit wall-clock millis (the public Delta in-commit-timestamp
    * design), written at commit time; −1 on pre-timestamp log formats.
    * Powers [[versionAsOfTimestamp]]; vacuum's rebase carries the horizon
    * commit's original ts so timestamp travel stays correct after it. */
  private[graft] case class Commit(version: Int, added: Seq[String], removed: Seq[String],
                                   schema: Option[String], stats: Map[String, FileStat] = Map.empty,
                                   ts: Long = -1L,
                                   /** operation tag (WRITE/APPEND/MERGE/…) — the Delta
                                     * commitInfo.operation design, surfaced by [[history]] */
                                   op: String = "",
                                   /** ABSOLUTE replacement for the state's active
                                     * deletion-vector versions (RESTORE / DV_MATERIALIZE /
                                     * vacuum rebase); None = inherit. Entries are DV dir
                                     * NAMES under `_graft_dv/` (writer-unique `vNNNNNNNN-hex8`,
                                     * like data staging dirs — two racing deletes can never
                                     * clobber or cross-reference each other's tombstones) */
                                   dvSet: Option[Seq[String]] = None,
                                   /** ABSOLUTE replacement for the logical→physical column
                                     * map (column-mapping tables: creation, schema-evolving
                                     * commits, RENAME/DROP COLUMN, RESTORE, vacuum rebase);
                                     * None = inherit */
                                   colMapSet: Option[Map[String, String]] = None,
                                   /** per-column identity high-water marks AFTER this commit
                                     * (the Delta IDENTITY highWaterMark design); None =
                                     * inherit. Monotonic: RESTORE inherits rather than
                                     * reverting, so reused versions can never collide. */
                                   idSet: Option[Map[String, Long]] = None,
                                   /** application transaction marks recorded by this commit
                                     * (the public Delta SetTransaction action: appId →
                                     * txnVersion). Merged into the state's txnHw — a retried
                                     * idempotent write sees its own mark and skips. Like
                                     * idHw, marks only advance (RESTORE inherits). */
                                   txnSet: Option[Map[String, Long]] = None)

  private def om = new com.fasterxml.jackson.databind.ObjectMapper()

  /** The materialized table state at one version — what a reader needs
    * (live files in add order, their stats, the committed schema) without
    * any per-commit history. Reconstructed from the newest CHECKPOINT at
    * or below the target version plus the commit tail after it — the
    * public Delta checkpoint design: without it every operation re-parses
    * the ENTIRE commit history, O(commits) driver I/O that grows without
    * bound under a streaming sink committing once per micro-batch. */
  private[graft] case class TableState(version: Int, files: Seq[String],
                                       stats: Map[String, FileStat], schemaDdl: Option[String],
                                       /** in-commit timestamp of the newest folded commit (−1 =
                                         * pre-timestamp log format) — checkpointed, so vacuum
                                         * recovery restores the horizon's exact ts */
                                       ts: Long = -1L,
                                       /** active deletion-vector versions at this state (the
                                         * Delta DV design): every read of this snapshot
                                         * anti-joins these versions' (file, row_index) sets */
                                       dv: Seq[String] = Seq.empty,
                                       /** logical→physical column names (column-mapping
                                         * tables; empty = identity). Stats keys, file footers
                                         * and partition dir names are PHYSICAL; the committed
                                         * schema is LOGICAL. */
                                       colMap: Map[String, String] = Map.empty,
                                       /** identity-column high-water marks at this state */
                                       idHw: Map[String, Long] = Map.empty,
                                       /** application transaction marks (appId → newest
                                         * txnVersion) — the idempotent-write ledger */
                                       txnHw: Map[String, Long] = Map.empty) {
    def schema: Option[StructType] = schemaDdl.map(StructType.fromDDL)
  }

  /** physical name of a logical column under `colMap` (identity when unmapped) */
  private def phys(colMap: Map[String, String], c: String): String = colMap.getOrElse(c, c)

  private def physSchema(sc: StructType, colMap: Map[String, String]): StructType =
    if (colMap.isEmpty) sc
    else StructType(sc.map(f => f.copy(name = phys(colMap, f.name))))

  /** fresh writer-unique physical name for a newly created logical column
    * (column-mapping tables) — a re-added column can never collide with a
    * dropped predecessor's physical data */
  private def freshPhys(logical: String): String =
    s"$logical-x${java.util.UUID.randomUUID.toString.take(8)}"

  /** colMap for a commit introducing `fields` as the full (overwrite) or
    * added (evolution) logical columns: existing mappings carry, new
    * logical names get fresh physical names. Identity tables return empty. */
  private def assignPhys(base: Map[String, String], fields: Seq[StructField]): Map[String, String] =
    if (!columnMapping) Map.empty
    else base ++ fields.filterNot(f => base.contains(f.name)).map(f => f.name -> freshPhys(f.name))

  /** Populate ABSENT generated columns inside the write plan (projection
    * only — no extra scan); PRESENT ones are validated by
    * [[generatedConstraints]] instead (Delta refuses a provided value
    * that contradicts the generation expression). */
  private def applyGeneratedColumns(df: DataFrame): DataFrame =
    generatedColumns.foldLeft(df) { case (d, (c, g)) =>
      if (d.columns.exists(_.equalsIgnoreCase(c))) d
      else d.withColumn(c, expr(g))
    }

  /** Drop-and-regenerate every generated column PRESENT in `df` from its
    * expression — the post-image rule shared by UPDATE, UPDATE_DV and (since
    * r13) both MERGE paths: a clause that changes a generated column's
    * source column must flow through to the generated value, or the row
    * commits contradicting its expression (and lands in the wrong
    * partition). Idempotent for rows whose value already satisfies it. */
  private def regenerate(df: DataFrame): DataFrame =
    generatedColumns.foldLeft(df) { case (d, (c, g)) =>
      if (d.columns.exists(_.equalsIgnoreCase(c))) d.withColumn(c, expr(g)) else d }

  /** row-level validation for generated columns the feed PROVIDED — rides
    * the same raise_error wrapper as CHECK constraints */
  private def generatedConstraints(df: DataFrame): Seq[graft.quality.Constraint] =
    generatedColumns.collect { case (c, g) if df.columns.exists(_.equalsIgnoreCase(c)) =>
      graft.quality.Constraint(s"generated:$c", s"`$c` <=> ($g)", errorMsgCols = Seq(c))
    }

  /** The columnMapping flag is a CREATION-TIME property: flipping it on an
    * existing table makes every pre-flip file read all-NULL (the map and
    * the files' physical names no longer agree), silently. Refuse loudly
    * on the first write instead. */
  private def guardColumnMappingFlag(st: Option[TableState]): Unit =
    st.filter(_.files.nonEmpty).foreach { s =>
      s.schema.foreach { sc =>
        if (columnMapping)
          require(sc.forall(f => s.colMap.contains(f.name)),
            s"DataObject $id: columnMapping=true but the existing table was written without " +
              "a column map — pre-flip files would read as NULL; the flag is fixed at table creation")
        else
          require(s.colMap.isEmpty,
            s"DataObject $id: columnMapping=false but the existing table carries a column map — " +
              "mapped files would read as NULL; the flag is fixed at table creation")
      }
    }

  /** Concurrent column-mapping DDL detection for the optimistic-commit
    * retry loops: this transaction's files are staged under `stagedMap`'s
    * physical names; committing is only safe if the fresh head still binds
    * every staged logical column to that same physical name. A concurrent
    * RENAME/DROP of a staged column (or a same-name concurrent add, which
    * assigns a DIFFERENT fresh physical name) would publish a column that
    * reads all-NULL — the Delta analogue raises MetadataChangedException. */
  private[graft] def colMapConflicts(headMap: Map[String, String], stagedMap: Map[String, String],
                              preMap: Map[String, String], stagedCols: Seq[String]): Boolean =
    columnMapping && stagedCols.exists { c =>
      headMap.get(c) match {
        case Some(p) => p != stagedMap.getOrElse(c, c)
        case None => preMap.contains(c) // renamed or dropped concurrently
      }
    }

  /** Log-file parse counter (commit + checkpoint JSONs actually read) —
    * instrumentation for the checkpoint-bounded-replay spec. */
  @transient private[graft] var logFilesParsed: Long = 0L

  /** Session-scoped parsed-STATE cache, keyed by version (r19 VERDICT #6).
    * A committed version's state is immutable (commit files are
    * write-once), so a state replayed once per (instance, version) serves
    * every later read in the session — repeated merges/time-travels stop
    * re-parsing the O(tail) JSON per operation; at production commit
    * rates this is the difference between O(ops) and O(ops × tail) log
    * parses per session (Delta's Snapshot cache, in miniature). Bounded
    * LRU (states carry file lists + stats maps); cleared by [[vacuum]],
    * the only operation that rewrites log history (post-vacuum reads
    * below the horizon must throw, not serve a cached pre-vacuum state).
    * Guarded by its own monitor: streaming listener threads read state
    * concurrently with the driver. */
  @transient private lazy val stateCache =
    new java.util.LinkedHashMap[Int, TableState](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Int, TableState]): Boolean =
        size > 8
    }

  /** ONE listing serves commit and checkpoint discovery. Only committed
    * names (NNNNNNNN.json / NNNNNNNN.checkpoint.json): a concurrent
    * writer's _tmp_* file can vanish between list and read (it renames or
    * deletes it), and half-written tmp content must never parse as log. */
  private def listLog(implicit ctx: ActionPipelineContext): (Seq[Int], Seq[Int]) = {
    if (!fs.exists(logDir)) return (Seq.empty, Seq.empty)
    val names = fs.listStatus(logDir).map(_.getPath.getName)
    (names.filter(_.matches("""\d{8}\.json""")).map(_.take(8).toInt).sorted.toSeq,
     names.filter(_.matches("""\d{8}\.checkpoint\.json""")).map(_.take(8).toInt).sorted.toSeq)
  }

  private def parseStats(v: com.fasterxml.jackson.databind.JsonNode): FileStat = {
    import scala.jdk.CollectionConverters._
    def strMap(f: String) = Option(v.get(f)).map(_.fields().asScala
      .map(x => x.getKey -> x.getValue.asText).toMap).getOrElse(Map.empty[String, String])
    def longMap(f: String) = Option(v.get(f)).map(_.fields().asScala
      .map(x => x.getKey -> x.getValue.asLong).toMap).getOrElse(Map.empty[String, Long])
    FileStat(v.get("rows").asLong, strMap("min"), strMap("max"), longMap("nulls"),
      Option(v.get("bytes")).map(_.asLong).getOrElse(0L), strMap("pv"))
  }

  private def parseCommit(version: Int)(implicit ctx: ActionPipelineContext): Commit = {
    import scala.jdk.CollectionConverters._
    logFilesParsed += 1
    val n = om.readTree(readFully(new Path(logDir, f"$version%08d.json")))
    val stats = Option(n.get("stats")).map(_.fields().asScala
      .map(e => e.getKey -> parseStats(e.getValue)).toMap)
      .getOrElse(Map.empty[String, FileStat])
    Commit(n.get("version").asInt,
      n.get("added").elements().asScala.map(_.asText).toSeq,
      n.get("removed").elements().asScala.map(_.asText).toSeq,
      Option(n.get("schema")).map(_.asText), stats,
      Option(n.get("ts")).map(_.asLong).getOrElse(-1L),
      Option(n.get("op")).map(_.asText).getOrElse(""),
      Option(n.get("dv")).map(_.elements().asScala.map(_.asText).toSeq),
      Option(n.get("colmap")).map(_.fields().asScala
        .map(e => e.getKey -> e.getValue.asText).toMap),
      Option(n.get("idhw")).map(_.fields().asScala
        .map(e => e.getKey -> e.getValue.asLong).toMap),
      Option(n.get("txn")).map(_.fields().asScala
        .map(e => e.getKey -> e.getValue.asLong).toMap))
  }

  /** Full per-commit history — needed ONLY where commit granularity is the
    * point (vacuum's log rebase). Everything else reads [[readState]]. */
  private def readLog(implicit ctx: ActionPipelineContext): Seq[Commit] =
    listLog._1.map(parseCommit)

  /** Best-effort checkpoint read; None on absence or damage (a checkpoint
    * is a pure read optimization — fall back to commit replay). */
  private def readCheckpoint(version: Int)(implicit ctx: ActionPipelineContext): Option[TableState] =
    try {
      import scala.jdk.CollectionConverters._
      logFilesParsed += 1
      val n = om.readTree(readFully(new Path(logDir, f"$version%08d.checkpoint.json")))
      val entries = n.get("files").elements().asScala.toSeq
      Some(TableState(n.get("version").asInt,
        entries.map(_.get("path").asText),
        entries.flatMap(e => Option(e.get("stat")).map(s => e.get("path").asText -> parseStats(s))).toMap,
        Option(n.get("schema")).map(_.asText),
        Option(n.get("ts")).map(_.asLong).getOrElse(-1L),
        Option(n.get("dv")).map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Seq.empty),
        Option(n.get("colmap")).map(_.fields().asScala
          .map(e => e.getKey -> e.getValue.asText).toMap).getOrElse(Map.empty),
        Option(n.get("idhw")).map(_.fields().asScala
          .map(e => e.getKey -> e.getValue.asLong).toMap).getOrElse(Map.empty),
        Option(n.get("txnhw")).map(_.fields().asScala
          .map(e => e.getKey -> e.getValue.asLong).toMap).getOrElse(Map.empty)))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** State at `version` (latest when None): newest usable checkpoint +
    * fold of the ≤ checkpointInterval commits after it — O(tail), never
    * O(history). None = empty log. Throws when `version` predates the
    * retained log (same contract as before). A checkpoint ALONE (no
    * commit at or below it) is a readable state too — that is the
    * mid-vacuum crash window, where the rebased checkpoint at the
    * horizon carries the whole base until the synthetic base commit
    * lands (see [[vacuum]]'s phase ordering). */
  private[graft] def readState(version: Option[Int] = None)
                              (implicit ctx: ActionPipelineContext): Option[TableState] = {
    val (commits, cps) = listLog
    if (commits.isEmpty && cps.isEmpty) return None
    val target = version.getOrElse((commits ++ cps).max)
    // the listing above (no JSON parse) is what discovers new commits;
    // the parsed state at a given version is immutable → cache hit skips
    // the checkpoint + commit-tail replay entirely
    stateCache.synchronized {
      Option(stateCache.get(target)) match {
        case hit @ Some(_) => return hit
        case None => ()
      }
    }
    val usable = commits.filter(_ <= target)
    val base = cps.filter(_ <= target).sorted.reverse.iterator
      .map(readCheckpoint).collectFirst { case Some(st) => st }
    require(usable.nonEmpty || base.nonEmpty,
      s"DataObject $id: version $target predates the log")
    val init = base.getOrElse(TableState(-1, Seq.empty, Map.empty, None))
    val st = usable.filter(_ > init.version).foldLeft(init) { (s, v) =>
      val c = parseCommit(v)
      val rm = c.removed.toSet
      TableState(c.version, s.files.filterNot(rm) ++ c.added,
        (s.stats -- rm) ++ c.stats, c.schema.orElse(s.schemaDdl),
        if (c.ts >= 0) c.ts else s.ts,
        c.dvSet.getOrElse(s.dv),
        c.colMapSet.getOrElse(s.colMap),
        s.idHw ++ c.idSet.getOrElse(Map.empty),
        s.txnHw ++ c.txnSet.getOrElse(Map.empty))
    }
    // cache under the RESOLVED state's version, not the requested target:
    // a target between commits resolves to the nearest state at or below
    // it, and a later commit AT the requested number must not be shadowed
    stateCache.synchronized { stateCache.put(st.version, st) }
    Some(st)
  }

  private def stateOrFail(version: Option[Int])(implicit ctx: ActionPipelineContext): TableState =
    readState(version).getOrElse(
      throw new IllegalArgumentException(s"DataObject $id: no committed versions at $path"))

  /** Write the checkpoint for `version` (deterministic content — racing
    * writers produce identical bytes, so replace is safe). Best effort:
    * a failed checkpoint costs replay time, never correctness. */
  private def writeCheckpoint(version: Int)(implicit ctx: ActionPipelineContext): Unit =
    try writeCheckpointOrFail(version)
    catch { case scala.util.control.NonFatal(_) => }

  /** Checkpoint write that THROWS on failure — for callers where the
    * checkpoint is load-bearing (vacuum's rebase shadows the history it
    * is about to delete behind this file). */
  private def writeCheckpointOrFail(version: Int)(implicit ctx: ActionPipelineContext): Unit = {
      val st = readState(Some(version)).getOrElse(return)
      val root = om.createObjectNode()
      root.put("version", st.version)
      if (st.ts >= 0) root.put("ts", st.ts)
      st.schemaDdl.foreach(root.put("schema", _))
      if (st.dv.nonEmpty) { val d = root.putArray("dv"); st.dv.foreach(d.add) }
      if (st.colMap.nonEmpty) {
        val cm = root.putObject("colmap")
        st.colMap.toSeq.sortBy(_._1).foreach { case (k, v) => cm.put(k, v) }
      }
      if (st.idHw.nonEmpty) {
        val ih = root.putObject("idhw")
        st.idHw.toSeq.sortBy(_._1).foreach { case (k, v) => ih.put(k, v) }
      }
      if (st.txnHw.nonEmpty) {
        val th = root.putObject("txnhw")
        st.txnHw.toSeq.sortBy(_._1).foreach { case (k, v) => th.put(k, v) }
      }
      val fl = root.putArray("files")
      st.files.foreach { f =>
        val e = fl.addObject()
        e.put("path", f)
        st.stats.get(f).foreach { s =>
          val n = e.putObject("stat")
          n.put("rows", s.rows); n.put("bytes", s.bytes)
          val mn = n.putObject("min"); s.min.toSeq.sortBy(_._1).foreach { case (k, v) => mn.put(k, v) }
          val mx = n.putObject("max"); s.max.toSeq.sortBy(_._1).foreach { case (k, v) => mx.put(k, v) }
          val nl = n.putObject("nulls"); s.nulls.toSeq.sortBy(_._1).foreach { case (k, v) => nl.put(k, v) }
          if (s.pv.nonEmpty) {
            val pv = n.putObject("pv"); s.pv.toSeq.sortBy(_._1).foreach { case (k, v) => pv.put(k, v) }
          }
        }
      }
      val bytes = om.writeValueAsString(root).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val tmpName = f"_tmp_cp_$version%08d-${java.util.UUID.randomUUID.toString.take(8)}.json"
      val dstName = f"$version%08d.checkpoint.json"
      if ("file".equalsIgnoreCase(fs.getUri.getScheme)) {
        val dir = java.nio.file.Paths.get(logDir.toUri.getPath)
        val tmp = dir.resolve(tmpName)
        java.nio.file.Files.write(tmp, bytes)
        java.nio.file.Files.move(tmp, dir.resolve(dstName),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } else {
        val tmp = new Path(logDir, tmpName); val dst = new Path(logDir, dstName)
        val out = fs.create(tmp, false)
        try out.write(bytes) finally out.close()
        fs.delete(dst, false) // identical-content race: replace window is benign
        if (!fs.rename(tmp, dst)) { fs.delete(tmp, false)
          throw new java.io.IOException(s"DataObject $id: checkpoint rename failed for $dstName") }
      }
  }

  private def readFully(p: Path)(implicit ctx: ActionPipelineContext): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Attempt the rename-commit; false = another writer claimed the
    * version (optimistic-concurrency loss, caller decides how to retry —
    * the public Delta commit protocol). The winner of every
    * `checkpointInterval`-th version also writes that version's
    * checkpoint, bounding every later reader's replay to ≤ interval
    * commits. */
  private def tryCommit(c: Commit)(implicit ctx: ActionPipelineContext): Boolean = {
    val won = tryCommitRaw(c)
    if (won && checkpointInterval > 0 && c.version > 0 && c.version % checkpointInterval == 0)
      writeCheckpoint(c.version)
    won
  }

  /** injectable clock for deterministic timestamp-travel specs */
  @transient private[graft] var clock: () => Long = () => System.currentTimeMillis()

  /** Monotonic commit timestamp (the Delta in-commit-timestamp clamp:
    * max(parent + 1, now)) — without it a backward clock step or skewed
    * second writer makes [[versionAsOfTimestamp]]'s newest-first scan
    * resolve to a version that includes LATER-committed changes. One
    * tiny predecessor-commit read; absent/unreadable predecessor (v0,
    * vacuum windows, pre-ts formats) degrades to the raw clock. */
  private def monotonicTs(version: Int)(implicit ctx: ActionPipelineContext): Long = {
    val prevTs =
      try { if (version > 0) parseCommit(version - 1).ts else -1L }
      catch { case scala.util.control.NonFatal(_) => -1L }
    math.max(clock(), prevTs + 1)
  }

  private def tryCommitRaw(c: Commit)(implicit ctx: ActionPipelineContext): Boolean = {
    val root = om.createObjectNode()
    root.put("version", c.version)
    root.put("ts", if (c.ts >= 0) c.ts else monotonicTs(c.version))
    if (c.op.nonEmpty) root.put("op", c.op)
    c.dvSet.foreach { vs => val d = root.putArray("dv"); vs.foreach(d.add) }
    c.colMapSet.foreach { m =>
      val cm = root.putObject("colmap")
      m.toSeq.sortBy(_._1).foreach { case (k, v) => cm.put(k, v) }
    }
    c.idSet.foreach { m =>
      val ih = root.putObject("idhw")
      m.toSeq.sortBy(_._1).foreach { case (k, v) => ih.put(k, v) }
    }
    c.txnSet.foreach { m =>
      val th = root.putObject("txn")
      m.toSeq.sortBy(_._1).foreach { case (k, v) => th.put(k, v) }
    }
    val a = root.putArray("added"); c.added.foreach(a.add)
    val r = root.putArray("removed"); c.removed.foreach(r.add)
    c.schema.foreach(root.put("schema", _))
    if (c.stats.nonEmpty) {
      val s = root.putObject("stats")
      c.stats.toSeq.sortBy(_._1).foreach { case (f, st) =>
        val n = s.putObject(f)
        n.put("rows", st.rows)
        n.put("bytes", st.bytes)
        val mn = n.putObject("min"); st.min.toSeq.sortBy(_._1).foreach { case (k, v) => mn.put(k, v) }
        val mx = n.putObject("max"); st.max.toSeq.sortBy(_._1).foreach { case (k, v) => mx.put(k, v) }
        val nl = n.putObject("nulls"); st.nulls.toSeq.sortBy(_._1).foreach { case (k, v) => nl.put(k, v) }
        if (st.pv.nonEmpty) {
          val pv = n.putObject("pv"); st.pv.toSeq.sortBy(_._1).foreach { case (k, v) => pv.put(k, v) }
        }
      }
    }
    val json = om.writeValueAsString(root)
    val bytes = json.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    fs.mkdirs(logDir)
    // zero-padded name keeps lexicographic == numeric commit order;
    // writer-unique tmp so concurrent committers never collide before
    // the put-if-absent race itself
    val tmpName = f"_tmp_${c.version}%08d-${java.util.UUID.randomUUID.toString.take(8)}.json"
    val dstName = f"${c.version}%08d.json"
    if ("file".equalsIgnoreCase(fs.getUri.getScheme)) {
      // POSIX rename() REPLACES an existing destination, so two racing
      // renames can both "succeed" and silently clobber a commit. Hard
      // links are the local-FS atomic put-if-absent: link(dst, tmp)
      // fails with FileAlreadyExists iff someone else committed first.
      val dir = java.nio.file.Paths.get(logDir.toUri.getPath)
      val tmp = dir.resolve(tmpName)
      java.nio.file.Files.write(tmp, bytes)
      try { java.nio.file.Files.createLink(dir.resolve(dstName), tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
      finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      // HDFS rename is atomic and FAILS on an existing destination —
      // the standard commit protocol there; object stores would use a
      // conditional put instead
      val tmp = new Path(logDir, tmpName)
      val dst = new Path(logDir, dstName)
      val out = fs.create(tmp, false)
      try out.write(bytes) finally out.close()
      val won = fs.rename(tmp, dst)
      if (!won) { fs.delete(tmp, false); () }
      won
    }
  }

  private def writeCommit(c: Commit)(implicit ctx: ActionPipelineContext): Unit =
    if (!tryCommit(c))
      throw new java.util.ConcurrentModificationException(
        s"DataObject $id: commit ${c.version} lost the rename race")

  /** Live file set at `asOfVersion` (latest when None). */
  private[graft] def snapshotFiles(asOfVersion: Option[Int] = None)(implicit ctx: ActionPipelineContext): Seq[String] =
    stateOrFail(asOfVersion).files

  /** Head version straight off the directory listing — zero log parses.
    * Checkpoints count: during vacuum's crash window the head state may
    * live only in the rebased checkpoint (a checkpoint at v implies
    * commit v was once committed). */
  def latestVersion(implicit ctx: ActionPipelineContext): Option[Int] = {
    val (c, cp) = listLog
    (c ++ cp).maxOption
  }

  override def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                           (implicit ctx: ActionPipelineContext): DataFrame = {
    val df = getDataFrameAsOf(None)
    // the predicate reaches the log-backed index → plan-time partition pruning
    PartitionValues.filterExpr(partitionValues).fold(df)(e => df.where(expr(e)))
  }

  /** distinct partition values of the LIVE snapshot — straight from the
    * log, no listing */
  override def listPartitions(implicit ctx: ActionPipelineContext): Seq[PartitionValues] =
    if (partitions.isEmpty) Seq.empty
    else readState(None).toSeq.flatMap { st =>
      val inv = partitions.map(p => phys(st.colMap, p) -> p).toMap
      st.files.flatMap(f => st.stats.get(f).map(_.pv).filter(_.nonEmpty))
        .distinct.map(pv => PartitionValues(pv.map { case (k, v) =>
          inv.getOrElse(k, k) -> (if (v == NullPartitionName) null else v) }))
    }

  /** Partition delete = ONE metadata commit removing the partitions'
    * files by reference — zero data I/O (partitionBy staging guarantees
    * one partition per file). The files stay on disk for time travel
    * until VACUUM. */
  override def deletePartitions(pvs: Seq[PartitionValues])(implicit ctx: ActionPipelineContext): Unit = {
    require(partitions.nonEmpty, s"DataObject $id: not partitioned")
    if (pvs.isEmpty) return
    // the doomed set is recomputed from FRESH state on every attempt
    // (same shape as writeDataFrame's per-attempt supersede set): losing
    // the rename race means a concurrent commit may have added files to
    // the doomed partitions — a stale list would silently leave them live
    var done = false
    var attempt = 0
    while (!done) {
      val st = readState(None).getOrElse(return)
      deletePartitionsRaceHook() // test seam: lands a concurrent commit here
      val doomed = st.files.filter { f =>
        st.stats.get(f).map(_.pv).exists(pv => pvs.exists(pvMatches(pv, _, st.colMap)))
      }
      if (doomed.isEmpty) return
      done = tryCommit(Commit(st.version + 1, Seq.empty, doomed, st.schemaDdl, op = "DELETE_PARTITIONS"))
      if (done) writeCdcCommit(st.version + 1)
      attempt += 1
      if (!done && attempt >= 20) throw new java.util.ConcurrentModificationException(
        s"DataObject $id: deletePartitions lost the rename race $attempt times")
    }
  }

  /** Time-travel read: the table exactly as of `version`, under that
    * version's committed schema (older files null-fill later columns —
    * append-evolution semantics without per-file footer sampling). ONE
    * state read (checkpoint + ≤ interval tail commits) serves files +
    * schema + stats — a streaming CDC sink pays O(interval), not
    * O(history), per micro-batch. */
  def getDataFrameAsOf(version: Option[Int])(implicit ctx: ActionPipelineContext): DataFrame = {
    val st = stateOrFail(version)
    require(st.files.nonEmpty, s"DataObject $id: empty snapshot")
    readFiles(st.files, st.schema, st.stats, st.dv, st.colMap)
  }

  /** Resolve a TIMESTAMP to the latest version committed at or before it
    * (the Delta `timestampAsOf` semantics on in-commit timestamps): scan
    * the commit list newest → oldest, stop at the first commit with
    * ts ≤ target — O(commits past the target) tiny JSON parses, a read
    * API not a hot path. Fails loudly when the timestamp predates the
    * retained log (same contract as version travel past VACUUM). */
  def versionAsOfTimestamp(tsMillis: Long)(implicit ctx: ActionPipelineContext): Int = {
    val versions = listLog._1.sorted.reverse
    versions.iterator.map(parseCommit)
      .collectFirst { case c if c.ts >= 0 && c.ts <= tsMillis => c.version }
      .getOrElse(throw new IllegalArgumentException(
        s"DataObject $id: no commit at or before timestamp $tsMillis (predates the log, " +
          "or a pre-timestamp log format)"))
  }

  /** Time travel by timestamp: the snapshot as of the latest commit at or
    * before `tsMillis`. */
  def getDataFrameAsOfTimestamp(tsMillis: Long)(implicit ctx: ActionPipelineContext): DataFrame =
    getDataFrameAsOf(Some(versionAsOfTimestamp(tsMillis)))

  /** The table's commit history, newest first (the Delta DESCRIBE
    * HISTORY surface): one row per retained commit with its version,
    * commit timestamp, operation tag, and file/row deltas. Driver-side
    * over the log only — O(min(limit, commits)) tiny JSON parses, zero
    * data I/O. Rows added is −1 when any added file predates footer
    * stats. */
  def history(limit: Int = Int.MaxValue)(implicit ctx: ActionPipelineContext): DataFrame = {
    val rows = listLog._1.sorted.reverse.take(limit).map(parseCommit).map { c =>
      val addedRows = {
        val rs = c.added.map(f => c.stats.get(f).map(_.rows).getOrElse(-1L))
        if (rs.exists(_ < 0)) -1L else rs.sum
      }
      (c.version, if (c.ts >= 0) new java.sql.Timestamp(c.ts) else null,
        if (c.op.nonEmpty) c.op else null,
        c.added.size, c.removed.size, addedRows)
    }
    import ctx.spark.implicits._
    rows.toDF("version", "timestamp", "operation",
      "num_added_files", "num_removed_files", "num_added_rows")
  }

  /** One-row table summary (the Delta DESCRIBE DETAIL surface): id,
    * location, current version + its commit timestamp, partition
    * columns, live file count / total bytes / total rows off the logged
    * footer stats, and the table's feature flags. Driver-side over ONE
    * state read — zero data I/O, zero filesystem listing beyond the log
    * dir, any table size. Bytes/rows are −1 when any live file predates
    * footer stats (pre-stats log format), never a silent partial sum. */
  def detail()(implicit ctx: ActionPipelineContext): DataFrame = {
    import ctx.spark.implicits._
    val st = stateOrFail(None)
    def total(get: FileStat => Long): Long = {
      val vs = st.files.map(f => st.stats.get(f).map(get).getOrElse(-1L))
      if (vs.exists(_ < 0)) -1L else vs.sum
    }
    Seq((id, path, st.version,
      if (st.ts >= 0) new java.sql.Timestamp(st.ts) else null,
      partitions, st.files.size.toLong, total(_.bytes), total(_.rows),
      deletionVectors, columnMapping,
      generatedColumns.map(_._1), identityColumns))
      .toDF("id", "location", "version", "last_modified",
        "partition_columns", "num_files", "size_in_bytes", "num_rows",
        "deletion_vectors", "column_mapping",
        "generated_columns", "identity_columns")
  }

  /** Read a file set through a log-backed [[org.apache.spark.sql.graftshims.GraftPrunedFileIndex]]:
    * ANY filter the user pushes on the returned DataFrame reaches the
    * index's `listFiles`, is evaluated against the per-file stats, and
    * prunes files BEFORE the scan is planned — automatic data skipping
    * on the ordinary read path (the Delta TahoeFileIndex design). File
    * sizes come from the log (zero filesystem RPCs when stats are
    * complete). Falls back to a plain multi-path parquet read when the
    * log predates the committed-schema format. */
  private def readFiles(files: Seq[String], schema: Option[StructType],
                        stats: Map[String, FileStat] = Map.empty,
                        dv: Seq[String] = Seq.empty,
                        colMap: Map[String, String] = Map.empty)
                       (implicit ctx: ActionPipelineContext): DataFrame =
    applyDv(readFilesRaw(files, schema, stats, colMap), dv)

  /** Reads under the PHYSICAL schema (footer truth on column-mapping
    * tables) and aliases back to LOGICAL names in one projection.
    * Predicates a caller pushes on the logical output are rewritten
    * through the alias by Catalyst, so the filters reaching the index's
    * `pruneFn` — and the stats they're checked against — are both
    * physical-named: data skipping keeps working across renames with no
    * translation layer in the hot path. */
  private def readFilesRaw(files: Seq[String], schema: Option[StructType],
                           stats: Map[String, FileStat] = Map.empty,
                           colMap: Map[String, String] = Map.empty)
                          (implicit ctx: ActionPipelineContext): DataFrame =
    schema match {
      case Some(sc) =>
        val pSc = physSchema(sc, colMap)
        val entries = files.map { rel =>
          val abs = new Path(path, rel)
          val len = stats.get(rel).map(_.bytes).filter(_ > 0)
            .getOrElse(fs.getFileStatus(abs).getLen)
          (rel, abs, len)
        }
        val pruneFn = (filters: Seq[Filter]) => files.filter(f =>
          stats.get(f).forall(st => filters.forall(mayContain(st, _, pSc)))).toSet
        def toLogical(df: DataFrame): DataFrame =
          if (colMap.isEmpty) df
          else df.select(sc.map(f => col(s"`${phys(colMap, f.name)}`").as(f.name)).toIndexedSeq: _*)
        if (partitions.isEmpty) {
          val index = new org.apache.spark.sql.graftshims.GraftPrunedFileIndex(
            new Path(path), entries, pruneFn)
          toLogical(org.apache.spark.sql.graftshims.GraftFileIndexShims
            .parquetDataFrame(ctx.spark, index, pSc))
        } else {
          // partition columns come from the LOG, not the files: the index
          // serves them per PartitionDirectory and evaluates partition
          // filters itself — plan-time pruning with zero footer reads.
          // Names here are PHYSICAL (staging dirs + logged pv keys).
          val physParts = partitions.map(phys(colMap, _)).toSet
          val partFields = pSc.filter(f => physParts.contains(f.name))
          val dataSchema = StructType(pSc.filterNot(f => physParts.contains(f.name)))
          val pvMap = stats.collect { case (rel, st) if st.pv.nonEmpty =>
            // sentinel → null here, so string-typed partition columns read
            // back NULL, not the literal directory name
            rel -> partFields.map(f =>
              st.pv.get(f.name).filterNot(_ == NullPartitionName).orNull).toSeq }
          val index = new org.apache.spark.sql.graftshims.GraftPrunedFileIndex(
            new Path(path), entries, pruneFn, StructType(partFields), pvMap.toMap)
          org.apache.spark.sql.graftshims.GraftFileIndexShims
            .parquetDataFrame(ctx.spark, index, dataSchema)
            .select(sc.map(f => col(s"`${phys(colMap, f.name)}`").as(f.name)).toIndexedSeq: _*)
        }
      case None =>
        ctx.spark.read.parquet(files.map(f => s"$path/$f"): _*)
    }

  // ----------------------------------------------------------------------
  // Deletion vectors (the public Delta DV design, from scratch):
  // merge-on-read row-level deletes as (file, row_index) sets
  // ----------------------------------------------------------------------

  private def dvDir = new Path(path, "_graft_dv")
  private def dvPath(name: String) = new Path(dvDir, name)
  private val dvSchema = StructType.fromDDL("file STRING, row_index BIGINT")

  /** staged data files are always `vNNNNNNNN-xxxxxxxx/…` — extract the
    * table-relative path from the absolute scan URI (scheme-independent) */
  private def relFileExpr: org.apache.spark.sql.Column =
    regexp_extract(input_file_name(), "(v[0-9]{8}-[0-9a-f]{8}/.+)$", 1)

  /** the union of (file, row_index) tombstones of the given DV versions */
  private def readDvVersions(names: Seq[String])(implicit ctx: ActionPipelineContext): DataFrame =
    ctx.spark.read.schema(dvSchema)
      .parquet(names.map(n => dvPath(n).toString): _*)

  /** input_file_name() yields URI-ENCODED paths (a partition value with a
    * space scans as `c=a%20b`), while the log stores decoded filesystem
    * names — every driver-side comparison of a scan-derived rel against
    * log rels must decode first. '+' is pre-escaped: URI encoding leaves
    * it literal, but URLDecoder would turn it into a space. */
  private def decodeRel(s: String): String =
    java.net.URLDecoder.decode(s.replace("+", "%2B"), java.nio.charset.StandardCharsets.UTF_8)

  private val StagingSuffix = """(v[0-9]{8}-[0-9a-f]{8}/.+)$""".r

  /** The staging-relative suffix of a log file entry — the identity a
    * SCAN reports via [[relFileExpr]]. Identity for ordinary (relative)
    * entries; for a shallow CLONE's absolute source references it strips
    * the source root, so scan-derived rels keep matching log entries.
    * Writer-unique staging dir names make the suffix collision-free. */
  private def stagingKey(entry: String): String =
    StagingSuffix.findFirstIn(entry).getOrElse(entry)

  /** Exclude the active deletion vectors from a scan — strategy selection
    * in [[dvFilter]] (broadcast predicate / per-file sidecar scan /
    * anti-join fallback). Stale tombstones (files since rewritten) match
    * nothing under any strategy. */
  private def applyDv(df: DataFrame, dv: Seq[String])(implicit ctx: ActionPipelineContext): DataFrame =
    if (dv.isEmpty) df
    else {
      val cols = df.columns.toSeq
      dvFilter(df.withColumn("_graft_dv_rel", relFileExpr)
        .withColumn("_graft_dv_ri", col("_metadata.row_index")), dv)
        .select(cols.map(c => col(s"`$c`")): _*)
    }

  /** broadcast-path size cap; above it reads take the per-file sidecar
    * scan path (anti-join only when sidecars are missing) */
  private val dvBroadcastMaxBytes: Long =
    sys.props.get("graft.dv.broadcastMaxBytes").map(_.toLong).getOrElse(64L << 20)

  /** Stage a tombstone SET under `_graft_dv/<name>`: the parquet dir
    * (source of truth — exclusion dedup, CDC classification, REORG,
    * anti-join fallback all read it) PLUS one `f-<md5(file)>.bin` sidecar
    * of sorted positions PER SCANNED FILE — the public Delta per-file-DV
    * layout (Delta writes one deletion-vector file per touched data file)
    * that lets the above-threshold read path load only the bitmaps of the
    * files a task actually scans. The sidecar pass is one extra job over
    * the just-written tombstones, grouped by file (state bounded by the
    * file's own row count — the same unit Delta's bitmaps are sized by).
    * Returns the tombstone count; a zero-count dir is deleted. */
  private def stageDvSet(name: String, tombstones: DataFrame)
                        (implicit ctx: ActionPipelineContext): Long = {
    tombstones.write.mode(SaveMode.ErrorIfExists).parquet(dvPath(name).toString)
    val back = ctx.spark.read.schema(dvSchema).parquet(dvPath(name).toString)
    val n = back.count()
    if (n == 0) { fs.delete(dvPath(name), true); return 0L }
    // underscore-prefixed subdir: invisible to Spark/parquet file listing,
    // so the tombstone-parquet readers never trip over the sidecars
    val dir = new Path(dvPath(name), "_sidecar").toString
    val conf = new graft.plans.SerializableHadoopConf(ctx.spark.sparkContext.hadoopConfiguration)
    back.groupBy("file").agg(sort_array(collect_list(col("row_index"))).as("ris"))
      .foreachPartition { (it: Iterator[Row]) =>
        it.foreach { r =>
          val p = new Path(dir, graft.plans.DvSidecarCache.sidecarName(r.getString(0)))
          val dos = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
            p.getFileSystem(conf.value).create(p, true), 1 << 16))
          try r.getSeq[Long](1).foreach(dos.writeLong) finally dos.close()
        }
      }
    n
  }

  /** One listStatus per active dv dir: (total parquet bytes, existing
    * sidecar paths, whether EVERY dir is sidecar-covered). O(dirs) driver
    * RPCs, no data job — the same cost class the threshold decision always
    * paid. */
  private def dvListing(dv: Seq[String])(implicit ctx: ActionPipelineContext)
      : (Long, Set[String], Boolean) = {
    var bytes = 0L
    var covered = true
    val sidecars = Set.newBuilder[String]
    dv.foreach { n =>
      try {
        val st = fs.listStatus(dvPath(n))
        bytes += st.filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
        val bin =
          try fs.listStatus(new Path(dvPath(n), "_sidecar"))
            .filter(_.getPath.getName.endsWith(".bin"))
          catch { case _: java.io.FileNotFoundException => Array.empty[org.apache.hadoop.fs.FileStatus] }
        if (bin.isEmpty) covered = false
        sidecars ++= bin.map(_.getPath.toString)
      } catch { case _: Exception => bytes = Long.MaxValue / 1024; covered = false }
    }
    (bytes, sidecars.result(), covered)
  }

  /** per-dv-set broadcast cache: the set named by `dv` is IMMUTABLE (dirs
    * are writer-unique and never rewritten), so one collect per distinct
    * active set per table instance */
  @transient private lazy val dvBroadcastCache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String],
      org.apache.spark.broadcast.Broadcast[Map[String, Array[Long]]]]()

  /** sidecar-presence broadcast cache — same immutability argument
    * (sidecars are staged BEFORE the commit that names the dir) */
  @transient private lazy val dvSidecarBcCache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String],
      org.apache.spark.broadcast.Broadcast[Set[String]]]()

  /** Three physical strategies, chosen by tombstone VOLUME (one driver
    * listing — no data job):
    *  1. ≤ [[dvBroadcastMaxBytes]]: tombstones collect once into per-file
    *     sorted arrays, broadcast, codegen'd scan-side predicate
    *     ([[graft.plans.DvTombstoned]]) — cheapest, the common case under
    *     periodic OPTIMIZE/materialization;
    *  2. above it, sidecars present (every dir staged by [[stageDvSet]]):
    *     the PER-FILE sidecar scan path ([[graft.plans.DvTombstonedScan]])
    *     — each task lazily loads only its own file's tombstones, so the
    *     predicate shape survives ANY tombstone volume (the Delta
    *     scan-task bitmap application; closes the r12 64 MB cliff);
    *  3. sidecars missing (foreign/legacy dv dirs only): shuffle
    *     anti-join on (file, row_index) — correct at any volume. */
  private def dvFilter(tagged: DataFrame, dv: Seq[String])
                      (implicit ctx: ActionPipelineContext): DataFrame = {
    if (dv.isEmpty) return tagged
    def predicate(e: org.apache.spark.sql.catalyst.expressions.Expression): DataFrame =
      tagged.where(!org.apache.spark.sql.graftshims.GraftSqlShims.column(e))
    def relE = org.apache.spark.sql.graftshims.GraftSqlShims.expression(tagged("_graft_dv_rel"))
    def riE = org.apache.spark.sql.graftshims.GraftSqlShims.expression(tagged("_graft_dv_ri"))
    val (bytes, sidecars, covered) = dvListing(dv)
    if (bytes <= dvBroadcastMaxBytes) {
      val bc = dvBroadcastCache.computeIfAbsent(dv, { _ =>
        val rows = readDvVersions(dv).collect()
        val byFile = rows.groupBy(_.getString(0))
          .map { case (f, rs) => f -> rs.map(_.getLong(1)).sorted.toArray }
        ctx.spark.sparkContext.broadcast(byFile)
      })
      predicate(graft.plans.DvTombstoned(relE, riE, bc))
    } else if (covered) {
      val present = dvSidecarBcCache.computeIfAbsent(dv,
        _ => ctx.spark.sparkContext.broadcast(sidecars))
      // fs-qualified dirs: the presence set came from listStatus (qualified
      // paths), so the per-row path construction must match scheme-for-scheme
      predicate(graft.plans.DvTombstonedScan(relE, riE,
        dv.map(n => fs.makeQualified(dvPath(n)).toString), present,
        new graft.plans.SerializableHadoopConf(ctx.spark.sparkContext.hadoopConfiguration)))
    } else {
      val d = readDvVersions(dv)
      tagged.join(d,
        tagged("_graft_dv_rel") === d("file") && tagged("_graft_dv_ri") === d("row_index"),
        "left_anti")
    }
  }

  /** the file set read with its table-relative path attached BELOW any DV
    * join — `input_file_name()` is single-source-only, so callers that
    * need file identity on a DV-filtered scan must take it from here */
  private def readFilesTagged(files: Seq[String], schema: Option[StructType],
                              stats: Map[String, FileStat], dv: Seq[String],
                              colMap: Map[String, String] = Map.empty)
                             (implicit ctx: ActionPipelineContext): DataFrame =
    dvFilter(readFilesRaw(files, schema, stats, colMap)
      .withColumn("_graft_dv_rel", relFileExpr)
      .withColumn("_graft_dv_ri", col("_metadata.row_index")), dv)

  // ----------------------------------------------------------------------
  // Per-file statistics (parquet footers — O(files) driver-side, no scan)
  // ----------------------------------------------------------------------

  /** Columns worth stats: top-level, order-comparable, capped at 32 (the
    * public Delta default) so wide tables don't bloat the log. */
  private def statColumns(schema: StructType): Seq[StructField] =
    schema.fields.toSeq.filter(f => f.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
           BooleanType | StringType | DateType | TimestampType => true
      case _ => false
    }).take(32)

  /** Canonical string for a parquet-footer min/max value of `dt`. None =
    * not representable (e.g. INT96 timestamps, >64-char strings whose
    * truncation would need prefix-increment semantics) → no pruning. */
  private def canonStat(dt: DataType, v: Any): Option[String] = (dt, v) match {
    case (_, null) => None
    case (StringType, b: org.apache.parquet.io.api.Binary) =>
      val s = b.toStringUsingUTF8; if (s.length <= 64) Some(s) else None
    case (FloatType | DoubleType, n: Number) => Some(n.doubleValue.toString)
    case (BooleanType, b: java.lang.Boolean) => Some(if (b) "1" else "0")
    case (ByteType | ShortType | IntegerType | LongType | DateType | TimestampType, n: Number) =>
      Some(n.longValue.toString)
    case _ => None
  }

  /** Canonical string for a RUNTIME value (Row cell / Filter literal). */
  private def canonValue(dt: DataType, v: Any): Option[String] = (dt, v) match {
    case (_, null) => None
    case (StringType, s: String) => Some(s)
    case (DateType, d: java.sql.Date) => Some(d.toLocalDate.toEpochDay.toString)
    case (DateType, d: java.time.LocalDate) => Some(d.toEpochDay.toString)
    case (TimestampType, t: java.sql.Timestamp) =>
      Some((Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L).toString)
    case (TimestampType, t: java.time.Instant) =>
      Some((t.getEpochSecond * 1000000L + t.getNano / 1000L).toString)
    case (BooleanType, b: java.lang.Boolean) => Some(if (b) "1" else "0")
    case (FloatType | DoubleType, n: Number) => Some(n.doubleValue.toString)
    case (ByteType | ShortType | IntegerType | LongType, n: Number) => Some(n.longValue.toString)
    case _ => None
  }

  private def cmpCanon(dt: DataType, a: String, b: String): Int = dt match {
    case FloatType | DoubleType => java.lang.Double.compare(a.toDouble, b.toDouble)
    case StringType => a.compareTo(b)
    case _ => java.lang.Long.compare(a.toLong, b.toLong)
  }

  /** Footer stats for one staged file: row count always; min/max/nulls per
    * supported column when the footer carries usable statistics. */
  private def footerStat(file: Path, schema: StructType)
                        (implicit ctx: ActionPipelineContext): FileStat = {
    val conf = ctx.spark.sparkContext.hadoopConfiguration
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks
      import scala.jdk.CollectionConverters._
      val rows = blocks.asScala.map(_.getRowCount).sum
      val byType = statColumns(schema).map(f => f.name -> f.dataType).toMap
      var min = Map.empty[String, String]; var max = Map.empty[String, String]
      var nulls = Map.empty[String, Long]; var broken = Set.empty[String]
      for (b <- blocks.asScala; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString
        byType.get(name).foreach { dt =>
          val st = c.getStatistics
          if (st == null || broken(name)) { broken += name }
          else {
            if (st.isNumNullsSet) nulls = nulls.updated(name, nulls.getOrElse(name, 0L) + st.getNumNulls)
            else broken += name
            if (st.hasNonNullValue) {
              (canonStat(dt, st.genericGetMin), canonStat(dt, st.genericGetMax)) match {
                case (Some(lo), Some(hi)) =>
                  min = min.updated(name, min.get(name).filter(cmpCanon(dt, _, lo) <= 0).getOrElse(lo))
                  max = max.updated(name, max.get(name).filter(cmpCanon(dt, _, hi) >= 0).getOrElse(hi))
                case _ => broken += name
              }
            } else if (!st.isNumNullsSet || st.getNumNulls < b.getRowCount) broken += name
          }
        }
      }
      // a column broken in ANY block has no trustworthy file-level range
      FileStat(rows, min -- broken, max -- broken, nulls -- broken)
    } finally reader.close()
  }

  /** Stats for every LIVE file at `version` (files from pre-stats commits
    * simply have no entry → never pruned). */
  private[graft] def liveFileStats(version: Option[Int] = None)
                                  (implicit ctx: ActionPipelineContext): Map[String, FileStat] =
    stateOrFail(version).stats

  /** Spark's partition-path escaping (%XX for special chars) undone —
    * minimal inverse of ExternalCatalogUtils.escapePathName. */
  private def unescapePathValue(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length)
        try { out.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar); i += 3 }
        catch { case _: NumberFormatException => out.append(c); i += 1 }
      else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** canonical-stat string for a RAW partition-path value, when the type
    * allows exact range compares (keeps pruning working on partition
    * columns through the ordinary stats machinery) */
  private def partStatCanon(dt: DataType, raw: String): Option[String] = dt match {
    case StringType => Some(raw).filter(_.length <= 64)
    case ByteType | ShortType | IntegerType | LongType =>
      try Some(raw.toLong.toString) catch { case _: NumberFormatException => None }
    case BooleanType => raw.toLowerCase match {
      case "true" => Some("1"); case "false" => Some("0"); case _ => None
    }
    case DateType =>
      try Some(java.time.LocalDate.parse(raw).toEpochDay.toString)
      catch { case _: Exception => None }
    case _ => None
  }

  /** Stage `df` as parquet files under a fresh `vNNN-xxxx/` subdir and
    * return their table-relative paths with footer stats. Partitioned
    * tables stage through `partitionBy` (one partition per file, values in
    * the directory names — the data files do NOT store the columns); each
    * file's stat carries its raw partition values plus canonical min=max
    * entries so data skipping and merge pruning see partition columns like
    * any other. */
  /** Parquet BLOOM FILTERS on the primary-key columns (adaptive sizing):
    * the second tier of point-lookup skipping — the log's min/max stats
    * prune FILES; blooms prune ROW GROUPS inside the files that survive,
    * through Spark's ordinary parquet filter pushdown, with no change to
    * the read path. Matters for selective key lookups on keys the data
    * is NOT clustered by (zorder makes min/max selective only for its
    * listed columns). */
  private def bloomOpts(df: DataFrame, colMap: Map[String, String]): Map[String, String] = {
    // option keys name the columns as WRITTEN — physical on mapped tables
    val cols = primaryKey.map(phys(colMap, _)).filter(df.columns.contains)
    if (cols.isEmpty) Map.empty
    else Map("parquet.bloom.filter.adaptive.enabled" -> "true") ++
      cols.map(c => s"parquet.bloom.filter.enabled#$c" -> "true")
  }

  /** Stages under PHYSICAL column names (`colMap` applied up front): the
    * data files, partition dir names, footer stats and logged pv keys are
    * all physical — immutable under later renames. */
  private def stage(df0: DataFrame, version: Int,
                    colMap: Map[String, String] = Map.empty)
                   (implicit ctx: ActionPipelineContext): (Seq[String], Map[String, FileStat]) = {
    val sub = f"v$version%08d-${java.util.UUID.randomUUID.toString.take(8)}"
    val df =
      if (colMap.isEmpty) df0
      else df0.select(df0.columns.map(c => col(s"`$c`").as(phys(colMap, c))).toIndexedSeq: _*)
    if (partitions.nonEmpty) {
      require(partitions.forall(df0.columns.contains),
        s"DataObject $id: partition columns ${partitions.mkString(",")} missing from ${df0.columns.mkString(",")}")
      // optimizedWrite: one shuffle so each partition value writes from one
      // task — 1 file per value instead of tasks×values small files
      val toWrite =
        if (optimizedWrite) df.repartition(partitions.map(p => col(s"`${phys(colMap, p)}`")): _*)
        else df
      toWrite.write.mode(SaveMode.ErrorIfExists).options(bloomOpts(df, colMap))
        .partitionBy(partitions.map(phys(colMap, _)): _*).parquet(s"$path/$sub")
      val it = fs.listFiles(new Path(path, sub), true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")) buf += st
      }
      val statuses = buf.toSeq
      val base = new Path(path).toUri.getPath
      val rels = statuses.map(s => s.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/"))
      val physParts = partitions.map(phys(colMap, _)).toSet
      val dataSchema = StructType(df.schema.filterNot(f => physParts.contains(f.name)))
      val byType = df.schema.fields.map(f => f.name -> f.dataType).toMap
      return (rels, statuses.zip(rels).map { case (st, rel) =>
        val pv = rel.split('/').dropRight(1).flatMap { seg =>
          val i = seg.indexOf('=')
          if (i > 0) Some(seg.take(i) -> unescapePathValue(seg.drop(i + 1))) else None
        }.toMap
        val stat0 = try footerStat(st.getPath, dataSchema).copy(bytes = st.getLen)
                    catch { case _: Exception => FileStat(-1, Map.empty, Map.empty, Map.empty, st.getLen) }
        // partition columns get exact min=max=value stats + zero nulls;
        // the null-partition sentinel gets NO range (it is not a value)
        // and nulls = the file's row count, so IsNull keeps the file and
        // IsNotNull prunes it — Spark's DEFAULT_PARTITION_NAME semantics
        val canon = pv.flatMap { case (k, v) =>
          if (v == NullPartitionName) None
          else byType.get(k).flatMap(partStatCanon(_, v)).map(k -> _) }
        val nullPartNulls = pv.collect {
          case (k, v) if v == NullPartitionName && stat0.rows >= 0 => k -> stat0.rows }
        rel -> stat0.copy(min = stat0.min ++ canon, max = stat0.max ++ canon,
          nulls = stat0.nulls ++ canon.keys.map(_ -> 0L) ++ nullPartNulls, pv = pv)
      }.toMap)
    }
    df.write.mode(SaveMode.ErrorIfExists).options(bloomOpts(df, colMap)).parquet(s"$path/$sub")
    val statuses = fs.listStatus(new Path(path, sub))
      .filter(s => s.getPath.getName.endsWith(".parquet") && !s.getPath.getName.startsWith("_"))
      .toSeq
    val rels = statuses.map(s => s"$sub/${s.getPath.getName}")
    // footer reads are independent driver-side I/O (a few ms each, but a
    // 32-partition write stages 32 files) — overlap them on a small pool
    // instead of paying the latency serially per commit
    val pool = Executors.newFixedThreadPool(math.min(8, math.max(1, statuses.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val stats = try {
      val futures = statuses.zip(rels).map { case (st, rel) =>
        Future(rel -> (try footerStat(st.getPath, df.schema).copy(bytes = st.getLen)
                       catch { case _: Exception =>
                         FileStat(-1, Map.empty, Map.empty, Map.empty, st.getLen) }))
      }
      Await.result(Future.sequence(futures), scala.concurrent.duration.Duration.Inf).toMap
    } finally pool.shutdown()
    (rels, stats)
  }

  private def rowsOf(stats: Map[String, FileStat]): Long = {
    val rs = stats.values.map(_.rows)
    if (rs.exists(_ < 0)) -1 else rs.sum
  }

  /** Optimistic-concurrency write (the public Delta commit protocol):
    * data files stage once; if another writer claims our version, the
    * transaction is re-validated against the fresh log and re-attempted
    * at the new head. Appends are ALWAYS safe to retry (disjoint data
    * files); overwrite recomputes its supersede-set at each attempt
    * (last-writer-wins, the lakehouse overwrite semantic). */
  override def writeDataFrame(df0: DataFrame, partitionValues: Seq[PartitionValues] = Seq.empty,
                              saveMode: Option[SdlSaveMode] = None)
                             (implicit ctx: ActionPipelineContext): ActionMetrics =
    writeDataFrameTxn(df0, partitionValues, saveMode, None)

  /** IDEMPOTENT write (the public Delta txnAppId/txnVersion option pair):
    * the commit records (appId → txnVersion) in the log; a write whose
    * txnVersion is at or below the table's recorded mark for that appId is
    * a NO-OP returning zero records — so a retried micro-batch, a replayed
    * foreachBatch after checkpoint recovery, or a re-run job commits its
    * data EXACTLY ONCE. The skip check re-runs inside the commit retry
    * loop against the fresh head, so two racing retries of the same
    * transaction can never both land. */
  def writeDataFrameIdempotent(df0: DataFrame, txnAppId: String, txnVersion: Long,
                               partitionValues: Seq[PartitionValues] = Seq.empty,
                               saveMode: Option[SdlSaveMode] = None)
                              (implicit ctx: ActionPipelineContext): ActionMetrics = {
    require(txnAppId.nonEmpty, s"DataObject $id: txnAppId must be non-empty")
    if (lastTxnVersion(txnAppId).exists(_ >= txnVersion)) ActionMetrics(0, 0)
    else writeDataFrameTxn(df0, partitionValues, saveMode, Some(txnAppId -> txnVersion))
  }

  /** newest recorded transaction version for `appId` (Delta's
    * `txnVersion(appId)`); None = never written by this application */
  def lastTxnVersion(appId: String)(implicit ctx: ActionPipelineContext): Option[Long] =
    readState(None).flatMap(_.txnHw.get(appId))

  private def writeDataFrameTxn(df0: DataFrame, partitionValues: Seq[PartitionValues],
                                saveMode: Option[SdlSaveMode], txn: Option[(String, Long)])
                               (implicit ctx: ActionPipelineContext): ActionMetrics = {
    val t0 = System.currentTimeMillis()
    val append = saveMode.contains(SdlSaveMode.Append)
    val dynamic = saveMode.contains(SdlSaveMode.OverwriteOptimized) && partitions.nonEmpty
    val preState = readState(None)
    guardColumnMappingFlag(preState)
    // identity columns: GENERATED ALWAYS — refuse provided values, then
    // populate above the logged high-water mark. monotonically_increasing_id
    // is unique per (partition, row) with gaps — exactly the identity
    // contract — so assignment is coordination-free across executors.
    val idBase: Map[String, Long] = preState.map(_.idHw).getOrElse(Map.empty)
    identityColumns.foreach { c =>
      require(!df0.columns.exists(_.equalsIgnoreCase(c)),
        s"DataObject $id: identity column $c is GENERATED ALWAYS — it cannot be provided")
    }
    identityColumns.foreach { c =>
      // headroom guard: monotonically_increasing_id contributes up to
      // partitionId<<33, so each commit can burn ~numPartitions*2^33 of the
      // id space; refuse loudly once half the Long range is spent rather
      // than wrapping negative (the wrap is also detected post-write below)
      require(idBase.getOrElse(c, 0L) < Long.MaxValue / 2,
        s"DataObject $id: identity column $c high-water ${idBase(c)} has exhausted its " +
          "headroom — re-key the table before further appends")
    }
    val df = identityColumns.foldLeft(applyGeneratedColumns(df0)) { (d, c) =>
      d.withColumn(c, lit(idBase.getOrElse(c, 0L)) + lit(1L) + monotonically_increasing_id())
    }
    val v0 = preState.map(_.version + 1).getOrElse(0)
    // column mapping: existing logical columns keep their immutable
    // physical names; brand-new logical columns get fresh ones. A
    // concurrent RENAME of an UNRELATED column during the commit race
    // changes only the map, never a physical name, so the staged files
    // stay valid on retry; DDL touching a STAGED column is a conflict
    // (colMapConflicts below).
    val preColMap = preState.map(_.colMap).getOrElse(Map.empty)
    val colMapWrite = assignPhys(preColMap, df.schema.fields.toSeq)
    val newAssigned = colMapWrite -- preColMap.keySet
    // data quality rides the staging write: constraints raise_error per
    // row, Job-scope expectations observe — zero extra scans. Feed-provided
    // generated columns validate the same way.
    val constrained = graft.quality.DataQualityValidation.applyConstraints(df,
      constraints ++ generatedConstraints(df0))
    val (instrumented, expObs) =
      graft.quality.DataQualityValidation.observeExpectations(constrained, expectations)
    val (added, stats) = stage(instrumented, v0, colMapWrite)
    // identity high-water AFTER this write: the max assigned value comes
    // from the staged files' own footer stats (already read) — no extra
    // job; the rare footer-stat failure falls back to one column-pruned
    // max over just the staged files
    val newIdHw: Map[String, Long] = identityColumns.map { c =>
      val p = phys(colMapWrite, c)
      val base = idBase.getOrElse(c, 0L)
      val vals = stats.values.flatMap(_.max.get(p))
        .flatMap(v => scala.util.Try(v.toLong).toOption)
      // the footer maxima are trustworthy only if EVERY staged file
      // contributed one — a partial footer-read failure on the file holding
      // the true max would silently undercount the mark and let the next
      // append reissue committed ids; any shortfall takes the exact scan
      val hw =
        if (added.isEmpty) base
        else if (vals.size == added.size) vals.max
        else ctx.spark.read.parquet(added.map(f => s"$path/$f"): _*)
          .agg(max(col(s"`$p`"))).head() match {
            case r if r.isNullAt(0) => base
            case r => r.getLong(0)
          }
      // assigned values are base+1+mid >= base+1, so a max at-or-below the
      // base means the arithmetic wrapped Long.MaxValue — fail loudly
      // instead of clamping (a clamp would freeze the mark and every later
      // write would reissue the same wrapped range)
      if (added.nonEmpty && stats.values.exists(_.rows > 0) && hw <= base)
        throw new IllegalStateException(
          s"DataObject $id: identity column $c assignment overflowed Long " +
            s"(staged max $hw <= high-water $base) — re-key the table")
      c -> math.max(hw, base)
    }.toMap
    // dynamic partition overwrite: supersede exactly the partitions the
    // staged files landed in — known from staging, zero extra jobs
    val writtenPvs = if (dynamic) stats.values.map(_.pv).filter(_.nonEmpty).toSet else Set.empty[Map[String, String]]
    var attempt = 0
    var done = false
    var committedV = -1
    while (!done) {
      val st = readState(None)
      // idempotency: a concurrent retry of the SAME transaction already
      // landed its commit — this attempt's staged files become orphans
      // (vacuum sweeps them), the data is exactly-once
      txn.foreach { case (app, v) =>
        if (st.exists(_.txnHw.get(app).exists(_ >= v)))
          return ActionMetrics(0, System.currentTimeMillis() - t0)
      }
      if (colMapConflicts(st.map(_.colMap).getOrElse(Map.empty), colMapWrite,
          preColMap, df.schema.fieldNames.toSeq))
        throw new java.util.ConcurrentModificationException(
          s"DataObject $id: concurrent column-mapping DDL touched a column this write " +
            "staged — re-run the write against the new schema")
      // a concurrent write that advanced an identity high-water started
      // from the same base as ours — the staged value ranges can collide;
      // committing would silently break identity uniqueness
      if (identityColumns.exists(c =>
          st.map(_.idHw).getOrElse(Map.empty).getOrElse(c, 0L) != idBase.getOrElse(c, 0L)))
        throw new java.util.ConcurrentModificationException(
          s"DataObject $id: concurrent write advanced an identity high-water mark — " +
            "re-run the write against the new state")
      val v = st.map(_.version + 1).getOrElse(0)
      val removed =
        if (append) Seq.empty
        else if (dynamic) st.map(_.files.filter(f =>
          st.get.stats.get(f).map(_.pv).exists(writtenPvs.contains))).getOrElse(Seq.empty)
        else st.map(_.files).getOrElse(Seq.empty)
      // schema evolution on append: committed schema = previous ∪ new (the
      // persisted-union-schema rule file objects use); overwrite resets it
      val schema = st.flatMap(_.schemaDdl) match {
        case Some(p) if append || dynamic =>
          val prev = StructType.fromDDL(p)
          val extra = df.schema.filterNot(f => prev.exists(_.name.equalsIgnoreCase(f.name)))
          StructType(prev.fields ++ extra).toDDL
        case _ => df.schema.toDDL
      }
      val opTag = if (append) "APPEND" else if (dynamic) "OVERWRITE_DYNAMIC" else "WRITE"
      // absolute map per attempt: the fresh head's map (carrying any
      // concurrent rename) plus this write's newly assigned columns
      val commitColMap =
        if (columnMapping) Some(st.map(_.colMap).getOrElse(Map.empty) ++ newAssigned)
        else None
      done = tryCommit(Commit(v, added, removed, Some(schema), stats, op = opTag,
        colMapSet = commitColMap,
        idSet = if (identityColumns.nonEmpty) Some(idBase ++ newIdHw) else None,
        txnSet = txn.map { case (app, tv) => Map(app -> tv) }))
      if (done) committedV = v
      attempt += 1
      if (!done && attempt >= 20) throw new java.util.ConcurrentModificationException(
        s"DataObject $id: commit contention — $attempt attempts lost the rename race")
    }
    writeCdcCommit(committedV)
    // expectations evaluate AFTER the commit: Job metrics off the staged
    // write's observation, table-scope (All/query) off the fresh snapshot
    val jobMetrics = expObs.map(o =>
      graft.quality.DataQualityValidation.evaluateObserved(o, expectations)).getOrElse(Map.empty)
    val tableMetrics =
      if (graft.quality.DataQualityValidation.needsTableEvaluation(expectations))
        graft.quality.DataQualityValidation.evaluateAgainstTable(getDataFrame(), expectations, partitions)
      else Map.empty[String, Any]
    ActionMetrics(recordsWritten = rowsOf(stats), durationMillis = System.currentTimeMillis() - t0,
      observedMetrics = jobMetrics ++ tableMetrics)
  }

  /** Copy-on-write gives staged self-overwrite for free: the new version's
    * files are fully written (reading the CURRENT snapshot) before the
    * commit supersedes them — no block-manager materialization needed. */
  override def writeDataFrameStaged(df: DataFrame)(implicit ctx: ActionPipelineContext): ActionMetrics =
    writeDataFrame(df, saveMode = Some(SdlSaveMode.Overwrite))

  // ----------------------------------------------------------------------
  // File-pruned MERGE (the Delta findTouchedFiles design)
  // ----------------------------------------------------------------------

  /** Stats prune for MERGE: live files whose per-column [min,max] ranges
    * intersect the feed's key bounds on EVERY join column. Driver-side over
    * the log only — zero data I/O. Conservative: missing stats, untracked
    * columns, or null feed keys keep the file a candidate. */
  private[graft] def pruneByKeyBounds(live: Seq[String], stats: Map[String, FileStat],
                                      schema: StructType, joinCols: Seq[String],
                                      bounds: Map[String, (String, String)],
                                      feedHasNullKeys: Boolean,
                                      colMap: Map[String, String] = Map.empty): Seq[String] = {
    if (feedHasNullKeys || bounds.isEmpty) return live
    live.filter { f =>
      stats.get(f).forall { st =>
        joinCols.forall { c =>
          // stats keys are PHYSICAL; joinCols/bounds are logical
          val p = phys(colMap, c)
          val dt = schema.find(_.name == c).map(_.dataType)
          (dt, st.min.get(p), st.max.get(p), bounds.get(c)) match {
            case (Some(t), Some(lo), Some(hi), Some((fLo, fHi))) =>
              // intersect unless file entirely above feed max or below feed min;
              // a file whose column is all-null can still null-match — but merge
              // null keys were excluded above, so all-null files with no range
              // (no hasNonNullValue) already fell into the conservative branch
              cmpCanon(t, lo, fHi) <= 0 && cmpCanon(t, hi, fLo) >= 0
            case _ => true
          }
        }
      }
    }
  }

  /** Can a lost merge commit be retried as-is? Only if the concurrent
    * commits (a) removed NONE of the files this merge read-and-rewrote,
    * and (b) added no file whose key-range stats could hold this merge's
    * keys (appends of disjoint keys are safe; stats-less files are
    * conservatively unsafe). The Delta merge conflict rules, stats-based. */
  private[graft] def mergeConflicts(concurrent: Seq[Commit], touched: Seq[String],
                                    joinCols: Seq[String], bounds: Map[String, (String, String)],
                                    schema: StructType, feedHasNullKeys: Boolean,
                                    colMap: Map[String, String] = Map.empty,
                                    preMap: Map[String, String] = Map.empty,
                                    stagedCols: Seq[String] = Seq.empty): Boolean = {
    val removedConcurrently = concurrent.flatMap(_.removed).toSet
    if (touched.exists(removedConcurrently)) return true
    // a dvSet-bearing commit (DELETE_DV/RESTORE/DV_MATERIALIZE) changes
    // row liveness without touching file sets — this merge's staged
    // rewrite was computed through the OLD dv view and would silently
    // drop the concurrent tombstone/revert
    if (concurrent.exists(_.dvSet.isDefined)) return true
    // concurrent column-mapping DDL touching a STAGED column: committing
    // would publish columns whose physical binding no longer matches the
    // staged files (all-NULL reads) — the head map is the latest absolute
    // colMapSet among the concurrent commits
    concurrent.filter(_.colMapSet.isDefined).sortBy(_.version).lastOption
      .flatMap(_.colMapSet).foreach { headMap =>
        if (colMapConflicts(headMap, colMap, preMap, stagedCols)) return true
      }
    val newFiles = concurrent.flatMap(_.added)
    val newStats = concurrent.flatMap(_.stats).toMap
    if (newFiles.exists(f => !newStats.contains(f))) return true
    pruneByKeyBounds(newFiles, newStats, schema, joinCols, bounds, feedHasNullKeys, colMap).nonEmpty
  }

  /** Exact touched set: among `candidates`, the files actually holding at
    * least one feed key — one column-pruned scan of candidate files
    * semi-joined (null-safe) with the distinct feed keys. */
  private def findTouchedFiles(candidates: Seq[String], schema: Option[StructType],
                               feedKeys: DataFrame, joinCols: Seq[String],
                               stats: Map[String, FileStat], dv: Seq[String] = Seq.empty,
                               colMap: Map[String, String] = Map.empty)
                              (implicit ctx: ActionPipelineContext): Seq[String] = {
    if (candidates.isEmpty) return Seq.empty
    // file identity comes from the TAGGED reader (computed below the DV
    // anti-join — input_file_name is single-source-only above a join)
    val withFile = readFilesTagged(candidates, schema, stats, dv, colMap)
      .select(joinCols.map(c => col(s"`$c`")) :+ col("_graft_dv_rel").as("_graft_file"): _*)
      .alias("t")
    val cond = joinCols.map(c => col(s"t.`$c`") <=> col(s"s.`$c`")).reduce(_ and _)
    val rels = withFile.join(feedKeys.alias("s"), cond, "left_semi")
      .select(col("_graft_file")).distinct().collect()
      .map(r => decodeRel(r.getString(0))).toSet
    candidates.filter(f => rels.contains(stagingKey(f)))
  }

  /** MERGE as a commit: stats-prune → exact findTouchedFiles → rewrite ONLY
    * the touched files through [[MergeEmulation]] (same SaveModeMergeOptions
    * semantics as the reference's Delta merge); untouched files are carried
    * by reference. Matched rows can only live in touched files (the exact
    * semi-join proves every other live file holds none of the feed's keys),
    * so per-commit I/O is O(touched + feed), not O(table). */
  override def mergeDataFrame(df0: DataFrame, joinCols: Seq[String],
                              options: SaveModeMergeOptions = SaveModeMergeOptions())
                             (implicit ctx: ActionPipelineContext): ActionMetrics =
    mergeDataFrameTxn(df0, joinCols, options, None)

  /** Idempotent MERGE — same (appId, txnVersion) contract as
    * [[writeDataFrameIdempotent]]: the streaming-merge-sink path under
    * foreachBatch replay. */
  def mergeDataFrameIdempotent(df0: DataFrame, joinCols: Seq[String],
                               txnAppId: String, txnVersion: Long,
                               options: SaveModeMergeOptions = SaveModeMergeOptions())
                              (implicit ctx: ActionPipelineContext): ActionMetrics = {
    require(txnAppId.nonEmpty, s"DataObject $id: txnAppId must be non-empty")
    if (lastTxnVersion(txnAppId).exists(_ >= txnVersion)) ActionMetrics(0, 0)
    else mergeDataFrameTxn(df0, joinCols, options, Some(txnAppId -> txnVersion))
  }

  private def mergeDataFrameTxn(df0: DataFrame, joinCols: Seq[String],
                                options: SaveModeMergeOptions, txn: Option[(String, Long)])
                               (implicit ctx: ActionPipelineContext): ActionMetrics = {
    val t0 = System.currentTimeMillis()
    require(identityColumns.isEmpty,
      s"DataObject $id: MERGE is not supported on tables with identity columns " +
        "(the Delta GENERATED ALWAYS AS IDENTITY contract)")
    val df = applyGeneratedColumns(df0)
    val st0 = readState(None)
    // a racing commit of the SAME (appId, txnVersion) can land between the
    // entry check in mergeDataFrameIdempotent and this read: it is in st0's
    // txnHw but INVISIBLE to the retry loop below (which only scans commits
    // >= v). writeDataFrameTxn re-checks st.txnHw each attempt; merge must
    // check the fresh head too or both merges land (r12 ADVICE).
    if (txn.exists { case (app, tv) => st0.exists(_.txnHw.get(app).exists(_ >= tv)) })
      return ActionMetrics(0, System.currentTimeMillis() - t0)
    if (st0.isEmpty) return writeDataFrameTxn(df0, Seq.empty, Some(SdlSaveMode.Overwrite), txn)
    guardColumnMappingFlag(st0)
    val live = st0.get.files
    // schema auto-merge (the Delta mergeSchema semantics): feed columns
    // unknown to the table are APPENDED to the committed schema — reading
    // touched (and carried) files under the evolved schema null-fills
    // them. Feed-technical columns the merge is told to ignore on insert
    // (e.g. an operation tag) never evolve the target.
    val committed = st0.get.schema.getOrElse(df.schema)
    val schema = StructType(committed.fields ++
      df.schema.fields.filterNot(f => committed.exists(_.name.equalsIgnoreCase(f.name)) ||
        options.insertColumnsToIgnore.contains(f.name)))
    val schemaOpt = Some(schema)
    // column mapping: evolved feed columns get fresh physical names
    val mergeColMap = assignPhys(st0.get.colMap, schema.fields.toSeq)
    val newAssigned = mergeColMap -- st0.get.colMap.keySet
    // CHECK constraints gate merge feeds too (Delta invariant semantics):
    // the raise_error wrapper fires during the feed's first materialization;
    // feed-provided generated columns validate alongside
    val feed = graft.quality.DataQualityValidation.applyConstraints(df,
        constraints ++ generatedConstraints(df0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one tiny agg: feed size + per-join-col bounds and null presence
      val aggs = count(lit(1)).as("_n") +:
        joinCols.flatMap(c => Seq(min(col(s"`$c`")).as(s"_min_$c"),
          max(col(s"`$c`")).as(s"_max_$c"), count(col(s"`$c`")).as(s"_cnt_$c")))
      val b = feed.agg(aggs.head, aggs.tail: _*).head()
      val n = b.getLong(b.fieldIndex("_n"))
      if (n == 0) return ActionMetrics(0, System.currentTimeMillis() - t0)
      val feedHasNullKeys = joinCols.exists(c => b.getLong(b.fieldIndex(s"_cnt_$c")) < n)
      val bounds = joinCols.flatMap { c =>
        val dt = schema.find(_.name == c).map(_.dataType)
        for {
          t <- dt
          lo <- canonValue(t, b.get(b.fieldIndex(s"_min_$c")))
          hi <- canonValue(t, b.get(b.fieldIndex(s"_max_$c")))
        } yield c -> (lo, hi)
      }.toMap
      val liveStats = st0.get.stats
      val candidates = pruneByKeyBounds(live, liveStats, schema, joinCols, bounds,
        feedHasNullKeys, mergeColMap)
      val touched = findTouchedFiles(candidates, schemaOpt,
        feed.select(joinCols.map(c => col(s"`$c`")): _*).distinct(), joinCols, liveStats,
        st0.get.dv, mergeColMap)
      // merge-on-read MERGE (deletionVectors=true, the Delta DV-DML
      // shape): tombstone the matched rows whose clause fires and APPEND
      // the updated versions + inserts — O(matched + feed), no touched-
      // file rewrite. Unmatched rows of touched files stay live in place.
      if (deletionVectors)
        return mergeViaDv(st0.get, schema, feed, joinCols, options, touched,
          bounds, feedHasNullKeys, mergeColMap, newAssigned, txn, t0)
      // reading touched files THROUGH the active DVs: a rewrite must not
      // resurrect rows a deletion vector already removed
      val existingTouched =
        if (touched.nonEmpty) readFiles(touched, schemaOpt, liveStats, st0.get.dv, mergeColMap)
        else ctx.spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
      // re-generate generated columns on the merged output + re-enforce
      // CHECK constraints: update clauses can change a generated column's
      // source or move rows out of a constraint (r12 ADVICE; the UPDATE
      // path has always done both)
      val merged = graft.quality.DataQualityValidation.applyConstraints(
        regenerate(MergeEmulation.computeMergedState(existingTouched, feed, joinCols, options)),
        constraints)
      val v = st0.get.version + 1
      val (added, stats) = stage(merged, v, mergeColMap)
      // optimistic commit: on losing the rename race, the merge is only
      // retryable if no concurrent commit invalidated what we read —
      // otherwise the whole merge must re-run against the new state.
      // Conflict validation parses ONLY the concurrent commits, not the
      // whole log.
      var commitV = v
      var attempt = 0
      dmlRaceHook()
      val txnCommit = txn.map { case (app, tv) => Map(app -> tv) }
      var done = tryCommit(Commit(commitV, added, touched, Some(schema.toDDL), stats,
        op = "MERGE", colMapSet = colMapFor(mergeColMap), txnSet = txnCommit))
      while (!done) {
        attempt += 1
        val freshVers = listLog._1
        val concurrent = freshVers.filter(_ >= v).map(parseCommit)
        // idempotency: a racing retry of the SAME transaction landed —
        // this merge's staged rewrite must NOT also commit (it would
        // double-apply); data is exactly-once, staged files orphan
        txn.foreach { case (app, tv) =>
          if (concurrent.exists(_.txnSet.exists(_.get(app).exists(_ >= tv))))
            return ActionMetrics(0, System.currentTimeMillis() - t0)
        }
        if (attempt >= 20 || mergeConflicts(concurrent, touched, joinCols, bounds, schema,
            feedHasNullKeys, mergeColMap, st0.get.colMap, schema.fieldNames.toSeq))
          throw new java.util.ConcurrentModificationException(
            s"DataObject $id: concurrent commit(s) ${concurrent.map(_.version).mkString(",")} " +
              "overlap this merge's keys or files — re-run the merge against the new state")
        commitV = freshVers.max + 1
        // fresh-schema union per attempt (same rule as dmlCommitLoop /
        // optimize): a non-conflicting concurrent append may have evolved
        // the committed schema — committing our pre-race DDL would regress
        // its new columns out of every later snapshot read. The colMap is
        // likewise rebased on the fresh head's map (a concurrent rename
        // changes the map, never a physical name).
        done = tryCommit(Commit(commitV, added, touched,
          Some(unionWithFresh(schema)), stats, op = "MERGE",
          colMapSet = colMapFor(freshColMap() ++ newAssigned), txnSet = txnCommit))
      }
      writeCdcCommit(commitV)
      ActionMetrics(rowsOf(stats), System.currentTimeMillis() - t0)
    } finally feed.unpersist()
  }

  // ----------------------------------------------------------------------
  // Row-level DELETE / UPDATE (the public Delta DML designs)
  // ----------------------------------------------------------------------

  /** Resolve the exact touched set for a row predicate: one scan of the
    * snapshot — stats-pruned at PLAN time (the predicate pushes into the
    * log-backed FileIndex, so files whose min/max disprove it are never
    * opened) — projecting only `input_file_name`. */
  private def touchedByPredicate(st: TableState, schema: StructType, pred: Column)
                                (implicit ctx: ActionPipelineContext): Seq[String] = {
    val rels = readFilesTagged(st.files, Some(schema), st.stats, st.dv, st.colMap)
      .where(pred).select(col("_graft_dv_rel")).distinct().collect()
      .map(r => decodeRel(r.getString(0))).toSet
    st.files.filter(f => rels.contains(stagingKey(f)))
  }

  /** Row-level DELETE (Delta's DELETE command). Copy-on-write by default:
    * stats-prune → exact touched files → rewrite them WITHOUT the matching
    * rows (NULL-evaluating rows are kept — SQL DELETE semantics); untouched
    * files carry by reference, so a selective delete on 100 TB costs
    * O(touched files), not O(table). With [[deletionVectors]] the touched
    * files are not rewritten at all: the matching (file, row_index)
    * positions are recorded under `_graft_dv/` and every subsequent read
    * anti-joins them — O(matched rows) per delete, the merge-on-read trade.
    * Returns the number of rows deleted. */
  def deleteWhere(predicateSql: String)(implicit ctx: ActionPipelineContext): Long = {
    val st0 = readState(None).getOrElse(return 0L)
    val schema = st0.schema.getOrElse(
      throw new IllegalStateException(s"DataObject $id: no committed schema"))
    val pred = expr(predicateSql)
    val touched = touchedByPredicate(st0, schema, pred)
    if (touched.isEmpty) return 0L
    if (deletionVectors) deleteViaDv(st0, schema, pred, touched)
    else deleteCopyOnWrite(st0, schema, pred, touched)
  }

  private def deleteCopyOnWrite(st0: TableState, schema: StructType, pred: Column,
                                touched: Seq[String])
                               (implicit ctx: ActionPipelineContext): Long = {
    val keep = readFiles(touched, Some(schema), st0.stats, st0.dv, st0.colMap)
      .where(!coalesce(pred, lit(false)))
    // rows live BEFORE the delete: stats are exact only without active
    // DVs (physical counts include tombstoned rows) — mixed-mode tables
    // pay one count job of the touched files instead of over-reporting
    val statRows = touched.flatMap(st0.stats.get).map(_.rows)
    val before =
      if (st0.dv.nonEmpty || statRows.exists(_ < 0))
        readFiles(touched, Some(schema), st0.stats, st0.dv, st0.colMap).count()
      else statRows.sum
    val v0 = st0.version + 1
    val (added, stats) = stage(keep, v0, st0.colMap)
    val commitV = dmlCommitLoop(v0, added, touched, schema, stats, "DELETE")
    writeCdcCommit(commitV)
    if (rowsOf(stats) < 0) -1L else before - rowsOf(stats)
  }

  private def deleteViaDv(st0: TableState, schema: StructType, pred: Column,
                          touched: Seq[String])
                         (implicit ctx: ActionPipelineContext): Long = {
    val v = st0.version + 1
    // positions are computed through the CURRENT DVs, so an already-dead
    // row is never re-tombstoned (restore branches stay well-defined)
    val matches = readFilesRaw(touched, Some(schema), st0.stats, st0.colMap)
      .withColumn("_graft_dv_rel", relFileExpr)
      .withColumn("_graft_dv_ri", col("_metadata.row_index"))
      .where(pred)
      .select(col("_graft_dv_rel").as("file"), col("_graft_dv_ri").as("row_index"))
    val newTombstones = applyDvExclusion(matches, st0.dv)
    // WRITER-UNIQUE dir (same scheme as data staging): two racing deletes
    // can neither clobber each other's tombstones nor have a loser's
    // cleanup touch a winner's committed files; the commit references the
    // dir by NAME. Staged before the commit, like data files.
    val name = f"v$v%08d-${java.util.UUID.randomUUID.toString.take(8)}"
    val deleted = stageDvSet(name, newTombstones)
    if (deleted == 0) return 0L
    // retry-at-new-head loop: concurrent appends (WriteSerializable — rows
    // they add matching the predicate are NOT affected) and disjoint
    // commits are safe alongside; rewrites of a touched file or other
    // dvSet-bearing commits conflict and surface
    val commitV = dvCommitLoop(v, Seq.empty, Map.empty, st0.dv, Some(name),
      schema, "DELETE_DV", touched)
    writeCdcCommit(commitV)
    deleted
  }

  /** drop tombstones already present in `dv` (anti-join on both columns) */
  private def applyDvExclusion(t: DataFrame, dv: Seq[String])
                              (implicit ctx: ActionPipelineContext): DataFrame =
    if (dv.isEmpty) t
    else {
      val existing = readDvVersions(dv)
      t.join(existing,
        t("file") === existing("file") && t("row_index") === existing("row_index"),
        "left_anti")
    }

  /** Row-level UPDATE (Delta's UPDATE command), copy-on-write: touched
    * files are rewritten with `assignments` applied to matching rows
    * (right-hand sides see PRE-update values, standard SQL UPDATE
    * semantics); non-matching rows and untouched files pass through
    * unchanged. Returns the number of rows scanned into the rewrite (−1
    * when pre-stats files make it unknowable). */
  def updateWhere(assignments: Map[String, String], predicateSql: String)
                 (implicit ctx: ActionPipelineContext): Long = {
    val st0 = readState(None).getOrElse(return 0L)
    val schema = st0.schema.getOrElse(
      throw new IllegalStateException(s"DataObject $id: no committed schema"))
    val unknown = assignments.keySet.filterNot(c => schema.exists(_.name == c))
    require(unknown.isEmpty, s"DataObject $id: UPDATE assigns unknown columns ${unknown.mkString(", ")}")
    // generated columns are derived, never assigned — they RE-GENERATE from
    // the post-image when a source column is updated (Delta semantics);
    // identity columns are likewise immutable once assigned
    val genAssigned = (generatedColumns.map(_._1) ++ identityColumns)
      .filter(c => assignments.keySet.exists(_.equalsIgnoreCase(c)))
    require(genAssigned.isEmpty,
      s"DataObject $id: cannot UPDATE generated/identity column(s) ${genAssigned.mkString(", ")} directly")
    val pred = expr(predicateSql)
    val touched = touchedByPredicate(st0, schema, pred)
    if (touched.isEmpty) return 0L
    if (deletionVectors) updateViaDv(st0, schema, pred, assignments, touched)
    else updateCopyOnWrite(st0, schema, pred, assignments, touched)
  }

  private def updateCopyOnWrite(st0: TableState, schema: StructType, pred: Column,
                                assignments: Map[String, String], touched: Seq[String])
                               (implicit ctx: ActionPipelineContext): Long = {
    val hit = coalesce(pred, lit(false))
    // single select from the pre-image: every RHS evaluates against OLD
    // values even when its own column is assigned
    val updated0 = readFiles(touched, Some(schema), st0.stats, st0.dv, st0.colMap)
      .select(schema.fields.map { f =>
        assignments.get(f.name) match {
          case Some(rhs) => when(hit, expr(rhs).cast(f.dataType)).otherwise(col(s"`${f.name}`")).as(f.name)
          case None => col(s"`${f.name}`")
        }
      }.toIndexedSeq: _*)
    // generated columns RE-GENERATE from the post-image (an updated source
    // column must flow through; idempotent for unhit rows)
    val updatedG = regenerate(updated0)
    // an UPDATE can move rows OUT of a CHECK constraint — enforce on the
    // rewrite like Delta does
    val updated = graft.quality.DataQualityValidation.applyConstraints(updatedG, constraints)
    val v0 = st0.version + 1
    val (added, stats) = stage(updated, v0, st0.colMap)
    val commitV = dmlCommitLoop(v0, added, touched, schema, stats, "UPDATE")
    writeCdcCommit(commitV)
    rowsOf(stats)
  }

  /** Merge-on-read UPDATE (the Delta DV-update design): tombstone the
    * MATCHED rows' positions and APPEND their rewritten versions as new
    * files, in one commit — O(matched rows) I/O instead of rewriting every
    * touched file (the copy-on-write failure mode where updating 1 row in
    * a 1 GB file rewrites 1 GB). CDC falls out of the existing diff: the
    * appended files classify as the n-side, the tombstoned positions as
    * the o-side, and the pk full-join pairs them into
    * update_preimage/update_postimage. */
  private def updateViaDv(st0: TableState, schema: StructType, pred: Column,
                          assignments: Map[String, String], touched: Seq[String])
                         (implicit ctx: ActionPipelineContext): Long = {
    val v = st0.version + 1
    // matched rows THROUGH current DVs, with their positions
    val matched = readFilesTagged(touched, Some(schema), st0.stats, st0.dv, st0.colMap)
      .where(pred)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tombstones = matched
        .select(col("_graft_dv_rel").as("file"), col("_graft_dv_ri").as("row_index"))
      val rewritten0 = matched.select(schema.fields.map { f =>
        assignments.get(f.name) match {
          case Some(rhs) => expr(rhs).cast(f.dataType).as(f.name)
          case None => col(s"`${f.name}`")
        }
      }.toIndexedSeq: _*)
      val rewritten = graft.quality.DataQualityValidation.applyConstraints(
        regenerate(rewritten0), constraints)
      val name = f"v$v%08d-${java.util.UUID.randomUUID.toString.take(8)}"
      val nMatched = stageDvSet(name, tombstones)
      if (nMatched == 0) return 0L
      val (added, stats) = stage(rewritten, v, st0.colMap)
      val commitV = dvCommitLoop(v, added, stats, st0.dv, Some(name),
        schema, "UPDATE_DV", touched)
      writeCdcCommit(commitV)
      nMatched
    } finally matched.unpersist()
  }

  /** The CURRENT committed schema unioned with `ours` (fresh fields first,
    * our unmatched fields appended) — re-evaluated per commit attempt so a
    * retry after a lost race never regresses a concurrent append's
    * union-evolution with a stale DDL. */
  private def unionWithFresh(ours: StructType)(implicit ctx: ActionPipelineContext): String =
    readState(None).flatMap(_.schemaDdl).map { d =>
      val f = StructType.fromDDL(d)
      StructType(f.fields ++ ours.fields.filterNot(x =>
        f.exists(_.name.equalsIgnoreCase(x.name)))).toDDL
    }.getOrElse(ours.toDDL)

  /** colMapSet for a data commit: absolute on column-mapping tables,
    * inherit (None) otherwise */
  private def colMapFor(m: Map[String, String]): Option[Map[String, String]] =
    if (columnMapping) Some(m) else None

  /** the fresh head's colMap (commit-retry rebase) */
  private def freshColMap()(implicit ctx: ActionPipelineContext): Map[String, String] =
    readState(None).map(_.colMap).getOrElse(Map.empty)

  /** Optimistic-commit loop for merge-on-read DML (DELETE_DV / UPDATE_DV /
    * MERGE_DV): the commit appends `dvName`'s tombstone dir to the active
    * set (and possibly adds files), removing nothing. A lost race retries
    * at the new head UNLESS a concurrent commit invalidates what this DML
    * read: it removed one of the `touched` files (their rows live on in a
    * rewrite, so our tombstones would silently miss them), it bears its
    * own dvSet (our absolute dv list would drop its tombstones/revert), or
    * `extraConflict` holds (MERGE_DV: concurrent adds whose stats overlap
    * the feed's key bounds could hold rows this merge should have
    * matched). Because dvSet-bearing concurrent commits always conflict,
    * a retried commit's `baseDv :+ dvName` is still the fresh head's dv
    * list. Fresh-schema union per attempt. On conflict or exhaustion the
    * staged dv dir is deleted (cheap to recompute) and the conflict
    * surfaced; staged data files are left for vacuum's orphan sweep, like
    * the copy-on-write paths.
    *
    * `txn` (MERGE_DV under mergeDataFrameIdempotent): the commit records
    * the (appId, txnVersion) mark so lastTxnVersion advances — without it
    * every foreachBatch replay re-applies the merge (the r12 high ADVICE).
    * A racing retry of the SAME transaction seen in the retry loop means
    * this commit must NOT also land: the staged dv dir is deleted and −1
    * returned (the idempotent-skip sentinel; data files orphan to vacuum,
    * same as the copy-on-write merge loop). */
  private def dvCommitLoop(v0: Int, added: Seq[String], stats: Map[String, FileStat],
                           baseDv: Seq[String], dvName: Option[String], schema: StructType,
                           opTag: String, touched: Seq[String],
                           extraConflict: Seq[Commit] => Boolean = _ => false,
                           baseColMap: Map[String, String] = Map.empty,
                           newAssigned: Map[String, String] = Map.empty,
                           txn: Option[(String, Long)] = None)
                          (implicit ctx: ActionPipelineContext): Int = {
    val touchedSet = touched.toSet
    val dvSet = dvName.fold(baseDv)(baseDv :+ _)
    val txnCommit = txn.map { case (app, tv) => Map(app -> tv) }
    // colMapSet only when this DML introduced columns — otherwise INHERIT,
    // so a concurrent rename's map is never clobbered by an absolute set
    def cmFor(base: Map[String, String]): Option[Map[String, String]] =
      if (newAssigned.isEmpty) None else colMapFor(base ++ newAssigned)
    def fail(msg: String): Nothing = {
      dvName.foreach(n => fs.delete(dvPath(n), true))
      throw new java.util.ConcurrentModificationException(s"DataObject $id: $msg")
    }
    var commitV = v0
    var attempt = 0
    dmlRaceHook()
    var done = tryCommit(Commit(commitV, added, Seq.empty, Some(schema.toDDL), stats,
      op = opTag, dvSet = Some(dvSet), colMapSet = cmFor(baseColMap), txnSet = txnCommit))
    while (!done) {
      attempt += 1
      val fresh = listLog._1
      val concurrent = fresh.filter(_ >= v0).map(parseCommit)
      // idempotency FIRST (before any conflict fail — the racing commit of
      // the same transaction typically carries its own dvSet, which would
      // otherwise surface as a conflict error instead of a clean skip): a
      // retry of the SAME (appId, txnVersion) landed, so this commit must
      // not double-apply
      txn.foreach { case (app, tv) =>
        if (concurrent.exists(_.txnSet.exists(_.get(app).exists(_ >= tv)))) {
          dvName.foreach(n => fs.delete(dvPath(n), true))
          return -1
        }
      }
      // staged files bind schema columns to (baseColMap ++ newAssigned)'s
      // physical names; concurrent column DDL touching one of them would
      // publish an all-NULL column (same rule as mergeConflicts)
      val ddlConflict = concurrent.filter(_.colMapSet.isDefined).sortBy(_.version)
        .lastOption.flatMap(_.colMapSet).exists(hm =>
          colMapConflicts(hm, baseColMap ++ newAssigned, baseColMap, schema.fieldNames.toSeq))
      if (concurrent.flatMap(_.removed).exists(touchedSet) ||
          concurrent.exists(_.dvSet.isDefined) || ddlConflict || extraConflict(concurrent))
        fail(s"concurrent commit(s) ${concurrent.map(_.version).mkString(",")} " +
          s"conflict with this $opTag — re-run against the new state")
      if (attempt >= 20) fail(s"$opTag commit contention — $attempt attempts lost the rename race")
      commitV = fresh.max + 1
      done = tryCommit(Commit(commitV, added, Seq.empty, Some(unionWithFresh(schema)), stats,
        op = opTag, dvSet = Some(dvSet), colMapSet = cmFor(freshColMap()), txnSet = txnCommit))
    }
    commitV
  }

  /** Shared optimistic-commit loop for copy-on-write DML: retry at the new
    * head unless a concurrent commit removed one of the files this DML
    * read-and-rewrote (committing then would resurrect superseded rows or
    * double-apply the DML) — the Delta DELETE/UPDATE conflict rule.
    * Concurrent appends stay live alongside; rows they add matching the
    * predicate are NOT affected (WriteSerializable semantics). */
  private def dmlCommitLoop(v0: Int, added: Seq[String], touched: Seq[String],
                            schema: StructType, stats: Map[String, FileStat], opTag: String)
                           (implicit ctx: ActionPipelineContext): Int = {
    val touchedSet = touched.toSet
    var commitV = v0
    var attempt = 0
    var done = tryCommit(Commit(commitV, added, touched, Some(schema.toDDL), stats, op = opTag))
    while (!done) {
      attempt += 1
      val fresh = listLog._1
      val concurrent = fresh.filter(_ >= v0).map(parseCommit)
      // a dvSet-bearing concurrent commit (DELETE_DV / RESTORE /
      // DV_MATERIALIZE) invalidates what this DML read: its tombstone or
      // revert would be silently dropped by our rewrite of the touched
      // files — same rule dmlCommitLoop's siblings need (merge, optimize)
      if (concurrent.flatMap(_.removed).exists(touchedSet) ||
          concurrent.exists(_.dvSet.isDefined))
        throw new java.util.ConcurrentModificationException(
          s"DataObject $id: concurrent commit(s) ${concurrent.map(_.version).mkString(",")} " +
            s"conflict with this $opTag — re-run against the new state")
      if (attempt >= 20) throw new java.util.ConcurrentModificationException(
        s"DataObject $id: $opTag commit contention — $attempt attempts lost the rename race")
      // re-read the committed schema per attempt: a concurrent append's
      // union evolution must not be regressed by our stale DDL (same rule
      // as writeDataFrame/optimize); our staged files null-fill any
      // evolved column under the fresh schema
      val freshSchema = readState(None).flatMap(_.schemaDdl).getOrElse(schema.toDDL)
      commitV = fresh.max + 1
      done = tryCommit(Commit(commitV, added, touched, Some(freshSchema), stats, op = opTag))
    }
    commitV
  }

  /** Materialize outstanding deletion vectors (Delta's REORG TABLE …
    * APPLY (PURGE)): rewrite every live file carrying tombstones with its
    * deleted rows physically removed, and empty the active DV set in the
    * same commit. No-op without active DVs. Returns the number of files
    * rewritten. */
  def materializeDeletionVectors()(implicit ctx: ActionPipelineContext): Int = {
    val st = readState(None).getOrElse(return 0)
    if (st.dv.isEmpty) return 0
    val schema = st.schema.getOrElse(
      throw new IllegalStateException(s"DataObject $id: no committed schema"))
    // tombstones store scan-derived (URI-encoded) rels; decode before
    // matching the log's filesystem names
    val tombstoned = readDvVersions(st.dv).select("file").distinct()
      .collect().map(r => decodeRel(r.getString(0))).toSet
    val targets = st.files.filter(f => tombstoned.contains(stagingKey(f)))
    val v = st.version + 1
    if (targets.isEmpty) {
      // every tombstone references a dead file — one metadata commit
      // clears the set
      writeCommit(Commit(v, Seq.empty, Seq.empty, st.schemaDdl, Map.empty,
        op = "DV_MATERIALIZE", dvSet = Some(Seq.empty)))
      writeCdcMarker(v)
      return 0
    }
    val clean = readFiles(targets, Some(schema), st.stats, st.dv, st.colMap)
    val (added, stats) = stage(clean, v, st.colMap)
    // single-attempt commit: materialization runs from maintenance paths
    // (vacuum) where contention means the caller should re-drive
    if (!tryCommit(Commit(v, added, targets, Some(schema.toDDL), stats,
        op = "DV_MATERIALIZE", dvSet = Some(Seq.empty))))
      throw new java.util.ConcurrentModificationException(
        s"DataObject $id: DV materialization lost the commit race — re-run")
    // snapshot content is unchanged by construction (tombstoned rows were
    // already invisible) — CDC gets a marker, like compaction
    writeCdcMarker(v)
    targets.size
  }

  /** MERGE as tombstones + appends (see [[mergeDataFrame]]): one commit
    * carrying the staged additions and the new DV dir, removing nothing.
    * Falls back to a plain append-only commit when no file is touched. */
  private def mergeViaDv(st0: TableState, schema: StructType, feed: DataFrame,
                         joinCols: Seq[String], options: SaveModeMergeOptions,
                         touched: Seq[String], bounds: Map[String, (String, String)],
                         feedHasNullKeys: Boolean, colMap: Map[String, String],
                         newAssigned: Map[String, String], txn: Option[(String, Long)],
                         t0: Long)
                        (implicit ctx: ActionPipelineContext): ActionMetrics = {
    val v = st0.version + 1
    val existingTagged =
      if (touched.nonEmpty) readFilesTagged(touched, Some(schema), st0.stats, st0.dv, colMap)
      else {
        val empty = ctx.spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
        empty.withColumn("_graft_dv_rel", lit(null).cast("string"))
          .withColumn("_graft_dv_ri", lit(null).cast("bigint"))
      }
    val (tombstones, additions0) = MergeEmulation.computeMergeOps(
      existingTagged, feed, joinCols, options)
    // update clauses can change a generated column's SOURCE column —
    // re-generate on the merge output (the UPDATE-path rule; Delta
    // recomputes on MERGE too), then re-enforce CHECK constraints, which an
    // update clause can likewise move rows out of (r12 ADVICE)
    val additions = graft.quality.DataQualityValidation.applyConstraints(
      regenerate(additions0.select(schema.fieldNames.map(c => col(s"`$c`")).toIndexedSeq: _*)),
      constraints)
    val name = f"v$v%08d-${java.util.UUID.randomUUID.toString.take(8)}"
    val nTombstoned = stageDvSet(name, tombstones)
    val (added, stats) = stage(additions, v, colMap)
    if (nTombstoned == 0 && added.isEmpty)
      return ActionMetrics(0, System.currentTimeMillis() - t0)
    val dvName = if (nTombstoned == 0) None else Some(name)
    // same retry semantics as the copy-on-write merge loop (a streaming
    // merge sink must survive a non-conflicting concurrent append or
    // maintenance commit): lost races retry at the new head unless the
    // concurrent commits overlap this merge's keys/files — the stats-based
    // adds-overlap check is the MERGE half of mergeConflicts; the
    // removed-touched and dvSet halves live in dvCommitLoop itself
    val commitV = dvCommitLoop(v, added, stats, st0.dv, dvName, schema, "MERGE_DV", touched,
      extraConflict = concurrent => {
        val newFiles = concurrent.flatMap(_.added)
        val newStats = concurrent.flatMap(_.stats).toMap
        newFiles.exists(f => !newStats.contains(f)) ||
          pruneByKeyBounds(newFiles, newStats, schema, joinCols, bounds,
            feedHasNullKeys, colMap).nonEmpty
      },
      baseColMap = st0.colMap, newAssigned = newAssigned, txn = txn)
    // −1 = a racing retry of the same transaction already landed: data is
    // exactly-once, nothing to CDC-materialize here
    if (commitV < 0) return ActionMetrics(0, System.currentTimeMillis() - t0)
    writeCdcCommit(commitV)
    ActionMetrics(rowsOf(stats), System.currentTimeMillis() - t0)
  }

  // ----------------------------------------------------------------------
  // Data skipping on reads
  // ----------------------------------------------------------------------

  /** The live files at `version` that MAY contain rows matching `filters`
    * per the logged stats — the planning half of data skipping, exposed for
    * plan assertions. Conservative everywhere stats can't decide. */
  private[graft] def filesForFilters(filters: Seq[Filter], version: Option[Int] = None)
                                    (implicit ctx: ActionPipelineContext): Seq[String] = {
    val st = stateOrFail(version)
    val schema = st.schema.getOrElse(return st.files)
    val pSc = physSchema(schema, st.colMap)
    val pFilters = filters.map(translateFilter(_, st.colMap))
    st.files.filter { f =>
      st.stats.get(f).forall(s => pFilters.forall(mayContain(s, _, pSc)))
    }
  }

  /** rewrite a LOGICAL-named filter to physical attribute names (identity
    * when unmapped; unsupported shapes pass through — they never prune) */
  private def translateFilter(f: Filter, colMap: Map[String, String]): Filter =
    if (colMap.isEmpty) f
    else f match {
      case EqualTo(a, v) => EqualTo(phys(colMap, a), v)
      case GreaterThan(a, v) => GreaterThan(phys(colMap, a), v)
      case GreaterThanOrEqual(a, v) => GreaterThanOrEqual(phys(colMap, a), v)
      case LessThan(a, v) => LessThan(phys(colMap, a), v)
      case LessThanOrEqual(a, v) => LessThanOrEqual(phys(colMap, a), v)
      case In(a, vs) => In(phys(colMap, a), vs)
      case IsNull(a) => IsNull(phys(colMap, a))
      case IsNotNull(a) => IsNotNull(phys(colMap, a))
      case And(l, r) => And(translateFilter(l, colMap), translateFilter(r, colMap))
      case Or(l, r) => Or(translateFilter(l, colMap), translateFilter(r, colMap))
      case Not(c) => Not(translateFilter(c, colMap))
      case other => other
    }

  private def mayContain(st: FileStat, f: Filter, schema: StructType): Boolean = {
    def dt(a: String) = schema.find(_.name == a).map(_.dataType)
    def range(a: String) = for { lo <- st.min.get(a); hi <- st.max.get(a) } yield (lo, hi)
    def lit(a: String, v: Any) = dt(a).flatMap(canonValue(_, v))
    // a column that is all-null in this file (nulls == rows, e.g. a null
    // partition) can satisfy no value comparison at all
    def allNull(a: String) = st.rows >= 0 && st.nulls.get(a).contains(st.rows)
    f match {
      case EqualTo(a, _) if allNull(a) => false
      case GreaterThan(a, _) if allNull(a) => false
      case GreaterThanOrEqual(a, _) if allNull(a) => false
      case LessThan(a, _) if allNull(a) => false
      case LessThanOrEqual(a, _) if allNull(a) => false
      case In(a, _) if allNull(a) => false
      case EqualTo(a, v) => (dt(a), range(a), lit(a, v)) match {
        case (Some(t), Some((lo, hi)), Some(c)) => cmpCanon(t, lo, c) <= 0 && cmpCanon(t, hi, c) >= 0
        case _ => true
      }
      case GreaterThan(a, v) => (dt(a), st.max.get(a), lit(a, v)) match {
        case (Some(t), Some(hi), Some(c)) => cmpCanon(t, hi, c) > 0
        case _ => true
      }
      case GreaterThanOrEqual(a, v) => (dt(a), st.max.get(a), lit(a, v)) match {
        case (Some(t), Some(hi), Some(c)) => cmpCanon(t, hi, c) >= 0
        case _ => true
      }
      case LessThan(a, v) => (dt(a), st.min.get(a), lit(a, v)) match {
        case (Some(t), Some(lo), Some(c)) => cmpCanon(t, lo, c) < 0
        case _ => true
      }
      case LessThanOrEqual(a, v) => (dt(a), st.min.get(a), lit(a, v)) match {
        case (Some(t), Some(lo), Some(c)) => cmpCanon(t, lo, c) <= 0
        case _ => true
      }
      case In(a, vs) => vs.exists(v => mayContain(st, EqualTo(a, v), schema))
      case IsNull(a) => st.nulls.get(a).forall(_ > 0)
      case IsNotNull(a) => st.nulls.get(a).forall(n => st.rows < 0 || n < st.rows)
      case And(l, r) => mayContain(st, l, schema) && mayContain(st, r, schema)
      case Or(l, r) => mayContain(st, l, schema) || mayContain(st, r, schema)
      case _ => true // Not / StringStartsWith / … — no pruning, never wrong
    }
  }

  private def filterToColumn(f: Filter): Column = f match {
    case EqualTo(a, v) => col(s"`$a`") === v
    case GreaterThan(a, v) => col(s"`$a`") > v
    case GreaterThanOrEqual(a, v) => col(s"`$a`") >= v
    case LessThan(a, v) => col(s"`$a`") < v
    case LessThanOrEqual(a, v) => col(s"`$a`") <= v
    case In(a, vs) => col(s"`$a`").isin(vs.toIndexedSeq: _*)
    case IsNull(a) => col(s"`$a`").isNull
    case IsNotNull(a) => col(s"`$a`").isNotNull
    case And(l, r) => filterToColumn(l) && filterToColumn(r)
    case Or(l, r) => filterToColumn(l) || filterToColumn(r)
    case Not(c) => !filterToColumn(c)
    case other => throw new IllegalArgumentException(
      s"DataObject $id: unsupported residual filter $other")
  }

  /** Data-skipping read: applies `filters` as row predicates on the
    * snapshot — the log-backed FileIndex underneath [[getDataFrameAsOf]]
    * prunes files whose stats can't satisfy them automatically at plan
    * time (skipping selects files, it never relaxes semantics). The same
    * pruning fires for ANY `.where` a caller writes on `getDataFrame()`;
    * this method just makes the pushdown explicit for engine callers.
    * At 100 TB a selective key lookup touches a handful of files instead
    * of the whole snapshot — Delta data skipping, from the same stats
    * that power the pruned MERGE. */
  def getDataFrameFiltered(filters: Seq[Filter], version: Option[Int] = None)
                          (implicit ctx: ActionPipelineContext): DataFrame =
    filters.foldLeft(getDataFrameAsOf(version))((df, f) => df.where(filterToColumn(f)))

  /** Streaming sink: each micro-batch is one log commit — append by
    * default, MERGE upsert on the primary key when the action rides
    * `graft.saveMode=merge` (the lakehouse CDC-sink pattern; Delta's
    * streaming write is the same per-batch transaction shape). With the
    * file-pruned merge above, a micro-batch costs O(files holding its
    * keys), not O(table).
    *
    * AUTO-COMPACTION (the public Delta autoCompact design): a per-batch
    * commit stream accumulates small files without bound — the quiet
    * scale killer of any streaming sink. With
    * `graft.autoCompact.minFiles=N`, after a batch whose snapshot holds
    * ≥ N live files the sink runs a size-targeted OPTIMIZE
    * (`graft.autoCompact.targetFileBytes`, default 128 MB) inside the
    * batch turn — older versions still time-travel to the pre-compaction
    * files until vacuum. The file-count check is one state read (no
    * listing); a compaction that loses its commit race to a conflicting
    * writer aborts the compaction only, never the batch's data commit. */
  override def writeStreamingDataFrame(df: DataFrame, trigger: org.apache.spark.sql.streaming.Trigger,
                                       options: Map[String, String], checkpointLocation: String,
                                       queryName: String, outputMode: String = "append")
                                      (implicit ctx: ActionPipelineContext): org.apache.spark.sql.streaming.StreamingQuery = {
    val merge = options.get("graft.saveMode").exists(_.equalsIgnoreCase("merge"))
    val autoCompactMin = options.get("graft.autoCompact.minFiles").map(_.toInt)
    val autoCompactBytes = options.get("graft.autoCompact.targetFileBytes")
      .map(_.toLong).getOrElse(128L * 1024 * 1024)
    val maybeCompact: () => Unit = () => autoCompactMin.foreach { min =>
      if (readState(None).exists(_.files.size >= min))
        try optimize(1, targetFileBytes = Some(autoCompactBytes))
        catch { case _: java.util.ConcurrentModificationException => () }
    }
    // EXACTLY-ONCE under foreachBatch replay (the public Delta
    // txnAppId/txnVersion design): with `graft.txnAppId` set, each batch
    // commits with (appId, batchId) as its transaction mark — a batch
    // Spark replays after checkpoint recovery (sink committed, stream
    // checkpoint didn't) finds its own mark in the log and skips, instead
    // of appending duplicates / re-applying the merge
    val txnApp = options.get("graft.txnAppId")
    val writeBatch: (DataFrame, Long) => Unit = (batch, batchId) => {
      if (merge) {
        require(primaryKey.nonEmpty, s"DataObject $id: streaming merge needs primaryKey")
        // mergeDataFrame handles the empty-log first batch itself (one
        // less log read per micro-batch)
        txnApp match {
          case Some(app) => mergeDataFrameIdempotent(batch, primaryKey, app, batchId)
          case None      => mergeDataFrame(batch, primaryKey)
        }
        ()
      } else {
        txnApp match {
          case Some(app) =>
            writeDataFrameIdempotent(batch, app, batchId, saveMode = Some(SdlSaveMode.Append))
          case None => writeDataFrame(batch, saveMode = Some(SdlSaveMode.Append))
        }
        ()
      }
      maybeCompact()
    }
    df.writeStream
      .foreachBatch(writeBatch)
      .option("checkpointLocation", checkpointLocation)
      .outputMode(outputMode).trigger(trigger).queryName(queryName)
      .start()
  }

  /** CHANGE DATA FEED (the public Delta CDF read semantics): row-level
    * net changes between two versions, typed like Delta's
    * `_change_type` — `insert`, `delete`, `update_preimage` /
    * `update_postimage`. Computed by diffing ONLY the files that
    * differ between the two snapshots: a file carried by reference
    * can't contain a change, so the scan is O(changed files), not
    * O(table) — at 100 TB a CDC consumer reads the delta, never the
    * snapshot. Rows rewritten identically (compaction, untouched rows
    * in a touched file) compare equal on the null-safe struct and emit
    * nothing. Net-diff semantics over the version RANGE (intermediate
    * overwritten states collapse); call per adjacent pair for
    * per-commit granularity. Requires `primaryKey`. */
  def changesBetween(fromVersion: Int, toVersion: Option[Int] = None)
                    (implicit ctx: ActionPipelineContext): DataFrame = {
    require(primaryKey.nonEmpty, s"DataObject $id: change data feed needs primaryKey")
    // two bounded state reads — every file scanned below is live at one
    // of the two versions, so their union covers all needed stats.
    // fromVersion < 0 = empty base: every row at `toVersion` is an insert
    // (serves the initial snapshot through the same diff)
    val stFrom = if (fromVersion < 0) TableState(-1, Seq.empty, Map.empty, None)
                 else stateOrFail(Some(fromVersion))
    val stTo = stateOrFail(toVersion)
    val filesFrom = stFrom.files.toSet
    val filesTo = stTo.files.toSet
    val schema = stTo.schema.getOrElse(
      throw new IllegalStateException(s"DataObject $id: no committed schema"))
    val allStats = stFrom.stats ++ stTo.stats
    val cols = schema.fieldNames.toSeq
    // deletion-vector deltas: rows in files COMMON to both versions whose
    // liveness changed only through DVs — tombstoned between the versions
    // (net delete) or un-tombstoned by a RESTORE (net insert). They feed
    // the same full-join classification as file-level diffs, so a
    // DV-delete + re-insert of one key still coalesces to an update pair.
    val common = (filesFrom & filesTo).toSeq
    val dvDeleted = stTo.dv.filterNot(stFrom.dv.contains)
    val dvRestored = stFrom.dv.filterNot(stTo.dv.contains)
    def dvDelta(include: Seq[String], exclude: Seq[String]): Option[DataFrame] =
      if (include.isEmpty || common.isEmpty) None
      else {
        // scan ONLY the files the delta tombstones actually reference
        // (tiny driver-side collect of the DV file column) — a one-row DV
        // delete must cost O(its files), never O(table), per CDC commit
        val touchedByDv = readDvVersions(include).select("file").distinct()
          .collect().map(r => decodeRel(r.getString(0))).toSet
        val scanFiles = common.filter(f => touchedByDv.contains(stagingKey(f)))
        if (scanFiles.isEmpty) return None
        // physical names never change, so TO's colMap reads FROM-side
        // files correctly even across a rename between the two versions
        val base = readFilesRaw(scanFiles, Some(schema), allStats, stTo.colMap)
          .withColumn("_graft_dv_rel", relFileExpr)
          .withColumn("_graft_dv_ri", col("_metadata.row_index"))
        val inc = readDvVersions(include)
        val hit = base.join(inc,
          base("_graft_dv_rel") === inc("file") && base("_graft_dv_ri") === inc("row_index"),
          "left_semi")
        val survived =
          if (exclude.isEmpty) hit
          else {
            val exc = readDvVersions(exclude)
            hit.join(exc,
              hit("_graft_dv_rel") === exc("file") && hit("_graft_dv_ri") === exc("row_index"),
              "left_anti")
          }
        Some(survived.select(cols.map(c => col(s"`$c`")): _*))
      }
    def side(files: Seq[String], dv: Seq[String], extra: Option[DataFrame], tag: String) = {
      val base = readFiles(files, Some(schema), allStats, dv, stTo.colMap)
        .select(cols.map(c => col(s"`$c`")): _*)
      extra.fold(base)(base.unionByName(_))
        .withColumn(s"_${tag}_present", lit(1)).alias(tag)
    }
    // o-side: rows live at FROM but gone at TO — removed files (as FROM saw
    // them, i.e. through FROM's DVs) plus rows newly tombstoned in common
    // files (excluding rows already dead at FROM)
    val o = side((filesFrom -- filesTo).toSeq, stFrom.dv,
      dvDelta(dvDeleted, stFrom.dv), "o")
    // n-side: rows live at TO but absent at FROM — added files (through
    // TO's DVs) plus rows a restore un-tombstoned (excluding rows still
    // dead at TO)
    val n = side((filesTo -- filesFrom).toSeq, stTo.dv,
      dvDelta(dvRestored, stTo.dv), "n")
    val keyEq = primaryKey.map(k => col(s"o.`$k`") <=> col(s"n.`$k`")).reduce(_ and _)
    val oRec = struct(cols.map(c => col(s"o.`$c`").as(c)): _*)
    val nRec = struct(cols.map(c => col(s"n.`$c`").as(c)): _*)
    val oP = col("_o_present").isNotNull
    val nP = col("_n_present").isNotNull
    val changes = when(oP && !nP, array(struct(oRec.as("r"), lit("delete").as("t"))))
      .when(nP && !oP, array(struct(nRec.as("r"), lit("insert").as("t"))))
      .when(oP && nP && !(oRec <=> nRec), array(
        struct(oRec.as("r"), lit("update_preimage").as("t")),
        struct(nRec.as("r"), lit("update_postimage").as("t"))))
    // unmatched .otherwise → null → explode emits nothing (equal rows)
    o.join(n, keyEq, "full")
      .select(explode(changes).as("c"))
      .select(col("c.r.*") +: Seq(col("c.t").as("_change_type")): _*)
  }

  // ----------------------------------------------------------------------
  // Change data feed as a STREAMING source (materialized CDC files)
  // ----------------------------------------------------------------------

  private def cdcDir = new Path(path, "_graft_cdc")

  /** Materialize commit `v`'s change rows as parquet under
    * `_graft_cdc/vNNNNNNNN/` — the public Delta CDF write-side design
    * (DML writes change data files alongside data files; here computed
    * post-commit from [[changesBetween]], whose scan is O(files changed
    * by the commit)). Called after every data-changing commit;
    * compaction writes an EMPTY marker dir instead (its data is
    * identical — the diff would scan the table to emit zero rows).
    *
    * SELF-HEALING: every commit type leaves a directory, so a missing
    * dir between the newest existing one and `v` is precisely the
    * signature of a crash between log commit and CDC write — the next
    * writer backfills it from `changesBetween` before writing its own,
    * closing the gap without consumer involvement. No dirs at all =
    * fresh CDF enablement: the feed starts at `v` (the Delta
    * enable-time semantics), not with an O(history) backfill. */
  /** Overwrite, not ErrorIfExists: CDC content per version is
    * DETERMINISTIC (a pure function of the log), so re-materializing is
    * idempotent — which is exactly what repairs a partially-written dir
    * from a crash mid-write and makes a backfill race benign. */
  private def cdcMaterialize(w: Int)(implicit ctx: ActionPipelineContext): Unit =
    changesBetween(w - 1, Some(w))
      .withColumn("_commit_version", lit(w.toLong))
      .write.mode(SaveMode.Overwrite).parquet(new Path(cdcDir, f"v$w%08d").toString)

  /** A version's CDC entry counts as present only when its `_SUCCESS`
    * marker exists — a dir without it is a crashed partial write and
    * must be re-materialized, not trusted. */
  private def cdcComplete(implicit ctx: ActionPipelineContext): Set[Int] =
    if (!fs.exists(cdcDir)) Set.empty
    else fs.listStatus(cdcDir).map(_.getPath)
      .collect { case p if p.getName.matches("""v\d{8}""") &&
        fs.exists(new Path(p, "_SUCCESS")) => p.getName.drop(1).toInt }.toSet

  /** Backfill every incomplete version between the newest COMPLETE CDC
    * entry and `v − 1` (crash recovery — a missing or partial dir is the
    * signature of a crash between log commit and CDC write), then write
    * `v`'s own entry. No complete entries at all = fresh CDF enablement →
    * the feed starts at `v`, no O(history) backfill (the Delta
    * enable-time semantics). */
  private def cdcBackfillThen(v: Int)(writeOwn: Int => Unit)
                             (implicit ctx: ActionPipelineContext): Unit = {
    val have = cdcComplete
    val floor = have.maxOption.getOrElse(v - 1)
    ((floor + 1) until v).filterNot(have).foreach(cdcMaterialize)
    if (!have.contains(v)) writeOwn(v)
  }

  private def writeCdcCommit(v: Int)(implicit ctx: ActionPipelineContext): Unit =
    if (changeDataFeed) cdcBackfillThen(v)(cdcMaterialize)

  /** Marker for commits that by construction change no data (compaction):
    * an EMPTY per-version dir (with `_SUCCESS`) keeps the sequence
    * gapless so the self-heal can tell "intentionally empty" from
    * "crashed before writing" — and it backfills any earlier gap first,
    * so a marker never papers over a crashed predecessor. */
  private def writeCdcMarker(v: Int)(implicit ctx: ActionPipelineContext): Unit =
    if (changeDataFeed) cdcBackfillThen(v) { w =>
      val d = new Path(cdcDir, f"v$w%08d")
      fs.mkdirs(d)
      val out = fs.create(new Path(d, "_SUCCESS"), true)
      out.close()
    }

  /** The change feed as a STREAMING DataFrame: Spark's file stream source
    * over the materialized CDC files — offsets, discovery, and exactly-once
    * checkpointing come from the engine (`maxFilesPerTrigger` etc. pass
    * through `options`). Schema = committed table schema +
    * `_change_type` + `_commit_version`. The micro-batch granularity is
    * one CDC file set per commit — the Delta `readChangeFeed` streaming
    * shape without custom Source machinery. */
  override def getStreamingDataFrame(options: Map[String, String],
                                     schema: Option[StructType])
                                    (implicit ctx: ActionPipelineContext): DataFrame = {
    require(changeDataFeed, s"DataObject $id: streaming reads need changeDataFeed=true")
    fs.mkdirs(cdcDir)
    val base = schema.orElse(readState(None).flatMap(_.schema)).getOrElse(
      throw new IllegalStateException(s"DataObject $id: no committed schema for streaming read"))
    val full = StructType(base.fields ++ Seq(
      StructField("_change_type", StringType), StructField("_commit_version", LongType)))
    // one directory per commit → glob one level down for the part files
    ctx.spark.readStream.schema(full).options(options).parquet(s"${cdcDir.toString}/*")
  }

  /** Compaction (reference Delta OPTIMIZE): rewrite the live snapshot into
    * `targetFileCount` files as a new commit. Data identical, file count
    * drops; prior versions still resolve to the pre-compaction files.
    * With `zorderBy` (the public OPTIMIZE ZORDER BY design), the rewrite
    * clusters rows by the interleaved-bit Morton value of those columns
    * ([[graft.functions.ZOrder]]), so the per-file min/max stats — and
    * therefore data skipping AND merge pruning — become selective on
    * every listed column, not just an incidental write order. */
  /** @param partitionValues when non-empty (and the table is partitioned),
    *        compact ONLY those partitions' files — Delta `OPTIMIZE …
    *        WHERE`; other partitions are carried by reference, so the
    *        rewrite is O(selected partitions), not O(table) */
  /** Test seam: fires between optimize/restore's state read and their
    * commit attempt, so specs can land a deterministic concurrent commit
    * in the race window. Production: no-op. */
  @transient private[graft] var maintenanceRaceHook: () => Unit = () => ()

  /** @param targetFileBytes when set, OVERRIDES `targetFileCount` with
    *        ceil(scoped bytes / target) computed from the log's byte
    *        stats — same state read as the compaction itself, so the
    *        sizing and the rewrite see one consistent file set */
  def optimize(targetFileCount: Int, zorderBy: Seq[String] = Seq.empty,
               partitionValues: Seq[PartitionValues] = Seq.empty,
               targetFileBytes: Option[Long] = None)
              (implicit ctx: ActionPipelineContext): Int = {
    val st = stateOrFail(None)
    val v = st.version + 1
    val scoped =
      if (partitionValues.isEmpty || partitions.isEmpty) st.files
      else st.files.filter(f => st.stats.get(f).map(_.pv).exists(pv =>
        partitionValues.exists(pvMatches(pv, _, st.colMap))))
    val nFiles = targetFileBytes match {
      case Some(tb) =>
        require(tb > 0, s"DataObject $id: targetFileBytes must be positive")
        val bytes = scoped.flatMap(st.stats.get).map(_.bytes).sum
        math.max(1L, (bytes + tb - 1) / tb).toInt
      case None => targetFileCount
    }
    // compaction reads THROUGH the active DVs: the rewritten files are
    // clean, their tombstones go stale harmlessly (dead file names)
    val current = readFiles(scoped, st.schema, st.stats, st.dv, st.colMap)
    val arranged =
      if (zorderBy.nonEmpty) graft.functions.ZOrder.cluster(current, zorderBy, nFiles)
      else current.repartition(nFiles)
    val (added, stats) = stage(arranged, v, st.colMap)
    maintenanceRaceHook()
    // optimistic commit with the Delta OPTIMIZE conflict rule: a lost
    // race retries at the new head UNLESS a concurrent commit REMOVED one
    // of this compaction's input files (committing then would resurrect
    // its superseded rows). Concurrent appends/disjoint merges are safe —
    // their files stay live alongside the compacted output. The schema is
    // re-read per attempt so a concurrent append's union-evolution is
    // never regressed by a stale DDL.
    val scopedSet = scoped.toSet
    val opTag = if (zorderBy.nonEmpty) "OPTIMIZE_ZORDER" else "OPTIMIZE"
    var commitV = v
    var attempt = 0
    var done = tryCommit(Commit(commitV, added, scoped,
      st.schemaDdl.orElse(Some(current.schema.toDDL)), stats, op = opTag))
    while (!done) {
      attempt += 1
      val fresh = listLog._1
      val concurrent = fresh.filter(_ >= v).map(parseCommit)
      // dvSet-bearing commits conflict for the same reason removed files
      // do: the compacted output was read through the OLD dv view, so
      // committing it would resurrect a concurrently tombstoned row (or
      // drop a concurrent restore's revert)
      if (concurrent.flatMap(_.removed).exists(scopedSet) ||
          concurrent.exists(_.dvSet.isDefined))
        throw new java.util.ConcurrentModificationException(
          s"DataObject $id: concurrent commit(s) ${concurrent.map(_.version).mkString(",")} " +
            "rewrote files this OPTIMIZE compacted — re-run against the new state")
      if (attempt >= 20) throw new java.util.ConcurrentModificationException(
        s"DataObject $id: OPTIMIZE commit contention — $attempt attempts lost the rename race")
      val freshSchema = readState(None).flatMap(_.schemaDdl)
        .orElse(st.schemaDdl).orElse(Some(current.schema.toDDL))
      commitV = fresh.max + 1
      done = tryCommit(Commit(commitV, added, scoped, freshSchema, stats, op = opTag))
    }
    writeCdcMarker(commitV)
    added.size
  }

  /** Size-targeted OPTIMIZE (the Delta norm: ~1 GB output files): the
    * target file COUNT comes from the LOG's per-file byte stats — zero
    * data I/O to size the compaction. Files from pre-stats log formats
    * count as 0 bytes (undercount → fewer, larger files; conservative). */
  def optimizeBySize(targetFileBytes: Long = 1L << 30, zorderBy: Seq[String] = Seq.empty,
                     partitionValues: Seq[PartitionValues] = Seq.empty)
                    (implicit ctx: ActionPipelineContext): Int =
    optimize(1, zorderBy, partitionValues, Some(targetFileBytes))

  /** Rollback (the public Delta RESTORE design): make the live snapshot
    * equal the snapshot at `version` by committing the file-set DIFF as a
    * NEW version — adds = target files missing from head, removes = head
    * files absent at target. Metadata-only: zero data files are read,
    * written, or deleted, so restoring a 100 TB table costs one log write
    * — EXCEPT on a `changeDataFeed` table, where the post-commit CDC
    * materialization diffs the files whose snapshot membership changed
    * (after a compaction that can be the whole table, scanned to emit the
    * net row changes — the price of a complete change feed, paid by the
    * restore, never by consumers);
    * history is preserved (the pre-restore head still time-travels), and a
    * restore past VACUUM's horizon fails loudly in `stateOrFail` before
    * anything is committed. Returns the new head version. */
  def restore(version: Int)(implicit ctx: ActionPipelineContext): Int = {
    val target = stateOrFail(Some(version))
    var attempt = 0
    while (attempt < 20) {
      // the file-set diff is recomputed against the FRESH head per attempt
      // (metadata-only, so a retry costs one state read) — restore is
      // last-writer-wins like overwrite, so losing a race to a concurrent
      // commit just means diffing against what that commit left behind
      val cur = stateOrFail(None)
      val v = cur.version + 1
      val curSet = cur.files.toSet
      val targetSet = target.files.toSet
      val adds = target.files.filterNot(curSet)
      val removes = cur.files.filterNot(targetSet)
      val stats = adds.flatMap(f => target.stats.get(f).map(f -> _)).toMap
      maintenanceRaceHook()
      // dvSet reverts the active deletion vectors to the target's list —
      // rows tombstoned after `version` come back, exactly like files do;
      // colMapSet likewise reverts renames/drops committed after it
      if (tryCommit(Commit(v, adds, removes, target.schemaDdl, stats,
          op = s"RESTORE($version)", dvSet = Some(target.dv),
          colMapSet = colMapFor(target.colMap)))) {
        writeCdcCommit(v)
        return v
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"DataObject $id: restore lost the rename race $attempt times")
  }

  /** SHALLOW CLONE (the public Delta shallow-clone design): create a new
    * versioned table at `targetPath` whose v0 commit references THIS
    * table's live files at `version` (latest when None) by ABSOLUTE path
    * — cloning a 100 TB table costs one log write and zero data I/O.
    * Schema, per-file stats, and the column map carry over, so data
    * skipping and file-pruned MERGE work on the clone immediately. The
    * clone evolves independently: its own commits/DML/OPTIMIZE land in
    * its own directory, gradually detaching it from the source; its
    * VACUUM never deletes outside its own root (see the out-of-root
    * guard). Like Delta, the SOURCE's vacuum can reclaim files a clone
    * still references — pin the source's retention to cover live clones.
    * Active deletion vectors must be materialized first (the clone's v0
    * carries no DV state). Application transaction marks (txnHw) are
    * deliberately NOT cloned — Delta's clone drops SetTransaction state
    * too, because a streaming app pointed at the clone must not silently
    * skip batches the SOURCE already consumed. Returns the clone's
    * DataObject. */
  def shallowCloneTo(targetId: String, targetPath: String, version: Option[Int] = None)
                    (implicit ctx: ActionPipelineContext): VersionedTableDataObject = {
    val st = stateOrFail(version)
    require(st.dv.isEmpty,
      s"DataObject $id: materializeDeletionVectors() before cloning — the clone cannot " +
        "reference the source's tombstone dirs")
    val srcUri = fs.makeQualified(new Path(path)).toUri
    val tgtUri = fs.makeQualified(new Path(targetPath)).toUri
    // absolute entries resolve against the CLONE's filesystem at read time;
    // a cross-filesystem clone would silently point at the wrong store
    require(Option(srcUri.getScheme) == Option(tgtUri.getScheme) &&
        Option(srcUri.getAuthority) == Option(tgtUri.getAuthority),
      s"DataObject $id: shallow clone requires source and target on the same filesystem " +
        s"($srcUri vs $tgtUri) — the clone's log stores path-only references")
    val srcRoot = srcUri.getPath
    // entries already absolute (this table is itself a shallow clone) pass
    // through untouched — prefixing them would corrupt the clone-of-clone
    def abs(f: String): String = if (f.startsWith("/")) f else s"$srcRoot/$f"
    val absolute = st.files.map(abs)
    val absStats = st.files.flatMap(f => st.stats.get(f).map(abs(f) -> _)).toMap
    val clone = this.copy(id = targetId, path = targetPath)
    require(clone.latestVersion.isEmpty,
      s"DataObject $targetId: clone target $targetPath already holds a table")
    clone.writeCommit(clone.Commit(0, absolute, Seq.empty, st.schemaDdl,
      absStats.map { case (k, v) =>
        k -> clone.FileStat(v.rows, v.min, v.max, v.nulls, v.bytes, v.pv) },
      op = s"CLONE($id@${st.version})",
      dvSet = Some(Seq.empty), colMapSet = if (st.colMap.nonEmpty) Some(st.colMap) else None,
      idSet = if (st.idHw.nonEmpty) Some(st.idHw) else None))
    clone
  }

  /** METADATA-ONLY column rename (the public Delta column-mapping RENAME
    * COLUMN): one log commit updating the committed (logical) schema and
    * the logical→physical map — the physical name, and therefore every
    * data file, footer stat, bloom filter and partition directory, is
    * untouched. Renaming a column on a 100 TB table costs one JSON write.
    * Requires `columnMapping` (without it physical names ARE logical
    * names, and a later add of the old name would resurrect old data).
    * Partition and primary-key columns are structural (constructor
    * identity) and refuse to rename. Returns the new head version. */
  def renameColumn(oldName: String, newName: String)
                  (implicit ctx: ActionPipelineContext): Int = {
    require(columnMapping,
      s"DataObject $id: renameColumn needs columnMapping=true (chosen at table creation)")
    require(!(partitions ++ primaryKey).exists(_.equalsIgnoreCase(oldName)),
      s"DataObject $id: cannot rename structural column $oldName (partition/primaryKey identity)")
    metadataColumnCommit(s"RENAME_COLUMN($oldName->$newName)") { st =>
      val schema = st.schema.getOrElse(
        throw new IllegalStateException(s"DataObject $id: no committed schema"))
      // resolution is case-insensitive like append evolution; a case-only
      // rename (Value -> value) is legal — only a DIFFERENT column may
      // not already hold the new name
      val field = schema.find(_.name.equalsIgnoreCase(oldName)).getOrElse(
        throw new IllegalArgumentException(s"DataObject $id: no column $oldName"))
      require(!schema.exists(f => f.name != field.name && f.name.equalsIgnoreCase(newName)),
        s"DataObject $id: column $newName already exists")
      val newSchema = StructType(schema.map(f =>
        if (f.name == field.name) f.copy(name = newName) else f))
      (newSchema, (st.colMap - field.name) + (newName -> phys(st.colMap, field.name)))
    }
  }

  /** METADATA-ONLY column drop (Delta column-mapping DROP COLUMN): the
    * column leaves the committed schema and the map in one log commit;
    * its physical data stays in the files (invisible to every read) until
    * those files are naturally rewritten. A column later re-added under
    * the same logical name gets a FRESH physical name, so the dropped
    * data can never resurrect. Time travel before the drop still sees the
    * column. Returns the new head version. */
  def dropColumn(name: String)(implicit ctx: ActionPipelineContext): Int = {
    require(columnMapping,
      s"DataObject $id: dropColumn needs columnMapping=true (chosen at table creation)")
    require(!(partitions ++ primaryKey).exists(_.equalsIgnoreCase(name)),
      s"DataObject $id: cannot drop structural column $name (partition/primaryKey identity)")
    metadataColumnCommit(s"DROP_COLUMN($name)") { st =>
      val schema = st.schema.getOrElse(
        throw new IllegalStateException(s"DataObject $id: no committed schema"))
      val field = schema.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(s"DataObject $id: no column $name"))
      require(schema.size > 1, s"DataObject $id: cannot drop the last column")
      (StructType(schema.filterNot(_.name == field.name)), st.colMap - field.name)
    }
  }

  /** retrying metadata-only commit for column DDL: recomputes schema+map
    * against the fresh head per attempt (rename/drop are last-writer-wins
    * metadata edits, like restore) */
  private def metadataColumnCommit(opTag: String)
                                  (f: TableState => (StructType, Map[String, String]))
                                  (implicit ctx: ActionPipelineContext): Int = {
    var attempt = 0
    while (attempt < 20) {
      val st = stateOrFail(None)
      val (newSchema, newMap) = f(st)
      val v = st.version + 1
      maintenanceRaceHook()
      if (tryCommit(Commit(v, Seq.empty, Seq.empty, Some(newSchema.toDDL), Map.empty,
          op = opTag, colMapSet = Some(newMap)))) {
        writeCdcMarker(v) // no row changes — marker keeps the CDC sequence gapless
        return v
      }
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"DataObject $id: $opTag lost the rename race $attempt times")
  }

  /** Test seam: invoked between vacuum's crash-ordered phases with the
    * phase just COMPLETED — a spec throws here to simulate a crash at
    * each boundary and proves every intermediate log state still reads
    * the correct snapshot. Production: no-op. */
  @transient private[graft] var vacuumPhaseHook: String => Unit = _ => ()

  /** Test seam: fires between [[deletePartitions]]' state read and its
    * commit attempt, so a spec can land a deterministic concurrent
    * commit in the race window. Production: no-op. */
  @transient private[graft] var deletePartitionsRaceHook: () => Unit = () => ()

  /** Test seam: fires between a DML's staging and its FIRST commit attempt
    * ([[mergeDataFrame]]'s copy-on-write loop and every merge-on-read path
    * via `dvCommitLoop`), so specs can land a deterministic concurrent
    * commit in the race window. Production: no-op. */
  @transient private[graft] var dmlRaceHook: () => Unit = () => ()

  /** Retention (reference Delta VACUUM): drop log entries older than the
    * last `retainVersions` commits and physically delete files no longer
    * referenced by any retained snapshot. Time travel before the horizon
    * then fails loudly (as in Delta after VACUUM).
    *
    * CRASH-ORDERED like Delta's checkpoint-then-clean protocol: nothing
    * is deleted until the full rebased state is durably shadowed by a
    * checkpoint at the horizon. The phases, each leaving a readable log:
    *  1. `checkpointed`   — write the rebased state as a CHECKPOINT at
    *     `cut` (atomic replace; checkpoints shadow commit replay in
    *     [[readState]], so from here the pre-horizon commits are
    *     redundant for every read at or above the horizon);
    *  2. `old-checkpoints-deleted` — drop checkpoints < cut (they would
    *     otherwise later replay against commits that no longer exist);
    *  3. `old-commits-deleted` — drop commits ≤ cut, DESCENDING, so any
    *     crash leaves the surviving pre-horizon commits a complete
    *     prefix (reads below the horizon either replay a true
    *     historical prefix or fail loudly — never a baseless suffix);
    *  4. `rebased` — write the synthetic base commit at `cut` (until it
    *     lands, the checkpoint alone serves reads — [[readState]] and
    *     [[latestVersion]] both accept a checkpoint-only horizon);
    *  5. data files last: only after the log is fully consistent. The
    *     log-derived superseded set is deleted age-free (the log proves
    *     no retained snapshot references it); crash LEFTOVERS — staged
    *     files whose commits were rebased away before they could be
    *     deleted, or a crashed writer's never-committed staging dir —
    *     are swept by a directory listing, guarded by
    *     `orphanRetentionMillis` (the public Delta vacuum design:
    *     age-guard so a slow in-flight writer's staged-but-uncommitted
    *     files survive; default 7 days). The sweep only considers
    *     staging dirs versioned BELOW the horizon — every in-flight
    *     writer stages at head+1 > cut, so live staging is never below
    *     it until its version falls out of retention. A crash anywhere
    *     leaks at most orphans, never loses data; re-running vacuum
    *     completes the rebase (recovery preamble) and re-sweeps. */
  def vacuum(retainVersions: Int,
             orphanRetentionMillis: Long = 7L * 24 * 3600 * 1000)
            (implicit ctx: ActionPipelineContext): Seq[String] = {
    // recovery preamble: a checkpoint with no commit at-or-below its
    // version is the signature of a crash between phases 3 and 4 —
    // complete the interrupted rebase before (re)cutting
    locally {
      val (commits0, cps0) = listLog
      cps0.minOption.filter(w => !commits0.exists(_ <= w)).foreach { w =>
        // the checkpoint carries the horizon commit's EXACT in-commit ts,
        // so timestamp travel to the recovered base stays correct
        readCheckpoint(w).foreach(s =>
          tryCommitRaw(Commit(w, s.files, Seq.empty, s.schemaDdl, s.stats, s.ts,
            op = "VACUUM_REBASE", dvSet = Some(s.dv), colMapSet = colMapFor(s.colMap),
            idSet = if (s.idHw.nonEmpty) Some(s.idHw) else None,
            txnSet = if (s.txnHw.nonEmpty) Some(s.txnHw) else None)))
      }
    }
    // deletion vectors need no materialization here: every DV dir a
    // retained snapshot references survives the sweep (retainedDv below),
    // and the rebased base commit carries the horizon state's dv list —
    // vacuum defers the rewrite exactly like Delta's VACUUM does
    // (materializeDeletionVectors() is the explicit REORG-style purge)
    val log = readLog
    val cut = log.map(_.version).sorted.takeRight(retainVersions).headOption.getOrElse(0)
    val (old, kept) = log.partition(_.version < cut)
    // files referenced by any retained snapshot (= live at some version >= cut):
    // everything added at >= cut, plus the carried-over base = snapshot(cut-? ) —
    // compute as snapshot at `cut`'s predecessor state folded into the first
    // retained commit: simplest correct form is files live at ANY retained version.
    val retainedLive = kept.map(_.version)
      .flatMap(v => snapshotFiles(Some(v))).toSet
    val deletable = (old.flatMap(_.added).toSet -- retainedLive).toSeq.sorted
    // DV dirs still referenced by any retained snapshot must survive the
    // sweep (a retained version's reads apply its dv list); computed from
    // the intact log, before any deletion
    val retainedDv = (cut +: kept.map(_.version))
      .flatMap(v => readState(Some(v)).map(_.dv).getOrElse(Seq.empty)).toSet
    if (old.nonEmpty) {
      // rebase target computed BEFORE anything is deleted — ONE log replay
      // at the horizon serves files/dv/colMap (was three)
      val baseState = readState(Some(cut))
      val baseFiles = baseState.map(_.files).getOrElse(Seq.empty)
      val baseDv = baseState.map(_.dv).getOrElse(Seq.empty)
      val baseColMap = baseState.map(_.colMap).getOrElse(Map.empty)
      val baseIdHw = baseState.map(_.idHw).getOrElse(Map.empty)
      val baseTxnHw = baseState.map(_.txnHw).getOrElse(Map.empty)
      val baseSchema = log.filter(_.version <= cut).reverse
        .collectFirst { case c: Commit if c.schema.isDefined => c.schema.get }
      val baseStats = log.flatMap(_.stats).toMap.filter(kv => baseFiles.contains(kv._1))
      // phase 1: shadow the history behind a checkpoint at the horizon —
      // load-bearing, so a failed write ABORTS with the log untouched
      writeCheckpointOrFail(cut)
      vacuumPhaseHook("checkpointed")
      // phase 2: checkpoints below the horizon
      listLog._2.filter(_ < cut).foreach(v =>
        fs.delete(new Path(logDir, f"$v%08d.checkpoint.json"), false))
      vacuumPhaseHook("old-checkpoints-deleted")
      // phase 3: commits ≤ cut, highest first (survivors form a prefix)
      (old.map(_.version) :+ cut).sorted.reverse.foreach(v =>
        fs.delete(new Path(logDir, f"$v%08d.json"), false))
      vacuumPhaseHook("old-commits-deleted")
      // phase 4: the synthetic base commit — carrying the horizon commit's
      // ORIGINAL timestamp so timestamp travel survives the rebase
      val cutTs = log.find(_.version == cut).map(_.ts).getOrElse(-1L)
      writeCommit(Commit(cut, baseFiles, Seq.empty, baseSchema, baseStats, cutTs,
        op = "VACUUM_REBASE", dvSet = Some(baseDv), colMapSet = colMapFor(baseColMap),
        idSet = if (baseIdHw.nonEmpty) Some(baseIdHw) else None,
        txnSet = if (baseTxnHw.nonEmpty) Some(baseTxnHw) else None))
      vacuumPhaseHook("rebased")
      // the rebase rewrote history below the horizon: drop every cached
      // state so sub-horizon reads fail loudly instead of serving a
      // pre-vacuum snapshot (the one log operation that invalidates)
      stateCache.synchronized { stateCache.clear() }
      // phase 5a: log-derived physical deletes, strictly after the log
      // is consistent. OUT-OF-ROOT GUARD: a shallow clone's log references
      // its source's files by absolute path — vacuum drops them from the
      // clone's LOG but must never physically delete outside its own
      // table root (the Delta shallow-clone vacuum contract: source files
      // are reclaimed only by the source's own vacuum).
      deletable.filterNot(f => f.startsWith("/") || f.contains("://"))
        .foreach(f => fs.delete(new Path(path, f), false))
      // later retained commits stay as-is: their removed-lists reference
      // only files present in the rebased base or in retained adds
      // (removal of an already-gone name is a no-op in snapshot
      // resolution)
    }
    // phase 5b: orphan sweep — ALWAYS runs, so a re-run after any crash
    // (including one between phases 4 and 5a, where the old commits that
    // named the superseded files are already gone) still reclaims space.
    // One top-level listing; only staging dirs versioned below the
    // horizon are descended into.
    val horizon = System.currentTimeMillis() - math.max(0L, orphanRetentionMillis)
    val stagedDir = """v(\d{8})-.*""".r
    val swept = scala.collection.mutable.ArrayBuffer.empty[String]
    val base = new Path(path).toUri.getPath
    if (fs.exists(new Path(path))) fs.listStatus(new Path(path)).foreach { d =>
      d.getPath.getName match {
        case stagedDir(v) if d.isDirectory && v.toInt < cut =>
          val it = fs.listFiles(d.getPath, true)
          var remaining = false
          while (it.hasNext) {
            val f = it.next()
            val rel = f.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/")
            if (!retainedLive.contains(rel) && f.getModificationTime < horizon) {
              fs.delete(f.getPath, false); swept += rel
            } else remaining = true
          }
          if (!remaining) fs.delete(d.getPath, true) // empty staging dir
        case _ =>
      }
    }
    // CDC files follow the same horizon as the log: a commit no longer
    // time-travelable has no replayable change feed either (Delta ties
    // CDF retention to the table's retention the same way)
    if (changeDataFeed && fs.exists(cdcDir)) {
      val cdcVer = """v(\d{8})""".r
      fs.listStatus(cdcDir).foreach(d => d.getPath.getName match {
        case cdcVer(v) if v.toInt < cut => fs.delete(d.getPath, true)
        case _ =>
      })
    }
    // deletion-vector dirs: drop those no retained snapshot references —
    // guarded like the data-file orphan sweep: only dirs versioned BELOW
    // the horizon (an in-flight delete stages at head+1 ≥ cut) and past
    // the age guard (a slow writer's staged-but-uncommitted tombstones
    // survive), so a concurrent deleteViaDv can never lose its dir
    if (fs.exists(dvDir)) {
      val dvName = """v(\d{8})-.*""".r
      fs.listStatus(dvDir).foreach(d => d.getPath.getName match {
        case dvName(v) if v.toInt < cut && !retainedDv.contains(d.getPath.getName) &&
            d.getModificationTime < horizon =>
          fs.delete(d.getPath, true)
        case _ =>
      })
    }
    (deletable ++ (swept.toSet -- deletable)).sorted
  }
}
