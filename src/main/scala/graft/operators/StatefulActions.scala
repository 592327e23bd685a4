package graft.operators

import graft.core._
import graft.sources._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Shared machinery of actions that read their own output to compute the
  * next state (deduplicate, historize). */
abstract class StatefulAction extends DataFrameAction {
  def inputId: String
  def outputId: String
  def primaryKey: Seq[String]
  /** capture-time provider; injectable for deterministic tests (reference
    * passes a referenceTimestamp through ActionPipelineContext) */
  def referenceTimestamp: () => Timestamp = () => new Timestamp(System.currentTimeMillis())

  def inputIds: Seq[String] = Seq(inputId)
  def outputIds: Seq[String] = Seq(outputId)

  protected def effectivePk(implicit ctx: ActionPipelineContext): Seq[String] =
    if (primaryKey.nonEmpty) primaryKey
    else ctx.registry.dataObject(outputId) match {
      case t: TableDataObject => t.table.primaryKey.getOrElse(Seq.empty)
      case _ => Seq.empty
    }

  protected def readExisting(expected: DataFrame)(implicit ctx: ActionPipelineContext): Option[DataFrame] =
    readCurrentStateIfExists(outputId)

  /** the output as a MERGE target, when it already holds committed state —
    * catalog/JDBC tables and the versioned lakehouse table */
  protected def mergeTargetIfExisting(output: DataObject)
                                     (implicit ctx: ActionPipelineContext): Option[CanMergeDataFrame] =
    output match {
      case m: CanMergeDataFrame with TableDataObject if m.isTableExisting => Some(m)
      case v: VersionedTableDataObject if v.latestVersion.isDefined => Some(v)
      case _ => None
    }

  /** write new full state; ALWAYS staged — the plan reads the same object
    * it overwrites, and a plain Overwrite truncates the source before the
    * plan runs (JDBC drops the table first, Hive refuses outright) */
  protected def writeState(df: DataFrame)(implicit ctx: ActionPipelineContext): ActionMetrics =
    ctx.registry.dataObject(outputId) match {
      case w: CanWriteDataFrame => w.writeDataFrameStaged(df)
      case other => throw new IllegalArgumentException(s"${other.id} cannot write DataFrames")
    }

  protected def transformedInput(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): DataFrame = {
    val in0 = subFeeds.find(_.dataObjectId == inputId).getOrElse(SubFeed(inputId))
    val in = applyExecutionMode(in0)
    val df = in.dataFrame.getOrElse(readInput(inputId, in.partitionValues))
    applyTransformers(df, inputId)
  }

  protected def computeState(feed: DataFrame, existing: Option[DataFrame])
                            (implicit ctx: ActionPipelineContext): DataFrame

  /** When true, columns present in the stored state but absent from the
    * feed are DROPPED from the merged schema instead of carried null-filled
    * (reference `ignoreOldDeletedColumns`). */
  protected def ignoreDeletedColumns: Boolean = false

  /** Feed-side technical columns excluded from the schema-drift compare and
    * re-attached after alignment — the CDC operation column is consumed by
    * the replay (never stored), so comparing it against the stored history's
    * business schema would fire a spurious evolution that null-fills an `op`
    * column into the history and breaks the merge select (the reference
    * evolves schemas only *after* mapping CDC columns away). */
  protected def feedTechColumns: Seq[String] = Seq.empty

  /** Align a schema-drifted feed and the existing state to their merged
    * schema before state computation — the reference runs
    * `SchemaEvolution.process` on every historize/dedup load
    * (`HistorizeAction`/`DeduplicateAction` via `DataFrameActionImpl`);
    * without it a feed that adds or drops a column fails the state union
    * with a missing-column error. SCD2 technical columns ride along on the
    * existing side untouched. No-op (same frames) when schemas match. */
  protected def evolveForState(feed: DataFrame, existing: Option[DataFrame]): (DataFrame, Option[DataFrame]) =
    existing match {
      case Some(e) =>
        import graft.functions.SchemaEvolution
        val tech = Seq(Historization.captured, Historization.delimited).filter(e.columns.contains)
        val eBiz = e.drop(tech: _*)
        val feedTech = feedTechColumns.filter(feed.columns.contains)
        val feedBiz = feed.drop(feedTech: _*)
        if (!SchemaEvolution.hasSchemaChanged(eBiz.schema, feedBiz.schema)) (feed, Some(e))
        else {
          val target = SchemaEvolution.mergedSchema(eBiz.schema, feedBiz.schema, ignoreDeletedColumns)
          val targetFeed = org.apache.spark.sql.types.StructType(
            target.fields ++ feed.schema.fields.filter(f => feedTech.contains(f.name)))
          val targetFull = org.apache.spark.sql.types.StructType(
            target.fields ++ e.schema.fields.filter(f => tech.contains(f.name)))
          (SchemaEvolution.alignTo(feed, targetFeed), Some(SchemaEvolution.alignTo(e, targetFull)))
        }
      case None => (feed, None)
    }

  override def init(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] = {
    val feed0 = transformedInput(subFeeds)
    val (feed, existing) = evolveForState(feed0, readExisting(feed0))
    val out = computeState(feed, existing)
    Seq(SubFeed(outputId, Some(out)))
  }

  override def exec(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] = {
    val feed0 = transformedInput(subFeeds)
    val (feed, existing) = evolveForState(feed0, readExisting(feed0))
    val out = computeState(feed, existing)
    val metrics = writeState(out)
    // the state plan read the object the staged write just replaced —
    // downstream must re-read the committed state
    Seq(SubFeed(outputId, None, metrics = Some(metrics)))
  }
}

/** Keep the latest record per primary key across loads; adds
  * `dl_ts_captured`. Reference `DeduplicateAction.scala:71-229`:
  * full mode = union existing + window row_number; merge mode = upsert with
  * `updateCapturedColumnOnlyWhenChanged` change predicate (:106-113).
  * With a merge-capable output and mergeModeEnable the work scales with the
  * feed, not the table.
  */
case class DeduplicateAction(
    id: String, inputId: String, outputId: String,
    primaryKey: Seq[String] = Seq.empty,
    transformers: Seq[DfTransformer] = Seq.empty,
    mergeModeEnable: Boolean = false,
    updateCapturedColumnOnlyWhenChanged: Boolean = false,
    /** drop stored columns absent from the feed instead of carrying them
      * null-filled (reference `ignoreOldDeletedColumns`) */
    ignoreOldDeletedColumns: Boolean = false,
    /** extra predicate ANDed into the merge join (reference
      * `mergeModeAdditionalJoinPredicate`) */
    mergeModeAdditionalJoinPredicate: Option[String] = None,
    override val referenceTimestamp: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
    override val executionMode: Option[graft.operators.modes.ExecutionMode] = None,
    override val executionCondition: Option[Condition] = None,
    override val metricsFailCondition: Option[String] = None)
  extends StatefulAction {

  // a merge upsert can only ADD or UPDATE target rows — it cannot remove a
  // column from the target, so "drop deleted columns" is unimplementable on
  // the merge path; evolveForState would drop the column from the feed and
  // the sink's merge would then reference a feed column that doesn't exist
  // (AnalysisException at exec). Reject the combination at CONSTRUCTION.
  require(!(mergeModeEnable && ignoreOldDeletedColumns),
    s"Action $id: ignoreOldDeletedColumns is incompatible with mergeModeEnable — " +
      "a merge cannot drop target columns; use full mode for schema-narrowing loads")

  override protected def ignoreDeletedColumns: Boolean = ignoreOldDeletedColumns

  override protected def computeState(feed: DataFrame, existing: Option[DataFrame])
                                     (implicit ctx: ActionPipelineContext): DataFrame = {
    val pk = effectivePk
    require(pk.nonEmpty, s"Action $id: primaryKey required for deduplication")
    val refTs = referenceTimestamp()
    existing match {
      case Some(e) => Historization.deduplicate(e, feed, pk, refTs, updateCapturedColumnOnlyWhenChanged)
      case None =>
        // first load: the feed itself may carry duplicate keys — exactly one
        // row per key must survive (reference DeduplicateAction.scala:214-219
        // always applies the window, existing or not)
        val empty = feed.withColumn(Historization.captured, lit(refTs)).limit(0)
        Historization.deduplicate(empty, feed, pk, refTs, updateCapturedColumnOnlyWhenChanged)
    }
  }

  override def exec(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] = {
    val output = ctx.registry.dataObject(outputId)
    (if (mergeModeEnable) mergeTargetIfExisting(output) else None) match {
      case Some(m) =>
        // merge mode: upsert only the feed (reference DeduplicateAction.scala:106-113)
        val pk = effectivePk
        val refTs = referenceTimestamp()
        // one row per key BEFORE the merge: a feed carrying duplicate keys
        // would double-match the target row (cardinality error on ANSI
        // engines, duplicate keys in the dedup table otherwise) — the
        // non-merge path gets this from the window in Historization.deduplicate
        val feed = transformedInput(subFeeds).dropDuplicates(pk)
          .withColumn(Historization.captured, lit(refTs))
        // null-safe "any column differs" in PORTABLE SQL: the condition is
        // evaluated by the SINK — Spark's expr() on lakehouse sinks, the
        // database engine on JDBC — and Spark's `<=>` parses nowhere else
        val changePredicate = feed.columns.filterNot(c => pk.contains(c) || c == Historization.captured)
          .map(c => s"(existing.`$c` <> new.`$c` OR (existing.`$c` IS NULL AND new.`$c` IS NOT NULL) " +
            s"OR (existing.`$c` IS NOT NULL AND new.`$c` IS NULL))").mkString(" OR ")
        val opts =
          (if (updateCapturedColumnOnlyWhenChanged && changePredicate.nonEmpty)
            SaveModeMergeOptions(updateCondition = Some(changePredicate))
          else SaveModeMergeOptions())
            .copy(additionalMergePredicate = mergeModeAdditionalJoinPredicate)
        val metrics = m.mergeDataFrame(feed, pk, opts)
        // consistent with the non-merge path: downstream re-reads the full
        // committed table (propagating only the feed would make a
        // downstream Overwrite publish just this run's increment)
        Seq(SubFeed(outputId, None, metrics = Some(metrics)))
      case _ => super.exec(subFeeds)
    }
  }
}

/** SCD2 historization action. Reference `HistorizeAction.scala:89-306`,
  * three algorithms:
  *  - full (default): complete snapshot vs history, detects deletes
  *  - incremental (`incrementalUpdate`): feed has only new/changed rows
  *  - CDC (`cdcOptions`): replay a change stream, no join at all
  */
case class HistorizeAction(
    id: String, inputId: String, outputId: String,
    primaryKey: Seq[String] = Seq.empty,
    transformers: Seq[DfTransformer] = Seq.empty,
    incrementalUpdate: Boolean = false,
    cdcOptions: Option[CdcOptions] = None,
    /** historize only the existing rows matching this SQL expression; the
      * remainder passes through untouched (reference `filterClause`) —
      * bounds the compare to the affected subset at scale */
    filterClause: Option[String] = None,
    /** columns EXCLUDED from change detection (reference
      * `historizeBlacklist`) — volatile technical columns don't open new
      * versions; mutually exclusive with the whitelist */
    historizeBlacklist: Option[Seq[String]] = None,
    /** the ONLY columns participating in change detection (reference
      * `historizeWhitelist`) */
    historizeWhitelist: Option[Seq[String]] = None,
    /** drop stored columns absent from the feed instead of carrying them
      * null-filled (reference `ignoreOldDeletedColumns`) */
    ignoreOldDeletedColumns: Boolean = false,
    /** upsert only the changed/new version rows through a MERGE-capable
      * output instead of rewriting the whole history (reference
      * `mergeModeEnable`) — with a file-pruned merge sink a load costs
      * O(changes), not O(table) */
    mergeModeEnable: Boolean = false,
    /** extra predicate ANDed into the merge join (reference
      * `mergeModeAdditionalJoinPredicate`) — lets the sink prune
      * partitions/files beyond the primary key */
    mergeModeAdditionalJoinPredicate: Option[String] = None,
    override val referenceTimestamp: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
    override val executionMode: Option[graft.operators.modes.ExecutionMode] = None,
    override val executionCondition: Option[Condition] = None,
    override val metricsFailCondition: Option[String] = None)
  extends StatefulAction {

  require(historizeWhitelist.isEmpty || historizeBlacklist.isEmpty,
    s"Action $id: historizeWhitelist and historizeBlacklist are mutually exclusive")

  // same constraint as DeduplicateAction: a merge upsert cannot drop a
  // target column, so the combination is rejected at construction instead
  // of failing with an AnalysisException mid-exec
  require(!(mergeModeEnable && ignoreOldDeletedColumns),
    s"Action $id: ignoreOldDeletedColumns is incompatible with mergeModeEnable — " +
      "a merge cannot drop target columns; use full mode for schema-narrowing loads")

  // the operation column never reaches the stored history (cdcHistorize drops
  // it); the event-time column DOES persist as a business column, so only the
  // op column must be kept out of the drift compare
  override protected def feedTechColumns: Seq[String] =
    cdcOptions.map(_.operationColumn).toSeq

  override protected def ignoreDeletedColumns: Boolean = ignoreOldDeletedColumns

  /** whitelist → exactly those (minus pk); blacklist → all non-pk feed
    * columns except those; None → default all-non-pk compare */
  private def compareColsFor(feed: DataFrame, pk: Seq[String]): Option[Seq[String]] =
    historizeWhitelist.map(_.filterNot(pk.contains)).orElse(
      historizeBlacklist.map(b =>
        feed.columns.toSeq.filterNot(pk.contains).filterNot(b.contains)))

  override protected def computeState(feed: DataFrame, existing: Option[DataFrame])
                                     (implicit ctx: ActionPipelineContext): DataFrame = {
    val pk = effectivePk
    require(pk.nonEmpty, s"Action $id: primaryKey required for historization")
    val refTs = referenceTimestamp()
    cdcOptions match {
      case Some(cdc) =>
        val replayed = Historization.cdcHistorize(feed, pk, cdc.timestampColumn, cdc.operationColumn, cdc.deleteValue)
        existing.fold(replayed)(e => mergeCdc(e, replayed, feed, cdc.timestampColumn, pk))
      case None =>
        val cmp = compareColsFor(feed, pk)
        existing match {
          case Some(e) if incrementalUpdate => Historization.incrementalHistorize(e, feed, pk, refTs, cmp)
          case Some(e) =>
            // filterClause (full mode only, like the reference): historize
            // the matching slice; the rest of the history passes through
            filterClause match {
              case Some(fc) =>
                // the complement must be null-coalesced: for a row where the
                // clause evaluates to NULL, both `where(fc)` and `where(!fc)`
                // are false — without the coalesce the row would vanish from
                // the rewritten history
                Historization.fullHistorize(e.where(expr(fc)), feed, pk, refTs, cmp)
                  .unionByName(e.where(!coalesce(expr(fc), lit(false))))
              case None => Historization.fullHistorize(e, feed, pk, refTs, cmp)
            }
          case None =>
            feed.withColumn(Historization.captured, lit(refTs))
              .withColumn(Historization.delimited, lit(Historization.doomsday))
        }
    }
  }

  /** MERGE mode (reference `HistorizeAction.scala:140-161`): write ONLY
    * the `updateClose` + `insertNew` operation rows through the output's
    * MERGE. The join is on pk with `new.captured = existing.captured`
    * ANDed in, so a close row updates exactly the open record it read and
    * an insert row (captured = refTs) matches nothing. */
  override def exec(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] = {
    val output = ctx.registry.dataObject(outputId)
    (if (mergeModeEnable && cdcOptions.isEmpty) mergeTargetIfExisting(output) else None) match {
      case Some(m) =>
        val pk = effectivePk
        require(pk.nonEmpty, s"Action $id: primaryKey required for historization")
        val refTs = referenceTimestamp()
        val feed0 = transformedInput(subFeeds)
        val (feed, existingOpt) = evolveForState(feed0.dropDuplicates(pk), readExisting(feed0))
        val existing = existingOpt.getOrElse(
          throw new IllegalStateException(s"Action $id: merge mode needs readable existing state"))
        val current = existing.where(col(Historization.delimited) === lit(Historization.doomsday))
        // the reference's checkDataFrameNotNewerThan guard: an existing
        // capture at/after refTs would make the insert row's captured
        // collide with the close predicate and double-match
        val newest = current.agg(max(col(Historization.captured))).head().getTimestamp(0)
        require(newest == null || newest.before(refTs),
          s"Action $id: existing state captured at $newest is not older than reference timestamp $refTs")
        val ops = Historization.incrementalHistorizeOps(current, feed, pk, refTs, compareColsFor(feed, pk))
        val predicate = (Seq(s"new.`${Historization.captured}` = existing.`${Historization.captured}`") ++
          mergeModeAdditionalJoinPredicate).mkString(" and ")
        val opts = SaveModeMergeOptions(
          updateCondition = Some(s"new.`${Historization.operationCol}` = 'updateClose'"),
          updateColumns = Seq(Historization.delimited),
          insertCondition = Some(s"new.`${Historization.operationCol}` = 'insertNew'"),
          // the op tag is feed-technical: never inserted, never evolves
          // the target schema (reference insertColsToIgnore)
          insertColumnsToIgnore = Seq(Historization.operationCol),
          additionalMergePredicate = Some(predicate))
        val metrics = m.mergeDataFrame(ops, pk, opts)
        Seq(SubFeed(outputId, None, metrics = Some(metrics)))
      case _ => super.exec(subFeeds)
    }
  }

  /** CDC replay over existing history: new versions append; the previously
    * open record of each affected key is closed at the first new change's
    * event ts − 1ms. The close point comes from the RAW feed (`rawFeed`,
    * before delete filtering) — a key whose only change this run is a delete
    * has no replayed rows, but its open record must still close at the
    * delete's timestamp, matching the within-batch delimiting of
    * [[Historization.cdcHistorize]]. */
  /** pk is the RESOLVED key from computeState (effectivePk) — the raw
    * constructor field may be empty when the key comes from table metadata,
    * and groupBy() on zero columns would close every record at the global
    * minimum CDC timestamp. */
  private def mergeCdc(existing: DataFrame, replayed: DataFrame, rawFeed: DataFrame,
                       tsCol: String, pk: Seq[String]): DataFrame = {
    val firstNew = rawFeed.groupBy(pk.map(col): _*)
      .agg(min(col(tsCol)).as("_first_new_ts"))
    val closed = existing.join(firstNew, pk, "left")
      .withColumn(Historization.delimited,
        when(col("_first_new_ts").isNotNull && col(Historization.delimited) === lit(Historization.doomsday),
          expr("timestampadd(MILLISECOND, -1, _first_new_ts)"))
          .otherwise(col(Historization.delimited)))
      .drop("_first_new_ts")
    closed.unionByName(replayed.select(closed.columns.map(c => col(s"`$c`")).toIndexedSeq: _*))
  }
}

/** CDC column mapping for HistorizeAction. */
case class CdcOptions(timestampColumn: String, operationColumn: String, deleteValue: String = "d")
