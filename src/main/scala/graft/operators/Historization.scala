package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import java.sql.Timestamp

/** SCD2 historization and latest-per-key deduplication.
  *
  * Semantics ported from the reference's golden tests
  * (`sdl-core/util/historization/Historization.scala:62-377`,
  * `FullHistorizationTest` / `IncrementalHistorizationTest` /
  * `IncrementalCDCHistorizationTest`): validity interval
  * [`dl_ts_captured`, `dl_ts_delimited`], open records delimited at doomsday
  * 9999-12-31, closed records delimited at newCaptured − 1ms (tick offset so
  * intervals never overlap).
  *
  * Implementation is Spark-first, NOT a port: one full-outer join and a
  * single `explode(array(ops))` pass produce all record classes (the
  * reference unions 6 separately-computed DataFrames,
  * `Historization.scala:96-129` — that re-scans the join output up to 6
  * times at scale). Change detection uses null-safe struct comparison
  * compiled by Catalyst (the reference used a non-codegen
  * `udf(row.hashCode)`, `Historization.scala:366-376`).
  */
object Historization {

  val captured = "dl_ts_captured"
  val delimited = "dl_ts_delimited"
  /** reference `Historization.doomsday` = 9999-12-31 */
  val doomsday: Timestamp = Timestamp.valueOf("9999-12-31 00:00:00")
  /** closing tick: 1 millisecond before the new capture time */
  def closeTs(refTs: Timestamp): Timestamp = new Timestamp(refTs.getTime - 1)

  private def nullSafeEq(attrs: Seq[String], l: String, r: String): Column =
    attrs.map(a => col(s"$l.`$a`") <=> col(s"$r.`$a`")).reduce(_ and _)

  /** Existence marker for outer-join sides: pk columns may legitimately be
    * NULL (the joins use `<=>`), so `pk.head.isNotNull` would silently drop
    * NULL-keyed rows — a constant-true column is null only when the side is
    * absent from the outer join. */
  private val existsMarker = "_graft_side_exists"
  private def marked(df: DataFrame): DataFrame = df.withColumn(existsMarker, lit(true))
  private def sideExists(side: String): Column = col(s"$side.`$existsMarker`").isNotNull

  /** Full historization: the complete new snapshot `newFeed` vs the existing
    * history `existing`. Records absent from the snapshot are closed
    * (deleted), changed records are closed + re-inserted, unchanged stay,
    * new are inserted, already-closed history rows pass through untouched.
    *
    * @param existing history table with dl_ts_captured/dl_ts_delimited
    *                 (may be empty with same schema)
    * @param newFeed  new full snapshot (business columns only)
    * @param pk       primary key columns
    * @param refTs    capture timestamp of this load (deterministic input →
    *                 deterministic output; callers default it to now())
    */
  /** @param compareCols columns participating in change detection (the
    *                     reference's historizeWhitelist/Blacklist resolved
    *                     by the action); None = all non-pk columns */
  def fullHistorize(existing: DataFrame, newFeed: DataFrame, pk: Seq[String],
                    refTs: Timestamp, compareCols: Option[Seq[String]] = None): DataFrame = {
    val attrs = newFeed.columns.toSeq
    val valueAttrs = compareCols.getOrElse(attrs.filterNot(pk.contains))
    val history = existing.where(col(delimited) =!= lit(doomsday))
    val current = existing.where(col(delimited) === lit(doomsday))

    val joined = marked(current).alias("e").join(
      marked(newFeed).alias("n"),
      pk.map(k => col(s"e.`$k`") <=> col(s"n.`$k`")).reduce(_ and _),
      "full")
    val eExists = sideExists("e")
    val nExists = sideExists("n")
    val unchanged = if (valueAttrs.nonEmpty) nullSafeEq(valueAttrs, "e", "n") else lit(true)

    def rec(side: String, cap: Column, del: Column): Column =
      struct((attrs.map(a => col(s"$side.`$a`").as(a)) :+ cap.as(captured)) :+ del.as(delimited): _*)

    // every joined row yields 0-2 output records in ONE pass:
    //  kept-as-is | closed (changed or deleted) | inserted (changed or new)
    val ops = array(
      when(eExists and nExists and unchanged, rec("e", col(s"e.`$captured`"), lit(doomsday))),
      when(eExists and (!nExists or !unchanged), rec("e", col(s"e.`$captured`"), lit(closeTs(refTs)))),
      when(nExists and (!eExists or !unchanged), rec("n", lit(refTs), lit(doomsday))))

    val updated = joined
      .select(explode(ops).as("r"))
      .where(col("r").isNotNull)
      .select(col("r.*"))
    history.select(updated.columns.map(c => col(s"`$c`")).toIndexedSeq: _*).unionByName(updated)
  }

  /** Incremental historization: `newFeed` carries only new/changed records
    * (no deletes observable). Unchanged records keep their original
    * captured ts; changed are closed + re-inserted; unseen keys pass
    * through. Reference: hash-column + merge algorithm
    * (`HistorizeAction.scala:140-161`, `Historization.scala:175-292`) —
    * same result computed here with one join + explode; sinks with real
    * MERGE support can apply [[incrementalHistorizeOps]] instead.
    */
  def incrementalHistorize(existing: DataFrame, newFeed: DataFrame, pk: Seq[String],
                           refTs: Timestamp, compareCols: Option[Seq[String]] = None): DataFrame = {
    val attrs = newFeed.columns.toSeq
    val valueAttrs = compareCols.getOrElse(attrs.filterNot(pk.contains))
    val history = existing.where(col(delimited) =!= lit(doomsday))
    val current = existing.where(col(delimited) === lit(doomsday))

    val joined = marked(current).alias("e").join(
      marked(newFeed).alias("n"),
      pk.map(k => col(s"e.`$k`") <=> col(s"n.`$k`")).reduce(_ and _),
      "full")
    val eExists = sideExists("e")
    val nExists = sideExists("n")
    val unchanged = if (valueAttrs.nonEmpty) nullSafeEq(valueAttrs, "e", "n") else lit(true)

    def rec(side: String, cap: Column, del: Column): Column =
      struct((attrs.map(a => col(s"$side.`$a`").as(a)) :+ cap.as(captured)) :+ del.as(delimited): _*)

    val ops = array(
      // existing key not in feed OR unchanged → keep as-is (no delete semantics)
      when(eExists and (!nExists or unchanged), rec("e", col(s"e.`$captured`"), col(s"e.`$delimited`"))),
      // changed → close existing
      when(eExists and nExists and !unchanged, rec("e", col(s"e.`$captured`"), lit(closeTs(refTs)))),
      // changed or brand new → insert
      when(nExists and (!eExists or !unchanged), rec("n", lit(refTs), lit(doomsday))))

    val updated = joined.select(explode(ops).as("r")).where(col("r").isNotNull).select(col("r.*"))
    history.select(updated.columns.map(c => col(s"`$c`")).toIndexedSeq: _*).unionByName(updated)
  }

  /** operation-tag column for MERGE-mode historization (reference
    * `Historization.historizeOperationColName`) */
  val operationCol = "_historize_op"

  /** Ops-only incremental historization for MERGE sinks (the reference's
    * `mergeModeEnable` algorithm, `HistorizeAction.scala:140-161`): emits
    * ONLY the rows a merge must write, tagged in [[operationCol]] —
    * `updateClose` rows carrying the closed record's original captured ts
    * plus the new delimited ts, and `insertNew` rows for changed/new
    * versions. Unchanged and absent keys emit NOTHING, so with a pruned
    * MERGE sink ([[graft.sources.VersionedTableDataObject]]) a load costs
    * O(changes), not O(table) — the reason merge mode exists at 100 TB.
    * `current` must be the OPEN records only (delimited = doomsday). */
  def incrementalHistorizeOps(current: DataFrame, newFeed: DataFrame, pk: Seq[String],
                              refTs: Timestamp, compareCols: Option[Seq[String]] = None): DataFrame = {
    val attrs = newFeed.columns.toSeq
    val valueAttrs = compareCols.getOrElse(attrs.filterNot(pk.contains))
    val joined = marked(current).alias("e").join(
      newFeed.alias("n"),
      pk.map(k => col(s"e.`$k`") <=> col(s"n.`$k`")).reduce(_ and _),
      "right")
    val eExists = sideExists("e")
    val unchanged = if (valueAttrs.nonEmpty) nullSafeEq(valueAttrs, "e", "n") else lit(true)
    def rec(side: String, cap: Column, del: Column, op: String): Column =
      struct((attrs.map(a => col(s"$side.`$a`").as(a)) :+ cap.as(captured)) :+
        del.as(delimited) :+ lit(op).as(operationCol): _*)
    val ops = array(
      when(eExists and !unchanged, rec("e", col(s"e.`$captured`"), lit(closeTs(refTs)), "updateClose")),
      when(!eExists or !unchanged, rec("n", lit(refTs), lit(doomsday), "insertNew")))
    joined.select(explode(ops).as("r")).where(col("r").isNotNull).select(col("r.*"))
  }

  /** CDC historization: replay a change stream (insert/update/delete ops
    * with event timestamps) into SCD2 — NO join against existing data.
    * Reference algorithm 3 (`HistorizeAction.scala:89-306` incremental-CDC).
    * Spark-first: `lead()` over the pk window delimits each version at the
    * next version's ts − 1ms; delete ops close the previous version and
    * emit nothing. One shuffle on pk, no join — at 100 TB this is the only
    * algorithm whose cost scales with the *changes*, not the table.
    *
    * @param cdc      change stream: business columns + `tsCol` + `opCol`
    * @param deleteOp value of opCol marking deletions
    */
  def cdcHistorize(cdc: DataFrame, pk: Seq[String], tsCol: String, opCol: String,
                   deleteOp: String = "d", tieBreakCols: Seq[String] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*)
      .orderBy((col(tsCol).asc +: tieBreakCols.map(col(_).asc)): _*)
    cdc
      .withColumn("_next_ts", lead(col(tsCol), 1).over(w))
      .withColumn(captured, col(tsCol))
      .withColumn(delimited,
        when(col("_next_ts").isNull, lit(doomsday))
          .otherwise(expr("timestampadd(MILLISECOND, -1, _next_ts)")))
      .where(col(opCol) =!= lit(deleteOp))
      .drop("_next_ts", opCol)
  }

  /** Latest record per key (dedup across loads): union of existing (already
    * carrying dl_ts_captured) and the new feed stamped with refTs, then
    * keep the newest per pk. Reference `DeduplicateAction.scala:214-219`.
    * When the newest candidate is value-identical to an older record the
    * older captured ts wins iff `keepCapturedTsWhenUnchanged` — the
    * reference's `updateCapturedColumnOnlyWhenChanged` (:106-113).
    */
  def deduplicate(existing: DataFrame, newFeed: DataFrame, pk: Seq[String],
                  refTs: Timestamp, keepCapturedTsWhenUnchanged: Boolean = false): DataFrame = {
    val attrs = newFeed.columns.toSeq
    val valueAttrs = attrs.filterNot(pk.contains)
    val stamped = newFeed.withColumn(captured, lit(refTs))
    val all = existing.select(stamped.columns.map(c => col(s"`$c`")).toIndexedSeq: _*)
      .unionByName(stamped)
    val w = Window.partitionBy(pk.map(col): _*).orderBy(col(captured).desc)
    if (!keepCapturedTsWhenUnchanged) {
      all.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
    } else {
      // newest row wins values; if they equal the previous version's values
      // (null-safe), keep the previous captured ts (first-seen semantics —
      // holds inductively because each load leaves one row per key)
      val vs = struct(valueAttrs.map(a => col(s"`$a`")): _*)
      all
        .withColumn("_rn", row_number().over(w))
        .withColumn("_prev_vs", lead(vs, 1).over(w))
        .withColumn("_prev_cap", lead(col(captured), 1).over(w))
        .where(col("_rn") === 1)
        .withColumn(captured,
          when(vs <=> col("_prev_vs"), col("_prev_cap")).otherwise(col(captured)))
        .drop("_rn", "_prev_vs", "_prev_cap")
    }
  }
}
