package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no built-in form for: as-of join,
  * interval (range) join, and gap-based sessionization.
  *
  * All three avoid the naive theta-join plan (BroadcastNestedLoop /
  * cartesian + filter), which collapses at scale:
  *  - asOfJoin is a tagged UNION + one window pass — a single shuffle on
  *    the key, no join operator at all, so 100 TB of events sorts once.
  *  - rangeJoin buckets the value domain so the join becomes an equi-join
  *    on bucket id (shuffle-hash/sort-merge, AQE-eligible); each interval
  *    is replicated only to the buckets it spans.
  *  - sessionize is two window functions over ONE partitioning (Catalyst
  *    reuses the sort), then a group-by on the same keys — no extra
  *    shuffle for the aggregation thanks to co-partitioning.
  */
object TemporalJoins {

  /** As-of join: for each left row attach the columns of the latest right
    * row with `right.tsCol <= left.tsCol` (or `<` when `strict`) within the
    * same key group. Left-outer semantics: unmatched left rows keep nulls.
    *
    * Implementation: tag both sides, union, and carry the most recent right
    * payload forward with `last(_, ignoreNulls)` over
    * (key ORDER BY ts, side). At equal ts the right row sorts before the
    * left row (side 0 < 1), so ties are visible — flipped for `strict`.
    *
    * Determinism: if the right side can hold several rows with the same
    * (key, ts), reduce it first (e.g. groupBy(key, ts).agg(max ...)) — the
    * carried payload would otherwise depend on partition-internal order.
    * DuckDB's ASOF JOIN has the same caveat.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightValueCols: Seq[String], suffix: String = "_asof",
               strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightValueCols.map(col) :+ col(rightTs).as(rightTs): _*)
    val rightSide = lit(if (strict) 2 else 0)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).cast("timestamp").as("_t"), rightSide.as("_side"),
        lit(null).cast(org.apache.spark.sql.types.StructType(left.schema.fields)).as("_lp"),
        payload.as("_rp")): _*)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).cast("timestamp").as("_t"), lit(1).as("_side"),
        struct(leftCols.map(col): _*).as("_lp"),
        lit(null).cast(r.schema("_rp").dataType).as("_rp")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("_carry", last(col("_rp"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
    val out = leftCols.map(c => col("_lp." + c).as(c)) ++
      (rightValueCols :+ rightTs).map(c => col("_carry." + c).as(c + suffix))
    joined.select(out: _*)
  }

  /** Interval join: rows of `points` matched to every row of `intervals`
    * whose [loCol, hiCol] contains pointCol. Buckets the value domain with
    * `bucketWidth` so the physical plan is an equi-join on bucket id; each
    * interval replicates to ceil(span/width)+1 buckets, each point to
    * exactly one, so there are no duplicate matches to dedupe. Pick the
    * width near the typical interval span.
    */
  def rangeJoin(points: DataFrame, pointCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_bucket", floor(col(pointCol) / bucketWidth))
    val i = intervals.withColumn("_bucket",
      explode(sequence(floor(col(loCol) / bucketWidth), floor(col(hiCol) / bucketWidth))))
    p.join(i, Seq("_bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bucket")
  }

  /** Gap-based sessionization: assigns a per-key `session_id` (1-based,
    * ordered by time) that increments whenever the gap to the previous
    * event exceeds `maxGapSeconds`. Batch twin of Structured Streaming's
    * session windows (streaming/Streaming.scala). */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
                 maxGapSeconds: Long): DataFrame = {
    // normalize NTZ/long event time like asOfJoin's casts above — plain
    // parquet µs timestamps arrive as TIMESTAMP_NTZ, which unix_micros
    // rejects (lossless under the UTC session tz)
    val ts = graft.core.EventTime.normalizeCol(df.schema(tsCol).dataType, tsCol)
    val order = Window.partitionBy(keys.map(col): _*).orderBy(ts)
    val gap = unix_micros(ts) - unix_micros(lag(ts, 1).over(order))
    val isNew = when(gap.isNull || gap > maxGapSeconds * 1000000L, 1L).otherwise(0L)
    // default RANGE frame on purpose: rows tying on ts are peers, so the
    // cumulative sum gives every peer the same session id no matter which
    // peer the lag() marked as the session opener — deterministic under
    // ties, where a ROWS frame would depend on partition-internal order
    df.withColumn("session_id", sum(isNew).over(order))
  }
}
