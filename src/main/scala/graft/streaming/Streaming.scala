package graft.streaming

import graft.core._
import graft.operators.DfTransformer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time tumbling/sliding window aggregation with watermark — exposed
  * as a declarative transformer. The reference does NOT support
  * watermarks/windows (SURVEY §2.6: "late data is not handled"); Spark
  * Structured Streaming gives them for free, so our engine surfaces them
  * as first-class pipeline config. Works identically on batch DataFrames
  * (the window function is the same), which keeps pipelines testable.
  *
  * Scale: watermark bounds the state store; without it a windowed agg on an
  * unbounded stream grows state forever — this transformer makes the bound
  * mandatory for streaming inputs.
  */
case class EventTimeWindowTransformer(
    eventTimeColumn: String,
    windowDuration: String,
    slideDuration: Option[String] = None,
    watermarkDuration: String = "0 seconds",
    groupByColumns: Seq[String] = Seq.empty,
    /** output column name → SQL aggregate expression */
    aggExpressions: Map[String, String]) extends DfTransformer {

  require(aggExpressions.nonEmpty,
    "EventTimeWindowTransformer: aggExpressions must not be empty")

  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame = {
    // NTZ/long event time → TimestampType (withWatermark rejects NTZ)
    val normalized = EventTime.normalize(df, eventTimeColumn)
    val withWm =
      if (normalized.isStreaming) normalized.withWatermark(eventTimeColumn, watermarkDuration) else normalized
    val windowCol = slideDuration match {
      case Some(slide) => window(col(eventTimeColumn), windowDuration, slide)
      case None => window(col(eventTimeColumn), windowDuration)
    }
    val aggs = aggExpressions.toSeq.map { case (name, e) => expr(e).as(name) }
    withWm
      .groupBy((windowCol.as("window") +: groupByColumns.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      // flatten the window struct so file sinks/oracles see plain timestamps
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }
}

/** Session-window aggregation (gap-based). Also absent in the reference. */
case class SessionWindowTransformer(
    eventTimeColumn: String,
    gapDuration: String,
    watermarkDuration: String = "0 seconds",
    groupByColumns: Seq[String] = Seq.empty,
    aggExpressions: Map[String, String]) extends DfTransformer {

  require(aggExpressions.nonEmpty,
    "SessionWindowTransformer: aggExpressions must not be empty")

  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame = {
    val normalized = EventTime.normalize(df, eventTimeColumn)
    val withWm =
      if (normalized.isStreaming) normalized.withWatermark(eventTimeColumn, watermarkDuration) else normalized
    val aggs = aggExpressions.toSeq.map { case (name, e) => expr(e).as(name) }
    withWm
      .groupBy((session_window(col(eventTimeColumn), gapDuration).as("window") +: groupByColumns.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }
}

/** Streaming deduplication — the streaming twin of exact dedup.
  * `withinWatermark = Some(d)` uses `dropDuplicatesWithinWatermark`: state
  * for a key is dropped once the watermark passes it, so state is bounded
  * by the watermark horizon instead of growing with every key ever seen —
  * the only shape that survives an unbounded stream. With `None` (or on a
  * batch frame) this is plain `dropDuplicates` (full-history dedup: state
  * grows with distinct keys; fine for bounded streams/backfills).
  * Content-keyed dedup composes by passing a derived column (e.g.
  * `Dedup.contentHash`) appended upstream. */
case class StreamingDedupTransformer(
    keyColumns: Seq[String],
    eventTimeColumn: Option[String] = None,
    withinWatermark: Option[String] = None) extends DfTransformer {
  require(withinWatermark.isEmpty || eventTimeColumn.nonEmpty,
    "withinWatermark needs eventTimeColumn for the watermark")
  // dropDuplicates(Seq.empty) is a GLOBAL dedup — Catalyst collapses the
  // whole dataset to one arbitrary row; a config that omits keyColumns
  // must fail at construction, not silently destroy the stream
  require(keyColumns.nonEmpty,
    "StreamingDedupTransformer: keyColumns must be non-empty")
  override def transform(df: DataFrame, dataObjectId: String = "")(implicit ctx: ActionPipelineContext): DataFrame =
    (withinWatermark, eventTimeColumn) match {
      case (Some(d), Some(ts)) if df.isStreaming =>
        EventTime.normalize(df, ts).withWatermark(ts, d)
          .dropDuplicatesWithinWatermark(keyColumns)
      case _ => df.dropDuplicates(keyColumns)
    }
}

/** Arbitrary stateful per-key processing via
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — exposed for user logic
  * needing custom state (reference covers this only via user Scala code).
  * Kept as a thin typed helper so the state encoder is explicit. */
object StatefulProcessing {
  import org.apache.spark.sql.{Dataset, Encoder}
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  def flatMapGroupsWithState[K: Encoder, V: Encoder, S: Encoder, O: Encoder](
      ds: Dataset[V], keyFn: V => K,
      fn: (K, Iterator[V], GroupState[S]) => Iterator[O],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      outputMode: OutputMode = OutputMode.Append): Dataset[O] =
    ds.groupByKey(keyFn).flatMapGroupsWithState(outputMode, timeout)(fn)
}
