package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time column normalization.
  *
  * Plain parquet files carrying `timestamp[us]` with `isAdjustedToUTC=false`
  * (the most common lake format — pyarrow/pandas default) arrive in Spark as
  * `TIMESTAMP_NTZ`, which every event-time API rejects:
  * `withWatermark` throws `EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE` and
  * `unix_micros` is TimestampType-only. Under a UTC session timezone the
  * NTZ→TIMESTAMP cast is a lossless reinterpretation (same instant, same
  * binary µs value), so the engine normalizes internally rather than making
  * every user pre-cast.
  *
  * Legacy nano-long columns (parquet TIMESTAMP(NANOS) read with
  * `spark.sql.legacy.parquet.nanosAsLong=true`) are also handled: values are
  * interpreted as epoch nanoseconds and truncated to µs — exact whenever the
  * source was µs-aligned.
  *
  * The reference sidesteps all of this only because it does no event-time
  * work at all (SURVEY §2.6: "late data is not handled").
  */
object EventTime {

  /** Expression form: `col(name)` normalized to TimestampType, or the
    * column unchanged if it already is one. */
  def normalizeCol(dt: DataType, name: String): Column = dt match {
    case TimestampType    => col(name)
    case TimestampNTZType => col(name).cast(TimestampType)
    // `div` (integer division) — a double-typed `/` would round epoch
    // nanos (~1.7e18) past the 53-bit mantissa
    case LongType         => expr(s"timestamp_micros(`$name` div 1000)")
    case DateType         => col(name).cast(TimestampType)
    case other => throw new IllegalArgumentException(
      s"event-time column '$name' has non-temporal type $other")
  }

  /** DataFrame form: replace `name` in place with its normalized value.
    * No-op (same plan) when the column is already TimestampType, so this is
    * safe to call unconditionally on both batch and streaming frames. */
  def normalize(df: DataFrame, name: String): DataFrame =
    df.schema(name).dataType match {
      case TimestampType => df
      case dt => df.withColumn(name, normalizeCol(dt, name))
    }
}
