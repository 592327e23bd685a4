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
  * every user pre-cast. NOTE: losslessness is conditional on
  * `spark.sql.session.timeZone=UTC` — under a DST-observing zone the cast
  * shifts skipped/ambiguous local times; `normalize` warns on non-UTC
  * sessions rather than silently moving window boundaries.
  *
  * Legacy nano-long columns (parquet TIMESTAMP(NANOS) read with
  * `spark.sql.legacy.parquet.nanosAsLong=true`) are handled by interpreting
  * values as epoch NANOseconds truncated to µs — exact whenever the source
  * was µs-aligned. Because a long column could equally hold epoch
  * millis/seconds, the branch is guarded per row: any non-null value with
  * magnitude below 1e16 (≈ 1970-04-26 in nanos, yet far above any modern
  * epoch-millis ≈ 1.7e12) raises a runtime error instead of silently
  * producing a ~1970 timestamp.
  *
  * The reference sidesteps all of this only because it does no event-time
  * work at all (SURVEY §2.6: "late data is not handled").
  */
object EventTime {

  // Below this magnitude a long cannot plausibly be epoch nanoseconds
  // (1e16 ns = 1970-04-26); modern epoch millis/seconds are far below it.
  private val MinPlausibleEpochNanos = 1000000000000000L * 10 // 1e16

  /** Expression form: normalize column `c` (of type `dt`, named `name` for
    * error messages only) to TimestampType, or unchanged if it already is. */
  def normalizeCol(dt: DataType, c: Column, name: String): Column = dt match {
    case TimestampType    => c
    case TimestampNTZType => c.cast(TimestampType)
    case LongType         =>
      // `div` = Catalyst IntegralDivide — a double `/` would round epoch
      // nanos (~1.7e18) past the 53-bit mantissa. Magnitude guard: refuse
      // to guess when the value can't be nanos (likely millis/seconds).
      when(c.isNotNull && abs(c) < lit(MinPlausibleEpochNanos),
        raise_error(concat(
          lit(s"event-time long column '$name' value "), c.cast(StringType),
          lit(" is too small to be epoch nanoseconds; cast to timestamp explicitly"))))
        .otherwise(timestamp_micros(call_function("div", c, lit(1000L))))
    case DateType         => c.cast(TimestampType)
    case other => throw new IllegalArgumentException(
      s"event-time column '$name' has non-temporal type $other")
  }

  /** Back-compat overload: resolves the column by (exact) name. Prefer the
    * Column overload when a resolved Column is available. */
  def normalizeCol(dt: DataType, name: String): Column =
    normalizeCol(dt, col(quoted(name)), name)

  private def quoted(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** DataFrame form: replace `name` in place with its normalized value.
    * Resolution is case-insensitive (matching Spark's own resolver, so a
    * config naming `TS` against a column `ts` keeps working). No-op (same
    * plan) when the column is already TimestampType, so this is safe to call
    * unconditionally on both batch and streaming frames. */
  def normalize(df: DataFrame, name: String): DataFrame = {
    val field = df.schema.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(
        s"event-time column '$name' not found among ${df.columns.mkString(", ")}"))
    field.dataType match {
      case TimestampType => df
      case dt =>
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
        if (dt == TimestampNTZType && tz != "UTC" && tz != "Etc/UTC" && tz != "GMT")
          org.apache.log4j.Logger.getLogger(getClass)
            .warn(s"normalizing TIMESTAMP_NTZ column '${field.name}' under non-UTC session timezone '$tz': DST-skipped/ambiguous local times will shift")
        df.withColumn(field.name, normalizeCol(dt, df(quoted(field.name)), field.name))
    }
  }
}
