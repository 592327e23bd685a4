package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering value for multi-column data skipping —
  * the mechanism behind the public `OPTIMIZE ... ZORDER BY` design
  * (Delta/Iceberg): map each clustering column to an equi-height
  * quantile bucket id, interleave the bucket bits into one scalar, and
  * range-partition + sort the data by it. Files then cover compact
  * hyper-rectangles of the clustered space, so per-file min/max stats
  * become selective on EVERY clustered column — a point filter on any of
  * them prunes most files, which a single-column sort only achieves for
  * its leading column.
  *
  * Spark-first shape: quantile boundaries come from one
  * `approxQuantile` pass (driver gets O(bits) doubles, the same sampled
  * sketch a RangePartitioner uses); the per-row bucket+interleave is a
  * pure column expression (`aggregate` HOF over a literal boundary
  * array + shift/or folds) — codegen'd, zero shuffles beyond the final
  * `repartitionByRange`. The reference has no z-ordering (its Delta
  * object delegates OPTIMIZE to the Delta runtime); this is the
  * from-scratch equivalent for [[graft.sources.VersionedTableDataObject]].
  */
object ZOrder {

  /** Morton value for `cols` (numeric), `bits` bits per column.
    * Null values land in bucket 0 (sort first, like NULLS FIRST). */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(cols.size * bits <= 62, s"zorder: ${cols.size} cols × $bits bits exceeds a long")
    val nBoundaries = (1 << bits) - 1
    val probs = (1 to nBoundaries).map(_.toDouble / (nBoundaries + 1)).toArray
    // ONE table pass sketches ALL clustered columns (the multi-column
    // approxQuantile overload) — the per-column overload would scan the
    // table cols.size times just for boundary training
    val allQs = df.stat.approxQuantile(cols.toArray, probs, 0.001)
    val buckets = cols.zip(allQs).map { case (c, qs) =>
      // bucket id = number of boundaries strictly below the value (0..2^bits-1);
      // one codegen'd pass over a literal array — no join, no shuffle
      val boundaries = array(qs.toIndexedSeq.map(lit): _*)
      aggregate(boundaries, lit(0),
        (acc, b) => acc + when(col(c).cast("double") > b, 1).otherwise(0))
    }
    val n = cols.size
    val terms = for {
      (bk, i) <- buckets.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(bk.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** `df` rewritten into `targetFileCount` z-clustered partitions: one
    * range shuffle on the Morton value, sorted within partitions so
    * row-group stats tighten too. */
  def cluster(df: DataFrame, cols: Seq[String], targetFileCount: Int, bits: Int = 8): DataFrame =
    df.withColumn("_graft_zv", zValue(df, cols, bits))
      .repartitionByRange(math.max(targetFileCount, 1), col("_graft_zv"))
      .sortWithinPartitions("_graft_zv")
      .drop("_graft_zv")
}
