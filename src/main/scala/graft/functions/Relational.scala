package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Derived relational operators the reference implements generically on its
  * DataFrame façade (`sdl-core/workflow/dataframe/GenericDataFrame.scala:119-236`).
  * Re-expressed directly on Spark DataFrames; all stay declarative (single
  * Catalyst plan, no driver materialization) so they hold at 100 TB.
  */
object Relational {

  /** Rows where any of the given columns is null. Reference
    * `GenericDataFrame.getNulls:119`. */
  def getNulls(df: DataFrame, cols: Seq[String]): DataFrame =
    df.where(cols.map(col(_).isNull).reduce(_ or _))

  /** Key values occurring more than once with their counts. Reference
    * `GenericDataFrame.getNonuniqueStats:128`. */
  def getNonuniqueStats(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_cnt"))
      .where(col("_cnt") > 1)

  /** All rows participating in a duplicate key. Implemented as a window
    * count instead of the reference's self-join
    * (`GenericDataFrame.getNonuniqueRows:143`) — one shuffle on the key
    * instead of two scans + shuffle join; at scale the input is read once.
    */
  def getNonuniqueRows(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCols.map(col): _*)
    df.withColumn("_cnt", count(lit(1)).over(w))
      .where(col("_cnt") > 1)
      .drop("_cnt")
  }

  /** Primary-key violators = null keys ∪ duplicate keys. Reference
    * `GenericDataFrame.getPKviolators:152`; used by `PKViolatorsDataObject`. */
  def getPKviolators(df: DataFrame, keyCols: Seq[String]): DataFrame =
    getNulls(df, keyCols).unionByName(
      getNonuniqueRows(df, keyCols).where(keyCols.map(col(_).isNotNull).reduce(_ and _)))

  /** Rows in exactly one of the two frames. Reference
    * `GenericDataFrame.symmetricDifference:200`. */
  def symmetricDifference(left: DataFrame, right: DataFrame, diffColName: String = "_in_first"): DataFrame = {
    val l = left.select(left.columns.sorted.map(col).toIndexedSeq: _*)
    val r = right.select(left.columns.sorted.map(col).toIndexedSeq: _*)
    l.except(r).withColumn(diffColName, lit(true))
      .unionByName(r.except(l).withColumn(diffColName, lit(false)))
  }

  /** Set equality of two frames. Reference `GenericDataFrame.isEqual:213`. */
  def isEqual(left: DataFrame, right: DataFrame): Boolean =
    left.schema.fields.map(f => (f.name, f.dataType)).sameElements(
      right.schema.fields.map(f => (f.name, f.dataType))) &&
      symmetricDifference(left, right).isEmpty

  /** Salted equi-join for skewed keys: the big (skewed) side gets a random
    * salt in [0, saltFactor); the small side is replicated `saltFactor`
    * ways (explode of a literal range — `saltFactor`× its size, which is
    * the explicit cost of the technique). The join key becomes
    * (key, salt), so a hot key's rows spread over `saltFactor` reducers
    * instead of hammering one.
    *
    * This is the MANUAL fallback for when AQE's skew-join splitting can't
    * help: AQE only splits sort-merge join partitions after a shuffle
    * materializes, so a skewed broadcast-ineligible join feeding a
    * same-key aggregation (no intermediate shuffle boundary) or a
    * deliberately AQE-off pipeline still needs salting. Result equals the
    * plain inner join (salt columns are dropped).
    *
    * The salt is `rand`-derived (seeded — deterministic per partition
    * layout) because the DISTRIBUTION is what matters, not
    * reproducibility of which reducer got which row: the join RESULT is
    * identical regardless of salt values. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int = 8, seed: Long = 42L): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = big.withColumn("_salt", (rand(seed) * saltFactor).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
