package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LM training-batch preparation: documents are
  * concatenated in a deterministic shard-local order and cut into
  * fixed-length token sequences; each doc learns where it lands (which
  * sequence, at what offset).
  *
  * Packing runs PER SHARD (`Window.partitionBy(shard)`): shards are
  * independent token streams, so a 1000-executor cluster packs 1000 shards
  * concurrently — a single global cumulative sum would serialize the whole
  * corpus through one task, which is why real pipelines shard first. Pure
  * window arithmetic: one shuffle (the shard sort), no UDFs.
  *
  * Offsets are exact integer math; the only cross-engine caveat is the
  * `floor(start/seqLen)` pack index, exact while shard-local token offsets
  * stay below 2^53 — petabytes per shard, far beyond any real shard.
  */
object Packing {

  /** Append `start_offset` (exclusive cumulative tokens before this doc in
    * its shard), `pack_id` (which seqLen-sized sequence the doc STARTS in)
    * and `pack_offset` (where inside that sequence). Docs may straddle pack
    * boundaries — standard concat-then-cut LM packing. */
  def packSequences(df: DataFrame, id: Column, shard: Column,
                    tokenCount: Column, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    // full tie-break: duplicate ids within a shard would otherwise get
    // partition-arrival-order offsets — nondeterministic across runs,
    // breaking the frozen-corpus contract. tokenCount alone isn't enough:
    // two rows with equal (id, tokenCount) but different payloads would
    // still swap offsets between runs (the offset SET is stable, the
    // row→offset ASSIGNMENT isn't — the packed bytes differ). The
    // whole-row hash pins the assignment to content; true full duplicates
    // are then genuinely interchangeable.
    val rowHash = xxhash64(struct(df.columns.map(c => col(s"`$c`")).toIndexedSeq: _*))
    val w = Window.partitionBy(shard).orderBy(id, tokenCount, rowHash)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = (sum(tokenCount.cast(LongType)).over(w) - tokenCount.cast(LongType))
    df.withColumn("start_offset", start)
      .withColumn("pack_id",
        floor(col("start_offset").cast(DoubleType) / lit(seqLen.toDouble)).cast(LongType))
      .withColumn("pack_offset", pmod(col("start_offset"), lit(seqLen.toLong)))
  }
}
