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

  /** Fixed-length token CHUNKING with overlap — the per-document half of
    * pretraining data prep (split long documents into `maxLen`-token
    * windows, consecutive windows sharing `overlap` tokens so no span of
    * context is lost at a boundary; BERT/long-doc fine-tuning's standard
    * stride recipe). One row per chunk: (…, chunk_idx, chunk_tokens,
    * chunk_text). A pure per-row explode — no shuffle, no state; docs
    * shorter than `maxLen` yield exactly one chunk, empty docs yield none.
    * Chunk starts step by `maxLen − overlap`; a final short window is kept
    * (its tail tokens appear nowhere else). */
  def chunkTokens(df: DataFrame, id: Column, text: Column,
                  maxLen: Int, overlap: Int = 0): DataFrame = {
    require(maxLen > 0, "maxLen must be positive")
    require(overlap >= 0 && overlap < maxLen, s"overlap=$overlap must be in [0, maxLen)")
    val stride = maxLen - overlap
    val toks = graft.functions.TextAnalysis.wsTokens(text)
    // lambda-bind the token array (HOFs have no CSE — the ngramBuckets
    // lesson). Chunk count = max(1, ceil((n − maxLen)/stride) + 1): the
    // last window is the first one whose end reaches the document's end —
    // no fully-redundant trailing window is emitted.
    val chunks = element_at(transform(array(toks), t =>
      when(size(t) > 0,
        transform(sequence(lit(0), greatest(ceil((size(t) - lit(maxLen)).cast(DoubleType)
            / lit(stride.toDouble)).cast(IntegerType), lit(0))),
          i => struct((i * stride).as("start"),
            slice(t, i * stride + 1, lit(maxLen)).as("toks"))))
        .otherwise(array().cast(s"array<struct<start:int,toks:array<string>>>"))), 1)
    df.withColumn("_graft_chunk", explode(chunks))
      .withColumn("chunk_idx", (col("_graft_chunk.start") / stride).cast(IntegerType))
      .withColumn("chunk_tokens", size(col("_graft_chunk.toks")))
      .withColumn("chunk_text", concat_ws(" ", col("_graft_chunk.toks")))
      .drop("_graft_chunk")
  }
}
