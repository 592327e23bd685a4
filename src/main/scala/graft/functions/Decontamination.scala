package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag corpus documents
  * that share word n-grams with an evaluation/benchmark set (the standard
  * "n-gram overlap" protocol from the GPT-3/PaLM appendices, typically
  * n = 8..13 for full-size documents).
  *
  * Scale design (100 TB corpus vs ~MB-scale benchmark): the benchmark's
  * distinct n-gram set is tiny — Spark broadcasts it (AQE picks a broadcast
  * hash join), so the corpus side stays map-only + partial-agg: ONE shuffle
  * for the final per-doc count, nothing quadratic, no corpus self-join.
  * N-grams travel as 64-bit hashes, never strings.
  */
object Decontamination {

  /** distinct word n-gram hashes of a document (normalized text) */
  def wordNgramHashes(text: Column, n: Int): Column = Dedup.wordShingleHashes(text, n)

  /** Per-document contamination report: how many of the doc's distinct word
    * n-grams appear anywhere in the benchmark. Returns
    * (idCol, n_contaminated_ngrams) for docs with at least `minOverlap`
    * overlapping n-grams.
    */
  def contaminationReport(corpus: DataFrame, idCol: String, textCol: String,
                          benchmark: DataFrame, benchTextCol: String,
                          n: Int = 5, minOverlap: Int = 1): DataFrame = {
    // normalization + n-gram hashing is CPU-bound regex work: spread small
    // single-file inputs across the session's parallelism first
    val benchNgrams = Dedup.ensureParallelism(benchmark, benchTextCol)
      .select(explode(wordNgramHashes(col(benchTextCol), n)).as("_ng")).distinct()
    val corpusNgrams = Dedup.ensureParallelism(corpus, idCol)
      .select(col(idCol), explode(wordNgramHashes(col(textCol), n)).as("_ng"))
    // n-grams are distinct per doc (wordShingleHashes dedupes), so a plain
    // count after the semi-ish join is the distinct overlap count
    corpusNgrams.join(broadcast(benchNgrams), "_ng")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated_ngrams"))
      .where(col("n_contaminated_ngrams") >= minOverlap)
  }

  /** Split-integrity guard: for every held-out (non-train) document, count
    * its distinct word n-grams that also occur in ANY train document — the
    * check that a frozen train/val/test split didn't leak eval text into
    * training (near-duplicates straddling the split boundary defeat the
    * purpose of the held-out set).
    *
    * Scale shape is the transpose of [[contaminationReport]]: the held-out
    * side is the smaller one (a few % of the corpus), but its exploded
    * (id, ngram) pairs are one hash PER TOKEN POSITION — far past the
    * broadcast limit at the corpus scales this guard targets — so the join
    * is left to AQE: genuinely small held-out sets still broadcast, larger
    * ones take the correct shuffle join. Per-(doc, gram) dedup + the final
    * per-doc count shuffle only overlap hits (output-sized). Returns one
    * row per held-out doc: (idCol, splitCol, n_leaked_ngrams, leaked).
    */
  def splitContamination(df: DataFrame, idCol: String, textCol: String,
                         splitCol: String, n: Int = 8): DataFrame = {
    val train = df.where(col(splitCol) === "train")
    // NULL-SAFE: a row with a NULL split label is NOT train — plain =!=
    // evaluates to NULL there and silently drops the row from the guard
    // entirely (an unlabeled doc would escape the leak check on both
    // sides; auditing it as held-out is the conservative reading)
    val heldOut = df.where(!(col(splitCol) <=> "train"))
    val heldNgrams = Dedup.ensureParallelism(heldOut, idCol)
      .select(col(idCol), explode(wordNgramHashes(col(textCol), n)).as("_ng"))
    val trainNgrams = Dedup.ensureParallelism(train, idCol)
      .select(explode(wordNgramHashes(col(textCol), n)).as("_ng"))
    // no forced broadcast: heldNgrams is one hash PER TOKEN POSITION of
    // the held-out set — at the corpus scales this guard targets that is
    // far past the broadcast limit; AQE still broadcasts genuinely small
    // held-out sets, and a shuffle join is the correct scale path
    val leaks = trainNgrams.join(heldNgrams, "_ng")
      // a gram hit by many train docs counts once per held-out doc
      .select(col(idCol), col("_ng")).distinct()
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_leaked_ngrams"))
    heldOut.select(col(idCol), col(splitCol))
      .join(leaks, Seq(idCol), "left")
      .select(col(idCol), col(splitCol),
        coalesce(col("n_leaked_ngrams"), lit(0L)).as("n_leaked_ngrams"))
      .withColumn("leaked", col("n_leaked_ngrams") > 0)
  }
}
