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
}
