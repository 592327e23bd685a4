package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication over an embedding column (Abbas et
  * al. 2023, "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication", arXiv:2303.09540). Beyond-reference
  * LLM-pipeline operator: the reference engine has no vector operators.
  *
  * The paper's algorithm, expressed relationally:
  *  1. k-means cluster the corpus embeddings ([[Similarity.buildIvfIndex]]
  *     — sample-bounded driver training, distributed assignment);
  *  2. candidate pairs are generated ONLY within a cluster — an
  *     equi-self-join on the cell id, never a corpus×corpus product.
  *     Pair work is Σ|cluster|², tuned by `k` (the paper restricts its
  *     pairwise similarity matrix to within-cluster for the same reason);
  *  3. the paper's triangular rule: order each cluster by distance to the
  *     centroid descending (farthest first); a row is dropped iff some
  *     EARLIER row — one with LOWER cosine similarity to the centroid —
  *     matches it above `threshold`. Per duplicate group the row farthest
  *     from the centroid (the "outlier") survives, the paper's preferred
  *     keep policy. Deterministic id tie-break: exact copies always drop
  *     the larger id — the structural guarantee the planted-duplicate
  *     oracle relies on.
  *
  * At 100 TB: centroid training is O(sample) on the driver (the FAISS
  * norm), assignment is one map, pair generation is one shuffle on the
  * cell id. For corpora whose clusters are still too large to self-join,
  * [[Dedup]]'s hyperplane-LSH embedding near-dup is the cheaper
  * (bucketed, lower-recall) alternative.
  */
object SemDeDup {

  /** One row per DROPPED id. Runs the clustering eagerly (k-means
    * training + one materializing pass) like the other index builders;
    * the returned frame is small (dropped ids only) and already
    * materialized, so callers can reuse it freely. */
  def droppedIds(df: DataFrame, idCol: String, embCol: String,
                 k: Int, threshold: Double, seed: Long = 42L): DataFrame = {
    val ivf = Similarity.buildIvfIndex(df, idCol, embCol, k, seed = seed)
    // centroid matrix rides as one literal array-of-arrays (k ≤ a few
    // hundred coarse cells — a few KB of plan, the IVF probe pattern)
    val centLit = array(ivf.centroids.map(c =>
      array(c.map(v => lit(v.toFloat)).toIndexedSeq: _*)).toIndexedSeq: _*)
    val withSim = ivf.assigned
      .withColumn("_csim", Similarity.cosineSimilarity(col(embCol),
        element_at(centLit, col("_ivf_cell") + 1)))
      .select(col(idCol).as("_sd_id"), col(embCol).as("_sd_emb"),
        col("_ivf_cell").as("_sd_cell"), col("_csim"))
    // drop a iff ∃ same-cluster b FARTHER from the centroid (tie →
    // smaller id) with cos(a, b) ≥ threshold — the paper's
    // farthest-first triangular rule (keep the outlier, §SemDeDup
    // "lowest cosine similarity to the cluster centroid")
    val fartherB = col("b._csim") < col("a._csim") ||
      (col("b._csim") === col("a._csim") && col("b._sd_id") < col("a._sd_id"))
    val dropped = withSim.alias("a").join(withSim.alias("b"),
        col("a._sd_cell") === col("b._sd_cell") && fartherB &&
          Similarity.cosineSimilarity(col("a._sd_emb"), col("b._sd_emb")) >= threshold,
        "left_semi")
      .select(col("_sd_id").as(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    dropped.count() // materialize before releasing the assignment cache
    ivf.assigned.unpersist()
    dropped
  }

  /** The deduplicated corpus: `df` minus the dropped rows. */
  def semDeDup(df: DataFrame, idCol: String, embCol: String,
               k: Int, threshold: Double, seed: Long = 42L): DataFrame = {
    val dropped = droppedIds(df, idCol, embCol, k, threshold, seed)
      .withColumnRenamed(idCol, "_sd_dropped")
    // no forced broadcast: the dropped set can be a large fraction of the
    // corpus at aggressive thresholds — let AQE pick the join strategy
    df.join(dropped, col(idCol) === col("_sd_dropped"), "left_anti")
  }
}
