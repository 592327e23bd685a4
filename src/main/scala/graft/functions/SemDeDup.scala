package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    * materialized, so callers can reuse it freely.
    *
    * @param maxClusterSize skew guard (the same design as the LSH
    *        operators' `maxBucketSize`): the within-cell self-join is
    *        Σ|cell|², so a hot cell — a skewed embedding space collapsing
    *        into one k-means cell — degenerates toward all-pairs. Cells
    *        over the cap are EXCLUDED from the pairwise join (a lazy
    *        broadcast anti-join that prunes nothing when no cell is
    *        capped) and handled by an EXACT-COPY pass instead: a linear
    *        window over identical embeddings, dropping all but the
    *        smallest id. Exact duplicates therefore keep recall 1.0
    *        through the cap (the structural guarantee the q108 oracle
    *        relies on); near-but-not-exact pairs inside a capped cell
    *        stay undetected — that bounded-work trade is the cap's
    *        purpose, same as the LSH bucket caps.
    * @param failOnCappedCells true = eagerly count over-cap cells and
    *        REQUIRE none (pipelines that need exhaustive within-cell
    *        recall); default false = lazy guard, no extra job. */
  def droppedIds(df: DataFrame, idCol: String, embCol: String,
                 k: Int, threshold: Double, seed: Long = 42L,
                 maxClusterSize: Int = 10000,
                 failOnCappedCells: Boolean = false): DataFrame = {
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
    // per-cell counts collected to the DRIVER: cardinality is bounded by
    // k (a few hundred coarse cells), so this is O(k) rows off the cached
    // assignment — one tiny job that lets the common no-hot-cell case keep
    // the EXACT uncapped plan, zero extra stages (unlike the LSH buckets,
    // whose unbounded id space forces the lazy anti-join pattern there)
    val cappedCells = withSim.groupBy("_sd_cell").agg(count(lit(1)).as("_n"))
      .where(col("_n") > maxClusterSize).select("_sd_cell")
      .collect().map(_.getInt(0)).toSeq
    require(!failOnCappedCells || cappedCells.isEmpty,
      s"SemDeDup: ${cappedCells.size} cell(s) exceeded maxClusterSize=$maxClusterSize — " +
        "within-cell recall not exhaustive; raise k or maxClusterSize")
    val joinable = if (cappedCells.isEmpty) withSim
      else withSim.where(!col("_sd_cell").isin(cappedCells: _*))
    // drop a iff ∃ same-cluster b FARTHER from the centroid (tie →
    // smaller id) with cos(a, b) ≥ threshold — the paper's
    // farthest-first triangular rule (keep the outlier, §SemDeDup
    // "lowest cosine similarity to the cluster centroid")
    val fartherB = col("b._csim") < col("a._csim") ||
      (col("b._csim") === col("a._csim") && col("b._sd_id") < col("a._sd_id"))
    val pairDropped = joinable.alias("a").join(joinable.alias("b"),
        col("a._sd_cell") === col("b._sd_cell") && fartherB &&
          Similarity.cosineSimilarity(col("a._sd_emb"), col("b._sd_emb")) >= threshold,
        "left_semi")
      .select(col("_sd_id").as(idCol))
    // capped cells: linear exact-copy pass — identical embeddings share
    // _csim, so the paper's tie-break reduces to "smallest id survives"
    val dropped0 = if (cappedCells.isEmpty) pairDropped else {
      val exactDropped = withSim.where(col("_sd_cell").isin(cappedCells: _*))
        .withColumn("_rk", row_number().over(
          Window.partitionBy(col("_sd_cell"), col("_sd_emb")).orderBy(col("_sd_id"))))
        .where(col("_rk") > 1)
        .select(col("_sd_id").as(idCol))
      // disjoint by construction (capped vs non-capped cells)
      pairDropped.union(exactDropped)
    }
    val dropped = dropped0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    dropped.count() // materialize before releasing the assignment cache
    ivf.assigned.unpersist()
    dropped
  }

  /** The deduplicated corpus: `df` minus the dropped rows.
    *
    * @param precomputedDropped reuse a [[droppedIds]] result the caller
    *        already holds (same df/params) instead of re-running the
    *        k-means training + within-cell pair join a second time — the
    *        clustering is the expensive half, and `droppedIds` output is
    *        already persisted+materialized, so a caller that needs BOTH
    *        frames (audit the drops, then materialize the survivors)
    *        should pay for it once. */
  def semDeDup(df: DataFrame, idCol: String, embCol: String,
               k: Int, threshold: Double, seed: Long = 42L,
               maxClusterSize: Int = 10000,
               failOnCappedCells: Boolean = false,
               precomputedDropped: Option[DataFrame] = None): DataFrame = {
    val dropped = precomputedDropped
      .getOrElse(droppedIds(df, idCol, embCol, k, threshold, seed, maxClusterSize, failOnCappedCells))
      .withColumnRenamed(idCol, "_sd_dropped")
    // no forced broadcast: the dropped set can be a large fraction of the
    // corpus at aggressive thresholds — let AQE pick the join strategy
    df.join(dropped, col(idCol) === col("_sd_dropped"), "left_anti")
  }
}
