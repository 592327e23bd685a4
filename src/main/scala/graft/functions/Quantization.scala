package graft.functions

import graft.plans.{PqAdcExpr, PqDecodeExpr, PqEncodeExpr}
import org.apache.spark.sql.graftshims.GraftSqlShims
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization + IVF-PQ approximate nearest neighbor.
  *
  * The scale path beyond [[Similarity.buildIvfIndex]]: IVF prunes WHICH
  * rows a probe scans (nprobe/nlist of the partitions); PQ shrinks WHAT
  * the scan reads per row — an m-byte code instead of 4·d bytes of
  * floats (32× at d=64, m=8). Probes score compressed codes
  * (asymmetric-distance lookups, [[graft.plans.PqKernel.adc]]); only the
  * `refine` survivors are re-ranked on exact vectors. This is the
  * standard billion-scale ANN architecture (Jégou et al., TPAMI 2011;
  * the FAISS IVFPQ layout) re-expressed on Spark: the index is a plain
  * partitioned DataFrame, probes are partition-pruned scans, scoring is
  * a codegen'd expression.
  *
  * Codebook training runs on a bounded DRIVER-SIDE sample
  * ([[LocalKMeans]]) — deliberate: PQ training needs ~10⁴–10⁵ points
  * regardless of corpus size (every production system samples), so at
  * 100 TB the train step stays O(sample), while assignment/encode — the
  * O(corpus) part — is fully distributed codegen'd expressions with zero
  * shuffles. Cosine scoring: vectors are L2-normalized before encoding,
  * so inner product against the code reconstruction approximates cosine
  * directly.
  *
  * The reference has no vector search at all (SURVEY §2: documents/
  * embeddings ops are beyond-reference additions).
  */
object Quantization {

  /** Deterministic plain k-means (fixed-seed init, Lloyd iterations) for
    * driver-side codebook training on a bounded sample. Tie-breaks and
    * empty-cluster re-seeding are index-ordered → bit-stable runs. */
  private[graft] object LocalKMeans {
    def fit(points: Array[Array[Float]], k: Int, iters: Int, seed: Long): Array[Array[Float]] = {
      require(points.nonEmpty, "k-means needs at least one training point")
      val dim = points(0).length
      val rnd = new scala.util.Random(seed)
      val n = points.length
      // distinct start points where possible (duplicated centroids would
      // freeze into permanently empty clusters)
      val init = rnd.shuffle(points.indices.toVector).take(math.min(k, n))
      val cents = Array.tabulate(math.min(k, n))(i => points(init(i)).clone())
      val assign = new Array[Int](n)
      var it = 0
      while (it < iters) {
        var p = 0
        while (p < n) {
          val pt = points(p)
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            var d = 0.0; var i = 0
            val ct = cents(c)
            while (i < dim) { val x = pt(i) - ct(i); d += x * x; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          assign(p) = best
          p += 1
        }
        val sums = Array.ofDim[Double](cents.length, dim)
        val counts = new Array[Int](cents.length)
        p = 0
        while (p < n) {
          val a = assign(p); val pt = points(p)
          var i = 0
          while (i < dim) { sums(a)(i) += pt(i); i += 1 }
          counts(a) += 1
          p += 1
        }
        var c = 0
        while (c < cents.length) {
          if (counts(c) > 0) {
            var i = 0
            while (i < dim) { cents(c)(i) = (sums(c)(i) / counts(c)).toFloat; i += 1 }
          } else cents(c) = points(rnd.nextInt(n)).clone() // re-seed empty cluster
          c += 1
        }
        it += 1
      }
      cents
    }
  }

  /** trained PQ codebooks: `m` subspaces × `kpq` centroids × `dsub` dims */
  case class PqCodebooks(m: Int, dsub: Int, centroids: Array[Array[Array[Float]]]) {
    def encodeCol(normalizedEmb: Column): Column =
      GraftSqlShims.column(PqEncodeExpr(GraftSqlShims.expression(normalizedEmb), centroids.toIndexedSeq))
    def decodeCol(code: Column): Column =
      GraftSqlShims.column(PqDecodeExpr(GraftSqlShims.expression(code), centroids.toIndexedSeq))
    /** per-query ADC lookup table: lut(s)(j) = <q_sub_s, centroid_j> */
    def lutFor(queryNormalized: Array[Float]): Array[Array[Double]] =
      Array.tabulate(m) { s =>
        Array.tabulate(centroids(s).length) { j =>
          var acc = 0.0; var i = 0
          val c = centroids(s)(j)
          while (i < dsub) { acc += queryNormalized(s * dsub + i) * c(i); i += 1 }
          acc
        }
      }
    def adcCol(code: Column, queryNormalized: Array[Float]): Column =
      GraftSqlShims.column(PqAdcExpr(GraftSqlShims.expression(code), lutFor(queryNormalized).toIndexedSeq))
  }

  /** unit-L2 normalization as a column (float elements, zero vectors pass
    * through unchanged) */
  def l2Normalize(emb: Column): Column = {
    val n = sqrt(Similarity.dotProduct(emb, emb))
    when(n > lit(0.0), transform(emb, x => (x / n).cast("float"))).otherwise(emb)
  }

  private[graft] def normalizeLocal(q: Array[Float]): Array[Float] = {
    var n = 0.0; var i = 0
    while (i < q.length) { n += q(i).toDouble * q(i); i += 1 }
    val d = math.sqrt(n)
    if (d == 0) q else q.map(v => (v / d).toFloat)
  }

  /** Train PQ codebooks on a driver-side sample of (normalized) vectors.
    * @param maxTrainRows approximate bound on the sample collected to the
    *        driver (the fraction is sized off the corpus row count — the
    *        optimizer's estimate when available, one count job otherwise;
    *        buildIvfPq calls this on its already-persisted assignment, so
    *        the count there reuses the materialized cache) */
  def trainPq(df: DataFrame, embCol: String, m: Int, kpq: Int = 16,
              maxTrainRows: Int = 20000, iters: Int = 10, seed: Long = 42L): PqCodebooks = {
    // a real SAMPLE, not limit(): limit takes the FIRST rows in partition
    // order — on a corpus written sorted/partitioned by domain that trains
    // every codebook on one domain's distribution and degrades ADC recall
    // corpus-wide. Any over-collection beyond maxTrainRows is trimmed by a
    // DRIVER-side shuffle (uniform), never a partition-ordered limit.
    val n = df.queryExecution.optimizedPlan.stats.rowCount
      .map(_.toLong).getOrElse(df.count())
    val frac = if (n <= maxTrainRows) 1.0 else maxTrainRows.toDouble / n * 1.1
    val collected = df.select(l2Normalize(col(embCol)).as("_e"))
      .sample(withReplacement = false, math.min(1.0, frac), seed)
      .collect()
      .map(_.getSeq[Float](0).toArray)
    val sample =
      if (collected.length <= maxTrainRows) collected
      else new scala.util.Random(seed).shuffle(collected.toVector).take(maxTrainRows).toArray
    require(sample.nonEmpty, "trainPq: empty input")
    val dim = sample(0).length
    require(dim % m == 0, s"embedding dim $dim must be divisible by m=$m")
    val dsub = dim / m
    val cbs = Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      LocalKMeans.fit(sub, kpq, iters, seed + s)
    }
    PqCodebooks(m, dsub, cbs)
  }

  /** IVF cells + PQ codes over the corpus. `data` columns: id, emb,
    * `_ivf_cell`, `_pq_code`. Persisted/partitioned like [[Similarity.IvfIndex]]
    * (write `partitionBy(_ivf_cell)` → probes are partition-pruned). */
  case class IvfPqIndex(data: DataFrame, cellCentroids: Array[Array[Double]],
                        codebooks: PqCodebooks, idCol: String, embCol: String) {

    /** Single-query top-k: driver picks the `nprobe` nearest cells, the
      * probed rows score their CODES via the per-query ADC LUT (m lookups
      * per row), the approx top `refine·k` re-rank on exact cosine. */
    def topK(query: Array[Float], k: Int, nprobe: Int, refine: Int = 32): DataFrame = {
      val qn = normalizeLocal(query)
      val qd = query.map(_.toDouble)
      def dist2(c: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < c.length) { val d = c(i) - qd(i); s += d * d; i += 1 }
        s
      }
      val cells = cellCentroids.zipWithIndex.sortBy { case (c, _) => dist2(c) }
        .take(math.max(nprobe, 1)).map(_._2)
      data.where(col("_ivf_cell").isin(cells.toIndexedSeq: _*))
        .withColumn("_approx", codebooks.adcCol(col("_pq_code"), qn))
        .orderBy(col("_approx").desc, col(idCol).asc)
        .limit(math.max(refine * k, k))
        .select(col(idCol),
          Similarity.cosineSimilarity(col(embCol), array(qd.map(lit).toIndexedSeq: _*)).as("cosine"))
        .orderBy(col("cosine").desc, col(idCol).asc)
        .limit(k)
    }
  }

  /** Build IVF-PQ: coarse cells from [[Similarity.buildIvfIndex]]
    * (distributed KMeans assignment), PQ codebooks from a bounded driver
    * sample, codes via the codegen'd encode expression — the per-row
    * O(corpus) work is all expressions, no extra shuffle beyond the IVF
    * assignment itself. */
  def buildIvfPq(df: DataFrame, idCol: String, embCol: String,
                 nlist: Int, m: Int, kpq: Int = 16,
                 maxTrainRows: Int = 20000, seed: Long = 42L): IvfPqIndex = {
    val ivf = Similarity.buildIvfIndex(df, idCol, embCol, nlist, seed = seed)
    val cb = trainPq(ivf.assigned, embCol, m, kpq, maxTrainRows, seed = seed)
    val encoded = ivf.assigned
      .withColumn("_pq_code", cb.encodeCol(l2Normalize(col(embCol))))
    IvfPqIndex(encoded, ivf.centroids, cb, idCol, embCol)
  }

  /** Batch top-k: every query row gets its `k` nearest corpus rows.
    * Same probe shape as [[Similarity.ivfTopKJoin]] (cells ranked by a
    * per-row literal-centroid expression, explode nprobe probes, equi-join
    * on the cell id — a shuffle of probed pairs, never a cross product).
    * Candidates score approximately as `<normalized query, decoded code>`
    * (decode is per CORPUS row via codegen — the batch analogue of the
    * LUT), a window keeps the approx top `refine·k` per query, and only
    * those re-rank on exact cosine. */
  def ivfPqTopKJoin(index: IvfPqIndex, queries: DataFrame, queryId: String,
                    embCol: String, k: Int, nprobe: Int, refine: Int = 32): DataFrame = {
    val cents = index.cellCentroids
    val dists = cents.zipWithIndex.map { case (c, i) =>
      val d = graft.plans.VectorExpressions.euclideanDistance(
        col(embCol), array(c.map(lit).toIndexedSeq: _*))
      struct(d.as("d"), lit(i).as("cell"))
    }
    val probes = slice(array_sort(array(dists.toIndexedSeq: _*)), 1, math.max(nprobe, 1))
    val probed = queries
      .select(col(queryId).as("qid"), col(embCol).as("qemb"),
        l2Normalize(col(embCol)).as("_qn"), probes.as("_probes"))
      .withColumn("_cell", explode(col("_probes")("cell")))
      .drop("_probes")
    val approxW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("_approx").desc, col("id").asc)
    val exactW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("cosine").desc, (col("id") === col("qid")).desc, col("id").asc)
    probed.join(index.data, col("_cell") === col("_ivf_cell"))
      .select(col("qid"), col("qemb"), col(index.idCol).as("id"),
        col(index.embCol).as("_cemb"),
        Similarity.dotProduct(col("_qn"),
          index.codebooks.decodeCol(col("_pq_code"))).as("_approx"))
      .withColumn("_arank", row_number().over(approxW))
      // id == qid is exempt from the approx cut: a query that IS a corpus
      // row must never lose its self-match to PQ quantization error (makes
      // the q102-style self-match guarantee STRUCTURAL, not statistical —
      // the exact re-rank window already tie-breaks it to rank 1)
      .where(col("_arank") <= math.max(refine * k, k) || col("id") === col("qid"))
      .select(col("qid"), col("id"),
        Similarity.cosineSimilarity(col("_cemb"), col("qemb")).as("cosine"))
      .withColumn("rank", row_number().over(exactW)).where(col("rank") <= k)
      .select(col("qid"), col("id"), col("rank"))
  }
}
