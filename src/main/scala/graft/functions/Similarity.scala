package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — one scan, no shuffle except the
  * final top-k (`orderBy.limit` = partial top-k per partition + driver
  * merge, Spark's TakeOrderedAndProject).
  * Scale path: random-hyperplane LSH buckets bound the candidate set; the
  * exact re-rank runs only inside buckets. All arithmetic via zip_with/
  * aggregate (codegen'd, sequential fold → deterministic results).
  */
object Similarity {

  /** dot product in double precision, sequential fold (deterministic) —
    * native one-pass codegen kernel ([[graft.plans.VectorKernels]]),
    * bit-compatible with the HOF formulation kept below for cross-checks */
  def dotProduct(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dotProduct(a, b)

  private[graft] def dotProductHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** cosine similarity — native kernel folding a·b, a·a, b·b in ONE pass
    * (the HOF version ran three interpreted aggregate passes per row) */
  def cosineSimilarity(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.cosineSimilarity(a, b)

  private[graft] def cosineSimilarityHof(a: Column, b: Column): Column = {
    val denom = sqrt(dotProductHof(a, a)) * sqrt(dotProductHof(b, b))
    when(denom > 0, dotProductHof(a, b) / denom).otherwise(lit(0.0))
  }

  def euclideanDistance(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.euclideanDistance(a, b)

  private[graft] def euclideanDistanceHof(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast(DoubleType) - y.cast(DoubleType); d * d
    }), lit(0.0), (acc, v) => acc + v))

  /** deterministic pseudo-random hyperplanes (fixed seed) as literal arrays */
  private[functions] def hyperplanes(dim: Int, numPlanes: Int): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** LSH bucket id: sign bits of the embedding against `numPlanes` fixed
    * hyperplanes, packed into a long. Per-row compute, no shuffle — ONE
    * pass over the embedding for all planes (native kernel; the per-plane
    * dot-expression fold it replaces traversed the array numPlanes times). */
  def hyperplaneSignature(emb: Column, dim: Int, numPlanes: Int = 16): Column =
    graft.plans.VectorExpressions.hyperplaneSignature(emb, hyperplanes(dim, numPlanes))

  private[graft] def hyperplaneSignatureHof(emb: Column, dim: Int, numPlanes: Int = 16): Column = {
    val planes = hyperplanes(dim, numPlanes)
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dotProductHof(emb, planeLit) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** Brute-force top-k most similar rows to one query vector. */
  def bruteForceTopK(df: DataFrame, idCol: String, embCol: String,
                     query: Array[Float], k: Int): DataFrame = {
    val qLit = array(query.map(v => lit(v.toDouble)): _*)
    df.select(col(idCol), cosineSimilarity(col(embCol), qLit).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Top-k neighbors for EVERY query row against a corpus: broadcast the
    * (small) query set, score, window top-k per query. The corpus is
    * scanned once regardless of query count. */
  /** @param excludeSelfMatches drop the corpus row whose id equals the
    *        query id — correct when queries ARE corpus rows (the self-recall
    *        pattern); set false when the two id spaces are unrelated, or an
    *        accidental collision silently removes a real neighbor */
  def topKForQueries(corpus: DataFrame, queries: DataFrame,
                     corpusId: String, queryId: String, embCol: String, k: Int,
                     excludeSelfMatches: Boolean = true): DataFrame = {
    // null-safe: a null id is never a "self match" on EITHER side — plain
    // =!= evaluates to null and drops null-id corpus rows from every query,
    // while !(a <=> b) would drop the null-corpus-id × null-query-id pair
    // (two distinct rows). Exclude only a definite non-null equality.
    val cond = if (excludeSelfMatches)
      !coalesce(col(s"c.$corpusId") === col("qid"), lit(false)) else lit(true)
    val scored = corpus.alias("c").join(
        broadcast(queries.select(col(queryId).as("qid"), col(embCol).as("qemb"))), cond)
      .select(col("qid"), col(s"c.$corpusId").as("id"),
        cosineSimilarity(col(s"c.$embCol"), col("qemb")).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN index: corpus partitioned into `nlist` KMeans
    * cells; a query probes only the `nprobe` nearest cells and re-ranks
    * exactly inside them — the classic 100 TB ANN layout (build once, store
    * the cell assignment as a partition column; queries scan nprobe/nlist
    * of the data). KMeans from Spark ML, trained on a bounded sample.
    */
  case class IvfIndex(assigned: DataFrame, centroids: Array[Array[Double]],
                      idCol: String, embCol: String) {
    /** top-k by cosine among the `nprobe` cells nearest to the query.
      * On a LOADED index (see [[IvfIndex.load]]) `_ivf_cell` is a partition
      * column, so this `isin` becomes a PartitionFilter — the scan touches
      * only nprobe/nlist of the files, which is the whole point at 100 TB. */
    def topK(query: Array[Float], k: Int, nprobe: Int): DataFrame = {
      val qd = query.map(_.toDouble)
      def dist2(c: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < c.length) { val d = c(i) - qd(i); s += d * d; i += 1 }
        s
      }
      val cells = centroids.zipWithIndex.sortBy { case (c, _) => dist2(c) }
        .take(math.max(nprobe, 1)).map(_._2)
      assigned.where(col("_ivf_cell").isin(cells.toIndexedSeq: _*))
        .select(col(idCol),
          cosineSimilarity(col(embCol), array(qd.map(lit).toIndexedSeq: _*)).as("cosine"))
        .orderBy(col("cosine").desc, col(idCol).asc)
        .limit(k)
    }

    /** Persist the index: row→cell assignment written `partitionBy(_ivf_cell)`
      * (one directory per cell → probes are partition-pruned scans) plus the
      * centroid matrix as a small JSON sidecar. */
    def write(path: String)(implicit spark: org.apache.spark.sql.SparkSession): Unit = {
      assigned.write.mode("overwrite").partitionBy("_ivf_cell").parquet(s"$path/data")
      val json = centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
      val p = new org.apache.hadoop.fs.Path(s"$path/centroids.json")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(p, true)
      try out.write(json.getBytes("UTF-8")) finally out.close()
    }
  }

  object IvfIndex {
    /** Load a persisted index. The returned index's `topK` reads ONLY the
      * probed cells' directories (`_ivf_cell` is a partition column, so the
      * cell filter prunes at planning time — verify with PartitionFilters
      * in the executed plan). */
    def load(spark: org.apache.spark.sql.SparkSession, path: String,
             idCol: String, embCol: String): IvfIndex = {
      val p = new org.apache.hadoop.fs.Path(s"$path/centroids.json")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      val json = try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
      // tiny fixed-shape doc ([[d,d,...],...]) — parse without a json lib
      val centroids = json.trim.stripPrefix("[").stripSuffix("]")
        .split("\\],\\s*\\[").map(row =>
          row.replaceAll("[\\[\\]]", "").split(",").map(_.trim.toDouble))
      IvfIndex(spark.read.parquet(s"$path/data"), centroids, idCol, embCol)
    }
  }

  /** build an IVF index: sample-train KMeans, assign every row to a cell.
    * The assignment is persisted — at scale you'd WRITE it partitioned by
    * `_ivf_cell` so probes are partition-pruned scans. */
  def buildIvfIndex(df: DataFrame, idCol: String, embCol: String,
                    nlist: Int, trainSampleFraction: Double = 1.0,
                    seed: Long = 42L, maxIter: Int = 10): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = df.select(col(idCol), col(embCol),
      array_to_vector(col(embCol).cast("array<double>")).as("_features"))
    val train = if (trainSampleFraction >= 1.0) vecs else vecs.sample(trainSampleFraction, seed)
    // A coarse quantizer doesn't need a converged clustering — probe
    // quality degrades gracefully with centroid error (recall is restored
    // by nprobe), so cap iterations well below KMeans' default 20; each
    // iteration is a full Spark job over the training sample.
    val model = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("_features")
      .setMaxIter(maxIter)
      .fit(train)
    val assigned = model.transform(vecs)
      .withColumnRenamed(model.getPredictionCol, "_ivf_cell")
      .select(col(idCol), col(embCol), col("_ivf_cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    IvfIndex(assigned, model.clusterCenters.map(_.toArray), idCol, embCol)
  }

  /** Batch KNN join via LSH buckets: every query row gets its top-k
    * nearest corpus rows. The corpus is signed once (per-row codegen'd
    * hyperplane signature, no shuffle); each query expands to its own
    * bucket plus all buckets within `probeBits` bit-flips (multi-probe),
    * and candidates come from a plain equi-join on the bucket id — at
    * 100 TB this is a shuffle of (bucket, id, emb) pairs instead of the
    * |queries| × |corpus| cross product a naive KNN join would need.
    * Each corpus row owns exactly ONE bucket, so a (query, corpus)
    * candidate pair arises from at most one probe — no dedup shuffle.
    * Exact cosine re-rank inside candidates, window top-k per query.
    *
    * Structural guarantee used by the q31 oracle: a query vector that IS
    * a corpus row signs into its own bucket (probe 0), so the exact match
    * is always a candidate and ranks first (cosine is maximal at the
    * identical vector). */
  def lshTopKJoin(corpus: DataFrame, queries: DataFrame,
                  corpusId: String, queryId: String, embCol: String,
                  k: Int, dim: Int, numPlanes: Int = 12, probeBits: Int = 1): DataFrame = {
    require(probeBits <= 2, "probe expansion is numPlanes^probeBits — cap at 2")
    val sig = hyperplaneSignature(col(embCol), dim, numPlanes)
    val signedCorpus = corpus.select(col(corpusId).as("id"), col(embCol).as("emb"), sig.as("_sig"))
    // Probe set as XOR masks (mask 0 = own bucket) applied in ONE transform
    // lambda: building a separate column per flip made the optimizer inline
    // the (numPlanes × dim)-literal signature tree into every probe — a
    // 13-fold plan blow-up for 1-bit probing; with the mask array the
    // signature subtree appears once.
    val masks: Seq[Long] = Seq(0L) ++
      (if (probeBits >= 1) (0 until numPlanes).map(1L << _) else Seq.empty[Long]) ++
      (if (probeBits >= 2)
        for (i <- 0 until numPlanes; j <- (i + 1) until numPlanes)
          yield (1L << i) | (1L << j)
      else Seq.empty[Long])
    val probed = queries
      .select(col(queryId).as("qid"), col(embCol).as("qemb"),
        hyperplaneSignature(col(embCol), dim, numPlanes).as("_qsig"))
      .withColumn("_probe",
        explode(transform(array(masks.map(lit): _*), m => col("_qsig").bitwiseXOR(m))))
    // tie-break prefers the query's own row: duplicate corpus vectors tie
    // at cosine 1.0 (and a zero vector ties everything at 0), so (cosine,
    // id) alone could rank a smaller-id twin above the query itself —
    // the self-match guarantee must be structural, not data-dependent
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("cosine").desc, (col("id") === col("qid")).desc, col("id").asc)
    probed.join(signedCorpus, col("_probe") === col("_sig"))
      .select(col("qid"), col("id"), cosineSimilarity(col("emb"), col("qemb")).as("cosine"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("id"), col("rank"))
  }

  /** Batch KNN join through an IVF index: each query probes its `nprobe`
    * nearest cells (centroid ranking is a per-row expression over the
    * broadcast centroid literals — no driver loop), candidates come from
    * an equi-join on the cell id, exact re-rank + window top-k. On a
    * loaded index the cell id is a partition column, so the corpus side
    * reads only probed cells' files.
    *
    * Structural guarantee used by the q34 oracle: a query that IS a
    * corpus row ranks its own cell first (it was assigned to its nearest
    * centroid), so with nprobe >= 1 the exact match is always probed. */
  def ivfTopKJoin(index: IvfIndex, queries: DataFrame, queryId: String,
                  embCol: String, k: Int, nprobe: Int): DataFrame = {
    val cents = index.centroids
    // dist² to each centroid as literal-array expressions; rank cells,
    // keep the nprobe nearest as an exploded probe column
    val dists = cents.zipWithIndex.map { case (c, i) =>
      // euclidean (native kernel) orders identically to the former dist²
      // HOF — sqrt is monotone, and only the RANKING of cells is used
      val d = graft.plans.VectorExpressions.euclideanDistance(
        col(embCol), array(c.map(lit).toIndexedSeq: _*))
      struct(d.as("d"), lit(i).as("cell"))
    }
    val probes = slice(array_sort(array(dists.toIndexedSeq: _*)), 1, math.max(nprobe, 1))
    val probed = queries
      .select(col(queryId).as("qid"), col(embCol).as("qemb"), probes.as("_probes"))
      .withColumn("_cell", explode(col("_probes")("cell")))
    // same structural tie-break as lshTopKJoin: self-match wins cosine ties
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("cosine").desc, (col("id") === col("qid")).desc, col("id").asc)
    probed.join(index.assigned, col("_cell") === col("_ivf_cell"))
      .select(col("qid"), col(index.idCol).as("id"),
        cosineSimilarity(col(index.embCol), col("qemb")).as("cosine"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("id"), col("rank"))
  }

  /** LSH-bucketed ANN top-k for one query: score only rows in the query's
    * hyperplane bucket (or within `probeHamming` bits of it) — the 100 TB
    * path where brute force is off the table.
    * Recall/latency tradeoff via numPlanes + probeHamming. */
  def lshTopK(df: DataFrame, idCol: String, embCol: String,
              query: Array[Float], k: Int, dim: Int,
              numPlanes: Int = 12, probeHamming: Int = 2): DataFrame = {
    val planes = hyperplanes(dim, numPlanes)
    val qSig = planes.zipWithIndex.map { case (p, i) =>
      val dot = p.zip(query).map { case (w, v) => w * v }.sum
      if (dot > 0) 1L << i else 0L
    }.reduce(_ | _)
    val sig = hyperplaneSignature(col(embCol), dim, numPlanes)
    df.select(col(idCol), col(embCol), sig.as("_sig"))
      .where(bit_count(col("_sig").bitwiseXOR(lit(qSig))) <= probeHamming)
      .select(col(idCol),
        cosineSimilarity(col(embCol), array(query.map(v => lit(v.toDouble)): _*)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
