package graft

import graft.functions.{Quantization, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantizationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def syntheticVecs(n: Int, dim: Int, seed: Long = 7L): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0L until n).map(i => i -> Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  test("LocalKMeans is deterministic and covers k centroids") {
    val pts = syntheticVecs(200, 8).map(_._2).toArray
    val a = Quantization.LocalKMeans.fit(pts, 16, 10, 42L)
    val b = Quantization.LocalKMeans.fit(pts, 16, 10, 42L)
    assert(a.length == 16)
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) })
  }

  test("encode/decode: decoded vector is the concat of nearest subspace centroids") {
    val data = syntheticVecs(300, 16).toDF("id", "emb")
    val cb = Quantization.trainPq(data, "emb", m = 4, kpq = 8, iters = 8)
    val row = data
      .withColumn("norm", Quantization.l2Normalize(col("emb")))
      .withColumn("code", cb.encodeCol(col("norm")))
      .withColumn("recon", cb.decodeCol(col("code")))
      .select("norm", "code", "recon").head()
    val norm = row.getSeq[Float](0).toArray
    val code = row.getAs[Array[Byte]](1)
    val recon = row.getSeq[Float](2).toArray
    assert(code.length == 4 && recon.length == 16)
    // each subspace decodes to its own nearest centroid
    for (s <- 0 until 4) {
      val sub = norm.slice(s * 4, s * 4 + 4)
      val nearest = cb.centroids(s).minBy(c =>
        c.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(recon.slice(s * 4, s * 4 + 4).sameElements(cb.centroids(s)(code(s) & 0xFF)))
      assert(cb.centroids(s)(code(s) & 0xFF).sameElements(nearest))
    }
  }

  test("ADC score equals dot(query, decoded code) up to float order") {
    val data = syntheticVecs(100, 16).toDF("id", "emb")
    val cb = Quantization.trainPq(data, "emb", m = 4, kpq = 8, iters = 8)
    val q = Quantization.normalizeLocal(syntheticVecs(1, 16, seed = 99L).head._2)
    val rows = data
      .withColumn("code", cb.encodeCol(Quantization.l2Normalize(col("emb"))))
      .withColumn("adc", cb.adcCol(col("code"), q))
      .withColumn("dotDecoded", Similarity.dotProduct(
        array(q.map(v => lit(v)).toIndexedSeq: _*), cb.decodeCol(col("code"))))
      .select("adc", "dotDecoded").collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-5,
        s"adc=${r.getDouble(0)} dot=${r.getDouble(1)}")
    }
  }

  test("IVF-PQ single-query topK: the query's own row ranks first") {
    val data = syntheticVecs(500, 32).toDF("id", "emb")
    val index = Quantization.buildIvfPq(data, "id", "emb", nlist = 8, m = 4, kpq = 16)
    val probe = syntheticVecs(500, 32).find(_._1 == 123L).get._2
    val top = index.topK(probe, k = 3, nprobe = 2).collect()
    assert(top.head.getLong(0) == 123L, s"expected self-match first, got ${top.toSeq}")
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
    index.data.unpersist()
  }

  test("IVF-PQ batch join: every query's own row ranks first") {
    val data = syntheticVecs(400, 32).toDF("id", "emb")
    val index = Quantization.buildIvfPq(data, "id", "emb", nlist = 8, m = 4, kpq = 16)
    val queries = data.where(col("id") % 50 === 0)
    val got = Quantization.ivfPqTopKJoin(index, queries, "id", "emb", k = 1, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.length == 8)
    assert(got.forall { case (qid, id, rank) => qid == id && rank == 1 }, got.toSeq.toString)
    index.data.unpersist()
  }

  test("IVF-PQ planted recall@1 vs brute force: the nprobe trade (sf0.001 embeddings)") {
    // real data, perturbed planted queries (the q104 fixture at the
    // smallest SF) — recall measured against exact brute-force top-1 at
    // nprobe = 1, 2, 4; numbers recorded in SCALE.md
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 2000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, (x * lit(1.02)).cast("float")).otherwise(x)).as("embedding"))
    val exact = Similarity.topKForQueries(emb, queries, "vec_id", "vec_id", "embedding", k = 1)
      .select(col("qid"), col("id").as("exact_id"))
    val index = Quantization.buildIvfPq(emb, "vec_id", "embedding", nlist = 16, m = 8, kpq = 16)
    val recalls = Seq(1, 2, 4).map { np =>
      val approx = Quantization.ivfPqTopKJoin(index, queries, "vec_id", "embedding",
        k = 1, nprobe = np, refine = 32)
      val joined = approx.join(exact, Seq("qid"))
      val n = joined.count()
      val hits = joined.where(col("id") === col("exact_id")).count()
      np -> hits.toDouble / n
    }
    index.data.unpersist()
    info(s"recall@1 by nprobe: ${recalls.map { case (np, r) => f"nprobe=$np: $r%.3f" }.mkString(", ")}")
    // recall must not decrease with more probes, and the q104 operating
    // point (nprobe=2) must be perfect on planted neighbors
    assert(recalls.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a })
    assert(recalls.toMap.apply(2) == 1.0, s"recall at nprobe=2 was ${recalls.toMap.apply(2)}")
  }
}
