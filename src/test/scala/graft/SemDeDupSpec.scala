package graft

import graft.functions.SemDeDup
import org.scalatest.funsuite.AnyFunSuite

class SemDeDupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def vec(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  test("exact copies: the larger id of each identical pair is dropped, nothing else") {
    // 8 well-separated directions (20° apart — cos 20° ≈ 0.94 < 0.99) and
    // exact copies of three of them at id+100
    val base = (0 until 8).map(i => (i.toLong, vec(i * 20.0)))
    val copies = Seq(0, 3, 5).map(i => (i + 100L, vec(i * 20.0)))
    val df = (base ++ copies).toDF("id", "emb")
    val dropped = SemDeDup.droppedIds(df, "id", "emb", k = 2, threshold = 0.99)
      .as[Long].collect().toSet
    assert(dropped == Set(100L, 103L, 105L))
    val kept = SemDeDup.semDeDup(df, "id", "emb", k = 2, threshold = 0.99)
      .select($"id").as[Long].collect().toSet
    assert(kept == (0L until 8L).toSet)
    // the precomputed-dropped path (skips the second clustering) must
    // produce the identical survivor set
    val keptReused = SemDeDup.semDeDup(df, "id", "emb", k = 2, threshold = 0.99,
        precomputedDropped = Some(SemDeDup.droppedIds(df, "id", "emb", k = 2, threshold = 0.99)))
      .select($"id").as[Long].collect().toSet
    assert(keptReused == kept)
  }

  test("keep policy: the member nearer the centroid is dropped (outlier survives)") {
    // cluster A: near-dup pair at 0° and 5° plus an anchor at 20° pulling
    // the centroid to ~8.3° — the 5° member sits nearer the centroid, so
    // IT is dropped even though its id is smaller. Cluster B: a symmetric
    // 120°/125° pair — equal centroid similarity, id tie-break drops the
    // larger id.
    val df = Seq((1L, vec(5.0)), (2L, vec(0.0)), (3L, vec(20.0)),
      (4L, vec(120.0)), (5L, vec(125.0))).toDF("id", "emb")
    val dropped = SemDeDup.droppedIds(df, "id", "emb", k = 2, threshold = 0.99)
      .as[Long].collect().toSet
    assert(dropped == Set(1L, 5L))
  }

  test("cluster-size cap: a degenerate hot cell skips the pair join, keeps exact-copy recall") {
    // degenerate corpus: 60 near-identical embeddings (within 0.5°, all
    // ≥ 0.99-similar to each other) collapse into one hot k-means cell —
    // uncapped, the self-join would generate ~60² candidate pairs. With
    // maxClusterSize = 10 the cell is EXCLUDED from the pair join:
    //  - exact copies are still dropped (linear exact-copy pass → recall
    //    1.0 for planted duplicates through the cap),
    //  - near-but-NOT-exact rows survive (proof the quadratic join never
    //    ran on the capped cell — the documented recall trade).
    val nearIdentical = (0 until 60).map(i => (i.toLong, vec(i * 0.008)))   // all distinct, all ≥ τ
    val exactCopies = Seq(0, 7).map(i => (i + 1000L, vec(i * 0.008)))       // planted exact dups
    val other = Seq((2000L, vec(120.0)), (2001L, vec(140.0)))               // second cell, small
    val df = (nearIdentical ++ exactCopies ++ other).toDF("id", "emb")
    val dropped = SemDeDup.droppedIds(df, "id", "emb", k = 2, threshold = 0.99,
      maxClusterSize = 10).as[Long].collect().toSet
    assert(dropped == Set(1000L, 1007L), s"capped cell: expected only exact copies dropped, got $dropped")
    // failOnCappedCells surfaces the capped cell loudly instead
    val e = intercept[IllegalArgumentException](SemDeDup.droppedIds(df, "id", "emb",
      k = 2, threshold = 0.99, maxClusterSize = 10, failOnCappedCells = true))
    assert(e.getMessage.contains("maxClusterSize"))
    // small clusters under the cap behave exactly as before
    val unchanged = SemDeDup.droppedIds(df, "id", "emb", k = 2, threshold = 0.99,
      maxClusterSize = 100).as[Long].collect().toSet
    assert(unchanged.contains(1000L) && unchanged.contains(1007L) && unchanged.size > 10)
  }

  test("chain semantics match the paper's triangular rule, not connected components") {
    // a(0°), b(5°), c(11°): sim(a,b) and sim(b,c) ≥ τ, sim(a,c) < τ.
    // Farthest-first order is (c, a, b): c kept, a kept (its only
    // farther row c is below τ), b dropped (c is farther and ≥ τ) — a
    // connected-component dedup would instead collapse all three to one.
    // 120°/140° give the second k-means cell; 20° apart → no pair there.
    val df = Seq((10L, vec(0.0)), (20L, vec(5.0)), (30L, vec(11.0)),
      (40L, vec(120.0)), (50L, vec(140.0))).toDF("id", "emb")
    val dropped = SemDeDup.droppedIds(df, "id", "emb", k = 2, threshold = 0.99)
      .as[Long].collect().toSet
    assert(dropped == Set(20L))
  }
}
