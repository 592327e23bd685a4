package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off 10×-scale measurement of the round-12 text operators (DSIR
  * q120, span removal q123, BM25 q124, NB classifier q126, bigram-LM
  * q128) — the round-6 LSH discipline applied to the new family: their
  * "one corpus shuffle / zero-shuffle scoring" claims were validated only
  * at sf0.1, this harness checks the per-query scaling ratio on the
  * synthetic 50k-doc corpus (10 content-perturbed copies, per-copy
  * character rotation so copies share no meaningful tokens — corpus
  * duplicate/vocabulary structure preserved, size ×10).
  *
  * Also measures the q123 PRODUCTION kernel (rolling-hash window
  * fingerprints) against the portable md5 mode at both scales — the
  * O(T·l) vs O(T) claim, with identical span-set output spec-pinned.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.BenchText10x"
  * Results recorded in SCALE.md round-13.
  */
object BenchText10x {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    // round-6 perturbation: rotate a–z/A–Z/0–9 per copy — copies share no
    // tokens, so vocabulary scales with the corpus like a real crawl
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digit = "0123456789"
    def rot(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
    def corpusAt(copies: Int): DataFrame =
      (0 until copies).map { i =>
        if (i == 0) base
        else base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          translate(col("text"), lower + upper + digit,
            rot(lower, i) + rot(upper, i) + rot(digit, i)).as("text"))
      }.reduce(_ unionByName _)

    def q120(c: DataFrame): DataFrame = {
      val target = c.where(col("doc_id") % 10 === 0)
      val corpus = c.where(col("doc_id") % 10 =!= 0)
      graft.functions.ImportanceResampling.resampleTopK(
        corpus, target, col("doc_id"), col("text"), numBuckets = 256, k = 50)
    }
    def q123(c: DataFrame, portable: Boolean): DataFrame = {
      val planted = c.select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" the quick brown fox jumps over the lazy dog again and again")))
          .otherwise(col("text")).as("text"))
      graft.functions.Dedup.removeRepeatedSpans(planted, "doc_id", "text", l = 8,
        portableFingerprints = portable)
    }
    def q124(c: DataFrame): DataFrame = {
      import spark.implicits._
      val queries = Seq((1, "table merge batch"), (2, "fast hash value"),
        (3, "slow scan row key")).toDF("query_id", "query_text")
      graft.functions.Retrieval.bm25TopK(c, "doc_id", "text",
        queries, "query_id", "query_text", k = 10)
    }
    def q126(c: DataFrame): DataFrame = {
      val t = c.where(col("doc_id") % 3 === 0)
      val b = c.where(col("doc_id") % 3 === 1)
      graft.functions.QualityClassifier.scoreNB(
        c.where(col("doc_id") % 3 === 2), col("text"), t, col("text"), b, col("text"),
        numBuckets = 256)
    }
    def q128(c: DataFrame): DataFrame = {
      val seed = c.where(col("doc_id") % 3 === 0)
      graft.functions.NgramLM.perplexity(
        c.where(col("doc_id") % 3 =!= 0), col("text"), seed, col("text"), numBuckets = 4096)
    }

    val shapes: Seq[(String, DataFrame => DataFrame)] = Seq(
      ("q120_dsir", q120 _),
      ("q123_spans_portable", (c: DataFrame) => q123(c, portable = true)),
      ("q123_spans_kernel", (c: DataFrame) => q123(c, portable = false)),
      ("q124_bm25", q124 _),
      ("q126_nb", q126 _),
      ("q128_lm", q128 _))

    def run(fn: DataFrame => DataFrame, c: DataFrame): Double = {
      val t0 = System.nanoTime()
      // noop sink materializes EVERY column (count() would let Catalyst
      // prune the scoring projections and even eliminate unique-key left
      // joins — the same rule Bench follows)
      fn(c).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }

    for ((label, copies) <- Seq(("sf0.1", 1), ("10x", 10))) {
      val c = corpusAt(copies)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count() // materialize the synthetic corpus outside the timings
      shapes.foreach { case (name, fn) => run(fn, c) } // warmup (untimed)
      shapes.foreach { case (name, fn) =>
        val runs = (1 to 2).map(_ => run(fn, c))
        println(f"""{"scale":"$label","query":"$name","sec":${runs.min}%.3f}""")
      }
      c.unpersist()
    }
    spark.stop()
  }
}
