package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage breakdown of the q133 composition at 1× and 10× — the
  * BenchMedia10x full-chain measurement read 15.8× at 10× data, and a
  * composition must not hide a super-linear stage. Each stage is timed
  * CUMULATIVELY (chain prefix through a noop sink), so stage cost =
  * consecutive-row delta — the composition's laziness means a stage
  * cannot be timed in isolation without materializing its input anyway.
  *
  * Run: sbt "runMain graft.BenchComposition10x"; SCALE.md round-14. */
object BenchComposition10x {
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
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digit = "0123456789"
    def rot(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
    def docsAt(copies: Int): DataFrame =
      (0 until copies).map { i =>
        if (i == 0) base
        else base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          translate(col("text"), lower + upper + digit,
            rot(lower, i) + rot(upper, i) + rot(digit, i)).as("text"))
      }.reduce(_ unionByName _)

    def stages(docs0: DataFrame): Seq[(String, DataFrame)] = {
      val corpus = docs0.unionByName(docs0.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      // canon persisted: the semi-join pushes into every corpus union
      // branch; an unpersisted canon replicates the whole dedup aggregate
      // (itself union-rooted) per branch — slim id-only rows, spillable
      val canon = graft.functions.Dedup.exactDedup(corpus, "doc_id", "text")
        .select(col("canonical_id").as("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deduped = corpus.join(canon, Seq("doc_id"), "left_semi")
      // persisted multi-consumer stage (the round-14 fix; unpersisted,
      // semi/anti-through-Union pushdown squared the plan — 25k nodes)
      val quality = deduped.where(
        size(graft.functions.TextAnalysis.wsTokens(col("text"))).between(5, 10000))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // q133's shape scales the benchmark WITH the corpus (doc_id % 13
      // over every copy) — outside contaminationReport's bounded-eval-set
      // contract; the fixed variant pins the benchmark to copy 0 (the
      // real-world contract: eval sets don't grow with the crawl)
      def cleanAgainst(bench: DataFrame): DataFrame = {
        val flagged = graft.functions.Decontamination.contaminationReport(
          quality, "doc_id", "text", bench, "text", n = 5, minOverlap = 1)
          .select(col("doc_id"))
        quality.join(flagged, Seq("doc_id"), "left_anti")
          .where(col("doc_id") % 10 =!= 0)
      }
      val clean = cleanAgainst(docs0.where(col("doc_id") % 13 === 1).select(col("text")))
      val cleanFixed = cleanAgainst(base.where(col("doc_id") % 13 === 1).select(col("text")))
      val target = docs0.where(col("doc_id") % 10 === 0)
      val dsir = graft.functions.ImportanceResampling.resampleTopK(
        clean, target, col("doc_id"), col("text"), numBuckets = 256, k = 100)
      Seq(("1_dedup", deduped), ("2_gate", quality), ("3_decontam", clean),
        ("3_decontam_fixedbench", cleanFixed), ("4_dsir", dsir))
    }

    // each timed run REBUILDS its frame (fresh persist registration) the
    // way Bench re-invokes a query lambda — clearCache between runs would
    // otherwise erase an already-built frame's cache registration and
    // re-plan WITHOUT the persist boundary, reintroducing the very plan
    // explosion the persist exists to prevent
    def time(build: () => DataFrame): Double = {
      val df = build()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }

    for ((label, copies) <- Seq(("1x", 1), ("10x", 10))) {
      val docs = docsAt(copies)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
      val names = stages(docs).map(_._1)
      names.zipWithIndex.foreach { case (name, i) =>
        def build(): DataFrame = stages(docs)(i)._2
        time(() => build()) // warmup
        val runs = (1 to 2).map(_ => time(() => build()))
        println(f"""{"scale":"$label","stage":"$name","cumSec":${runs.min}%.3f}""")
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
