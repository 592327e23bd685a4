package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off 10×-scale measurement of the multimodal dedup family (image
  * dHash q137/q140, audio fingerprint q138/q141, video frame-hash
  * q139/q142) and the composition queries (q133 four-stage curation,
  * q143 curate→mix→pack) — the BenchText10x discipline applied to the
  * round-13/14 media operators.
  *
  * Corpus scaling preserves the DUPLICATE STRUCTURE the way a real crawl
  * scales: the distinct-seed count grows with the corpus (seed = id mod
  * groups·copies), so duplicate GROUP SIZE stays constant while group
  * COUNT scales ×10 — decode is the expected linear dominator; the pair
  * stages must stay near-linear because the per-bucket work is bounded
  * (group size) and bucket count scales with the corpus.
  *
  * The incremental variants measure the store-design claim directly: a
  * FIXED 300-item delta joined against a 1× vs 10× fingerprint store
  * (store built and parquet-persisted OUTSIDE the timing — that is the
  * amortized decode the store exists to avoid). Per-batch cost should be
  * near-flat in store size.
  *
  * Run: sbt "runMain graft.BenchMedia10x"  (SPARK_GRAFT_SF_DIR for the
  * documents table; defaults to /root/testdata/sf0.1)
  * Results recorded in SCALE.md round-14.
  */
object BenchMedia10x {
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
    import graft.operators.Multimodal

    val tmp = java.nio.file.Files.createTempDirectory("media10x").toString

    def ids(n: Int): DataFrame =
      spark.range(n.toLong).select(col("id").as("media_id"))
        .repartition(cpus.toInt)

    // media corpora: seed groups of constant size (~50 img / ~60 aud /
    // ~20 vid members), group count scales with copies
    def images(n: Int, copies: Int): DataFrame =
      Multimodal.withSynthImage(
        ids(n).withColumn("seed", col("media_id") % (60 * copies)), "seed", 16, 16)
    def audios(n: Int, copies: Int): DataFrame =
      Multimodal.withSynthAudio(
        ids(n).withColumn("seed", col("media_id") % (50 * copies)), "seed", nSamples = 2000)
    def videos(n: Int, copies: Int): DataFrame =
      Multimodal.withSynthVideo(
        ids(n).withColumn("seed", col("media_id") % (40 * copies)), "seed",
        nFrames = 6, frameSize = 2048)

    // documents corpus for the compositions — the BenchText10x rotation
    // (copies share no tokens; duplicate/vocabulary structure preserved)
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digit = "0123456789"
    def rot(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
    def docsAt(copies: Int): DataFrame =
      (0 until copies).map { i =>
        if (i == 0) base
        else base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          translate(col("text"), lower + upper + digit,
            rot(lower, i) + rot(upper, i) + rot(digit, i)).as("text"),
          col("source"))
      }.reduce(_ unionByName _)

    def q133(docs: DataFrame): DataFrame = {
      val docs0 = docs.select(col("doc_id"), col("text"))
      val corpus = docs0.unionByName(docs0.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val canon = graft.functions.Dedup.exactDedup(corpus, "doc_id", "text")
        .select(col("canonical_id").as("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deduped = corpus.join(canon, Seq("doc_id"), "left_semi")
      // persisted multi-consumer stage — see q133's comment in SparkEntry
      // (unpersisted, semi/anti-through-Union pushdown squares the plan
      // on a multi-branch corpus: 25k nodes, 16.6 s measured)
      val quality = deduped.where(
        size(graft.functions.TextAnalysis.wsTokens(col("text"))).between(5, 10000))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bench = docs0.where(col("doc_id") % 13 === 1).select(col("text"))
      val flagged = graft.functions.Decontamination.contaminationReport(
        quality, "doc_id", "text", bench, "text", n = 5, minOverlap = 1)
        .select(col("doc_id"))
      val clean = quality.join(flagged, Seq("doc_id"), "left_anti")
        .where(col("doc_id") % 10 =!= 0)
      val target = docs0.where(col("doc_id") % 10 === 0)
      graft.functions.ImportanceResampling.resampleTopK(
        clean, target, col("doc_id"), col("text"), numBuckets = 256, k = 100)
    }
    def q143(docs: DataFrame): DataFrame = {
      val corpus = docs.unionByName(docs.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"), col("source")))
      val canon = graft.functions.Dedup.exactDedup(corpus, "doc_id", "text")
        .select(col("canonical_id").as("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deduped = corpus.join(canon, Seq("doc_id"), "left_semi")
      val quality = deduped
        .withColumn("n_tokens",
          size(graft.functions.TextAnalysis.wsTokens(col("text"))).cast("long"))
        .where(col("n_tokens").between(5, 10000))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mixed = graft.functions.Sampling.temperatureMix(quality, col("doc_id"),
        col("source"), col("n_tokens"), budgetTokens = 200000L, alpha = 0.5)
      graft.functions.Packing.chunkTokens(mixed, col("doc_id"), col("text"),
        maxLen = 32, overlap = 8)
    }

    def time(fn: => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    // optional comma-separated shape filter for re-measuring single rows
    val only = sys.env.get("SPARK_GRAFT_SHAPES").map(_.split(",").toSet)
    def report(scale: String, name: String, fn: => DataFrame): Unit = {
      if (!only.forall(_.contains(name))) return
      time(fn) // warmup (untimed)
      val runs = (1 to 2).map(_ => time(fn))
      println(f"""{"scale":"$scale","query":"$name","sec":${runs.min}%.3f}""")
    }

    for ((label, copies) <- Seq(("1x", 1), ("10x", 10))) {
      val nImg = 3000 * copies
      val nAud = 3000 * copies
      val nVid = 800 * copies

      // batch pair generation (decode + fingerprint + blocked pairing)
      report(label, "img_pairs",
        Multimodal.imageNearDupPairs(images(nImg, copies), "media_id", "content",
          maxHamming = 0))
      report(label, "aud_pairs",
        Multimodal.audioNearDupPairs(audios(nAud, copies), "media_id", "content",
          maxHamming = 0))
      report(label, "vid_pairs",
        Multimodal.videoNearDupPairs(videos(nVid, copies), "media_id", "content",
          frameSize = 2048, minSharedFrames = 2))

      // decode-only floors (the expected linear dominator, isolated)
      report(label, "img_decode",
        Multimodal.imageFingerprintStore(images(nImg, copies), "media_id"))
      report(label, "aud_decode",
        Multimodal.audioFingerprintStore(audios(nAud, copies), "media_id"))
      report(label, "vid_decode",
        Multimodal.videoFrameHashStore(videos(nVid, copies), "media_id", "content",
          frameSize = 2048))

      // incremental: FIXED 300-item delta vs this scale's store (store
      // build + write is the amortized cost — untimed)
      Multimodal.imageFingerprintStore(images(nImg, copies), "media_id")
        .write.mode("overwrite").parquet(s"$tmp/imgstore-$label")
      val imgStore = spark.read.parquet(s"$tmp/imgstore-$label")
      val imgDelta = Multimodal.withSynthImage(
        ids(300).withColumn("seed",
          when(col("media_id") % 2 === 0, col("media_id") % (60 * copies))
            .otherwise(col("media_id") + 900000000L)), "seed", 16, 16)
      report(label, "img_incremental",
        Multimodal.imageIncrementalPairs(imgDelta, imgStore, "media_id", maxHamming = 0))

      Multimodal.videoFrameHashStore(videos(nVid, copies), "media_id", "content",
          frameSize = 2048)
        .write.mode("overwrite").parquet(s"$tmp/vidstore-$label")
      val vidStore = spark.read.parquet(s"$tmp/vidstore-$label")
      val vidDelta = Multimodal.withSynthVideo(
        ids(100).withColumn("seed",
          when(col("media_id") % 2 === 0, col("media_id") % (40 * copies))
            .otherwise(col("media_id") + 900000000L)), "seed",
        nFrames = 6, frameSize = 2048)
      report(label, "vid_incremental",
        Multimodal.videoIncrementalPairs(vidDelta, vidStore, "media_id", "content",
          frameSize = 2048, minSharedFrames = 2))

      // compositions
      val docs = docsAt(copies).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
      report(label, "q133_composition", q133(docs))
      report(label, "q143_mix_pack", q143(docs))
      docs.unpersist()
    }
    spark.stop()
  }
}
