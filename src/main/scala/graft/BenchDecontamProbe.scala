package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bisection probe for the q133 decontamination stage's 10×-scale
  * super-linearity (BenchComposition10x): times the stage's sub-pieces
  * at 10× against a PARQUET-materialized quality frame (lineage cut), so
  * re-evaluation cost, n-gram explode cost, and join cost separate.
  * One-off diagnostic; results in SCALE.md round-14. */
object BenchDecontamProbe {
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

    def time(name: String, df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warmup
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      println(f"""{"probe":"$name","sec":${runs.min}%.3f}""")
    }

    val tmp = java.nio.file.Files.createTempDirectory("decprobe").toString
    for ((label, copies) <- Seq(("1x", 1), ("10x", 10))) {
      val docs0 = docsAt(copies)
      val corpus = docs0.unionByName(docs0.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val canon = graft.functions.Dedup.exactDedup(corpus, "doc_id", "text")
        .select(col("canonical_id").as("doc_id"))
      val deduped = corpus.join(canon, Seq("doc_id"), "left_semi")
      val quality = deduped.where(
        size(graft.functions.TextAnalysis.wsTokens(col("text"))).between(5, 10000))
      quality.write.mode("overwrite").parquet(s"$tmp/quality-$label")
      val qMat = spark.read.parquet(s"$tmp/quality-$label")
      val bench = base.where(col("doc_id") % 13 === 1).select(col("text"))

      // a. n-gram explode of the materialized quality frame, no join
      time(s"$label/a_ngrams_only",
        qMat.select(col("doc_id"),
          explode(graft.functions.Decontamination.wordNgramHashes(col("text"), 5)).as("_ng"))
          .groupBy("doc_id").agg(count(lit(1)).as("n")))
      // b. full contaminationReport on the materialized frame
      time(s"$label/b_report_materialized",
        graft.functions.Decontamination.contaminationReport(
          qMat, "doc_id", "text", bench, "text", n = 5, minOverlap = 1))
      // c. full stage on the LIVE lineage (re-evaluates dedup+gate twice)
      time(s"$label/c_clean_live",
        quality.join(
          graft.functions.Decontamination.contaminationReport(
            quality, "doc_id", "text", bench, "text", n = 5, minOverlap = 1)
            .select(col("doc_id")),
          Seq("doc_id"), "left_anti").where(col("doc_id") % 10 =!= 0))
      // c2. ONE live copy of the lineage: report only, no anti-join back
      time(s"$label/c2_report_live",
        graft.functions.Decontamination.contaminationReport(
          quality, "doc_id", "text", bench, "text", n = 5, minOverlap = 1))
      // c3. anti-join of live quality against a TRIVIAL small side — the
      // doubled-lineage shape without the contamination subtree
      time(s"$label/c3_anti_trivial",
        quality.join(quality.select(col("doc_id")).where(col("doc_id") % 997 === 3),
          Seq("doc_id"), "left_anti"))
      // d. same as c but with the quality prefix persisted (the fix shape)
      val qPersist = quality.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      qPersist.count()
      time(s"$label/d_clean_persisted",
        qPersist.join(
          graft.functions.Decontamination.contaminationReport(
            qPersist, "doc_id", "text", bench, "text", n = 5, minOverlap = 1)
            .select(col("doc_id")),
          Seq("doc_id"), "left_anti").where(col("doc_id") % 10 =!= 0))
      qPersist.unpersist()
    }
    spark.stop()
  }
}
