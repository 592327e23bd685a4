package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off 2×2 measurement for the LSH verification-path flags
  * (`dedupBeforeVerify` × `starPass`), running the exact q61 pipeline shape
  * at the given SF with the driver's protocol (untimed warmup pass, then
  * min over timed passes). Results are recorded in SCALE.md; the winning
  * combination is the default in [[graft.functions.Dedup]].
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.BenchLsh"
  */
object BenchLsh {
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

    def q61(dedupBeforeVerify: Boolean, starPass: Boolean): DataFrame = {
      import graft.functions.Dedup
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val nearDups = docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" extra trailing tokens appended here")).as("text"))
      val corpus = docs.unionByName(nearDups)
      val pairs = Dedup.minhashDuplicatePairs(corpus, "doc_id", "text",
        shingleSize = 5, numHashes = 32, bands = 16, threshold = 0.5,
        cappedBucketExactFallback = starPass, dedupBeforeVerify = dedupBeforeVerify)
        .select(col("id_a"), col("id_b"))
      val drop = Dedup.duplicateClusters(pairs)
        .where(col("id") =!= col("cluster_id"))
        .select(col("id").as("doc_id"))
      // hint-free like q61 itself (drop set is duplicate-volume-scaled)
      corpus.join(drop, Seq("doc_id"), "left_anti")
        .select(col("doc_id"))
    }

    val combos = Seq(
      ("dedupAfter_starOn",   false, true),
      ("dedupAfter_starOff",  false, false),
      ("dedupBefore_starOn",  true,  true),
      ("dedupBefore_starOff", true,  false))

    def runOnce(dbv: Boolean, star: Boolean): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = q61(dbv, star).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (dt, n)
    }

    // warmup pass (untimed), then min over timed passes — same protocol as Bench
    combos.foreach { case (_, dbv, star) => runOnce(dbv, star) }
    val timedPasses = sys.env.get("SPARK_GRAFT_TIMED_PASSES").map(_.toInt).getOrElse(3)
    val results = combos.map { case (name, dbv, star) =>
      val runs = (1 to timedPasses).map(_ => runOnce(dbv, star))
      (name, runs.map(_._1).min, runs.head._2)
    }
    results.foreach { case (name, sec, rows) =>
      println(f"""{"combo":"$name","sec":$sec%.3f,"rows":$rows}""")
    }
    // survivor-set must be identical across combos at this SF (star pass only
    // adds recall when buckets cap; dedup placement is result-neutral)
    val counts = results.map(_._3).distinct
    println(s"""{"distinct_row_counts":${counts.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
