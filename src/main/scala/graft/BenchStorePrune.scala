package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement of the round-16 blocking-key-pruned store layout:
  * per-batch store READ volume of the incremental pair join against a
  * banded, prefix-partitioned text signature store
  * ([[graft.functions.Dedup.minhashBandedStore]]), pruned by the delta's
  * own bucket-prefix set vs the unpruned full-store scan — at a store of
  * S docs and again at 10S, to show the pruned read is bounded by the
  * DELTA's bucket count (files read flat across the 10× store) while the
  * unpruned scan grows with the store.
  *
  * The regime measured is the streaming one the layout exists for: small
  * continuous micro-batches (batch × bands ≪ storePartitions). Bulk
  * ingestion batches touch every prefix and degrade gracefully to the
  * full scan (pruning is an upper-bound-preserving optimization).
  *
  * Run: sbt "runMain graft.BenchStorePrune"; results in SCALE.md round-16. */
object BenchStorePrune {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core._
    import graft.functions.Dedup
    import graft.sources._

    val numHashes = 32
    val bands = 8
    // overridable to measure the parallel-partition-discovery threshold
    // crossing (spark.sql.sources.parallelPartitionDiscovery.threshold =
    // 32 dirs): 16 stays on driver-side listing, 64 launches a listing
    // job per store read — SCALE.md round-19 documents the crossing
    val storePartitions = sys.env.get("SPARK_GRAFT_STORE_PARTITIONS").map(_.toInt).getOrElse(256)
    val batchSize = 8       // streaming-shaped micro-batch (batch × bands ≪ N)
    val nBatches = 5

    def docs(from: Long, n: Long): DataFrame =
      spark.range(from, from + n).select(col("id").as("doc_id"))
        .withColumn("text", concat_ws(" ",
          transform(sequence(lit(0), lit(39)),
            i => concat(lit("w"), pmod(xxhash64(col("doc_id") * 1000 + i), lit(500000L))))))

    def scanFiles(df: DataFrame): Long =
      df.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.selectedPartitions.totalNumberOfFiles
      }.sum
    def scanBytes(df: DataFrame): Long =
      df.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.selectedPartitions.totalFileSize
      }.sum

    def measure(storeDocs: Long, tag: String): String = {
      val tmp = java.nio.file.Files.createTempDirectory(s"storeprune_$tag").toString
      val reg = new InstanceRegistry
      reg.register(ParquetFileDataObject("store", s"$tmp/store",
        partitions = Seq("store_pfx"), numberOfTasksPerPartition = Some(1)))
      implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
      val storeObj = reg.dataObject("store").asInstanceOf[ParquetFileDataObject]
      storeObj.writeDataFrame(Dedup.minhashBandedStore(
        Dedup.minhashSignatures(docs(0, storeDocs), "doc_id", "text", 5, numHashes),
        numHashes, bands, storePartitions))

      var prunedFiles, prunedBytes, fullFiles, fullBytes = 0L
      var prunedSecs, fullSecs = 0.0
      (0 until nBatches).foreach { b =>
        val delta = Dedup.minhashSignatures(
          docs(10000000L + b * batchSize, batchSize), "doc_id", "text", 5, numHashes)
          .persist()
        delta.count()
        val store = storeObj.getDataFrame()
        val pfxs = Dedup.minhashBandedStore(delta, numHashes, bands, storePartitions)
          .select("store_pfx").distinct().collect().map(_.getLong(0)).toSeq
        val pruned = store.where(col("store_pfx").isin(pfxs: _*)).drop("store_pfx")
        val full = store.drop("store_pfx")
        prunedFiles += scanFiles(pruned); prunedBytes += scanBytes(pruned)
        fullFiles += scanFiles(full); fullBytes += scanBytes(full)
        var t0 = System.nanoTime()
        Dedup.minhashIncrementalPairsBandedStore(delta, pruned, numHashes, bands).count()
        prunedSecs += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        Dedup.minhashIncrementalPairsBandedStore(delta, full, numHashes, bands).count()
        fullSecs += (System.nanoTime() - t0) / 1e9
        delta.unpersist()
      }
      f""""$tag":{"store_docs":$storeDocs,"pruned_files_per_batch":${prunedFiles / nBatches},""" +
        f""""full_files_per_batch":${fullFiles / nBatches},""" +
        f""""pruned_mb_per_batch":${prunedBytes / nBatches / 1e6}%.2f,""" +
        f""""full_mb_per_batch":${fullBytes / nBatches / 1e6}%.2f,""" +
        f""""pruned_secs":$prunedSecs%.2f,"full_secs":$fullSecs%.2f}"""
    }

    val small = measure(20000, "s")
    val big = measure(200000, "s10x")
    println(s"""{"bench":"store_prune","batch":$batchSize,"bands":$bands,"store_partitions":$storePartitions,$small,$big}""")
    spark.stop()
  }
}
