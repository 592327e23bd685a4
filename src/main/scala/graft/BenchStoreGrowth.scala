package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement of the round-15 store-growth discipline: per-batch
  * fingerprint-store WRITE volume under continuous ingestion, full-rewrite
  * shape (round-14: `store.unionByName(novelFps)` overwritten per batch)
  * vs append shape (round-15: only the batch's novel fingerprints move,
  * [[graft.sources.SparkFileDataObject.writeDataFrameStagedAppend]]).
  *
  * The claim to validate is about I/O VOLUME, not just wall time: with a
  * bootstrap store of S items and B batches of n items each, the rewrite
  * shape writes S + (S+n) + (S+2n) + … = O(B·S + B²n) rows cumulatively,
  * the append shape writes B·novel — the quadratic-vs-linear gap that
  * only widens with ingestion lifetime. Bytes are read from the store
  * directory's data files after each batch (what actually hit the disk).
  *
  * Run: sbt "runMain graft.BenchStoreGrowth"; results in SCALE.md round-15. */
object BenchStoreGrowth {
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
    import graft.operators._
    import graft.sources._

    val storeItems = sys.env.getOrElse("SPARK_GRAFT_STORE_ITEMS", "200000").toInt
    val batchSize = 5000
    val nBatches = 5

    def fps(from: Long, n: Int, dupFrac: Double): DataFrame = {
      // seed space disjoint from the store for novel rows; dupFrac of the
      // batch re-posts store seeds (dropped by the dedup, so the append
      // delta is the novel (1-dupFrac) share)
      val dupN = (n * dupFrac).toInt
      val img = Multimodal.withSynthImage(
        spark.range(from, from + n).select(col("id").as("media_id"))
          .withColumn("seed",
            when(col("media_id") < from + dupN, pmod(col("media_id"), lit(storeItems)))
              .otherwise(col("media_id"))),
        "seed", 16, 16)
      Multimodal.imageFingerprintStore(img, "media_id")
    }

    def dataBytes(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else if (f.getName.endsWith(".parquet")) f.length else 0L
      walk(new java.io.File(dir))
    }

    val tmp = java.nio.file.Files.createTempDirectory("storegrowth").toString
    // bootstrap store state (identical for both shapes), OUTSIDE timing —
    // fingerprints only, the corpus bytes are never an input
    val boot = fps(0, storeItems, 0.0).persist()
    boot.count()

    // ---- shape A (round-14): full rewrite per batch -------------------
    boot.write.mode("overwrite").parquet(s"$tmp/rewrite")
    var rewriteBytes = 0L
    var rewriteSecs = 0.0
    (0 until nBatches).foreach { b =>
      val delta = fps(10000000L + b * batchSize, batchSize, 0.2)
      val t0 = System.nanoTime()
      val store = spark.read.parquet(s"$tmp/rewrite")
      val dup = graft.functions.Dedup.simhashIncrementalPairsFromSigs(
        delta.select(col("id"), col("dhash64").as("simhash")),
        store.select(col("id"), col("dhash64").as("simhash")), maxHamming = 0)
        .select(col("id_new").as("id")).distinct()
      val novel = delta.join(broadcast(dup), Seq("id"), "left_anti")
      val before = dataBytes(s"$tmp/rewrite")
      // the r14 shape: grown store overwritten wholesale (staged dir, as
      // the old writeDataFrameStaged did)
      store.unionByName(novel).write.mode("overwrite").parquet(s"$tmp/rewrite_next")
      rewriteBytes += dataBytes(s"$tmp/rewrite_next")
      def rmrf(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
        f.delete(); ()
      }
      rmrf(new java.io.File(s"$tmp/rewrite"))
      new java.io.File(s"$tmp/rewrite_next").renameTo(new java.io.File(s"$tmp/rewrite"))
      rewriteSecs += (System.nanoTime() - t0) / 1e9
      val _ = before
    }

    // ---- shape B (round-15): staged append of the novel delta ---------
    val reg = new InstanceRegistry
    reg.register(ParquetFileDataObject("store", s"$tmp/append"))
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val storeObj = reg.dataObject("store").asInstanceOf[ParquetFileDataObject]
    storeObj.writeDataFrame(boot)
    var appendBytes = 0L
    var appendSecs = 0.0
    (0 until nBatches).foreach { b =>
      val delta = fps(20000000L + b * batchSize, batchSize, 0.2)
      val t0 = System.nanoTime()
      val store = storeObj.getDataFrame()
      val dup = graft.functions.Dedup.simhashIncrementalPairsFromSigs(
        delta.select(col("id"), col("dhash64").as("simhash")),
        store.select(col("id"), col("dhash64").as("simhash")), maxHamming = 0)
        .select(col("id_new").as("id")).distinct()
      val novel = delta.join(broadcast(dup), Seq("id"), "left_anti")
      val before = dataBytes(s"$tmp/append")
      storeObj.writeDataFrameStagedAppend(novel)
      appendBytes += dataBytes(s"$tmp/append") - before
      appendSecs += (System.nanoTime() - t0) / 1e9
    }

    val finalRewrite = spark.read.parquet(s"$tmp/rewrite").count()
    val finalAppend = spark.read.parquet(s"$tmp/append").count()
    println(f"""{"bench":"store_growth","store_items":$storeItems,"batch":$batchSize,"batches":$nBatches,""" +
      f""""rewrite_bytes":$rewriteBytes,"append_bytes":$appendBytes,""" +
      f""""bytes_ratio":${rewriteBytes.toDouble / appendBytes}%.1f,""" +
      f""""rewrite_secs":$rewriteSecs%.2f,"append_secs":$appendSecs%.2f,""" +
      f""""final_rewrite_rows":$finalRewrite,"final_append_rows":$finalAppend}""")

    // ---- shape C: TEXT store layouts — compact vs banded storage trade --
    //
    // The banded layout buys a prefix-prunable per-batch READ (measured
    // flat in BenchStorePrune) by replicating the signature into every
    // band row and dropping the shingle array; the compact layout stores
    // shingles once per doc. This section puts the WRITE/STORAGE side of
    // that trade on record: bootstrap bytes, append bytes per batch (at
    // S and 10S — append volume must stay flat in store size for both),
    // and the store footprint after compaction (FileCompactionMode for
    // the unpartitioned compact store; per-prefix re-bin for the
    // store_pfx-partitioned banded store).
    import graft.functions.Dedup
    val textItems = sys.env.getOrElse("SPARK_GRAFT_TEXT_ITEMS", "50000").toInt
    val bands = 8; val numHashes = 32; val pfx = 64
    def textSigs(from: Long, n: Int): DataFrame =
      Dedup.minhashSignatures(
        spark.range(from, from + n).select(col("id").as("doc_id"))
          .withColumn("text", concat_ws(" ",
            transform(sequence(lit(0), lit(39)),
              i => concat(lit("w"), pmod(xxhash64(col("doc_id") * 1000 + i), lit(50000L)))))),
        "doc_id", "text", 5, numHashes)
    def bandedOf(sigs: DataFrame): DataFrame =
      Dedup.minhashBandedStore(sigs, numHashes, bands, pfx)
    Seq(1, 10).foreach { mult =>
      val s0 = textItems * mult
      Seq("compact", "banded").foreach { layout =>
        val dir = s"$tmp/text_${layout}_$mult"
        val reg2 = new InstanceRegistry
        reg2.register(ParquetFileDataObject(s"ts_${layout}_$mult", dir,
          partitions = if (layout == "banded") Seq("store_pfx") else Seq.empty,
          numberOfTasksPerPartition = if (layout == "banded") Some(8) else None))
        val obj = reg2.dataObject(s"ts_${layout}_$mult").asInstanceOf[ParquetFileDataObject]
        val ctx2 = ActionPipelineContext(spark, reg2)
        def shaped(df: DataFrame) = if (layout == "banded") bandedOf(df) else df
        shaped(textSigs(0, s0)).write
          .partitionBy((if (layout == "banded") Seq("store_pfx") else Seq.empty): _*)
          .mode("overwrite").parquet(dir)
        val bootBytes = dataBytes(dir)
        var appBytes = 0L; var appSecs = 0.0
        (0 until nBatches).foreach { b =>
          val delta = shaped(textSigs(30000000L + b * 2000L, 2000))
          val t0 = System.nanoTime()
          val before = dataBytes(dir)
          obj.writeDataFrameStagedAppend(delta)(ctx2)
          appBytes += dataBytes(dir) - before
          appSecs += (System.nanoTime() - t0) / 1e9
        }
        // compaction: whole-directory rewrite for the unpartitioned
        // compact store; per-prefix re-bin for the partitioned banded one
        if (layout == "banded")
          PartitionArchiveCompactionMode(compactCondition = Some("true"),
            compactNumFiles = 1).exec(obj)(ctx2)
        else
          FileCompactionMode(minFiles = 2, targetNumFiles = 4).exec(obj)(ctx2)
        val compactedBytes = dataBytes(dir)
        println(f"""{"bench":"store_layout","layout":"$layout","store_items":$s0,""" +
          f""""boot_bytes":$bootBytes,"append_bytes_per_batch":${appBytes / nBatches},""" +
          f""""append_secs":$appSecs%.2f,"compacted_bytes":$compactedBytes,""" +
          f""""bytes_per_doc":${compactedBytes / (s0 + nBatches * 2000)}}""")
      }
    }
    spark.stop()
  }
}
