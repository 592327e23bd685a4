package graft

import graft.core._
import graft.functions.Dedup
import graft.operators._
import graft.sources._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 blocking-key-pruned store layouts: the banded text signature
  * store, embedding bucket partitioning, and video frame-hash
  * partitioning — per-batch store READS bounded by the delta's own
  * blocking keys instead of the whole store (the writes were already
  * O(increment) via staged append). */
class PrunedStoreSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** deterministic 40-token doc per seed — exact copies share a seed */
  private def docs(rows: Seq[(Long, Long)]): DataFrame =
    rows.toDF("doc_id", "seed")
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(39)),
          i => concat(lit("w"), pmod(xxhash64(col("seed") * 1000 + i), lit(50000L))))))
      .drop("seed")

  /** files the scan would actually read AFTER partition pruning — the
    * measurement the pruned layout exists for */
  private def scannedFiles(df: DataFrame): Long =
    df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.totalNumberOfFiles
    }.sum

  private def registryFor(dir: String, storePartitions: Boolean): InstanceRegistry = {
    val reg = new InstanceRegistry
    reg.register(ParquetFileDataObject("batch", s"$dir/batch"))
    reg.register(ParquetFileDataObject("novel", s"$dir/novel"))
    reg.register(ParquetFileDataObject("store", s"$dir/store",
      partitions = if (storePartitions) Seq("store_pfx") else Seq.empty))
    reg
  }

  private def bandedAction(n: Int): Action = CustomDataFrameAction(
    "inc", Seq("batch"), Seq("novel", "store"),
    dfsTransformers = Seq(IncrementalDedupTransformer("batch", "store", "doc_id", "text",
      threshold = 0.8, novelOutput = Some("novel"),
      storeLayout = "banded", storePartitions = n)),
    saveMode = Some(SdlSaveMode.Append), recursiveInputIds = Seq("store"))

  test("banded+partitioned text store through the DAG: decisions, layout, sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("banded").toString
    val reg = registryFor(dir, storePartitions = true)
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val action = bandedAction(64)

    // run 1: seeds 1..6 novel; id 7 re-posts seed 1 WITHIN the batch
    docs((1L to 6L).map(i => (i, i)) :+ (7L, 1L))
      .write.mode("overwrite").parquet(s"$dir/batch")
    new ActionDAGRun(Seq(action)).run()
    assert(spark.read.parquet(s"$dir/novel").select("doc_id").as[Long].collect().toSet ==
      (1L to 6L).toSet)

    // run 2: id 10 re-posts stored seed 2; 11 novel; 12 re-posts 11 intra
    docs(Seq((10L, 2L), (11L, 99L), (12L, 99L)))
      .write.mode("overwrite").parquet(s"$dir/batch")
    new ActionDAGRun(Seq(action)).run()
    assert(spark.read.parquet(s"$dir/novel").select("doc_id").as[Long].collect().toSet ==
      (1L to 6L).toSet + 11L)

    // on-disk layout: the store is laid out by blocking-key prefix, and
    // the banded schema (no shingle arrays) is what's stored
    val dirs = new java.io.File(s"$dir/store").listFiles().map(_.getName)
      .filter(_.startsWith("store_pfx=")).toSeq
    assert(dirs.nonEmpty, "store must be partitioned by store_pfx on disk")
    val storeDf = reg.dataObject("store").asInstanceOf[ParquetFileDataObject].getDataFrame()
    assert(storeDf.columns.toSet == Set("id", "band", "bucket", "sig", "store_pfx"))
    // store holds only the HEADS (novel ids), one row per band
    assert(storeDf.select("id").distinct().as[Long].collect().toSet == (1L to 6L).toSet + 11L)
    // sidecar records the layout — a compact-config rerun must fail loudly
    val meta = StoreMeta.read(s"$dir/store").get
    assert(meta("storeLayout") == "banded" && meta("storePartitions") == "64")
  }

  test("layout drift fails loudly from the sidecar (banded store, compact config)") {
    val dir = java.nio.file.Files.createTempDirectory("bandeddrift").toString
    val reg = registryFor(dir, storePartitions = true)
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    docs(Seq((1L, 1L))).write.mode("overwrite").parquet(s"$dir/batch")
    new ActionDAGRun(Seq(bandedAction(64))).run()
    val compact = CustomDataFrameAction(
      "inc", Seq("batch"), Seq("novel", "store"),
      dfsTransformers = Seq(IncrementalDedupTransformer("batch", "store", "doc_id", "text",
        threshold = 0.8, novelOutput = Some("novel"))),
      saveMode = Some(SdlSaveMode.Append), recursiveInputIds = Seq("store"))
    val e = intercept[Exception] { new ActionDAGRun(Seq(compact)).run() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(t => Option(t.getMessage).exists(_.contains("storeLayout"))),
      s"expected a storeLayout drift failure, got: $e")
  }

  test("prefix pruning: the pair join's store scan reads only the delta's bucket files") {
    val dir = java.nio.file.Files.createTempDirectory("bandedprune").toString
    val reg = registryFor(dir, storePartitions = true)
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val action = bandedAction(64)
    // two corpus batches → a store spread over many prefixes
    docs((1L to 12L).map(i => (i, i))).write.mode("overwrite").parquet(s"$dir/batch")
    new ActionDAGRun(Seq(action)).run()
    docs((20L to 31L).map(i => (i, i))).write.mode("overwrite").parquet(s"$dir/batch")
    new ActionDAGRun(Seq(action)).run()

    val store = reg.dataObject("store").asInstanceOf[ParquetFileDataObject].getDataFrame()
    val all = scannedFiles(store)
    // a single-doc delta touches at most `bands` of the 64 prefixes
    val sigs = Dedup.minhashSignatures(docs(Seq((100L, 2L))), "doc_id", "text", 5, 32)
    val pfxs = Dedup.minhashBandedStore(sigs, 32, 8, 64)
      .select("store_pfx").distinct().as[Long].collect().toSeq
    assert(pfxs.size <= 8)
    val pruned = store.where(col("store_pfx").isin(pfxs: _*))
    assert(scannedFiles(pruned) < all,
      s"pruned scan must read fewer files: ${scannedFiles(pruned)} vs $all")
    // and the pruned view still finds the planted duplicate
    val pairs = Dedup.minhashIncrementalPairsBandedStore(
      sigs, pruned.drop("store_pfx"), 32, 8, threshold = 0.8)
    assert(pairs.select("id_corpus").as[Long].collect().toSet == Set(2L))
  }

  test("banded estimate agrees with the compact layout on planted batches") {
    // same two batches through both layouts, standalone (frames passed
    // directly) — identical novel decisions
    implicit val ctx: ActionPipelineContext =
      ActionPipelineContext(spark, new InstanceRegistry)
    val b1 = docs((1L to 6L).map(i => (i, i)) :+ (7L, 1L))
    val b2 = docs(Seq((10L, 2L), (11L, 99L), (12L, 99L)))
    def novels(tr: IncrementalDedupTransformer): Set[Long] = {
      val r1 = tr.transform(Map("b" -> b1))
      val r2 = tr.transform(Map("b" -> b2, "store" -> r1("store")))
      (r1("b").select("doc_id").as[Long].collect() ++
        r2("b").select("doc_id").as[Long].collect()).toSet
    }
    val banded = novels(IncrementalDedupTransformer("b", "store", "doc_id", "text",
      threshold = 0.8, storeLayout = "banded"))
    val compact = novels(IncrementalDedupTransformer("b", "store", "doc_id", "text",
      threshold = 0.8))
    assert(banded == compact && banded == (1L to 6L).toSet + 11L)
  }

  test("embedding store partitioning: same decisions, pruned bucket scan") {
    def vec(seed: Long): Array[Float] =
      Array.tabulate(16)(i => (((seed * 31 + i * 17) % 97).toFloat - 48f) / 48f)
    def batchOf(rows: Seq[(Long, Long)]): DataFrame =
      rows.map { case (id, s) => (id, vec(s)) }.toDF("vec_id", "emb")
    def run(dir: String, n: Int): Set[Long] = {
      val reg = new InstanceRegistry
      reg.register(ParquetFileDataObject("batch", s"$dir/batch"))
      reg.register(ParquetFileDataObject("novel", s"$dir/novel"))
      reg.register(ParquetFileDataObject("store", s"$dir/store",
        partitions = if (n > 0) Seq("store_pfx") else Seq.empty))
      implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
      val action = CustomDataFrameAction(
        "inc", Seq("batch"), Seq("novel", "store"),
        dfsTransformers = Seq(IncrementalEmbeddingDedupTransformer("batch", "store",
          "vec_id", "emb", dim = 16, novelOutput = Some("novel"), storePartitions = n)),
        saveMode = Some(SdlSaveMode.Append), recursiveInputIds = Seq("store"))
      batchOf((1L to 8L).map(i => (i, i))).write.mode("overwrite").parquet(s"$dir/batch")
      new ActionDAGRun(Seq(action)).run()
      // 10 re-posts vector 3; 11 novel; 12 re-posts 11 intra-batch
      batchOf(Seq((10L, 3L), (11L, 42L), (12L, 42L)))
        .write.mode("overwrite").parquet(s"$dir/batch")
      new ActionDAGRun(Seq(action)).run()
      spark.read.parquet(s"$dir/novel").select("vec_id").as[Long].collect().toSet
    }
    val base = java.nio.file.Files.createTempDirectory("embprune").toString
    val pruned = run(s"$base/p", 32)
    val plain = run(s"$base/u", 0)
    assert(pruned == plain && pruned == (1L to 8L).toSet + 11L)
    assert(new java.io.File(s"$base/p/store").listFiles()
      .exists(_.getName.startsWith("store_pfx=")))
  }

  test("video store partitioning wires through HOCON and preserves decisions") {
    val fs = 2048
    def run(dir: String, n: Int): (Set[Long], Set[Long]) = {
      val partLine = if (n > 0) """, partitions = ["store_pfx"]""" else ""
      val cfg =
        s"""dataObjects {
           |  vbatch { type = parquet, path = "$dir/batch" }
           |  vnovel { type = parquet, path = "$dir/novel" }
           |  vstore { type = parquet, path = "$dir/store"$partLine }
           |}
           |actions {
           |  ingest {
           |    type = customDataFrame
           |    inputIds = [vbatch]
           |    outputIds = [vnovel, vstore]
           |    recursiveInputIds = [vstore]
           |    saveMode = append
           |    dfsTransformers = [
           |      { type = incrementalMediaDedup, batchInput = vbatch, storeInput = vstore,
           |        idColumn = media_id, modality = video, frameSize = $fs,
           |        minSharedFrames = 2, novelOutput = vnovel, storePartitions = $n }
           |    ]
           |  }
           |}
           |""".stripMargin
      val reg = ConfigParser.parse(cfg)
      implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
      val action = reg.action("ingest")
      def write(rows: Seq[(Long, Array[Byte])]): Unit =
        rows.toDF("media_id", "content").write.mode("overwrite").parquet(s"$dir/batch")
      write(Seq((1L, Multimodal.Codecs.synthVideo(1L, 5, fs)),
                (2L, Multimodal.Codecs.synthVideo(2L, 5, fs))))
      new ActionDAGRun(Seq(action)).run()
      write(Seq((3L, Multimodal.Codecs.synthVideo(1L, 5, fs)),
                (4L, Multimodal.Codecs.synthVideo(9L, 5, fs))))
      new ActionDAGRun(Seq(action)).run()
      (spark.read.parquet(s"$dir/novel").select("media_id").as[Long].collect().toSet,
        spark.read.parquet(s"$dir/store").select("id").distinct().as[Long].collect().toSet)
    }
    val base = java.nio.file.Files.createTempDirectory("vidprune").toString
    val (novelP, storeP) = run(s"$base/p", 16)
    val (novelU, storeU) = run(s"$base/u", 0)
    assert(novelP == novelU && novelP == Set(1L, 2L, 4L))
    assert(storeP == storeU && storeP == Set(1L, 2L, 4L))
    assert(new java.io.File(s"$base/p/store").listFiles()
      .exists(_.getName.startsWith("store_pfx=")))
  }

  test("streaming replay stays idempotent on the nested (batchId, store_pfx) store") {
    val dir = java.nio.file.Files.createTempDirectory("bandedreplay").toString
    val reg = new InstanceRegistry
    reg.register(ParquetFileDataObject("in", s"$dir/src"))
    reg.register(ParquetFileDataObject("novel", s"$dir/out", partitions = Seq("ingest_batch")))
    reg.register(ParquetFileDataObject("store", s"$dir/store",
      partitions = Seq("ingest_batch", "store_pfx")))
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val action = StreamingIncrementalDedupAction("ingest",
      IncrementalDedupTransformer("in", "store", "doc_id", "text", threshold = 0.8,
        novelOutput = Some("novel"), storeLayout = "banded", storePartitions = 16),
      graft.operators.modes.SparkStreamingMode(
        checkpointLocation = s"$dir/cp", triggerType = "AvailableNow"))
    action.processBatch(docs((1L to 4L).map(i => (i, i))), 0L)
    // batch 1: id 10 re-posts stored seed 2, id 11 novel — delivered TWICE
    // (the at-least-once window: writes landed, checkpoint commit didn't)
    val b1 = docs(Seq((10L, 2L), (11L, 99L)))
    action.processBatch(b1, 1L)
    action.processBatch(b1, 1L)
    assert(spark.read.parquet(s"$dir/out").select("doc_id").as[Long].collect().toSet ==
      (1L to 4L).toSet + 11L)
    // the store holds each head's banded rows exactly once — a replayed
    // batch overwrites its own (batchId, prefix) leaves, no duplicates
    val store = spark.read.parquet(s"$dir/store")
    assert(store.groupBy("id", "band").count().where(col("count") > 1).count() == 0,
      "replay must not duplicate banded store rows")
    assert(store.select("id").distinct().as[Long].collect().toSet == (1L to 4L).toSet + 11L)
  }

  test("image blocked store partitioning: same decisions, blocked layout on disk") {
    def run(dir: String, n: Int): (Set[Long], Set[Long]) = {
      val reg = new InstanceRegistry
      reg.register(ParquetFileDataObject("batch", s"$dir/batch"))
      reg.register(ParquetFileDataObject("novel", s"$dir/novel"))
      reg.register(ParquetFileDataObject("store", s"$dir/store",
        partitions = if (n > 0) Seq("store_pfx") else Seq.empty))
      implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
      val action = CustomDataFrameAction(
        "inc", Seq("batch"), Seq("novel", "store"),
        dfsTransformers = Seq(IncrementalMediaDedupTransformer("batch", "store",
          "media_id", modality = "image", maxHamming = 2,
          novelOutput = Some("novel"), storePartitions = n)),
        saveMode = Some(SdlSaveMode.Append), recursiveInputIds = Seq("store"))
      def write(rows: Seq[(Long, Long)]): Unit =
        operators.Multimodal.withSynthImage(rows.toDF("media_id", "seed"), "seed", 16, 16)
          .write.mode("overwrite").parquet(s"$dir/batch")
      write((1L to 6L).map(i => (i, i)) :+ (7L, 1L))   // 7 intra-dups seed 1
      new ActionDAGRun(Seq(action)).run()
      write(Seq((10L, 2L), (11L, 99L), (12L, 99L)))    // 10 store dup, 12 intra
      new ActionDAGRun(Seq(action)).run()
      (spark.read.parquet(s"$dir/novel").select("media_id").as[Long].collect().toSet,
        spark.read.parquet(s"$dir/store").select("id").distinct().as[Long].collect().toSet)
    }
    val base = java.nio.file.Files.createTempDirectory("imgblocked").toString
    val (novelP, storeP) = run(s"$base/p", 32)
    val (novelU, storeU) = run(s"$base/u", 0)
    assert(novelP == novelU && novelP == (1L to 6L).toSet + 11L)
    assert(storeP == storeU && storeP == (1L to 6L).toSet + 11L)
    // blocked layout on disk: one row per Manku block key, prefix dirs
    val storeDf = spark.read.parquet(s"$base/p/store")
    assert(storeDf.columns.toSet == Set("id", "block", "bkey", "dhash64", "store_pfx"))
    assert(storeDf.groupBy("id").count().select(max(col("count"))).as[Long].head() == 3L,
      "maxHamming=2 → 3 block rows per fingerprint")
    assert(new java.io.File(s"$base/p/store").listFiles()
      .exists(_.getName.startsWith("store_pfx=")))
    // a hamming-budget drift against the blocked store fails loudly
    val reg = new InstanceRegistry
    reg.register(ParquetFileDataObject("batch", s"$base/p/batch"))
    reg.register(ParquetFileDataObject("novel", s"$base/p/novel"))
    reg.register(ParquetFileDataObject("store", s"$base/p/store", partitions = Seq("store_pfx")))
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val drifted = CustomDataFrameAction("inc", Seq("batch"), Seq("novel", "store"),
      dfsTransformers = Seq(IncrementalMediaDedupTransformer("batch", "store",
        "media_id", modality = "image", maxHamming = 3,
        novelOutput = Some("novel"), storePartitions = 32)),
      saveMode = Some(SdlSaveMode.Append), recursiveInputIds = Seq("store"))
    val e = intercept[Exception] { new ActionDAGRun(Seq(drifted)).run() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(t => Option(t.getMessage).exists(_.contains("storeBlockedMaxHamming"))),
      s"expected a blocked-hamming drift failure, got: $e")
  }

  test("span fingerprint store pruning: same cleaned text, pruned window scan") {
    // corpus history: docs sharing the boilerplate span; delta: one doc
    // re-posting it (span removed) + one clean doc (untouched)
    val boiler = "all rights reserved contact us for licensing terms today"
    def doc(id: Long, body: String) = (id, s"$body $boiler")
    val corpus = Seq(doc(1, "alpha beta gamma delta epsilon zeta eta theta"),
      doc(2, "one two three four five six seven eight")).toDF("doc_id", "text")
    val delta = Seq(doc(10, "fresh unique words appear nowhere else in corpus"),
      (11L, "completely novel text with no shared windows at all whatsoever"))
      .toDF("doc_id", "text")
    def cleaned(store: org.apache.spark.sql.DataFrame, n: Int): Map[Long, String] =
      Dedup.removeRepeatedSpansIncremental(delta, "doc_id", "text", store,
          l = 8, storePartitions = n)
        .select(col("id"), col("cleaned_text")).as[(Long, String)].collect().toMap
    val plain = cleaned(
      Dedup.spanFingerprintStore(corpus, "doc_id", "text", l = 8), 0)
    // partitioned store persisted to parquet, read back with partition dirs
    val dir = java.nio.file.Files.createTempDirectory("spanprune").toString
    Dedup.spanFingerprintStore(corpus, "doc_id", "text", l = 8, storePartitions = 16)
      .write.partitionBy("store_pfx").parquet(s"$dir/store")
    val partStore = spark.read.option("basePath", s"$dir/store").parquet(s"$dir/store")
    val pruned = cleaned(partStore, 16)
    assert(pruned == plain, "pruning must not change a single cleaned byte")
    assert(pruned(10L).endsWith("in corpus") && !pruned(10L).contains("licensing"),
      s"the boilerplate span must be removed: ${pruned(10L)}")
    assert(pruned(11L).contains("whatsoever"), "clean doc untouched")
    // and the store scan was actually pruned to the delta's prefixes
    val total = scannedFiles(partStore)
    val deltaPfx = Dedup.spanFingerprintStore(delta, "doc_id", "text", l = 8,
      storePartitions = 16).select("store_pfx").distinct().as[Long].collect().toSeq
    assert(scannedFiles(partStore.where(col("store_pfx").isin(deltaPfx: _*))) < total)
  }

  test("per-prefix compaction: re-binning prefix files preserves dedup decisions") {
    // a prefix-partitioned store accumulates one file set per batch per
    // touched prefix; PartitionArchiveCompactionMode's compactCondition
    // rewrites each prefix dir in place (staged swap) — every rewrite is
    // bounded by ONE prefix, never the store
    val dir = java.nio.file.Files.createTempDirectory("pfxcompact").toString
    val reg = registryFor(dir, storePartitions = true)
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val action = bandedAction(16)
    docs((1L to 8L).map(i => (i, i))).write.mode("overwrite").parquet(s"$dir/batch")
    new ActionDAGRun(Seq(action)).run()
    docs((20L to 27L).map(i => (i, i))).write.mode("overwrite").parquet(s"$dir/batch")
    new ActionDAGRun(Seq(action)).run()
    val storeObj = reg.dataObject("store").asInstanceOf[ParquetFileDataObject]
    def storeRows: Set[(Long, Int, Long)] = storeObj.getDataFrame()
      .select("id", "band", "bucket").as[(Long, Int, Long)].collect().toSet
    def dataFiles: Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(s"$dir/store"))
    }
    val (rowsBefore, filesBefore) = (storeRows, dataFiles)
    PartitionArchiveCompactionMode(compactCondition = Some("true"), compactNumFiles = 1)
      .exec(storeObj)
    assert(storeRows == rowsBefore, "compaction must not change a single store row")
    assert(dataFiles < filesBefore, s"got $dataFiles vs $filesBefore")
    // and the compacted store still dedups: re-post of stored seed 3
    docs(Seq((50L, 3L), (51L, 777L))).write.mode("overwrite").parquet(s"$dir/batch")
    new ActionDAGRun(Seq(action)).run()
    assert(spark.read.parquet(s"$dir/novel").select("doc_id").as[Long].collect().toSet ==
      ((1L to 8L) ++ (20L to 27L)).toSet + 51L)
  }

  test("incremental span removal wires through HOCON: history scrub, append-only counts") {
    val dir = java.nio.file.Files.createTempDirectory("spanhocon").toString
    val cfg =
      s"""dataObjects {
         |  sbatch { type = parquet, path = "$dir/batch" }
         |  sclean { type = parquet, path = "$dir/clean" }
         |  sstore { type = parquet, path = "$dir/store", partitions = ["store_pfx"] }
         |}
         |actions {
         |  scrub {
         |    type = customDataFrame
         |    inputIds = [sbatch]
         |    outputIds = [sclean, sstore]
         |    recursiveInputIds = [sstore]
         |    saveMode = append
         |    dfsTransformers = [
         |      { type = incrementalSpanRemoval, batchInput = sbatch, storeInput = sstore,
         |        idColumn = doc_id, textColumn = text, windowTokens = 8,
         |        cleanOutput = sclean, storePartitions = 16 }
         |    ]
         |  }
         |}
         |""".stripMargin
    val reg = ConfigParser.parse(cfg)
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val action = reg.action("scrub")
    docs(Seq((1L, 1L), (2L, 2L))).write.mode("overwrite").parquet(s"$dir/batch")
    new ActionDAGRun(Seq(action)).run()
    // batch 2: id 10 re-posts seed 1's text — fully scrubbed against history
    docs(Seq((10L, 1L), (11L, 99L))).write.mode("overwrite").parquet(s"$dir/batch")
    new ActionDAGRun(Seq(action)).run()
    val out = spark.read.parquet(s"$dir/clean")
      .select("doc_id", "n_removed_tokens").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> 0, 10L -> 40, 11L -> 0), s"got $out")
    // append-only partial counts: batch 2 appended its own window rows —
    // the shared windows (seed 1) now have one partial row per batch
    val store = spark.read.parquet(s"$dir/store")
    assert(store.groupBy("h", "h2").count().where(col("count") > 1).count() == 33,
      "seed 1's 33 windows must hold one partial count row per batch")
    assert(new java.io.File(s"$dir/store").listFiles()
      .exists(_.getName.startsWith("store_pfx=")))
    // sidecar pins the window length — a drifted windowTokens fails loudly
    val drifted = CustomDataFrameAction("scrub2", Seq("sbatch"), Seq("sclean", "sstore"),
      dfsTransformers = Seq(IncrementalSpanRemovalTransformer("sbatch", "sstore",
        "doc_id", "text", windowTokens = 6, cleanOutput = Some("sclean"),
        storePartitions = 16)),
      saveMode = Some(SdlSaveMode.Append), recursiveInputIds = Seq("sstore"))
    val e = intercept[Exception] { new ActionDAGRun(Seq(drifted)).run() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(t => Option(t.getMessage).exists(_.contains("windowTokens"))),
      s"expected a windowTokens drift failure, got: $e")
  }

  test("incrementalLineDedup parses from HOCON with its full option surface") {
    val reg = ConfigParser.parse(
      """dataObjects {
        |  lb { type = parquet, path = "/tmp/x/lb" }
        |  lc { type = parquet, path = "/tmp/x/lc" }
        |  ls { type = parquet, path = "/tmp/x/ls", partitions = ["store_pfx"] }
        |}
        |actions {
        |  scrub {
        |    type = customDataFrame
        |    inputIds = [lb], outputIds = [lc, ls], recursiveInputIds = [ls]
        |    saveMode = append
        |    dfsTransformers = [
        |      { type = incrementalLineDedup, batchInput = lb, storeInput = ls,
        |        idColumn = doc_id, textColumn = text, maxOccurrences = 2,
        |        cleanOutput = lc, storePartitions = 32 }
        |    ]
        |  }
        |}
        |""".stripMargin)
    val tr = reg.action("scrub").asInstanceOf[CustomDataFrameAction]
      .dfsTransformers.head.asInstanceOf[IncrementalLineDedupTransformer]
    assert(tr == IncrementalLineDedupTransformer("lb", "ls", "doc_id", "text",
      maxOccurrences = 2, cleanOutput = Some("lc"), storePartitions = 32))
  }

  test("round-17 knobs parse from HOCON: allowRerun, checkpoint-clamped housekeeping") {
    val reg = ConfigParser.parse(
      """dataObjects {
        |  b { type = parquet, path = "/tmp/x/b" }
        |  n { type = parquet, path = "/tmp/x/n",
        |      housekeepingMode = { type = retention,
        |        retentionCondition = "ingest_batch >= 5",
        |        streamingCheckpoint = "/tmp/x/cp", batchIdColumn = mb } }
        |  s { type = parquet, path = "/tmp/x/s",
        |      housekeepingMode = { type = archiveCompaction,
        |        archiveCondition = "ingest_batch < 2",
        |        archiveExpression = "named_struct('ingest_batch', 'old')",
        |        streamingCheckpoint = "/tmp/x/cp" } }
        |}
        |actions {
        |  ing {
        |    type = customDataFrame
        |    inputIds = [b], outputIds = [n, s], recursiveInputIds = [s]
        |    saveMode = append
        |    dfsTransformers = [
        |      { type = incrementalDedup, batchInput = b, storeInput = s,
        |        idColumn = id, textColumn = t, allowRerun = true }
        |    ]
        |  }
        |}
        |""".stripMargin)
    val tr = reg.action("ing").asInstanceOf[CustomDataFrameAction]
      .dfsTransformers.head.asInstanceOf[IncrementalDedupTransformer]
    assert(tr.allowRerun, "allowRerun must parse")
    val ret = reg.dataObject("n").asInstanceOf[ParquetFileDataObject]
      .housekeepingMode.get.asInstanceOf[PartitionRetentionMode]
    assert(ret.streamingCheckpoint.contains("/tmp/x/cp") && ret.batchIdColumn == "mb")
    val arc = reg.dataObject("s").asInstanceOf[ParquetFileDataObject]
      .housekeepingMode.get.asInstanceOf[PartitionArchiveCompactionMode]
    assert(arc.streamingCheckpoint.contains("/tmp/x/cp") && arc.batchIdColumn == "ingest_batch")
  }

  test("OPH signing composes with the banded layout (parity with oph+compact)") {
    // the corpus-scale default candidate (oph) through the prunable
    // layout: signature VALUES differ from classic minhash but the
    // agreement estimator and band keys work identically (rotation
    // densification keeps bins filled) — decisions must match the
    // oph+compact path on planted batches
    implicit val ctx: ActionPipelineContext =
      ActionPipelineContext(spark, new InstanceRegistry)
    val b1 = docs((1L to 6L).map(i => (i, i)) :+ (7L, 1L))
    val b2 = docs(Seq((10L, 2L), (11L, 99L), (12L, 99L)))
    def novels(tr: IncrementalDedupTransformer): Set[Long] = {
      val r1 = tr.transform(Map("b" -> b1))
      val r2 = tr.transform(Map("b" -> b2, "store" -> r1("store")))
      (r1("b").select("doc_id").as[Long].collect() ++
        r2("b").select("doc_id").as[Long].collect()).toSet
    }
    val ophBanded = novels(IncrementalDedupTransformer("b", "store", "doc_id", "text",
      threshold = 0.8, signatureScheme = "oph", storeLayout = "banded"))
    val ophCompact = novels(IncrementalDedupTransformer("b", "store", "doc_id", "text",
      threshold = 0.8, signatureScheme = "oph"))
    assert(ophBanded == ophCompact && ophBanded == (1L to 6L).toSet + 11L)
  }

  test("banded store pins bands: a bands drift fails loudly from the sidecar") {
    // banded rows bake the band decomposition into the stored (band,
    // bucket) values — a drifted bands (valid divisor, same numHashes)
    // would silently never key-match; the compact layout bands per batch,
    // so bands stays a free knob there
    val dir = java.nio.file.Files.createTempDirectory("bandsdrift").toString
    val reg = registryFor(dir, storePartitions = true)
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    docs(Seq((1L, 1L))).write.mode("overwrite").parquet(s"$dir/batch")
    new ActionDAGRun(Seq(bandedAction(16))).run()
    val drifted = CustomDataFrameAction("inc", Seq("batch"), Seq("novel", "store"),
      dfsTransformers = Seq(IncrementalDedupTransformer("batch", "store", "doc_id", "text",
        threshold = 0.8, bands = 16, novelOutput = Some("novel"),
        storeLayout = "banded", storePartitions = 16)),
      saveMode = Some(SdlSaveMode.Append), recursiveInputIds = Seq("store"))
    val e = intercept[Exception] { new ActionDAGRun(Seq(drifted)).run() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(t => Option(t.getMessage).exists(m =>
      m.contains("bands=8") && m.contains("bands=16"))),
      s"expected a bands drift failure, got: $e")
  }

  test("construction guards: partitioning needs a single-blocking-key layout") {
    intercept[IllegalArgumentException] {
      IncrementalDedupTransformer("b", "s", "id", "text", storePartitions = 8)
    }
    // banded without partitioning is legal (slimmer store, estimator verify)
    IncrementalDedupTransformer("b", "s", "id", "text", storeLayout = "banded")
  }

  test("media pruned path blocks the delta exactly once per batch") {
    // r16 What's-wrong #1: the old shape ran the Manku block explode up to
    // three times per batch (prefix set, store join, intra pass). The
    // blocked frame is now computed once and threaded through — pinned by
    // the plan-construction counter (the text path's deltaBanded
    // discipline, mirrored via FromBlockedStore's deltaBlocked parameter).
    implicit val ctx: ActionPipelineContext =
      ActionPipelineContext(spark, new InstanceRegistry)
    def img(rows: Seq[(Long, Long)]): DataFrame =
      operators.Multimodal.withSynthImage(rows.toDF("media_id", "seed"), "seed", 16, 16)
    val t = IncrementalMediaDedupTransformer("b", "s", "media_id",
      modality = "image", maxHamming = 2, storePartitions = 16)
    val r1 = t.transform(Map("b" -> img((1L to 6L).map(i => (i, i)) :+ (7L, 1L))))
    assert(r1("b").select("media_id").as[Long].collect().toSet == (1L to 6L).toSet,
      "run 1: intra dup 7 dropped")
    Dedup.mankuBlockedCalls.reset()
    // run 2: 10 re-posts stored seed 2; 11 novel; 12 re-posts 11 intra
    val r2 = t.transform(Map("b" -> img(Seq((10L, 2L), (11L, 99L), (12L, 99L))),
      "s" -> r1("s")))
    assert(r2("b").select("media_id").as[Long].collect().toSet == Set(11L),
      "run 2 decisions unchanged by the block-once threading")
    assert(r2("s").select("id").distinct().as[Long].collect().toSet == Set(11L))
    assert(Dedup.mankuBlockedCalls.sum() == 1L,
      s"the delta must be blocked exactly once per batch, " +
        s"got ${Dedup.mankuBlockedCalls.sum()} plan constructions")
  }

  test("fused store+intra join: decisions identical to the split-pass contract") {
    // the within-batch pass now rides the SAME band join as the store
    // pass (corpus = store ∪ delta, tagged ids) — decisions must match
    // the split-pass contract exactly: exact copies, near copies and
    // store dups all land as before, heads keep the min id
    implicit val ctx: ActionPipelineContext =
      ActionPipelineContext(spark, new InstanceRegistry)
    // text: ids 2/5/9 exact re-posts of 1 (chain, min head 1); 3 a NEAR
    // copy of 1 (shares seed text plus a tail); 4 novel
    def doc(seed: Long): String = docs(Seq((0L, seed)))
      .select("text").as[String].collect().head
    val b1 = Seq((1L, doc(1)), (2L, doc(1)), (5L, doc(1)), (9L, doc(1)),
      (3L, doc(1) + " tail extra words here"), (4L, doc(42))).toDF("doc_id", "text")
    val t = IncrementalDedupTransformer("b", "s", "doc_id", "text", threshold = 0.5)
    val r1 = t.transform(Map("b" -> b1))
    assert(r1("b").select("doc_id").as[Long].collect().toSet == Set(1L, 4L),
      "exact copies AND the near copy collapse to the min-id head")
    assert(r1("s").select("id").as[Long].collect().toSet == Set(1L, 4L))
    // run 2: a store dup (re-post of head 1) plus an exact pair of a novel
    val b2 = Seq((20L, doc(1)), (21L, doc(77)), (22L, doc(77))).toDF("doc_id", "text")
    val r2 = t.transform(Map("b" -> b2, "s" -> r1("s")))
    assert(r2("b").select("doc_id").as[Long].collect().toSet == Set(21L))
    assert(r2("s").select("id").as[Long].collect().toSet == Set(21L))
  }
}
