package graft

import graft.core._
import graft.operators._
import graft.sources._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 store-discipline surface: video modality through HOCON config,
  * append-store compaction, and the declarative streaming action from
  * config — all on the append-only fingerprint-store contract. */
class IncrementalStoreSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val fs = 2048

  test("video modality wires through HOCON: frame-hash store, delta dedup, append growth") {
    val dir = java.nio.file.Files.createTempDirectory("incvideo").toString
    val cfg =
      s"""dataObjects {
         |  vbatch { type = parquet, path = "$dir/batch" }
         |  vnovel { type = parquet, path = "$dir/novel" }
         |  vstore { type = parquet, path = "$dir/store" }
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
         |        minSharedFrames = 2, novelOutput = vnovel }
         |    ]
         |  }
         |}
         |""".stripMargin
    val reg = ConfigParser.parse(cfg)
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val action = reg.action("ingest")

    def write(rows: Seq[(Long, Array[Byte])]): Unit =
      rows.toDF("media_id", "content").write.mode("overwrite").parquet(s"$dir/batch")

    // run 1: two distinct videos — bootstrap, both novel
    write(Seq((1L, Multimodal.Codecs.synthVideo(1L, 5, fs)),
              (2L, Multimodal.Codecs.synthVideo(2L, 5, fs))))
    new ActionDAGRun(Seq(action)).run()
    assert(spark.read.parquet(s"$dir/novel").count() == 2)
    assert(spark.read.parquet(s"$dir/store").columns.toSet == Set("id", "fh"))

    // run 2: id 3 re-posts video 1's frames (5 shared >= 2), id 4 novel
    write(Seq((3L, Multimodal.Codecs.synthVideo(1L, 5, fs)),
              (4L, Multimodal.Codecs.synthVideo(9L, 5, fs))))
    new ActionDAGRun(Seq(action)).run()
    assert(spark.read.parquet(s"$dir/novel").select("media_id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L))
    // store grew by the novel video's frame hashes only
    assert(spark.read.parquet(s"$dir/store").select("id").distinct().as[Long].collect().toSet ==
      Set(1L, 2L, 4L))
  }

  test("FileCompactionMode: append-store compaction preserves dedup results exactly") {
    val dir = java.nio.file.Files.createTempDirectory("inccompact").toString
    def registryWith(compaction: Boolean, sub: String): InstanceRegistry = {
      val reg = new InstanceRegistry
      reg.register(ParquetFileDataObject("batch", s"$dir/batch"))
      reg.register(ParquetFileDataObject("novel", s"$dir/$sub/novel"))
      reg.register(ParquetFileDataObject("store", s"$dir/$sub/store",
        housekeepingMode = if (compaction) Some(FileCompactionMode(minFiles = 2, targetNumFiles = 1))
                           else None))
      reg
    }
    def actionFor(reg: InstanceRegistry): Action = CustomDataFrameAction(
      "inc", Seq("batch"), Seq("novel", "store"),
      dfsTransformers = Seq(IncrementalMediaDedupTransformer("batch", "store", "media_id",
        modality = "image", maxHamming = 0, novelOutput = Some("novel"))),
      saveMode = Some(SdlSaveMode.Append), recursiveInputIds = Seq("store"))
    val regC = registryWith(compaction = true, "c")
    val regU = registryWith(compaction = false, "u")

    // three ingestion runs with cross-batch dups (seeds 10/11 re-posted)
    val batches = Seq(
      Seq((1L, 10L), (2L, 11L)),
      Seq((3L, 10L), (4L, 99L)),
      Seq((5L, 11L), (6L, 99L), (7L, 77L)))   // 6 dups 99 (batch-2 novel), 7 novel
    batches.foreach { rows =>
      Multimodal.withSynthImage(rows.toDF("media_id", "seed"), "seed", 16, 16)
        .write.mode("overwrite").parquet(s"$dir/batch")
      new ActionDAGRun(Seq(actionFor(regC))).run()(ActionPipelineContext(spark, regC))
      new ActionDAGRun(Seq(actionFor(regU))).run()(ActionPipelineContext(spark, regU))
    }

    def novels(sub: String) = spark.read.parquet(s"$dir/$sub/novel")
      .select("media_id").as[Long].collect().toSet
    def store(sub: String) = spark.read.parquet(s"$dir/$sub/store")
      .select("id", "dhash64").as[(Long, Long)].collect().toSet
    // compaction must not change a single dedup decision or store row
    assert(novels("c") == Set(1L, 2L, 4L, 7L), s"got ${novels("c")}")
    assert(novels("c") == novels("u"))
    assert(store("c") == store("u"))
    // and it actually compacted: the uncompacted store holds one file set
    // per batch, the compacted one collapsed below that
    def dataFiles(sub: String) = new java.io.File(s"$dir/$sub/store").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(dataFiles("u") >= 3, s"uncompacted store should accumulate files, got ${dataFiles("u")}")
    assert(dataFiles("c") < dataFiles("u"),
      s"compaction should shrink the file count: c=${dataFiles("c")} u=${dataFiles("u")}")
  }

  test("embedding modality wires through HOCON: vector store, cosine-verified delta dedup") {
    val dir = java.nio.file.Files.createTempDirectory("incemb").toString
    val cfg =
      s"""dataObjects {
         |  ebatch { type = parquet, path = "$dir/batch" }
         |  enovel { type = parquet, path = "$dir/novel" }
         |  estore { type = parquet, path = "$dir/store" }
         |}
         |actions {
         |  ingest {
         |    type = customDataFrame
         |    inputIds = [ebatch]
         |    outputIds = [enovel, estore]
         |    recursiveInputIds = [estore]
         |    saveMode = append
         |    dfsTransformers = [
         |      { type = incrementalEmbeddingDedup, batchInput = ebatch, storeInput = estore,
         |        idColumn = vec_id, embColumn = emb, dim = 4, threshold = 0.95,
         |        novelOutput = enovel }
         |    ]
         |  }
         |}
         |""".stripMargin
    val reg = ConfigParser.parse(cfg)
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val action = reg.action("ingest")
    def write(rows: Seq[(Long, Array[Float])]): Unit =
      rows.toDF("vec_id", "emb").write.mode("overwrite").parquet(s"$dir/batch")

    // run 1: two orthogonal vectors — bootstrap, both novel
    write(Seq((1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f))))
    new ActionDAGRun(Seq(action)).run()
    assert(spark.read.parquet(s"$dir/novel").count() == 2)
    assert(spark.read.parquet(s"$dir/store").columns.toSet == Set("id", "emb", "bucket"))

    // run 2: ids 3/4 = exact copies of stored vectors 1/2 (identical
    // vector → identical bucket → structural recall, cosine 1 → dropped;
    // a NEAR-copy would make recall depend on whether one of the 16 fixed
    // hyperplanes happens to split the pair — not a deterministic spec),
    // id 5 orthogonal to everything (novel)
    write(Seq(
      (3L, Array(1f, 0f, 0f, 0f)),
      (4L, Array(0f, 1f, 0f, 0f)),
      (5L, Array(0f, 0f, 1f, 0f))))
    new ActionDAGRun(Seq(action)).run()
    assert(spark.read.parquet(s"$dir/novel").select("vec_id").as[Long].collect().toSet ==
      Set(1L, 2L, 5L))
    assert(spark.read.parquet(s"$dir/store").select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 5L))
  }

  test("intra-batch dedup: within-batch duplicates keep the min-id head; only the head's signature is appended") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("incintra").toString
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
    val other = "different content about engines and queries and joins " * 5
    val reg = new InstanceRegistry
    reg.register(ParquetFileDataObject("batch", s"$dir/batch"))
    reg.register(ParquetFileDataObject("novel", s"$dir/novel"))
    reg.register(ParquetFileDataObject("store", s"$dir/store"))
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val action = CustomDataFrameAction("inc", Seq("batch"), Seq("novel", "store"),
      Seq(IncrementalDedupTransformer("batch", "store", "doc_id", "text",
        threshold = 0.5, bands = 16, novelOutput = Some("novel"))),
      saveMode = Some(SdlSaveMode.Append), recursiveInputIds = Seq("store"))
    // run 1 (bootstrap) bursts a duplicate INSIDE the batch: ids 1 and 7
    // carry the same text — only the head (1) may survive or be stored
    Seq((7L, base), (1L, base), (2L, other))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/batch")
    new ActionDAGRun(Seq(action)).run()
    assert(spark.read.parquet(s"$dir/novel").select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L))
    assert(spark.read.parquet(s"$dir/store").select("id").as[Long].collect().toSet ==
      Set(1L, 2L), "only the min-id head's signature may enter the store")
    // run 2: an intra-dup pair of a NOVEL text (ids 10/11 — head 10) plus
    // a store dup (id 12 re-posts run 1's base via the HEAD's store row)
    Seq((11L, "novel deep sea exploration and marine biology notes " * 5),
        (10L, "novel deep sea exploration and marine biology notes " * 5),
        (12L, base))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/batch")
    new ActionDAGRun(Seq(action)).run()
    assert(spark.read.parquet(s"$dir/novel").select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 10L))
    assert(spark.read.parquet(s"$dir/store").select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 10L), "store grows by the head signature only")

    // intraBatch = false restores the store-only contract: both copies of
    // a within-batch pair pass (neither is stored yet)
    val off = IncrementalDedupTransformer("b", "s", "doc_id", "text",
      threshold = 0.5, bands = 16, intraBatch = false)
    val out = off.transform(Map("b" ->
      Seq((20L, base + " offmode"), (21L, base + " offmode")).toDF("doc_id", "text")))
    assert(out("b").select("doc_id").as[Long].collect().toSet == Set(20L, 21L))
  }

  test("OPH signature scheme: incremental text dedup end-to-end; width-mismatched store fails loudly") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("incoph").toString
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
    val reg = new InstanceRegistry
    reg.register(ParquetFileDataObject("batch", s"$dir/batch"))
    reg.register(ParquetFileDataObject("novel", s"$dir/novel"))
    reg.register(ParquetFileDataObject("store", s"$dir/store"))
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val action = CustomDataFrameAction("inc", Seq("batch"), Seq("novel", "store"),
      Seq(IncrementalDedupTransformer("batch", "store", "doc_id", "text",
        threshold = 0.5, bands = 16, novelOutput = Some("novel"),
        signatureScheme = "oph")),
      saveMode = Some(SdlSaveMode.Append), recursiveInputIds = Seq("store"))
    Seq((1L, base), (2L, "different content about engines and queries " * 5))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/batch")
    new ActionDAGRun(Seq(action)).run()
    Seq((3L, base + " second crawl tail"),
        (4L, "novel text about deep sea exploration and marine biology " * 5))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/batch")
    new ActionDAGRun(Seq(action)).run()
    assert(spark.read.parquet(s"$dir/novel").select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L))
    assert(spark.read.parquet(s"$dir/store").select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L))

    // width guard: a transformer signing at a different numHashes against
    // this store must fail LOUDLY (silently-never-matching deltas are the
    // worst dedup failure mode)
    val wrong = CustomDataFrameAction("inc2", Seq("batch"), Seq("novel", "store"),
      Seq(IncrementalDedupTransformer("batch", "store", "doc_id", "text",
        numHashes = 64, bands = 16, novelOutput = Some("novel"))),
      saveMode = Some(SdlSaveMode.Append), recursiveInputIds = Seq("store"))
    val e = intercept[IllegalArgumentException] {
      wrong.exec(Seq(SubFeed("batch",
        Some(spark.read.parquet(s"$dir/batch")))))
    }
    assert(e.getMessage.contains("never match"))
  }

  test("store meta sidecar: a SAME-WIDTH scheme swap fails loudly (undetectable from data)") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("incmeta").toString
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
    val reg = new InstanceRegistry
    reg.register(ParquetFileDataObject("batch", s"$dir/batch"))
    reg.register(ParquetFileDataObject("novel", s"$dir/novel"))
    reg.register(ParquetFileDataObject("store", s"$dir/store"))
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val action = CustomDataFrameAction("inc", Seq("batch"), Seq("novel", "store"),
      Seq(IncrementalDedupTransformer("batch", "store", "doc_id", "text",
        threshold = 0.5, bands = 16, novelOutput = Some("novel"),
        signatureScheme = "minhash")),
      saveMode = Some(SdlSaveMode.Append), recursiveInputIds = Seq("store"))
    Seq((1L, base)).toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/batch")
    new ActionDAGRun(Seq(action)).run()
    // bootstrap persisted the signing parameters next to the store data
    assert(new java.io.File(s"$dir/store/.schema/storeMeta.json").exists,
      "bootstrap must write the store meta sidecar")
    // signing parameters pinned exactly; the lastBatch*/recentBatch* keys
    // are the rerun guard's state (written at the staged append's commit
    // point), not signing parameters
    assert(graft.sources.StoreMeta.read(s"$dir/store").get
      .filterNot(_._1.startsWith("lastBatch"))
      .filterNot(_._1 == "recentBatchFingerprints") ==
      Map("scheme" -> "minhash", "numHashes" -> "32", "shingleSize" -> "5",
        "storeLayout" -> "compact", "storePartitions" -> "0"))
    assert(graft.sources.StoreMeta.read(s"$dir/store").get.contains("lastBatchChecksum"),
      "the committed append must record the applied batch's fingerprint")

    // minhash → oph at the SAME numHashes: signature VALUES are
    // indistinguishable from data (the old limit(1) width probe passes),
    // but deltas would silently never match — the sidecar catches it
    val swapped = CustomDataFrameAction("inc2", Seq("batch"), Seq("novel", "store"),
      Seq(IncrementalDedupTransformer("batch", "store", "doc_id", "text",
        threshold = 0.5, bands = 16, novelOutput = Some("novel"),
        signatureScheme = "oph")),
      saveMode = Some(SdlSaveMode.Append), recursiveInputIds = Seq("store"))
    val e = intercept[IllegalArgumentException] {
      swapped.exec(Seq(SubFeed("batch", Some(spark.read.parquet(s"$dir/batch")))))
    }
    assert(e.getMessage.contains("scheme=minhash") && e.getMessage.contains("never match"),
      s"got: ${e.getMessage}")

    // a pre-sidecar (legacy) store still gets the data-level width probe
    // once, then upgrades to a sidecar
    assert(new java.io.File(s"$dir/store/.schema/storeMeta.json").delete())
    val wrongWidth = CustomDataFrameAction("inc3", Seq("batch"), Seq("novel", "store"),
      Seq(IncrementalDedupTransformer("batch", "store", "doc_id", "text",
        numHashes = 64, bands = 16, novelOutput = Some("novel"))),
      saveMode = Some(SdlSaveMode.Append), recursiveInputIds = Seq("store"))
    val e2 = intercept[IllegalArgumentException] {
      wrongWidth.exec(Seq(SubFeed("batch", Some(spark.read.parquet(s"$dir/batch")))))
    }
    assert(e2.getMessage.contains("32-hash"))
  }

  test("hidden partition-name guard: '_'-prefixed partition columns fail loudly, not silently") {
    // '_'/'.'-prefixed dirs are invisible to Spark's file listing — a
    // partition column named '_x' would write data every read silently
    // skips (the exact trap the streaming action's first cut hit)
    val dir = java.nio.file.Files.createTempDirectory("hiddenpart").toString
    val reg = new InstanceRegistry
    reg.register(ParquetFileDataObject("bad", s"$dir/bad", partitions = Seq("_x")))
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val obj = reg.dataObject("bad").asInstanceOf[ParquetFileDataObject]
    val e = intercept[IllegalArgumentException] {
      obj.writeDataFrame(Seq((1L, "a")).toDF("id", "_x"))
    }
    assert(e.getMessage.contains("hidden"))
    intercept[IllegalArgumentException] { obj.getDataFrame() }
    // the streaming action rejects a hidden batchIdColumn at construction
    intercept[IllegalArgumentException] {
      StreamingIncrementalDedupAction("s",
        IncrementalMediaDedupTransformer("a", "b", "id", novelOutput = Some("c")),
        graft.operators.modes.SparkStreamingMode(checkpointLocation = s"$dir/cp"),
        batchIdColumn = "_b")
    }
  }

  test("staged-append protocol: interleaved appender fails loudly; crash reclaim completes committed moves, discards uncommitted") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("stageproto").toString
    val reg = new InstanceRegistry
    reg.register(ParquetFileDataObject("t", s"$dir/t"))
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val obj = reg.dataObject("t").asInstanceOf[ParquetFileDataObject]
    def ids(): Set[Long] =
      spark.read.parquet(s"$dir/t").select("id").as[Long].collect().toSet

    obj.writeDataFrameStagedAppend(Seq(1L).toDF("id"))
    assert(ids() == Set(1L))

    // INTERLEAVED APPENDERS: a fresh staging dir (appender A mid-flight)
    // makes appender B fail loudly — B must not delete A's staging (that
    // silently commits a partial delta) and must not proceed
    val inflight = new java.io.File(s"$dir/t_graft_staging_append_inflt")
    assert(inflight.mkdirs())
    val e = intercept[IllegalStateException] {
      obj.writeDataFrameStagedAppend(Seq(2L).toDF("id"))
    }
    assert(e.getMessage.contains("concurrent appender"), s"got: ${e.getMessage}")
    assert(ids() == Set(1L), "the losing appender must not modify the store")
    assert(inflight.exists, "the winner's staging dir must be left untouched")

    // CRASHED UNCOMMITTED append (no commit marker), aged past the
    // guard: nothing was moved (the marker is ordered after the staged
    // write) — reclaimed by deletion, then the new append proceeds
    assert(inflight.setLastModified(System.currentTimeMillis() - 2 * 3600 * 1000L))
    obj.writeDataFrameStagedAppend(Seq(2L).toDF("id"))
    assert(ids() == Set(1L, 2L))
    assert(!inflight.exists, "aged uncommitted staging must be reclaimed")

    // CRASHED COMMITTED append (marker present, moves incomplete), aged:
    // recovery COMPLETES the moves — the increment's rows reach the store
    // instead of being destroyed with the staging dir (the r15 shape
    // deleted leftover staging, permanently committing partial deltas)
    val crashed = new java.io.File(s"$dir/t_graft_staging_append_crash")
    assert(crashed.mkdirs())
    Seq(3L).toDF("id").coalesce(1).write.parquet(s"$dir/stage3")
    val part = new java.io.File(s"$dir/stage3").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(crashed.getPath, part.getName))
    assert(new java.io.File(crashed, "_graft_commit_ready").createNewFile())
    assert(crashed.setLastModified(System.currentTimeMillis() - 2 * 3600 * 1000L))
    obj.writeDataFrameStagedAppend(Seq(4L).toDF("id"))
    assert(ids() == Set(1L, 2L, 3L, 4L),
      "recovery must complete the committed increment's moves (row 3) and append row 4")
    assert(!crashed.exists)
  }

  test("partitioned staged append: increment's partition dirs merge in, existing files untouched") {
    val dir = java.nio.file.Files.createTempDirectory("partappend").toString
    val reg = new InstanceRegistry
    reg.register(ParquetFileDataObject("t", s"$dir/t", partitions = Seq("part")))
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val obj = reg.dataObject("t").asInstanceOf[ParquetFileDataObject]
    obj.writeDataFrame(Seq((1L, "p1"), (2L, "p2")).toDF("id", "part"))
    def files(): Set[String] = {
      def walk(f: java.io.File): Seq[String] =
        if (f.isDirectory) Option(f.listFiles()).map(_.toSeq.flatMap(walk)).getOrElse(Seq.empty)
        else if (f.getName.endsWith(".parquet")) Seq(f.getPath) else Seq.empty
      walk(new java.io.File(s"$dir/t")).toSet
    }
    val before = files()
    // increment touches an existing partition AND a new one
    obj.writeDataFrameStagedAppend(Seq((3L, "p2"), (4L, "p3")).toDF("id", "part"))
    assert(before.subsetOf(files()), "staged append must not rewrite existing files")
    assert(spark.read.parquet(s"$dir/t").select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L))
    assert(new java.io.File(s"$dir/t/part=p3").isDirectory)
  }

  test("streaming action is transformer-agnostic: embedding modality through micro-batches") {
    val tmp = java.nio.file.Files.createTempDirectory("sidemb").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$tmp/src"))
    def addFile(rows: Seq[(Long, Array[Float])], name: String, mtime: Long): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("sidembstage").toString
      rows.toDF("vec_id", "emb").coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(s"$tmp/src/$name"))
      assert(new java.io.File(s"$tmp/src/$name").setLastModified(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    addFile(Seq((1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f))), "b1.parquet", t0)
    // batch 2: id 3 re-posts vector 1 exactly (store dup), id 4 novel
    addFile(Seq((3L, Array(1f, 0f, 0f, 0f)), (4L, Array(0f, 0f, 1f, 0f))), "b2.parquet", t0 + 2000)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("emb", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false))))
    val reg = new InstanceRegistry
    reg.register(ParquetFileDataObject("vin", s"$tmp/src", schema = Some(schema)))
    reg.register(ParquetFileDataObject("vnovel2", s"$tmp/out", partitions = Seq("ingest_batch")))
    reg.register(ParquetFileDataObject("vstore2", s"$tmp/store", partitions = Seq("ingest_batch")))
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val action = StreamingIncrementalDedupAction("vingest",
      IncrementalEmbeddingDedupTransformer("vin", "vstore2", "vec_id", "emb",
        dim = 4, novelOutput = Some("vnovel2")),
      graft.operators.modes.SparkStreamingMode(checkpointLocation = s"$tmp/cp",
        triggerType = "AvailableNow", inputOptions = Map("maxFilesPerTrigger" -> "1")))
    new ActionDAGRun(Seq(action)).run()
    assert(spark.read.parquet(s"$tmp/out").select("vec_id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L))
    assert(spark.read.parquet(s"$tmp/store").select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L))
  }

  test("StreamingIncrementalDedupAction wires from HOCON and runs micro-batches") {
    val tmp = java.nio.file.Files.createTempDirectory("sidhocon").toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$tmp/src"))
    def addFile(rows: Seq[(Long, Long)], name: String, mtime: Long): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("sidhstage").toString
      Multimodal.withSynthImage(rows.toDF("media_id", "seed"), "seed", 16, 16)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(s"$tmp/src/$name"))
      assert(new java.io.File(s"$tmp/src/$name").setLastModified(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    addFile(Seq((1L, 10L), (2L, 11L)), "b1.parquet", t0)
    addFile(Seq((3L, 10L), (4L, 99L)), "b2.parquet", t0 + 2000)
    val cfg =
      s"""dataObjects {
         |  media_in    { type = parquet, path = "$tmp/src",
         |                schema = "media_id long, seed long, content binary" }
         |  media_novel { type = parquet, path = "$tmp/out",   partitions = [ingest_batch] }
         |  media_store { type = parquet, path = "$tmp/store", partitions = [ingest_batch] }
         |}
         |actions {
         |  ingest {
         |    type = streamingIncrementalDedup
         |    transformer = { type = incrementalMediaDedup, batchInput = media_in,
         |                    storeInput = media_store, idColumn = media_id,
         |                    modality = image, maxHamming = 0, novelOutput = media_novel }
         |    mode = { type = streaming, checkpointLocation = "$tmp/cp",
         |             triggerType = AvailableNow,
         |             inputOptions = { maxFilesPerTrigger = "1" } }
         |  }
         |}
         |""".stripMargin
    val reg = ConfigParser.parse(cfg)
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    new ActionDAGRun(Seq(reg.action("ingest"))).run()
    assert(spark.read.parquet(s"$tmp/out").select("media_id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L))
    // two micro-batches, each its own store partition of novel fingerprints
    assert(spark.read.parquet(s"$tmp/store").select("id", "ingest_batch")
      .as[(Long, Long)].collect().toSet == Set((1L, 0L), (2L, 0L), (4L, 1L)))
  }
}
