package graft

import graft.core._
import graft.operators._
import graft.sources._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** End-to-end pipeline DAG tests (reference `workflow/ActionDAGTest.scala`). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  def tmpDir(): String = Files.createTempDirectory("graft-test").toString

  def newCtx(reg: InstanceRegistry = new InstanceRegistry()) =
    ActionPipelineContext(spark, reg)

  test("OverwritePreserveDirectories keeps the directory tree; plain overwrite does not") {
    val dir = tmpDir() + "/tgt"
    implicit val ctx: ActionPipelineContext = newCtx()
    val dst = ParquetFileDataObject("pres", dir, partitions = Seq("dt"))
    val df = Seq((1, "a"), (2, "b")).toDF("x", "dt")
    dst.writeDataFrame(df, Seq.empty, Some(SdlSaveMode.Overwrite))
    // stand-in for a partition dir carrying ACLs/ownership set out-of-band
    val aclDir = new java.io.File(dir, "custom_acl_dir")
    assert(aclDir.mkdir())
    dst.writeDataFrame(df.withColumn("x", col("x") * 10), Seq.empty,
      Some(SdlSaveMode.OverwritePreserveDirectories))
    assert(aclDir.exists, "preserve-directories overwrite deleted a sibling directory")
    assert(new java.io.File(dir, "dt=a").exists, "partition dir not preserved")
    assert(dst.getDataFrame().select("x").as[Int].collect().toSet == Set(10, 20),
      "data not fully overwritten")
    dst.writeDataFrame(df, Seq.empty, Some(SdlSaveMode.Overwrite))
    assert(!aclDir.exists, "plain overwrite is expected to drop the tree (contrast case)")
  }

  test("copy pipeline: csv → filter+sql transform → parquet, DAG 2 actions") {
    val dir = tmpDir()
    Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("id", "name", "value")
      .write.option("header", "true").csv(s"$dir/src")

    val reg = new InstanceRegistry()
    reg.register(CsvFileDataObject("src", s"$dir/src"))
    reg.register(ParquetFileDataObject("stage", s"$dir/stage"))
    reg.register(ParquetFileDataObject("mart", s"$dir/mart"))
    reg.register(CopyAction("copy_stage", "src", "stage",
      transformers = Seq(FilterTransformer("value > 15"))))
    reg.register(CopyAction("copy_mart", "stage", "mart",
      transformers = Seq(SQLDfTransformer("SELECT id, value * 2 AS value2 FROM %{inputViewName}"))))

    implicit val ctx: ActionPipelineContext = newCtx(reg)
    val dag = ActionDAGRun.fromRegistry(reg, parallelism = 2)
    assert(dag.layers.map(_.map(_.id)) == Seq(Seq("copy_stage"), Seq("copy_mart")))
    val results = dag.run()

    val mart = spark.read.parquet(s"$dir/mart").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(mart.toSeq == Seq((2, 40.0), (3, 60.0)))
    assert(results("copy_mart").head.metrics.exists(_.recordsWritten == 2))
  }

  test("partitioned write + PartitionDiffMode processes only new partitions") {
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("in", s"$dir/in", partitions = Seq("dt")))
    reg.register(ParquetFileDataObject("out", s"$dir/out", partitions = Seq("dt")))
    reg.register(CopyAction("cp", "in", "out",
      executionMode = Some(graft.operators.modes.PartitionDiffMode()),
      saveMode = Some(SdlSaveMode.OverwriteOptimized)))
    implicit val ctx: ActionPipelineContext = newCtx(reg)

    Seq((1, "2024-01-01"), (2, "2024-01-02")).toDF("v", "dt")
      .write.partitionBy("dt").parquet(s"$dir/in")
    new ActionDAGRun(Seq(reg.action("cp"))).run()
    assert(spark.read.parquet(s"$dir/out").count() == 2)

    // add one new partition; only it should be copied (out gets 3 rows, not rewritten)
    Seq((3, "2024-01-03")).toDF("v", "dt")
      .write.mode("append").partitionBy("dt").parquet(s"$dir/in")
    new ActionDAGRun(Seq(reg.action("cp"))).run()
    assert(spark.read.parquet(s"$dir/out").count() == 3)

    // third run: no new partitions → action skipped, output unchanged
    val res3 = new ActionDAGRun(Seq(reg.action("cp"))).run()
    assert(res3("cp").head.isSkipped)
    assert(spark.read.parquet(s"$dir/out").count() == 3)
  }

  test("PartitionDiffMode: coarser output partitioning diffs on the common columns; disjoint fails loudly") {
    import graft.operators.modes.PartitionDiffMode
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("in2", s"$dir/in", partitions = Seq("dt", "hour")))
    reg.register(ParquetFileDataObject("out2", s"$dir/out", partitions = Seq("dt")))
    reg.register(CopyAction("cp2", "in2", "out2",
      executionMode = Some(PartitionDiffMode()),
      saveMode = Some(SdlSaveMode.OverwriteOptimized)))
    implicit val ctx: ActionPipelineContext = newCtx(reg)
    Seq((1, "d1", "00"), (2, "d1", "01"), (3, "d2", "00")).toDF("v", "dt", "hour")
      .write.partitionBy("dt", "hour").parquet(s"$dir/in")
    new ActionDAGRun(Seq(reg.action("cp2"))).run()
    assert(spark.read.parquet(s"$dir/out").count() == 3)
    // re-run: every dt exists at the output → nothing to do, NOT an
    // every-run full reprocess (the diff keys on the common column dt)
    val res2 = new ActionDAGRun(Seq(reg.action("cp2"))).run()
    assert(res2("cp2").head.isSkipped, "coarser-output diff must match on common columns")
    // a new hour under an EXISTING dt is considered processed (dt granularity)
    Seq((4, "d1", "02")).toDF("v", "dt", "hour")
      .write.mode("append").partitionBy("dt", "hour").parquet(s"$dir/in")
    val res3 = new ActionDAGRun(Seq(reg.action("cp2"))).run()
    assert(res3("cp2").head.isSkipped)
    // disjoint layouts can never match → loud config error, not silent reprocessing
    reg.register(ParquetFileDataObject("outx", s"$dir/outx", partitions = Seq("region")))
    reg.register(CopyAction("cpx", "in2", "outx",
      executionMode = Some(PartitionDiffMode()), saveMode = Some(SdlSaveMode.OverwriteOptimized)))
    val e = intercept[Exception](new ActionDAGRun(Seq(reg.action("cpx"))).run())
    assert(e.getMessage != null && e.getMessage.contains("share no"), s"got: ${e.getMessage}")
  }

  test("DataFrameIncrementalMode: first run into a FRESH versioned-table output works") {
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("isrc", s"$dir/in"))
    reg.register(VersionedTableDataObject("ivt", s"$dir/t", primaryKey = Seq("k")))
    reg.register(CopyAction("inc", "isrc", "ivt",
      executionMode = Some(graft.operators.modes.DataFrameIncrementalMode("k")),
      saveMode = Some(SdlSaveMode.Append)))
    implicit val ctx: ActionPipelineContext = newCtx(reg)
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.parquet(s"$dir/in")
    // empty log must mean "no watermark yet", not a crash
    new ActionDAGRun(Seq(reg.action("inc"))).run()
    val vt = reg.dataObject("ivt").asInstanceOf[VersionedTableDataObject]
    assert(vt.getDataFrame().count() == 2)
    // second run: watermark from the table filters everything → skip
    val res = new ActionDAGRun(Seq(reg.action("inc"))).run()
    assert(res("inc").head.isSkipped)
    // third: one new row above the watermark
    Seq((3, "c")).toDF("k", "v").write.mode("append").parquet(s"$dir/in")
    new ActionDAGRun(Seq(reg.action("inc"))).run()
    assert(vt.getDataFrame().count() == 3)
  }

  test("failed exec releases the mod-time read bound on the shared input") {
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("fsrc", s"$dir/in"))
    // output whose write always fails AFTER the mode installed its bound
    case class FailingSink(id: String) extends DataObject with CanWriteDataFrame {
      override def writeDataFrame(df: org.apache.spark.sql.DataFrame, pvs: Seq[PartitionValues],
                                  saveMode: Option[SdlSaveMode])
                                 (implicit ctx: ActionPipelineContext): ActionMetrics =
        throw new RuntimeException("sink down")
    }
    reg.register(FailingSink("fdst"))
    reg.register(CopyAction("fcp", "fsrc", "fdst",
      executionMode = Some(graft.operators.modes.DataObjectStateIncrementalMode())))
    implicit val ctx: ActionPipelineContext = newCtx(reg)
    Seq((1, "a")).toDF("k", "v").write.parquet(s"$dir/in")
    intercept[Exception](new ActionDAGRun(Seq(reg.action("fcp"))).run())
    // the bound must NOT leak: a file landing after the failed run is
    // visible to the next direct read of the shared DataObject
    Thread.sleep(5)
    Seq((2, "b")).toDF("k", "v").write.mode("append").parquet(s"$dir/in")
    val src = reg.dataObject("fsrc").asInstanceOf[ParquetFileDataObject]
    assert(src.getDataFrame().count() == 2, "stale readUpperBound leaked from the failed run")
  }

  test("PartitionDiffMode condition/selection knobs (reference parity)") {
    import graft.operators.modes.PartitionDiffMode
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("pin", s"$dir/in", partitions = Seq("dt")))
    reg.register(ParquetFileDataObject("pout", s"$dir/out", partitions = Seq("dt")))
    implicit val ctx: ActionPipelineContext = newCtx(reg)
    Seq((1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-03")).toDF("v", "dt")
      .write.partitionBy("dt").parquet(s"$dir/in")

    // selectExpression: newest missing partition only
    val sel = CopyAction("psel", "pin", "pout",
      executionMode = Some(PartitionDiffMode(
        selectExpression = Some("slice(selectedPartitionValues, -1, 1)"))),
      saveMode = Some(SdlSaveMode.OverwriteOptimized))
    val fed = sel.executionMode.get.apply(sel, SubFeed("pin"))
    assert(fed.partitionValues.map(_.elements("dt")) == Seq("2024-01-03"))

    // default apply rule: explicitly given partition values WIN over the diff
    val plain = CopyAction("pgiven", "pin", "pout",
      executionMode = Some(PartitionDiffMode()))
    val givenPv = Seq(PartitionValues(Map("dt" -> "2024-01-02")))
    assert(plain.executionMode.get.apply(plain,
      SubFeed("pin", partitionValues = givenPv)).partitionValues == givenPv)

    // failCondition: too many missing partitions aborts loudly
    val guard = CopyAction("pguard", "pin", "pout",
      executionMode = Some(PartitionDiffMode(
        failCondition = Some("size(selectedPartitionValues) > 2"))))
    val e = intercept[IllegalStateException](
      guard.executionMode.get.apply(guard, SubFeed("pin")))
    assert(e.getMessage.contains("failCondition"))

    // applyCondition overrides the default rule
    val always = CopyAction("palways", "pin", "pout",
      executionMode = Some(PartitionDiffMode(applyCondition = Some("true"))))
    assert(always.executionMode.get.apply(always,
      SubFeed("pin", partitionValues = givenPv)).partitionValues.size == 3)
  }

  test("DeduplicateAction across two loads via parquet output") {
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("feed", s"$dir/feed"))
    reg.register(ParquetFileDataObject("dedup", s"$dir/dedup"))
    val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = Timestamp.valueOf("2024-01-02 00:00:00")
    implicit val ctx: ActionPipelineContext = newCtx(reg)

    Seq((1, "a"), (2, "b")).toDF("id", "name").write.parquet(s"$dir/feed")
    new ActionDAGRun(Seq(DeduplicateAction("dd", "feed", "dedup", Seq("id"),
      referenceTimestamp = () => t1))).run()

    Seq((2, "b2"), (3, "c")).toDF("id", "name").write.mode("overwrite").parquet(s"$dir/feed")
    new ActionDAGRun(Seq(DeduplicateAction("dd", "feed", "dedup", Seq("id"),
      referenceTimestamp = () => t2))).run()

    val got = spark.read.parquet(s"$dir/dedup")
      .select("id", "name", "dl_ts_captured").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2))).toSet
    assert(got == Set((1, "a", t1), (2, "b2", t2), (3, "c", t2)))
  }

  test("DeduplicateAction evolves schema across loads: added column null-filled, dropped column kept") {
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("feed", s"$dir/feed"))
    reg.register(ParquetFileDataObject("dedup", s"$dir/dedup"))
    val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = Timestamp.valueOf("2024-01-02 00:00:00")
    implicit val ctx: ActionPipelineContext = newCtx(reg)

    Seq((1, "a", 1.0), (2, "b", 2.0)).toDF("id", "name", "score")
      .write.parquet(s"$dir/feed")
    new ActionDAGRun(Seq(DeduplicateAction("dd", "feed", "dedup", Seq("id"),
      referenceTimestamp = () => t1))).run()

    // second load drops `score` and adds `lang` — previously failed with a
    // missing-column error instead of evolving like the reference
    Seq((2, "b2", "en"), (3, "c", "de")).toDF("id", "name", "lang")
      .write.mode("overwrite").parquet(s"$dir/feed")
    new ActionDAGRun(Seq(DeduplicateAction("dd", "feed", "dedup", Seq("id"),
      referenceTimestamp = () => t2))).run()

    val got = spark.read.parquet(s"$dir/dedup")
      .select("id", "name", "score", "lang").collect()
      .map(r => (r.getInt(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), Option(r.getString(3)))).toSet
    assert(got == Set(
      (1, "a", Some(1.0), None),      // untouched row keeps score, lang null
      (2, "b2", None, Some("en")),    // updated row: new schema, score null
      (3, "c", None, Some("de"))))
  }

  test("HistorizeAction full across two loads via parquet output") {
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("feed", s"$dir/feed"))
    reg.register(ParquetFileDataObject("hist", s"$dir/hist"))
    val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = Timestamp.valueOf("2024-01-02 00:00:00")
    implicit val ctx: ActionPipelineContext = newCtx(reg)

    Seq((1, "a"), (2, "b")).toDF("id", "name").write.parquet(s"$dir/feed")
    new ActionDAGRun(Seq(HistorizeAction("h", "feed", "hist", Seq("id"),
      referenceTimestamp = () => t1))).run()

    Seq((1, "a"), (2, "b2")).toDF("id", "name").write.mode("overwrite").parquet(s"$dir/feed")
    new ActionDAGRun(Seq(HistorizeAction("h", "feed", "hist", Seq("id"),
      referenceTimestamp = () => t2))).run()

    val got = spark.read.parquet(s"$dir/hist")
      .select("id", "name", "dl_ts_captured", "dl_ts_delimited").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(got == Set(
      (1, "a", t1, Historization.doomsday),
      (2, "b", t1, new Timestamp(t2.getTime - 1)),
      (2, "b2", t2, Historization.doomsday)))
  }

  test("HistorizeAction CDC across two loads: op column never drifts into history; pure delete closes") {
    // regression: the CDC feed always carries the op column, which is absent
    // from the stored history — evolveForState used to fire and null-fill an
    // `op` column into the history, making mergeCdc's select throw on every
    // run after the first; a load-2 feed with ONLY a delete for a key also
    // failed to close that key's open record
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("cdcfeed", s"$dir/feed"))
    reg.register(ParquetFileDataObject("cdchist", s"$dir/hist"))
    val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = Timestamp.valueOf("2024-01-02 00:00:00")
    implicit val ctx: ActionPipelineContext = newCtx(reg)
    val action = HistorizeAction("h", "cdcfeed", "cdchist", Seq("id"),
      cdcOptions = Some(CdcOptions(timestampColumn = "ts", operationColumn = "op")))

    Seq((1, "a", t1, "i"), (2, "b", t1, "i")).toDF("id", "name", "ts", "op")
      .write.parquet(s"$dir/feed")
    new ActionDAGRun(Seq(action)).run()

    // load 2: update key 2, PURE delete of key 1 (no other change for it)
    Seq((2, "b2", t2, "u"), (1, "a", t2, "d")).toDF("id", "name", "ts", "op")
      .write.mode("overwrite").parquet(s"$dir/feed")
    new ActionDAGRun(Seq(action)).run()

    val hist = spark.read.parquet(s"$dir/hist")
    assert(!hist.columns.contains("op"), "op column must never reach the stored history")
    val got = hist.select("id", "name", "dl_ts_captured", "dl_ts_delimited").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(got == Set(
      (1, "a", t1, new Timestamp(t2.getTime - 1)),   // closed by the pure delete
      (2, "b", t1, new Timestamp(t2.getTime - 1)),   // closed by the update
      (2, "b2", t2, Historization.doomsday)))        // new open version
  }

  test("CustomDataFrameAction N:M with SQLDfsTransformer") {
    val dir = tmpDir()
    val reg = new InstanceRegistry()
    Seq((1, 10.0), (2, 20.0)).toDF("id", "v").write.parquet(s"$dir/a")
    Seq((1, "x"), (2, "y")).toDF("id", "label").write.parquet(s"$dir/b")
    reg.register(ParquetFileDataObject("a", s"$dir/a"))
    reg.register(ParquetFileDataObject("b", s"$dir/b"))
    reg.register(ParquetFileDataObject("joined", s"$dir/joined"))
    reg.register(CustomDataFrameAction("join_ab", Seq("a", "b"), Seq("joined"),
      Seq(SQLDfsTransformer(Map("joined" -> "SELECT a.id, a.v, b.label FROM a JOIN b ON a.id = b.id")))))
    implicit val ctx: ActionPipelineContext = newCtx(reg)
    new ActionDAGRun(Seq(reg.action("join_ab"))).run()
    assert(spark.read.parquet(s"$dir/joined").count() == 2)
  }

  test("simulation mode: init-only run with injected subfeeds, no IO") {
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("in", "/nonexistent/in"))
    reg.register(ParquetFileDataObject("out", "/nonexistent/out"))
    reg.register(CopyAction("cp", "in", "out", Seq(FilterTransformer("x > 1"))))
    implicit val ctx: ActionPipelineContext = newCtx(reg)
    val injected = SubFeed("in", Some(Seq(1, 2, 3).toDF("x")))
    val results = new ActionDAGRun(Seq(reg.action("cp"))).simulate(Seq(injected))
    assert(results("cp").head.dataFrame.get.count() == 2)
    assert(!new java.io.File("/nonexistent/out").exists())
  }

  test("metricsFailCondition fails the run when a metric row matches") {
    val in = tmpDir(); val out = tmpDir()
    Seq((1, "a"), (2, "b")).toDF("x", "v").write.mode("overwrite").parquet(in)
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("src", in))
    reg.register(ParquetFileDataObject("dst", out))
    // the filter drops every row → records_written = 0 → condition matches
    reg.register(CopyAction("cp", "src", "dst", Seq(FilterTransformer("x > 100")),
      metricsFailCondition = Some("key = 'records_written' and value = 0")))
    implicit val ctx: ActionPipelineContext = newCtx(reg)
    val e = intercept[IllegalStateException](new ActionDAGRun(reg.allActions).run())
    assert(e.getMessage.contains("metricsFailCondition"))
    // without the condition the same pipeline passes
    val reg2 = new InstanceRegistry()
    reg2.register(ParquetFileDataObject("src", in))
    reg2.register(ParquetFileDataObject("dst", out))
    reg2.register(CopyAction("cp", "src", "dst", Seq(FilterTransformer("x > 100"))))
    new ActionDAGRun(reg2.allActions).run()(newCtx(reg2))
  }

  test("condition SQL survives quoted ids under escapedStringLiterals") {
    // ids/keys are interpolated into SQL literals; '' doubling (not \')
    // stays a quote in BOTH parser modes
    implicit val ctx: ActionPipelineContext = newCtx()
    val quotedId = "src's_table"
    val feeds = Seq(SubFeed(quotedId, isSkipped = false,
      metrics = Some(ActionMetrics(recordsWritten = 5))))
    for (escaped <- Seq("false", "true")) {
      spark.conf.set("spark.sql.parser.escapedStringLiterals", escaped)
      try {
        assert(ConditionEvaluator.evalExecutionCondition(
          Condition(s"inputSubFeeds.`$quotedId`.numRecords = 5"), feeds))
        assert(ConditionEvaluator.failingMetrics("value > 4", feeds)
          .exists(_.startsWith(quotedId)))
      } finally spark.conf.unset("spark.sql.parser.escapedStringLiterals")
    }
  }

  test("hive append evolves the table on a drifted feed; type change is rejected") {
    implicit val ctx: ActionPipelineContext = newCtx()
    val t = HiveTableDataObject("evo", Table(None, "evo_append_tgt"))
    spark.sql("DROP TABLE IF EXISTS evo_append_tgt")
    t.writeDataFrame(Seq((1, "a", 1.0)).toDF("id", "name", "score"), Seq.empty, None)
    // drifted feed: drops `score`, adds `lang`
    t.writeDataFrame(Seq((2, "b", "en")).toDF("id", "name", "lang"), Seq.empty,
      Some(SdlSaveMode.Append))
    val got = spark.table("evo_append_tgt").select("id", "name", "score", "lang")
      .collect().map(r => (r.getInt(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), Option(r.getString(3)))).toSet
    assert(got == Set((1, "a", Some(1.0), None), (2, "b", None, Some("en"))))
    // a changed column TYPE cannot append in place — loud failure, no write
    val e = intercept[IllegalArgumentException] {
      t.writeDataFrame(Seq((3, 9, "de")).toDF("id", "name", "lang"), Seq.empty,
        Some(SdlSaveMode.Append))
    }
    assert(e.getMessage.contains("name"))
    assert(spark.table("evo_append_tgt").count() == 2)
  }

  test("parquet append evolves: union schema persisted, old and new files both readable") {
    implicit val ctx: ActionPipelineContext = newCtx()
    val dir = tmpDir() + "/tgt"
    val t = ParquetFileDataObject("pevo", dir)
    t.writeDataFrame(Seq((1, "a", 1.0)).toDF("id", "name", "score"), Seq.empty, None)
    // drifted append: drops `score`, adds `lang`. Without the persisted
    // union schema a later read infers from ONE footer and silently drops
    // the other file's columns.
    t.writeDataFrame(Seq((2, "b", "en")).toDF("id", "name", "lang"), Seq.empty,
      Some(SdlSaveMode.Append))
    val got = t.getDataFrame().select("id", "name", "score", "lang")
      .collect().map(r => (r.getInt(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), Option(r.getString(3)))).toSet
    assert(got == Set((1, "a", Some(1.0), None), (2, "b", None, Some("en"))))
    val e = intercept[IllegalArgumentException] {
      t.writeDataFrame(Seq((3, 9, "de")).toDF("id", "name", "lang"), Seq.empty,
        Some(SdlSaveMode.Append))
    }
    assert(e.getMessage.contains("name"))
  }

  test("json append evolves like parquet (by-name reader null-fills)") {
    implicit val ctx: ActionPipelineContext = newCtx()
    val t = JsonFileDataObject("jevo", tmpDir() + "/tgt")
    t.writeDataFrame(Seq((1, "a", 1.0)).toDF("id", "name", "score"), Seq.empty, None)
    t.writeDataFrame(Seq((2, "b", "en")).toDF("id", "name", "lang"), Seq.empty,
      Some(SdlSaveMode.Append))
    val got = t.getDataFrame().select("id", "name", "score", "lang")
      .collect().map(r => (r.getInt(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), Option(r.getString(3)))).toSet
    assert(got == Set((1, "a", Some(1.0), None), (2, "b", None, Some("en"))))
  }

  test("csv append with a drifted schema is rejected (positional format would misparse)") {
    implicit val ctx: ActionPipelineContext = newCtx()
    val t = CsvFileDataObject("cevo", tmpDir() + "/tgt")
    t.writeDataFrame(Seq((1, "a", 1.0)).toDF("id", "name", "score"), Seq.empty, None)
    val e = intercept[IllegalArgumentException] {
      t.writeDataFrame(Seq((2, "b", "en")).toDF("id", "name", "lang"), Seq.empty,
        Some(SdlSaveMode.Append))
    }
    assert(e.getMessage.contains("drifted schema"))
    // same-schema append stays allowed
    t.writeDataFrame(Seq((2, "b", 2.0)).toDF("id", "name", "score"), Seq.empty,
      Some(SdlSaveMode.Append))
    assert(t.getDataFrame().count() == 2)
  }

  test("DataFrameIncrementalMode into a fresh hive table processes all on first run") {
    val in = tmpDir()
    Seq((1, 10), (2, 20)).toDF("id", "x").write.mode("overwrite").parquet(in)
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("src", in))
    reg.register(HiveTableDataObject("tgt", Table(None, "inc_fresh_tgt")))
    reg.register(CopyAction("load", "src", "tgt", saveMode = Some(SdlSaveMode.Append),
      executionMode = Some(graft.operators.modes.DataFrameIncrementalMode("x"))))
    implicit val ctx: ActionPipelineContext = newCtx(reg)
    spark.sql("DROP TABLE IF EXISTS inc_fresh_tgt")
    // no output table yet: watermark must resolve to "none" (previously
    // this threw TABLE_OR_VIEW_NOT_FOUND probing the missing table)
    new ActionDAGRun(reg.allActions).run()
    assert(spark.table("inc_fresh_tgt").count() == 2)
    // second run: rows above the watermark only
    Seq((3, 30)).toDF("id", "x").write.mode("overwrite").parquet(in)
    new ActionDAGRun(reg.allActions).run()
    assert(spark.table("inc_fresh_tgt").count() == 3)
  }

  test("executionCondition overrides the default skip-propagation rule") {
    val in = tmpDir(); val mid = tmpDir(); val outA = tmpDir(); val outB = tmpDir()
    Seq((1, "a")).toDF("x", "v").write.mode("overwrite").parquet(in)
    def registry(withCondition: Boolean): InstanceRegistry = {
      val reg = new InstanceRegistry()
      reg.register(ParquetFileDataObject("src", in))
      reg.register(ParquetFileDataObject("mid", mid))
      reg.register(ParquetFileDataObject("dst", if (withCondition) outB else outA))
      reg.register(CopyAction("stage", "src", "mid",
        executionMode = Some(graft.operators.modes.DataFrameIncrementalMode("x"))))
      reg.register(CopyAction("load", "mid", "dst",
        executionCondition =
          if (withCondition) Some(Condition("true", Some("run even on skipped input")))
          else None))
      reg
    }
    // first run materializes mid; second run: stage skips (no data above
    // watermark) and by DEFAULT the downstream action skips too
    val r1 = new ActionDAGRun(registry(false).allActions)
    r1.run()(newCtx(registry(false)))
    val res2 = new ActionDAGRun(registry(false).allActions).run()(newCtx(registry(false)))
    assert(res2("stage").head.isSkipped && res2("load").head.isSkipped)
    // with executionCondition=true the downstream action runs anyway
    val res3 = new ActionDAGRun(registry(true).allActions).run()(newCtx(registry(true)))
    assert(res3("stage").head.isSkipped && !res3("load").head.isSkipped)
    assert(spark.read.parquet(outB).count() == 1)
  }

  test("recursiveInputIds: running total reads this action's own output across runs") {
    val in = tmpDir(); val tot = tmpDir(); val rep = tmpDir()
    def reg() = {
      val r = new InstanceRegistry()
      r.register(ParquetFileDataObject("delta", in))
      r.register(ParquetFileDataObject("total", tot))
      r.register(ParquetFileDataObject("report", rep))
      r.register(CustomDataFrameAction("acc", Seq("delta"), Seq("total"),
        Seq(new DfsTransformer {
          def transform(dfs: Map[String, org.apache.spark.sql.DataFrame])
                       (implicit ctx: ActionPipelineContext): Map[String, org.apache.spark.sql.DataFrame] = {
            val delta = dfs("delta")
            // first run has no 'total' entry; later runs union the previous state
            val combined = dfs.get("total").fold(delta)(prev => prev.unionByName(delta))
            Map("total" -> combined.groupBy("k").agg(sum("v").as("v")))
          }
        }),
        recursiveInputIds = Seq("total")))
      // downstream consumer: must re-read committed state, not the stale plan
      // whose files the staged swap replaced
      r.register(CopyAction("publish", "total", "report"))
      r
    }
    Seq(("a", 1L), ("b", 2L)).toDF("k", "v").write.mode("overwrite").parquet(in)
    new ActionDAGRun(reg().allActions).run()(newCtx(reg()))
    Seq(("a", 10L)).toDF("k", "v").write.mode("overwrite").parquet(in)
    new ActionDAGRun(reg().allActions).run()(newCtx(reg()))
    val got = spark.read.parquet(tot).orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 11L), ("b", 2L))) // second run folded into the first's state
    val published = spark.read.parquet(rep).orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(published == got) // downstream saw the committed state
  }

  test("recursiveInputIds works with a tick-tock output (read-and-rewrite object)") {
    val in = tmpDir(); val tt = tmpDir()
    def reg() = {
      val r = new InstanceRegistry()
      r.register(ParquetFileDataObject("delta", in))
      r.register(TickTockHiveTableDataObject("total", Table(None, "rec_tt_total"), tt,
        registerInCatalog = false))
      r.register(CustomDataFrameAction("acc", Seq("delta"), Seq("total"),
        Seq(new DfsTransformer {
          def transform(dfs: Map[String, org.apache.spark.sql.DataFrame])
                       (implicit ctx: ActionPipelineContext): Map[String, org.apache.spark.sql.DataFrame] = {
            val delta = dfs("delta")
            val combined = dfs.get("total").fold(delta)(prev => prev.unionByName(delta))
            Map("total" -> combined.groupBy("k").agg(sum("v").as("v")))
          }
        }),
        recursiveInputIds = Seq("total")))
      r
    }
    Seq(("a", 1L)).toDF("k", "v").write.mode("overwrite").parquet(in)
    new ActionDAGRun(reg().allActions).run()(newCtx(reg()))
    Seq(("a", 5L)).toDF("k", "v").write.mode("overwrite").parquet(in)
    new ActionDAGRun(reg().allActions).run()(newCtx(reg()))
    implicit val ctx: ActionPipelineContext = newCtx(reg())
    val got = reg().dataObject("total").asInstanceOf[TickTockHiveTableDataObject]
      .getDataFrame().collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 6L))) // previous tick-tock state was read, not lost
  }

  test("breakDataFrameLineage: downstream re-reads from storage, results unchanged") {
    val in = tmpDir(); val mid = tmpDir(); val out = tmpDir()
    Seq((1, "a"), (5, "b")).toDF("x", "v").write.mode("overwrite").parquet(in)
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("src", in))
    reg.register(ParquetFileDataObject("mid", mid))
    reg.register(ParquetFileDataObject("dst", out))
    reg.register(CopyAction("stage", "src", "mid",
      Seq(FilterTransformer("x > 1")), breakDataFrameLineage = true))
    reg.register(CopyAction("load", "mid", "dst"))
    implicit val ctx: ActionPipelineContext = newCtx(reg)
    val res = new ActionDAGRun(reg.allActions).run()
    // the staged subfeed carries NO DataFrame — the plan was cut at storage
    assert(res("stage").head.dataFrame.isEmpty)
    assert(spark.read.parquet(out).collect().map(_.getInt(0)).toSeq == Seq(5))
  }

  test("merge emulation honors delete/update/insert conditions") {
    val existing = Seq((1, "a", 1), (2, "b", 2), (3, "c", 3)).toDF("id", "v", "n")
    val feed = Seq((1, "a2", 1), (2, "b2", -1), (4, "d", 4)).toDF("id", "v", "n")
    val merged = MergeEmulation.computeMergedState(existing, feed, Seq("id"),
      SaveModeMergeOptions(deleteCondition = Some("new.n < 0")))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    // id=2 deleted (n<0), id=1 updated, id=3 kept, id=4 inserted
    assert(merged == Set((1, "a2", 1), (3, "c", 3), (4, "d", 4)))
  }

  test("merge emulation: updateExistingCondition is a second update-ALL-columns clause") {
    // reference SDLSaveMode.scala:129 + DeltaLakeTableDataObject.scala:433-436
    // (HistorizeAction CDC uses it with per-operation condition columns):
    // primary clause updates only `v` for op='close'; the SECOND clause
    // updates every column for op='updateExisting'; other matches keep
    val existing = Seq((1, "a", 1), (2, "b", 2), (3, "c", 3)).toDF("id", "v", "n")
    val feed = Seq((1, "A", 10, "close"), (2, "B", 20, "updateExisting"),
      (3, "C", 30, "nothing"), (4, "D", 40, "ins")).toDF("id", "v", "n", "op")
    val merged = MergeEmulation.computeMergedState(existing, feed, Seq("id"),
      SaveModeMergeOptions(
        updateCondition = Some("new.op = 'close'"), updateColumns = Seq("v"),
        updateExistingCondition = Some("new.op = 'updateExisting'")))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    // id=1: primary clause → only v updated; id=2: second clause → all
    // columns; id=3: matched, no clause fires → kept; id=4: inserted
    assert(merged == Set((1, "A", 1), (2, "B", 20), (3, "c", 3), (4, "D", 40)))
  }

  test("DAG schedules on dependency completion, not layer barriers") {
    // two independent chains: slow a1 -> a2, fast b1 -> b2. Under layer
    // barriers b2 (layer 2) cannot start before a1 (layer 1) finishes;
    // under dependency-triggered scheduling it starts as soon as b1 is done.
    val log = scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]
    case class TimedAction(id: String, inputIds: Seq[String], outputIds: Seq[String],
                           sleepMs: Long) extends Action {
      override def prepare(implicit ctx: ActionPipelineContext): Unit = ()
      override def init(sf: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] =
        outputIds.map(SubFeed(_))
      override def exec(sf: Seq[SubFeed])(implicit ctx: ActionPipelineContext): Seq[SubFeed] = {
        val t0 = System.nanoTime()
        Thread.sleep(sleepMs)
        log(id) = (t0, System.nanoTime())
        outputIds.map(SubFeed(_))
      }
    }
    val actions = Seq(
      TimedAction("a1", Seq.empty, Seq("ao1"), sleepMs = 1500),
      TimedAction("a2", Seq("ao1"), Seq("ao2"), sleepMs = 0),
      TimedAction("b1", Seq.empty, Seq("bo1"), sleepMs = 20),
      TimedAction("b2", Seq("bo1"), Seq("bo2"), sleepMs = 20))
    implicit val ctx: ActionPipelineContext = newCtx()
    new ActionDAGRun(actions, parallelism = 4).run()
    val (b2Start, _) = log("b2")
    val (_, a1End) = log("a1")
    assert(b2Start < a1End,
      "fast chain's second action must start before the slow sibling branch finishes")
  }

  test("CustomPartitionMode: user logic prunes the read to selected partitions") {
    val dir = Files.createTempDirectory("graft-cpm").toString
    Seq((1, "a"), (2, "b"), (3, "a"), (4, "c")).toDF("k", "part")
      .write.partitionBy("part").parquet(s"$dir/src")
    val reg = new InstanceRegistry()
    reg.register(ParquetFileDataObject("cp_src", s"$dir/src", partitions = Seq("part")))
    reg.register(ParquetFileDataObject("cp_dst", s"$dir/dst"))
    val mode = graft.operators.modes.CustomPartitionMode((_, _) =>
      Seq(PartitionValues(Map("part" -> "a"))))
    val a = CopyAction("cp", "cp_src", "cp_dst",
      saveMode = Some(SdlSaveMode.Overwrite), executionMode = Some(mode))
    implicit val c2: ActionPipelineContext =
      ActionPipelineContext(spark, reg)
    a.exec(Seq.empty)(c2)
    val out = spark.read.parquet(s"$dir/dst")
    assert(out.select("k").as[Int].collect().toSet == Set(1, 3))
  }
}
