package graft

import graft.core.{ConfigParser, PipelineRunner}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Declarative YAML config → registry → 3-phase DAG run, mirroring the
  * reference's HOCON-driven pipelines (config/ConfigParsingTest.scala,
  * app/SmartDataLakeBuilderTest.scala). */
class ConfigSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  def tmpDir(): String = java.nio.file.Files.createTempDirectory("graft_cfg").toString

  test("config parse registers dataObjects/actions with transformers and modes") {
    val cfg =
      """dataObjects:
        |  src: {type: CsvFileDataObject, path: /tmp/in, csvOptions: {delimiter: ";"}}
        |  dst:
        |    type: ParquetFileDataObject
        |    path: /tmp/out
        |    partitions: [dt]
        |    expectations:
        |      - {type: CountExpectation, name: cnt, expectation: "> 0"}
        |actions:
        |  a1:
        |    type: CopyAction
        |    inputId: src
        |    outputId: dst
        |    saveMode: OverwriteOptimized
        |    transformers:
        |      - {type: FilterTransformer, filterClause: "x > 1"}
        |      - {type: SQLDfTransformer, sql: "select * from %{inputViewName}"}
        |    executionMode: {type: PartitionDiffMode, nbOfPartitionValuesPerRun: 2}
        |    metadata: {feed: staging}
        |""".stripMargin
    val reg = ConfigParser.parse(cfg)
    val src = reg.dataObject("src").asInstanceOf[graft.sources.CsvFileDataObject]
    assert(src.options("delimiter") == ";")
    val dst = reg.dataObject("dst").asInstanceOf[graft.sources.ParquetFileDataObject]
    assert(dst.partitions == Seq("dt") && dst.expectations.size == 1)
    val a = reg.action("a1").asInstanceOf[graft.operators.CopyAction]
    assert(a.transformers.size == 2 && a.saveMode.contains(graft.core.SdlSaveMode.OverwriteOptimized))
    assert(a.executionMode.exists(_.isInstanceOf[graft.operators.modes.PartitionDiffMode]))
    assert(ConfigParser.parseFeeds(cfg) == Map("a1" -> "staging"))
  }

  test("config-driven pipeline runs end-to-end: csv -> filter/sql -> partitioned parquet") {
    import spark.implicits._
    val in = tmpDir(); val out = tmpDir()
    Seq((1, "a", "2024-01-01"), (2, "b", "2024-01-01"), (30, "c", "2024-01-02"))
      .toDF("amount", "name", "dt")
      .write.mode("overwrite").option("header", "true").csv(in)
    val cfg =
      s"""dataObjects:
         |  src-csv: {type: csv, path: $in}
         |  stg-parquet: {type: parquet, path: $out, partitions: [dt]}
         |actions:
         |  load:
         |    type: copy
         |    inputId: src-csv
         |    outputId: stg-parquet
         |    saveMode: overwrite
         |    transformers:
         |      - {type: sql, sql: "select amount * 2 as amount2, name, dt from %{inputViewName} where amount >= 2"}
         |    metadata: {feed: staging}
         |""".stripMargin
    val result = PipelineRunner.run(cfg, spark, feedSel = Some("stag.*"))
    assert(result.contains("load"))
    val got = spark.read.parquet(out).orderBy("amount2")
      .collect().map(r => (r.getAs[Int]("amount2"), r.getAs[String]("name"))).toSeq
    assert(got == Seq((4, "b"), (60, "c")))
    // partition layout on disk (dt=...)
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("dt=")))
  }

  test("config-level merge with fine-grained saveModeOptions upserts a keyed hive table") {
    import spark.implicits._
    val in1 = tmpDir(); val in2 = tmpDir()
    Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("id", "name", "v")
      .write.mode("overwrite").parquet(in1)
    // feed: id=2 price-only update, id=3 flagged for delete, id=4 new with
    // name override, id=5 new but under the insert condition
    Seq((2, "b2", 25.0), (3, "DEL", 30.0), (4, "d", 40.0), (5, "e", 1.0))
      .toDF("id", "name", "v").write.mode("overwrite").parquet(in2)
    def cfg(src: String) =
      s"""dataObjects:
         |  src: {type: parquet, path: $src}
         |  tgt: {type: hive, table: {name: cfg_merge_tgt, primaryKey: [id]}}
         |actions:
         |  load:
         |    type: copy
         |    inputId: src
         |    outputId: tgt
         |    saveMode: merge
         |    saveModeOptions:
         |      deleteCondition: "new.name = 'DEL'"
         |      updateCondition: "new.v > existing.v"
         |      updateColumns: [v]
         |      insertCondition: "new.v >= 10"
         |      insertValuesOverride: {name: "upper(new.name)"}
         |    metadata: {feed: merge}
         |""".stripMargin
    spark.sql("DROP TABLE IF EXISTS cfg_merge_tgt")
    PipelineRunner.run(cfg(in1), spark, Some("merge")) // table absent -> initial write
    PipelineRunner.run(cfg(in2), spark, Some("merge")) // real merge
    val got = spark.table("cfg_merge_tgt").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set(
      (1, "a", 10.0),  // untouched
      (2, "b", 25.0),  // updateColumns=[v]: price updated, name kept
      (4, "D", 40.0))) // inserted with the name override; 3 deleted, 5 filtered
  }

  test("config-driven Structured Streaming action drains a file source") {
    import spark.implicits._
    val dir = tmpDir()
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v").write.parquet(s"$dir/src")
    val cfg =
      s"""dataObjects:
         |  src: {type: parquet, path: $dir/src, schema: "id INT, v STRING"}
         |  dst: {type: parquet, path: $dir/dst}
         |actions:
         |  stream:
         |    type: copy
         |    inputId: src
         |    outputId: dst
         |    transformers:
         |      - {type: filter, filterClause: "id >= 2"}
         |    executionMode:
         |      type: streaming
         |      checkpointLocation: $dir/cp
         |      triggerType: AvailableNow
         |    metadata: {feed: stream}
         |""".stripMargin
    PipelineRunner.run(cfg, spark, Some("stream"))
    assert(spark.read.parquet(s"$dir/dst").select("id").as[Int].collect().toSet == Set(2, 3))
  }

  test("config-driven CDC historize replays a change stream into SCD2") {
    import spark.implicits._
    val dir = tmpDir()
    Seq(
      (1, "a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "i"),
      (1, "a2", java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "u"),
      (2, "b", java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), "i"),
      (2, "b", java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), "d"))
      .toDF("id", "name", "ts", "op").write.parquet(s"$dir/cdc")
    val cfg =
      s"""dataObjects:
         |  src: {type: parquet, path: $dir/cdc}
         |  hist: {type: parquet, path: $dir/hist}
         |actions:
         |  historize:
         |    type: historize
         |    inputId: src
         |    outputId: hist
         |    primaryKey: [id]
         |    cdcOptions: {timestampColumn: ts, operationColumn: op}
         |    metadata: {feed: cdc}
         |""".stripMargin
    PipelineRunner.run(cfg, spark, Some("cdc"))
    val got = spark.read.parquet(s"$dir/hist")
      .select("id", "name", "dl_ts_delimited").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2))).toSet
    val dd = graft.operators.Historization.doomsday
    assert(got == Set(
      (1, "a", new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-02 00:00:00").getTime - 1)),
      (1, "a2", dd), // latest version open
      (2, "b", new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-03 00:00:00").getTime - 1))
      // the delete op closes id=2 and emits nothing
    ))
  }

  test("config-declared partition retention prunes expired partitions after the write") {
    import spark.implicits._
    val dir = tmpDir()
    Seq((1, "2024-01-01"), (2, "2024-06-01"), (3, "2024-12-01"))
      .toDF("x", "dt").write.parquet(s"$dir/src")
    val cfg =
      s"""dataObjects:
         |  src: {type: parquet, path: $dir/src}
         |  dst:
         |    type: parquet
         |    path: $dir/dst
         |    partitions: [dt]
         |    housekeepingMode:
         |      type: retention
         |      retentionCondition: "dt >= '2024-06-01'"
         |actions:
         |  load: {type: copy, inputId: src, outputId: dst, metadata: {feed: hk}}
         |""".stripMargin
    PipelineRunner.run(cfg, spark, Some("hk"))
    val kept = spark.read.parquet(s"$dir/dst")
      .select(col("dt").cast("string"))
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("2024-06-01", "2024-12-01"), s"got $kept")
    assert(!new java.io.File(s"$dir/dst/dt=2024-01-01").exists)
  }

  test("config-declared constraint aborts the write naming the violating row") {
    import spark.implicits._
    val dir = tmpDir()
    Seq((1, 5.0), (2, -1.0)).toDF("id", "v").write.parquet(s"$dir/src")
    val cfg =
      s"""dataObjects:
         |  src: {type: parquet, path: $dir/src}
         |  dst:
         |    type: parquet
         |    path: $dir/dst
         |    constraints:
         |      - {name: v_nonneg, expression: "v >= 0", errorMsgCols: [id]}
         |actions:
         |  load: {type: copy, inputId: src, outputId: dst, metadata: {feed: c}}
         |""".stripMargin
    val e = intercept[Exception](PipelineRunner.run(cfg, spark, Some("c")))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("v_nonneg")),
      s"constraint name not in failure: ${msgs(e).mkString(" | ")}")
  }

  test("versionedTable config: generated + identity columns parse and populate on write") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cfgvt").toString
    val cfg =
      s"""dataObjects:
        |  vt:
        |    type: versionedTable
        |    path: $dir/t
        |    primaryKey: [rid]
        |    identityColumns: [rid]
        |    generatedColumns: {upper_v: "upper(v)"}
        |""".stripMargin
    val reg = ConfigParser.parse(cfg)
    val vt = reg.dataObject("vt").asInstanceOf[graft.sources.VersionedTableDataObject]
    assert(vt.identityColumns == Seq("rid"))
    assert(vt.generatedColumns == Seq("upper_v" -> "upper(v)"))
    implicit val c: graft.core.ActionPipelineContext =
      graft.core.ActionPipelineContext(spark, reg)
    vt.writeDataFrame(Seq("a", "b").toDF("v"))
    val rows = vt.getDataFrame().select("rid", "v", "upper_v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(rows.map(_._1).distinct.size == 2)
    assert(rows.map(r => r._2 -> r._3).toSet == Set("a" -> "A", "b" -> "B"))
  }

  test("feedSel selects no actions -> error; unknown type -> clear error") {
    val cfg =
      """dataObjects:
        |  d1: {type: parquet, path: /tmp/x}
        |actions:
        |  a1: {type: copy, inputId: d1, outputId: d1, metadata: {feed: f1}}
        |""".stripMargin
    val e1 = intercept[IllegalArgumentException](PipelineRunner.run(cfg, spark, Some("nomatch")))
    assert(e1.getMessage.contains("no actions selected"))
    val e2 = intercept[IllegalArgumentException](
      ConfigParser.parse("dataObjects:\n  d1: {type: bogus, path: /x}\n"))
    assert(e2.getMessage.contains("unknown type 'bogus'"))
  }

  test("HOCON config (reference application.conf syntax) parses: = syntax, substitutions, nested blocks") {
    // mirrors reference sdl-core/src/test/resources/config/config.conf layout
    // (`dataObjects = { id = { type = ... } }`, HOCON `=`, ${} substitution)
    val cfg =
      """basePath = /tmp/hocon_test
        |connections {
        |  conn1 = {
        |    type = JdbcConnection
        |    url = "jdbc:derby:memory:cfgdb;create=true"
        |    driver = org.apache.derby.jdbc.EmbeddedDriver
        |  }
        |}
        |dataObjects {
        |  src-orders = {
        |    type = CsvFileDataObject
        |    path = ${basePath}"/in"
        |    csvOptions { delimiter = ";" }
        |  }
        |  stg-orders = {
        |    type = ParquetFileDataObject
        |    path = ${basePath}"/out"
        |    partitions = [dt]
        |  }
        |  tbl-orders = {
        |    type = JdbcTableDataObject
        |    connectionId = conn1
        |    table { db = app, name = orders, primaryKey = [id] }
        |  }
        |}
        |actions {
        |  load-orders = {
        |    type = CopyAction
        |    inputId = src-orders
        |    outputId = stg-orders
        |    saveMode = OverwriteOptimized
        |    transformers = [
        |      { type = FilterTransformer, filterClause = "x > 1" }
        |      { type = SQLDfTransformer, sql = "select * from %{inputViewName}" }
        |    ]
        |    executionMode = { type = PartitionDiffMode, nbOfPartitionValuesPerRun = 2 }
        |    metadata { feed = staging }
        |  }
        |}
        |""".stripMargin
    val reg = ConfigParser.parse(cfg)
    val src = reg.dataObject("src-orders").asInstanceOf[graft.sources.CsvFileDataObject]
    assert(src.path == "/tmp/hocon_test/in" && src.options("delimiter") == ";")
    val dst = reg.dataObject("stg-orders").asInstanceOf[graft.sources.ParquetFileDataObject]
    assert(dst.partitions == Seq("dt"))
    val tbl = reg.dataObject("tbl-orders").asInstanceOf[graft.sources.JdbcTableDataObject]
    assert(tbl.table.fullName == "app.orders" && tbl.table.primaryKey.contains(Seq("id")))
    assert(tbl.connection.url.startsWith("jdbc:derby:memory:cfgdb"))
    val a = reg.action("load-orders").asInstanceOf[graft.operators.CopyAction]
    assert(a.transformers.size == 2 && a.saveMode.contains(graft.core.SdlSaveMode.OverwriteOptimized))
    assert(ConfigParser.parseFeeds(cfg) == Map("load-orders" -> "staging"))
  }

  test("HOCON config file with include runs a pipeline end-to-end") {
    import spark.implicits._
    val in = tmpDir(); val out = tmpDir(); val cfgDir = tmpDir()
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("amount", "name")
      .write.mode("overwrite").option("header", "true").csv(in)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$cfgDir/objects.conf"),
      s"""dataObjects {
         |  src = { type = csv, path = "$in" }
         |  dst = { type = parquet, path = "$out" }
         |}""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$cfgDir/application.conf"),
      s"""include "objects.conf"
         |actions {
         |  load = {
         |    type = copy
         |    inputId = src
         |    outputId = dst
         |    transformers = [{ type = sql, sql = "select amount * 10 as amount10, name from %{inputViewName}" }]
         |  }
         |}""".stripMargin)
    val reg = ConfigParser.parseFile(s"$cfgDir/application.conf")
    implicit val ctx: graft.core.ActionPipelineContext = graft.core.ActionPipelineContext(spark, reg)
    new graft.core.ActionDAGRun(reg.allActions, 1).run()
    val got = spark.read.parquet(out).orderBy("amount10")
      .collect().map(_.getAs[Int]("amount10")).toSeq
    assert(got == Seq(10, 20, 30))
  }

  test("dataObject metadata parsed and surfaced by DataObjectsExporter") {
    val cfg =
      """dataObjects {
        |  stg-orders = {
        |    type = ParquetFileDataObject
        |    path = /tmp/meta_test
        |    metadata { name = "Orders staging", description = "raw orders", layer = staging, tags = [pii, core] }
        |  }
        |  exporter = { type = DataObjectsExporterDataObject }
        |}
        |""".stripMargin
    val reg = ConfigParser.parse(cfg)
    assert(reg.metadata("stg-orders").exists(m =>
      m.name.contains("Orders staging") && m.layer.contains("staging") && m.tags == Seq("pii", "core")))
    implicit val ctx: graft.core.ActionPipelineContext = graft.core.ActionPipelineContext(spark, reg)
    val exported = reg.dataObject("exporter").asInstanceOf[graft.sources.DataObjectsExporterDataObject]
      .getDataFrame().where(col("id") === "stg-orders").collect().head
    assert(exported.getAs[String]("name") == "Orders staging")
    assert(exported.getAs[String]("layer") == "staging")
    assert(exported.getAs[String]("tags") == "pii,core")
  }

  test("global.sparkOptions applies runtime confs through PipelineRunner") {
    import spark.implicits._
    val in = tmpDir(); val out = tmpDir()
    Seq((1, "a")).toDF("x", "v").write.mode("overwrite").option("header", "true").csv(in)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val cfg =
        s"""global { sparkOptions { "spark.sql.shuffle.partitions" = "7" } }
           |dataObjects {
           |  src = { type = csv, path = "$in" }
           |  dst = { type = parquet, path = "$out" }
           |}
           |actions { load = { type = copy, inputId = src, outputId = dst } }
           |""".stripMargin
      PipelineRunner.run(cfg, spark)
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "7")
      assert(spark.read.parquet(out).count() == 1)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("secret providers: ENV/FILE/custom resolution in credentials") {
    import graft.core.SecretsUtil
    // plain values pass through untouched
    assert(SecretsUtil.resolve("plaintext") == "plaintext")
    // FILE provider reads trimmed content
    val f = java.nio.file.Files.createTempFile("graft_secret", ".txt")
    java.nio.file.Files.writeString(f, "  s3cret\n")
    assert(SecretsUtil.resolve(s"###FILE#$f###") == "s3cret")
    // ENV provider (PATH always exists); missing var → clear error
    assert(SecretsUtil.resolve("###ENV#PATH###") == sys.env("PATH"))
    val e = intercept[IllegalArgumentException](SecretsUtil.resolve("###ENV#GRAFT_NO_SUCH_VAR###"))
    assert(e.getMessage.contains("not set"))
    // custom provider
    SecretsUtil.registerProvider("VAULT", name => s"vault:$name")
    assert(SecretsUtil.resolve("###VAULT#db/pass###") == "vault:db/pass")
    // resolution is lazy: constructing the connection never touches providers
    val conn = graft.core.JdbcConnection("c", "jdbc:derby:memory:x", "d",
      password = Some(s"###FILE#$f###"))
    assert(conn.password.contains(s"###FILE#$f###"))
    assert(conn.resolvedPassword.contains("s3cret"))
    // auth headers resolve at request time
    val auth = graft.sources.BasicAuthMode("admin", s"###FILE#$f###")
    val expected = java.util.Base64.getEncoder.encodeToString("admin:s3cret".getBytes("UTF-8"))
    assert(auth.headers("Authorization") == s"Basic $expected")
  }

  test("multi-action DAG from config: copy then deduplicate downstream") {
    import spark.implicits._
    val in = tmpDir(); val mid = tmpDir(); val out = tmpDir()
    Seq((1, "x", "2024-01-01 10:00:00"), (1, "y", "2024-01-02 10:00:00"), (2, "z", "2024-01-01 10:00:00"))
      .toDF("id", "payload", "ts")
      .write.mode("overwrite").option("header", "true").csv(in)
    val cfg =
      s"""dataObjects:
         |  raw: {type: csv, path: $in}
         |  staged: {type: parquet, path: $mid}
         |  deduped: {type: parquet, path: $out}
         |actions:
         |  stage: {type: copy, inputId: raw, outputId: staged, saveMode: overwrite}
         |  dedup:
         |    type: deduplicate
         |    inputId: staged
         |    outputId: deduped
         |    primaryKey: [id]
         |""".stripMargin
    PipelineRunner.run(cfg, spark)
    val got = spark.read.parquet(out)
    assert(got.count() == 2) // one row per id
    assert(got.columns.contains("dl_ts_captured"))
  }

  test("curation pipeline from HOCON: near-dedup + text quality + pii redact + deterministic sample") {
    import spark.implicits._
    val in = tmpDir(); val out = tmpDir()
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
    Seq(
      (1L, base + "contact a@b.org"),
      (2L, base + " slightly changed tail contact a@b.org"), // near-dup of 1 -> dropped
      (3L, "completely different content about engines and queries " * 5))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(in)
    val cfg =
      s"""dataObjects {
         |  corpus { type = parquet, path = "$in" }
         |  curated { type = parquet, path = "$out" }
         |}
         |actions {
         |  curate {
         |    type = copy
         |    inputId = corpus
         |    outputId = curated
         |    transformers = [
         |      { type = nearDedup, idColumn = doc_id, textColumn = text, threshold = 0.5 },
         |      { type = textQuality, textColumn = text, repetitionMaxN = 2 },
         |      { type = piiRedact, textColumn = text },
         |      { type = sample, keyColumn = doc_id, rate = 1.0 }
         |    ]
         |  }
         |}
         |""".stripMargin
    PipelineRunner.run(cfg, spark)
    val got = spark.read.parquet(out)
    val ids = got.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L), s"near-dup 2 should drop, got $ids")
    assert(got.columns.contains("quality_score") && got.columns.contains("dup_2gram_frac"))
    assert(got.where(col("text").contains("a@b.org")).count() == 0)
    assert(got.where(col("text").contains("<EMAIL>")).count() == 1)
  }

  test("incremental dedup pipeline from HOCON: batch vs signature store, store grows") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
    val batchIn = tmpDir(); val storeIn = tmpDir()
    val novelOut = tmpDir(); val storeOut = tmpDir()
    // existing corpus -> signature store (the write-once side of the loop)
    val corpus = Seq((1L, base),
      (2L, "completely different content about engines and queries " * 5))
      .toDF("doc_id", "text")
    graft.functions.Dedup.minhashSignatures(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(storeIn)
    Seq(
      (101L, base + " second crawl tail"), // near-dup of stored doc 1 -> dropped
      (102L, "entirely novel text about deep sea exploration and marine life " * 5))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(batchIn)
    val cfg =
      s"""dataObjects {
         |  batch { type = parquet, path = "$batchIn" }
         |  store { type = parquet, path = "$storeIn" }
         |  novel { type = parquet, path = "$novelOut" }
         |  storeGrown { type = parquet, path = "$storeOut" }
         |}
         |actions {
         |  ingest {
         |    type = customDataFrame
         |    inputIds = [batch, store]
         |    outputIds = [novel, storeGrown]
         |    dfsTransformers = [
         |      { type = incrementalDedup, batchInput = batch, storeInput = store,
         |        idColumn = doc_id, textColumn = text, threshold = 0.5, bands = 16 }
         |    ]
         |  }
         |}
         |""".stripMargin
    // transformer outputs are keyed by INPUT names (batch/store) — map them
    // to the declared output ids
    val reg = ConfigParser.parse(cfg)
    val act = reg.action("ingest").asInstanceOf[graft.operators.CustomDataFrameAction]
    implicit val ctx: graft.core.ActionPipelineContext = graft.core.ActionPipelineContext(spark, reg)
    val outs = act.dfsTransformers.head.transform(Map(
      "batch" -> spark.read.parquet(batchIn), "store" -> spark.read.parquet(storeIn)))
    outs("batch").write.mode("overwrite").parquet(novelOut)
    outs("store").write.mode("overwrite").parquet(storeOut)
    val novel = spark.read.parquet(novelOut).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(novel == Set(102L), s"dup 101 should drop, got $novel")
    // the store output is the DELTA (novel docs' signatures) — append-shaped
    // growth: the grown store is old ∪ delta, and only the delta was written
    val delta = spark.read.parquet(storeOut).select("id").collect().map(_.getLong(0)).toSet
    assert(delta == Set(102L), s"store delta should hold exactly the survivor, got $delta")
    val grown = spark.read.parquet(storeIn, storeOut).select("id").collect().map(_.getLong(0)).toSet
    assert(grown == Set(1L, 2L, 102L), s"store should grow by the survivor, got $grown")
  }

  test("PartitionDiffMode config pipeline: run 2 processes ONLY the new partition (metrics)") {
    import spark.implicits._
    val dir = tmpDir()
    Seq((1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"))
      .toDF("id", "v", "dt").write.partitionBy("dt").parquet(s"$dir/src")
    val cfg =
      s"""dataObjects:
         |  src: {type: parquet, path: $dir/src, partitions: [dt]}
         |  dst: {type: parquet, path: $dir/dst, partitions: [dt]}
         |actions:
         |  load:
         |    type: copy
         |    inputId: src
         |    outputId: dst
         |    saveMode: append
         |    executionMode: {type: partitionDiff}
         |    metadata: {feed: incr}
         |""".stripMargin
    val r1 = PipelineRunner.run(cfg, spark, feedSel = Some("incr"))
    assert(r1("load").head.metrics.map(_.recordsWritten) == Some(3L))

    Seq((4, "d", "p3")).toDF("id", "v", "dt")
      .write.mode("append").partitionBy("dt").parquet(s"$dir/src")
    val r2 = PipelineRunner.run(cfg, spark, feedSel = Some("incr"))
    // the metrics gate: run 2 wrote exactly the one new partition's row,
    // not a re-copy of p1/p2
    assert(r2("load").head.metrics.map(_.recordsWritten) == Some(1L))
    assert(spark.read.parquet(s"$dir/dst").count() == 4)

    // run 3 with nothing new: the mode must signal no-data and skip
    val r3 = PipelineRunner.run(cfg, spark, feedSel = Some("incr"))
    assert(r3("load").head.isSkipped)
    assert(spark.read.parquet(s"$dir/dst").count() == 4)
  }

  test("near-dedup config pipeline runs ZERO Spark jobs during the init phase") {
    import spark.implicits._
    val dir = tmpDir()
    Seq((1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (2L, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (3L, "an entirely different document about streaming watermarks"))
      .toDF("doc_id", "text").write.parquet(s"$dir/src")
    val cfg =
      s"""dataObjects:
         |  src: {type: parquet, path: $dir/src, schema: "doc_id BIGINT, text STRING"}
         |  dst: {type: parquet, path: $dir/dst}
         |actions:
         |  dedup:
         |    type: copy
         |    inputId: src
         |    outputId: dst
         |    transformers:
         |      - {type: nearDedup, idColumn: doc_id, textColumn: text}
         |    metadata: {feed: nd}
         |""".stripMargin
    val reg = ConfigParser.parse(cfg)
    implicit val ctx: graft.core.ActionPipelineContext =
      graft.core.ActionPipelineContext(spark, reg)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // init-only traversal (the simulation path): builds and validates the
      // whole plan, must not execute the dedup's pair pipeline
      new graft.core.ActionDAGRun(reg.allActions).simulate(Seq.empty)
      Thread.sleep(1000) // listener bus is async; nothing should arrive
      assert(jobs.get() == 0, s"init phase ran ${jobs.get()} Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
    // and the exec phase still deduplicates for real
    PipelineRunner.run(cfg, spark, feedSel = Some("nd"))
    assert(spark.read.parquet(s"$dir/dst").as[(Long, String)].collect()
      .map(_._1).toSet == Set(1L, 3L))
  }

  test("customDf className resolves at PARSE time; a typo fails the parse, not the first exec") {
    val good =
      """dataObjects {
        |  src { type = customDf, className = "graft.Q156SyntheticFeed",
        |        options = { rows = "3", factor = "2", prefix = "x" } }
        |}""".stripMargin
    val reg = ConfigParser.parse(good)
    implicit val ctx: graft.core.ActionPipelineContext =
      graft.core.ActionPipelineContext(spark, reg)
    val df = reg.dataObject("src").asInstanceOf[graft.sources.CustomDfDataObject].getDataFrame()
    assert(df.count() == 3)
    val e = intercept[IllegalArgumentException] {
      ConfigParser.parse(good.replace("graft.Q156SyntheticFeed", "graft.NoSuchCreator"))
    }
    assert(e.getMessage.contains("not found"), e.getMessage)
  }

  test("batch-keyed novel sink knobs parse on the incremental transformers") {
    val cfg =
      """dataObjects {
        |  b { type = parquet, path = "/tmp/x/b" }
        |  s { type = parquet, path = "/tmp/x/s" }
        |}
        |actions {
        |  ing {
        |    type = customDataFrame
        |    inputIds = [b, s]
        |    outputIds = [b, s]
        |    dfsTransformers = [
        |      { type = incrementalDedup, batchInput = b, storeInput = s,
        |        idColumn = id, textColumn = t,
        |        novelBatchKeyColumn = ingest_batch, novelBatchKeyValue = "2026-08-16" }
        |    ]
        |  }
        |}
        |""".stripMargin
    val t = ConfigParser.parse(cfg).action("ing")
      .asInstanceOf[graft.operators.CustomDataFrameAction]
      .dfsTransformers.head.asInstanceOf[graft.operators.IncrementalDedupTransformer]
    assert(t.novelBatchKeyColumn.contains("ingest_batch"))
    assert(t.novelBatchKeyValue.contains("2026-08-16"))
  }

  test("rerunGuardRingSize and executionMode/mainInputId parse on customDataFrame pipelines") {
    // a retry horizon is operational policy (r18 VERDICT #7) and the
    // execution mode is what derives a config-only batch key — both must
    // be reachable from HOCON without code
    val cfg =
      """dataObjects {
        |  b { type = parquet, path = "/tmp/x/b", partitions = [dt] }
        |  n { type = parquet, path = "/tmp/x/n", partitions = [ingest_batch] }
        |  s { type = parquet, path = "/tmp/x/s" }
        |}
        |actions {
        |  ing {
        |    type = customDataFrame
        |    inputIds = [b]
        |    outputIds = [n, s]
        |    recursiveInputIds = [s]
        |    saveMode = append
        |    mainInputId = b
        |    executionMode = { type = PartitionDiffMode, alternativeOutputId = s }
        |    dfsTransformers = [
        |      { type = incrementalDedup, batchInput = b, storeInput = s,
        |        idColumn = id, textColumn = t, novelOutput = n,
        |        novelBatchKeyColumn = ingest_batch,
        |        rerunGuardRingSize = 4 }
        |    ]
        |  }
        |}
        |""".stripMargin
    val a = ConfigParser.parse(cfg).action("ing")
      .asInstanceOf[graft.operators.CustomDataFrameAction]
    assert(a.mainInputId.contains("b"))
    assert(a.executionMode.exists(_.isInstanceOf[graft.operators.modes.PartitionDiffMode]))
    val t = a.dfsTransformers.head.asInstanceOf[graft.operators.IncrementalDedupTransformer]
    assert(t.rerunGuardRingSize == 4)
    // column set, VALUE left to the mode's batch identity
    assert(t.novelBatchKeyColumn.contains("ingest_batch") && t.novelBatchKeyValue.isEmpty)
  }

  test("jms and fileRef data objects parse with reflective providers (connection params via options)") {
    // the reference wires JMS/SFTP through config (jndi/connection
    // blocks); the engine-side analog names a provider class resolved at
    // PARSE time, with connection params passing through `options`
    val cfg =
      """dataObjects {
        |  jq { type = jms, consumerFactoryClassName = "graft.TestJmsProvider",
        |       options = { queue = ORDERS }, batchSize = 50, maxWaitSec = 2,
        |       maxBatchAgeSec = 30, txBatchSize = 10, schema = "q STRING" }
        |  fr { type = fileRef, pattern = "/remote/*.csv",
        |       transportClassName = "graft.TestTransportProvider",
        |       options = { host = sfs01 }, targetDir = "/tmp/lnd159" }
        |  fr2 { type = fileRef, pattern = "/local/*.csv" }
        |}
        |""".stripMargin
    val reg = ConfigParser.parse(cfg)
    val j = reg.dataObject("jq").asInstanceOf[graft.sources.JmsDataObject]
    assert(j.batchSize == 50 && j.maxWaitMs == 2000L &&
      j.maxBatchAgeMs == 30000L && j.txBatchSize == 10)
    // the provider got the options map and mints live consumers
    val msg = j.consumerFactory().receive(0)
    assert(msg.text == """{"q":"ORDERS"}""", msg.text)
    val f = reg.dataObject("fr").asInstanceOf[graft.sources.FileRefDataObject]
    assert(f.targetDir.contains("/tmp/lnd159"))
    assert(f.transport.list("ignored").map(_.path) == Seq("/remote/seen-sfs01"))
    // no transport class → the Hadoop transport default
    val f2 = reg.dataObject("fr2").asInstanceOf[graft.sources.FileRefDataObject]
    assert(f2.transport.isInstanceOf[graft.sources.HadoopFileRefTransport])
    // a typo'd provider fails the PARSE, not the first exec
    val e = intercept[IllegalArgumentException] {
      ConfigParser.parse(
        """dataObjects { bad { type = jms, consumerFactoryClassName = "nope.Missing" } }""")
    }
    assert(e.getMessage.contains("not found"), e.getMessage)
  }
}

/** fixtures for the reflective-provider parse test */
class TestJmsProvider extends graft.sources.JmsConsumerProvider {
  override def create(options: Map[String, String]): graft.sources.JmsConsumer =
    new graft.sources.JmsConsumer {
      private var drained = false
      override def receive(maxWaitMs: Long): graft.sources.JmsMessage =
        if (drained) null
        else {
          drained = true
          new graft.sources.JmsMessage {
            val text: String = s"""{"q":"${options("queue")}"}"""
            def acknowledge(): Unit = ()
          }
        }
      override def close(): Unit = ()
    }
}

class TestTransportProvider extends graft.sources.FileRefTransportProvider {
  override def create(conf: org.apache.hadoop.conf.Configuration,
                      options: Map[String, String]): graft.sources.FileRefTransport =
    new graft.sources.FileRefTransport {
      override def list(pattern: String): Seq[graft.sources.FileRef] =
        Seq(graft.sources.FileRef(s"/remote/seen-${options("host")}", 1L, 1L))
      override def open(path: String): java.io.InputStream =
        new java.io.ByteArrayInputStream(Array.emptyByteArray)
      override def put(path: String, in: java.io.InputStream): Unit = ()
    }
}
