package graft

import graft.app.GraftApp
import graft.core.PartitionValues
import java.nio.file.Files
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** CLI entry point: arg parsing, config-dir merge, batch run, simulate,
  * stateful run (reference `LocalSmartDataLakeBuilder` surface). */
class GraftAppSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  def tmpDir(): String = Files.createTempDirectory("graft-app").toString

  private def writePipelineConf(dir: String): String = {
    Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("id", "name", "value")
      .write.option("header", "true").mode("overwrite").csv(s"$dir/src")
    val conf =
      s"""dataObjects {
         |  src { type = csv, path = "$dir/src" }
         |  out { type = parquet, path = "$dir/out" }
         |}
         |actions {
         |  load { type = copy, inputId = src, outputId = out, metadata { feed = staging }
         |         transformers = [{type = filter, filterClause = "value > 15"}] }
         |}
         |""".stripMargin
    val f = s"$dir/pipeline.conf"
    Files.writeString(java.nio.file.Paths.get(f), conf)
    f
  }

  test("parseArgs: full option surface") {
    val a = GraftApp.parseArgs(Array(
      "--config", "x.conf,y.conf", "-f", "stag.*", "-p", "4",
      "--partition-values", "dt=2024-01-01,region=eu",
      "--state-path", "/tmp/state", "-n", "myapp", "--simulate",
      "--trigger-interval-sec", "5", "--max-iterations", "3"))
    assert(a.configPaths == Seq("x.conf", "y.conf") && a.feedSel.contains("stag.*"))
    assert(a.parallelism == 4 && a.appName == "myapp" && a.simulate)
    assert(a.partitionValues == Seq(PartitionValues(Map("dt" -> "2024-01-01", "region" -> "eu"))))
    assert(a.triggerIntervalSec == 5 && a.maxIterations == 3)
    intercept[IllegalArgumentException](GraftApp.parseArgs(Array("--bogus")))
    intercept[IllegalArgumentException](GraftApp.parseArgs(Array.empty))
  }

  test("batch run from a config file: csv -> filter -> parquet") {
    val dir = tmpDir()
    val conf = writePipelineConf(dir)
    val results = GraftApp.run(GraftApp.CliArgs(configPaths = Seq(conf)), spark)
    assert(results.contains("load"))
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 2)
  }

  test("feed-sel regex selects actions; non-matching regex errors clearly") {
    val dir = tmpDir()
    val conf = writePipelineConf(dir)
    val res = GraftApp.run(GraftApp.CliArgs(configPaths = Seq(conf),
      feedSel = Some("stag.*")), spark)
    assert(res.contains("load"))
    val e = intercept[IllegalArgumentException](GraftApp.run(
      GraftApp.CliArgs(configPaths = Seq(conf), feedSel = Some("nomatch")), spark))
    assert(e.getMessage.contains("no actions selected"))
  }

  test("config directory: *.conf files merged in name order") {
    val dir = tmpDir()
    writePipelineConf(dir)
    val confDir = s"$dir/confs"
    new java.io.File(confDir).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$confDir/10-objects.conf"),
      s"""dataObjects {
         |  src { type = csv, path = "$dir/src" }
         |  out { type = parquet, path = "$dir/out2" }
         |}""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$confDir/20-actions.conf"),
      """actions { load2 { type = copy, inputId = src, outputId = out } }""")
    GraftApp.run(GraftApp.CliArgs(configPaths = Seq(confDir)), spark)
    assert(spark.read.parquet(s"$dir/out2").count() == 3)
  }

  test("simulate: init-only dry run propagates schemas, writes nothing") {
    val dir = tmpDir()
    val conf = writePipelineConf(dir)
    val res = GraftApp.run(GraftApp.CliArgs(configPaths = Seq(conf), simulate = true), spark)
    val outFeed = res("load").head
    assert(outFeed.dataFrame.isDefined)
    assert(outFeed.dataFrame.get.schema.fieldNames.toSet == Set("id", "name", "value"))
    assert(!new java.io.File(s"$dir/out").exists(), "simulate must not write output")
  }

  test("examples/training_pipeline.conf: full curation DAG runs through the CLI") {
    val dir = tmpDir()
    val conf = new String(Files.readAllBytes(
      java.nio.file.Paths.get("examples/training_pipeline.conf")))
      .replace("/tmp/graft-example-out", s"$dir/out")
    val confPath = s"$dir/pipeline.conf"
    Files.writeString(java.nio.file.Paths.get(confPath), conf)
    val res = GraftApp.run(GraftApp.CliArgs(configPaths = Seq(confPath),
      feedSel = Some("curation"), parallelism = 2), spark)
    assert(res.keySet == Set("clean", "score", "dedup", "freeze", "mix", "pack"))
    val frozen = spark.read.parquet(s"$dir/out/frozen")
    assert(frozen.count() > 0)
    assert(frozen.columns.toSet.contains("shard") && frozen.columns.toSet.contains("pos"))
    // split is the partition column of the final table
    val splits = frozen.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
    // PII pass really ran: no raw emails survive in the frozen corpus
    assert(frozen.where(col("text").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+")).isEmpty)
    // mixing attached the rate and stayed within the token budget's order
    val mixed = spark.read.parquet(s"$dir/out/mixed")
    assert(mixed.count() > 0 && mixed.columns.contains("_mix_rate_e6"))
    // packing: one row per chunk, chunk sizes bounded by maxLen
    val packed = spark.read.parquet(s"$dir/out/packed")
    assert(packed.count() >= mixed.count())
    assert(packed.agg(org.apache.spark.sql.functions.max(col("chunk_tokens")))
      .head.getInt(0) <= 64)
  }

  test("examples/training_pipeline.conf: ingest feed dedups batches against the append-only store") {
    val dir = tmpDir()
    val conf = new String(Files.readAllBytes(
      java.nio.file.Paths.get("examples/training_pipeline.conf")))
      .replace("/tmp/graft-example-out", s"$dir/out")
    val confPath = s"$dir/pipeline.conf"
    Files.writeString(java.nio.file.Paths.get(confPath), conf)
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
    // batch 1: two distinct docs
    Seq((1L, base), (2L, "entirely different content about query engines " * 5))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/out/incoming")
    GraftApp.run(GraftApp.CliArgs(configPaths = Seq(confPath), feedSel = Some("ingest")), spark)
    // batch 2: one near-dup of stored doc 1, one novel
    Seq((3L, base + " tail"), (4L, "novel text about deep sea exploration " * 5))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/out/incoming")
    GraftApp.run(GraftApp.CliArgs(configPaths = Seq(confPath), feedSel = Some("ingest")), spark)
    // novel sink accumulated exactly the store-novel survivors
    assert(spark.read.parquet(s"$dir/out/novel").select("doc_id")
      .as[Long].collect().toSet == Set(1L, 2L, 4L))
    // signature store grew append-only by the survivors
    assert(spark.read.parquet(s"$dir/out/doc_sigs").select("id")
      .as[Long].collect().toSet == Set(1L, 2L, 4L))
  }

  test("examples/training_pipeline.conf: stream_ingest feed runs micro-batch dedup from config") {
    val dir = tmpDir()
    val conf = new String(Files.readAllBytes(
      java.nio.file.Paths.get("examples/training_pipeline.conf")))
      .replace("/tmp/graft-example-out", s"$dir/out")
    val confPath = s"$dir/pipeline.conf"
    Files.writeString(java.nio.file.Paths.get(confPath), conf)
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
    // two source files → two micro-batches (maxFilesPerTrigger = 1)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/out/stream_in"))
    def addFile(rows: Seq[(Long, String)], name: String, mtime: Long): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("gasstage").toString
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$dir/out/stream_in/$name"))
      assert(new java.io.File(s"$dir/out/stream_in/$name").setLastModified(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    addFile(Seq((1L, base),
      (2L, "different content about engines and query planners " * 5)), "b1.parquet", t0)
    addFile(Seq((3L, base + " second crawl tail"),
      (4L, "novel text about deep sea exploration and marine life " * 5)), "b2.parquet", t0 + 2000)
    GraftApp.run(GraftApp.CliArgs(configPaths = Seq(confPath),
      feedSel = Some("stream_ingest")), spark)
    assert(spark.read.parquet(s"$dir/out/stream_novel").select("doc_id")
      .as[Long].collect().toSet == Set(1L, 2L, 4L))
    // one batch-keyed store partition of novel signatures per micro-batch;
    // the banded layout holds one row per band, laid out by blocking-key
    // prefix under the batch partition
    assert(spark.read.parquet(s"$dir/out/stream_sigs").select("id", "ingest_batch")
      .distinct().as[(Long, Long)].collect().toSet == Set((1L, 0L), (2L, 0L), (4L, 1L)))
    assert(new java.io.File(s"$dir/out/stream_sigs/ingest_batch=0").listFiles()
      .exists(_.getName.startsWith("store_pfx=")))
  }

  test("examples/warehouse_pipeline.conf: incremental stage + config merge + historize") {
    val dir = tmpDir()
    val conf = new String(Files.readAllBytes(
      java.nio.file.Paths.get("examples/warehouse_pipeline.conf")))
      .replace("/tmp/graft-warehouse-out", s"$dir/out")
    val confPath = s"$dir/pipeline.conf"
    Files.writeString(java.nio.file.Paths.get(confPath), conf)
    spark.sql("DROP TABLE IF EXISTS example_cur_orders")
    val res = GraftApp.run(GraftApp.CliArgs(configPaths = Seq(confPath),
      feedSel = Some("warehouse")), spark)
    assert(res.keySet == Set("stage", "upsert", "historize"))
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    // no 'X' status in the source, so the initial merge carries all rows
    assert(spark.table("example_cur_orders").count() == src.count())
    val hist = spark.read.parquet(s"$dir/out/hist_customer")
    assert(hist.columns.contains("dl_ts_delimited") && hist.count() > 0)
    // second run: stage skips (no rows above the watermark) but the DAG
    // completes; current state unchanged
    val res2 = GraftApp.run(GraftApp.CliArgs(configPaths = Seq(confPath),
      feedSel = Some("warehouse")), spark)
    assert(res2("stage").head.isSkipped)
    assert(spark.table("example_cur_orders").count() == src.count())
  }

  test("stateful run: state file lands in succeeded/ and records the action") {
    val dir = tmpDir()
    val conf = writePipelineConf(dir)
    GraftApp.run(GraftApp.CliArgs(configPaths = Seq(conf),
      statePath = Some(s"$dir/state"), appName = "cli-test"), spark)
    val succeeded = new java.io.File(s"$dir/state/succeeded")
      .listFiles((_, name) => name.endsWith(".json"))
    assert(succeeded != null && succeeded.nonEmpty)
    val content = new String(Files.readAllBytes(succeeded.head.toPath))
    assert(content.contains("\"load\"") && content.contains("SUCCEEDED"))
  }
}
