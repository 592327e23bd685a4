package graft

import graft.core._
import graft.operators._
import graft.operators.modes.SparkStreamingMode
import graft.sources._
import graft.streaming._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Structured Streaming behind the DataObject/Action interface (reference
  * `SmartDataLakeBuilderStreamingTest`) + watermark windows (our addition).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  val eventSchema = StructType(Seq(
    StructField("id", LongType), StructField("ts", TimestampType), StructField("v", DoubleType)))

  test("streaming copy with AvailableNow: incremental via checkpoint") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val reg = new InstanceRegistry()
    reg.register(JsonFileDataObject("src", s"$dir/src", schema = Some(eventSchema)))
    reg.register(ParquetFileDataObject("sink", s"$dir/sink"))
    val action = CopyAction("stream_cp", "src", "sink",
      transformers = Seq(FilterTransformer("v > 0")),
      executionMode = Some(SparkStreamingMode(s"$dir/checkpoint", "AvailableNow")))
    reg.register(action)
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)

    Seq((1L, "2024-01-01 00:00:00", 1.0), (2L, "2024-01-01 00:01:00", -5.0),
      (3L, "2024-01-01 00:02:00", 2.0))
      .toDF("id", "ts", "v").selectExpr("id", "CAST(ts AS TIMESTAMP) ts", "v")
      .write.json(s"$dir/src")
    action.exec(Seq.empty)
    assert(spark.read.parquet(s"$dir/sink").count() == 2) // v>0 only

    // second batch: only the new file is processed (checkpointed offsets)
    Seq((4L, "2024-01-01 00:03:00", 3.0)).toDF("id", "ts", "v")
      .selectExpr("id", "CAST(ts AS TIMESTAMP) ts", "v")
      .write.mode("append").json(s"$dir/src")
    action.exec(Seq.empty)
    assert(spark.read.parquet(s"$dir/sink").count() == 3)
  }

  test("event-time tumbling window + watermark over a stream") {
    val dir = Files.createTempDirectory("graft-stream").toString
    Seq(
      (1L, "2024-01-01 00:00:10", 1.0), (2L, "2024-01-01 00:00:50", 2.0),
      (3L, "2024-01-01 00:01:10", 4.0), (4L, "2024-01-01 00:02:30", 8.0))
      .toDF("id", "ts", "v").selectExpr("id", "CAST(ts AS TIMESTAMP) ts", "v")
      .write.json(s"$dir/src")

    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, new InstanceRegistry())
    val src = JsonFileDataObject("src", s"$dir/src", schema = Some(eventSchema))
    val stream = src.getStreamingDataFrame(Map.empty, None)
    val windowed = EventTimeWindowTransformer(
      eventTimeColumn = "ts", windowDuration = "1 minute",
      watermarkDuration = "0 seconds",
      aggExpressions = Map("sum_v" -> "sum(v)", "cnt" -> "count(*)"))
      .transform(stream)
    val q = windowed.writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.awaitTermination()
    val got = spark.table("win_agg")
      .selectExpr("CAST(window_start AS STRING)", "sum_v", "cnt").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == Set(
      ("2024-01-01 00:00:00", 3.0, 2L),
      ("2024-01-01 00:01:00", 4.0, 1L),
      ("2024-01-01 00:02:00", 8.0, 1L)))
  }

  test("streaming dedup within watermark: duplicate keys collapse, state bounded") {
    val dir = Files.createTempDirectory("graft-stream").toString
    Seq(
      (1L, "2024-01-01 00:00:10", 1.0),
      (1L, "2024-01-01 00:00:20", 1.0),  // dup key within watermark -> dropped
      (2L, "2024-01-01 00:00:30", 2.0),
      (3L, "2024-01-01 00:01:10", 3.0))
      .toDF("id", "ts", "v").selectExpr("id", "CAST(ts AS TIMESTAMP) ts", "v")
      .write.json(s"$dir/src")
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, new InstanceRegistry())
    val src = JsonFileDataObject("src", s"$dir/src", schema = Some(eventSchema))
    val deduped = StreamingDedupTransformer(Seq("id"),
      eventTimeColumn = Some("ts"), withinWatermark = Some("10 minutes"))
      .transform(src.getStreamingDataFrame(Map.empty, None))
    assert(deduped.isStreaming)
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.awaitTermination()
    val ids = spark.table("dedup_stream").select("id").collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L))
    // batch frame: same transformer degrades to plain dropDuplicates
    val batch = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("id", "x")
    assert(StreamingDedupTransformer(Seq("id")).transform(batch).count() == 2)
  }

  test("windowed transformer works identically on batch input") {
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, new InstanceRegistry())
    val batch = Seq((1L, "2024-01-01 00:00:10", 1.0), (2L, "2024-01-01 00:01:20", 2.0))
      .toDF("id", "ts", "v").selectExpr("id", "CAST(ts AS TIMESTAMP) ts", "v")
    val out = EventTimeWindowTransformer("ts", "1 minute",
      aggExpressions = Map("cnt" -> "count(*)")).transform(batch)
    assert(out.count() == 2)
  }

  test("stateful processing: running count per key via flatMapGroupsWithState") {
    import org.apache.spark.sql.streaming.GroupState
    val ds = Seq(("a", 1), ("a", 2), ("b", 5)).toDS()
    // batch mode mapGroups equivalence check of the helper's typed plumbing
    val out = StatefulProcessing.flatMapGroupsWithState[String, (String, Int), Int, (String, Int)](
      ds, _._1,
      (k: String, it: Iterator[(String, Int)], st: GroupState[Int]) => {
        val total = it.map(_._2).sum + st.getOption.getOrElse(0)
        st.update(total)
        Iterator((k, total))
      })
    assert(out.collect().toSet == Set(("a", 3), ("b", 5)))
  }

  test("streaming merge into a table sink: micro-batches upsert on the primary key") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val kvSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val reg = new InstanceRegistry()
    reg.register(JsonFileDataObject("src", s"$dir/src", schema = Some(kvSchema)))
    reg.register(HiveTableDataObject("tbl",
      Table(None, "stream_merge_tbl", Some(Seq("id")))))
    val action = CopyAction("stream_merge", "src", "tbl",
      saveMode = Some(SdlSaveMode.Merge),
      executionMode = Some(SparkStreamingMode(s"$dir/ckpt", "AvailableNow")))
    reg.register(action)
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)

    Seq((1L, "a"), (2L, "b")).toDF("id", "name").write.json(s"$dir/src")
    action.exec(Seq.empty)
    // second increment: update id 2, insert id 3 — the checkpoint makes the
    // stream pick up only the new file; merge upserts it into the table
    Seq((2L, "b2"), (3L, "c")).toDF("id", "name").write.mode("append").json(s"$dir/src")
    action.exec(Seq.empty)
    val got = spark.table("stream_merge_tbl").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("CDF streaming source drives a config-parsed pipeline: versioned table → stream copy") {
    // the full "CDC without state plumbing" story END TO END through the
    // ACTION layer: a CDF-enabled versioned table is the streaming INPUT
    // of an ordinary config-driven copy — SparkStreamingMode only needs
    // CanCreateStreamingDataFrame, so the change feed flows like any
    // other stream, incl. incremental pickup across runs via the
    // engine's file-source checkpoint.
    val dir = Files.createTempDirectory("graft-stream").toString
    val cfg =
      s"""dataObjects:
         |  vsrc: {type: versionedTable, path: $dir/t, primaryKey: [k], changeDataFeed: true}
         |  vdst: {type: parquet, path: $dir/out}
         |actions:
         |  cdc:
         |    type: copy
         |    inputId: vsrc
         |    outputId: vdst
         |    executionMode:
         |      type: streaming
         |      checkpointLocation: $dir/cp
         |      triggerType: AvailableNow
         |    metadata: {feed: cdf}
         |""".stripMargin
    val t = VersionedTableDataObject("seed", s"$dir/t", primaryKey = Seq("k"),
      changeDataFeed = true)
    implicit val ctx0: ActionPipelineContext = ActionPipelineContext(spark, new InstanceRegistry)
    t.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v"))(ctx0)                // v0
    t.mergeDataFrame(Seq((2, "B")).toDF("k", "v"), Seq("k"))(ctx0)                // v1
    core.PipelineRunner.run(cfg, spark, feedSel = Some("cdf"))
    def out() = spark.read.parquet(s"$dir/out")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(out() == Set((1, "a", "insert", 0L), (2, "b", "insert", 0L),
      (2, "b", "update_preimage", 1L), (2, "B", "update_postimage", 1L)))
    // a later commit is picked up INCREMENTALLY by the next run
    t.mergeDataFrame(Seq((3, "c")).toDF("k", "v"), Seq("k"))(ctx0)                // v2
    core.PipelineRunner.run(cfg, spark, feedSel = Some("cdf"))
    assert(out().contains((3, "c", "insert", 2L)) && out().size == 5)
  }

  test("CDF streaming source honors maxFilesPerTrigger rate limiting (Delta parity)") {
    val dir = Files.createTempDirectory("graft-cdfrate").toString
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, new InstanceRegistry())
    val t = VersionedTableDataObject("cdfr", s"$dir/t", primaryKey = Seq("k"),
      changeDataFeed = true)
    import spark.implicits._
    t.writeDataFrame(Seq((1, "a")).toDF("k", "v"))                                // v0
    t.writeDataFrame(Seq((2, "b")).toDF("k", "v"), saveMode = Some(SdlSaveMode.Append)) // v1
    t.writeDataFrame(Seq((3, "c")).toDF("k", "v"), saveMode = Some(SdlSaveMode.Append)) // v2
    // options pass through to Spark's file stream source — one change file
    // per trigger bounds micro-batch size like Delta's readChangeFeed
    val stream = t.getStreamingDataFrame(Map("maxFilesPerTrigger" -> "1"), None)
    val q = stream.writeStream.format("memory").queryName("cdf_rate")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.awaitTermination()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 3, s"3 commits at 1 file/trigger need >= 3 micro-batches, saw $batches")
    assert(spark.table("cdf_rate").count() == 3)
  }
}
