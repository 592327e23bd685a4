package graft

import graft.core._
import graft.sources._
import org.apache.spark.sql.functions.{concat, lit}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

class ConnectorsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  implicit lazy val ctx: ActionPipelineContext =
    ActionPipelineContext(spark, new InstanceRegistry)

  class FakeHttp(responses: Map[String, String]) extends HttpTransport {
    val calls = scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, String])]
    override def get(url: String, headers: Map[String, String]): Array[Byte] = {
      calls += ((url, headers))
      responses.getOrElse(url, throw new IllegalArgumentException(s"no fake for $url")).getBytes("UTF-8")
    }
  }

  test("webservice: query-param partitions become requests and columns; auth header sent") {
    val http = new FakeHttp(Map(
      "https://api.example.com/data?region=eu" -> """[{"id":1,"v":"a"},{"id":2,"v":"b"}]""",
      "https://api.example.com/data?region=us" -> """[{"id":3,"v":"c"}]"""))
    val ws = WebserviceFileDataObject("ws1", "https://api.example.com/data",
      authMode = TokenAuthMode("t0k"), queryParameters = Map("region" -> Seq("eu", "us")),
      transport = http)
    val df = ws.getDataFrame()
    assert(df.count() == 3)
    assert(df.where(df("region") === "eu").count() == 2)
    assert(http.calls.forall(_._2("Authorization") == "Bearer t0k"))
    assert(ws.listPartitions.map(_.elements("region")).sorted == Seq("eu", "us"))
  }

  test("odata: follows @odata.nextLink pagination") {
    val http = new FakeHttp(Map(
      "https://svc/odata/Items" ->
        """{"value":[{"k":1},{"k":2}],"@odata.nextLink":"https://svc/odata/Items?page=2"}""",
      "https://svc/odata/Items?page=2" -> """{"value":[{"k":3}]}"""))
    val od = ODataDataObject("od1", "https://svc/odata", "Items", transport = http)
    val got = od.getDataFrame().collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("splunk client rows become a string DataFrame") {
    val client = new SplunkClient {
      override def search(q: String, from: String, to: String) =
        Seq(Map("host" -> "h1", "msg" -> "up"), Map("host" -> "h2"))
    }
    val sp = SplunkDataObject("sp1", "search index=x", client = client)
    val df = sp.getDataFrame()
    assert(df.columns.toSeq == Seq("host", "msg") && df.count() == 2)
    assert(df.where(df("host") === "h2").collect().head.isNullAt(1))
  }

  test("splunk splitQueryTimes: tumbling half-open windows, last clipped") {
    import java.time.{Duration, LocalDateTime}
    val f = LocalDateTime.of(2024, 1, 1, 0, 0)
    val t = LocalDateTime.of(2024, 1, 1, 0, 25)
    val w = SplunkDataObject.splitQueryTimes(f, t, Duration.ofMinutes(10))
    assert(w.size == 3)
    assert(w.head == (f, f.plusMinutes(10)))
    assert(w(1) == (f.plusMinutes(10), f.plusMinutes(20)))
    assert(w(2) == (f.plusMinutes(20), t)) // clipped, not overshooting `to`
    // windows tile exactly: each `to` is the next `from`
    assert(w.sliding(2).forall { case Seq(a, b) => a._2 == b._1; case _ => true })
    // exact fit: no empty trailing window
    assert(SplunkDataObject.splitQueryTimes(f, f.plusMinutes(20), Duration.ofMinutes(10)).size == 2)
  }

  test("splunk validateQuery: index required, search prefix added") {
    assert(SplunkDataObject.validateQuery("index=web error") == "search index=web error")
    assert(SplunkDataObject.validateQuery("search index=web") == "search index=web")
    intercept[IllegalArgumentException](SplunkDataObject.validateQuery("error"))
  }

  test("splunk windowed path: one executor-side search per window, schema-projected") {
    import java.time.{Duration, LocalDateTime}
    import org.apache.spark.sql.types.{StringType, StructField}
    val sp = SplunkDataObject("sp2", "index=web",
      queryFrom = LocalDateTime.of(2024, 1, 1, 0, 0),
      queryTo = LocalDateTime.of(2024, 1, 1, 2, 0),
      queryTimeInterval = Duration.ofMinutes(30),
      parallelRequests = 4,
      schema = Some(StructType(Seq(
        StructField("win", StringType), StructField("host", StringType)))),
      client = WindowEchoSplunkClient())
    val df = sp.getDataFrame()
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).sorted
    // 4 windows of 30min over 2h; one row per window, `host` missing -> ""
    assert(rows.map(_._1).toSeq == Seq(
      "2024-01-01T00:00:00/2024-01-01T00:30:00",
      "2024-01-01T00:30:00/2024-01-01T01:00:00",
      "2024-01-01T01:00:00/2024-01-01T01:30:00",
      "2024-01-01T01:30:00/2024-01-01T02:00:00"))
    assert(rows.forall(_._2 == ""))
    // the `search` prefix must be added before the query reaches the client
    assert(rows.nonEmpty) // (prefix checked inside the client via require)
  }

  test("splunk: from/to WITHOUT schema still runs windowed with the reference default (_raw,_time)") {
    import java.time.{Duration, LocalDateTime}
    val sp = SplunkDataObject("sp3", "index=web",
      queryFrom = LocalDateTime.of(2024, 1, 1, 0, 0),
      queryTo = LocalDateTime.of(2024, 1, 1, 1, 0),
      queryTimeInterval = Duration.ofMinutes(30),
      client = WindowEchoSplunkClient())
    val df = sp.getDataFrame()
    // the windowed path engaged (one row per 30-min window, not one search)
    assert(df.columns.toSeq == Seq("_raw", "_time"))
    assert(df.count() == 2)
  }

  test("airbyte subprocess protocol stream: RECORD kept for stream, STATE captured") {
    val script = java.nio.file.Files.createTempFile("airbyte", ".sh")
    java.nio.file.Files.writeString(script,
      """#!/bin/sh
        |echo '{"type":"LOG","log":{"message":"starting"}}'
        |echo '{"type":"RECORD","record":{"stream":"users","data":{"uid":1,"name":"ann"}}}'
        |echo '{"type":"RECORD","record":{"stream":"other","data":{"x":9}}}'
        |echo '{"type":"RECORD","record":{"stream":"users","data":{"uid":2,"name":"bob"}}}'
        |echo '{"type":"STATE","state":{"cursor":"42"}}'
        |""".stripMargin)
    script.toFile.setExecutable(true)
    val ab = AirbyteDataObject("ab1", Seq("/bin/sh", script.toString), streamName = "users")
    val df = ab.getDataFrame()
    assert(df.count() == 2 && df.columns.contains("uid"))
    assert(ab.getState.exists(_.contains("42")))
  }

  test("fileref transfer copies matching files and tracks watermark state") {
    val srcDir = java.nio.file.Files.createTempDirectory("fr_src")
    val dstDir = java.nio.file.Files.createTempDirectory("fr_dst")
    java.nio.file.Files.writeString(srcDir.resolve("a.txt"), "one")
    java.nio.file.Files.writeString(srcDir.resolve("b.txt"), "two")
    java.nio.file.Files.writeString(srcDir.resolve("skip.dat"), "no")
    val conf = spark.sparkContext.hadoopConfiguration
    val src = FileRefDataObject("src", s"$srcDir/*.txt", new HadoopFileRefTransport(conf))
    val dst = FileRefDataObject("dst", s"$dstDir/*", new HadoopFileRefTransport(conf),
      targetDir = Some(dstDir.toString))
    val moved = src.transferTo(dst)
    assert(moved.size == 2)
    assert(new java.io.File(dstDir.toFile, "a.txt").exists())
    assert(!new java.io.File(dstDir.toFile, "skip.dat").exists())
    // watermark: second transfer moves nothing new
    assert(src.transferTo(dst).isEmpty)
  }

  test("kafka option mapping and json decode/encode plumbing") {
    val k = KafkaTopicDataObject("k1", "events", "broker:9092", valueType = "json",
      valueSchema = Some(StructType.fromDDL("a INT, b STRING")),
      batchReadMaxOffsetsPerTrigger = Some(500L))
    assert(k.readOptions("subscribe") == "events")
    assert(k.readOptions("maxOffsetsPerTrigger") == "500")
    // decode on a frame with kafka's wire schema
    import spark.implicits._
    val wire = Seq(("k1", """{"a":5,"b":"x"}""", "events", 0, 7L, new java.sql.Timestamp(0)))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")
      .select($"key".cast("binary").as("key"), $"value".cast("binary").as("value"),
        $"topic", $"partition", $"offset", $"timestamp")
    val decoded = k.decode(wire)
    val row = decoded.selectExpr("value.a", "value.b", "offset").collect().head
    assert(row.getInt(0) == 5 && row.getString(1) == "x" && row.getLong(2) == 7L)
    val encoded = k.encodeForWrite(Seq((1, "z")).toDF("a", "b"))
    assert(encoded.columns.toSeq == Seq("key", "value"))
    assert(encoded.selectExpr("value").collect().head.getString(0).contains("\"a\":1"))
    // selectCols restricts the surfaced columns; datePartitionCol derives
    // a formatted day column from the frame timestamp (reference parity)
    val k2 = k.copy(selectCols = Seq("key", "value"),
      datePartitionCol = Some("day"), datePartitionFormat = "yyyyMMdd")
    val narrowed = k2.decode(wire)
    assert(narrowed.columns.toSeq == Seq("key", "value", "day"))
    assert(narrowed.select($"day").collect().head.getString(0) == "19700101")
  }

  test("kafka avro decode: plain writer schema, registry framing roundtrip, loud failures") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{struct, monotonically_increasing_id}
    val schema1 =
      """{"type":"record","name":"r","fields":[
        |{"name":"a","type":["null","long"]},{"name":"b","type":["null","string"]}]}""".stripMargin
    val schema2 =
      """{"type":"record","name":"r","fields":[
        |{"name":"a","type":["null","long"]},{"name":"b","type":["null","string"]},
        |{"name":"c","type":["null","double"]}]}""".stripMargin
    def wireOf(value: org.apache.spark.sql.Column, df: org.apache.spark.sql.DataFrame) =
      df.select(lit("k").cast("binary").as("key"), value.as("value"),
        lit("t").as("topic"), lit(0).as("partition"),
        monotonically_increasing_id().as("offset"),
        lit(new java.sql.Timestamp(0)).as("timestamp"))

    // union-null wire value: avro binary 0x00 = union branch 0 (null) —
    // the decode must SET isNull, not unbox null into a primitive slot
    locally {
      val unionSchema = """["null","long"]"""
      val bytes = Seq(Array[Byte](0), Array[Byte](2, 10)).toDF("b") // null; long 5
      val got = bytes.select(org.apache.spark.sql.avro.GraftAvroFunctions
        .from_avro($"b", unionSchema).as("v")).collect()
      assert(got(0).isNullAt(0))
      assert(got(1).getLong(0) == 5L)
    }

    // plain avro: to_avro → from_avro under an explicit writer schema
    val plain = KafkaTopicDataObject("ka", "t", "b:9092",
      valueType = "avro", valueAvroSchema = Some(schema2))
    val avroWire = wireOf(org.apache.spark.sql.avro.GraftAvroFunctions.to_avro(
      struct($"a", $"b", $"c"), schema2), Seq((1L, "x", 2.5)).toDF("a", "b", "c"))
    val row = plain.decode(avroWire).selectExpr("value.a", "value.b", "value.c").collect().head
    assert(row.getLong(0) == 1L && row.getString(1) == "x" && row.getDouble(2) == 2.5)

    // registry framing: encodeForWrite stamps the LATEST id; decode dispatches
    val reg = KafkaTopicDataObject("kr", "t", "b:9092",
      valueType = "avro-registry", schemaRegistry = Map(1 -> schema1, 2 -> schema2))
    val encoded = reg.encodeForWrite(Seq((7L, "y", 9.0)).toDF("a", "b", "c"))
    val header = encoded.select($"value").collect().head.getAs[Array[Byte]](0).take(5)
    assert(header.toSeq == Seq[Byte](0, 0, 0, 0, 2)) // magic + big-endian id 2
    val decoded = reg.decode(wireOf($"value",
        encoded.select($"value"))).selectExpr("value.a", "value.b", "value.c").collect().head
    assert(decoded.getLong(0) == 7L && decoded.getString(1) == "y" && decoded.getDouble(2) == 9.0)
    // an OLD writer id aligns to the latest schema with null-fill
    val oldFrame = wireOf(concat(lit(Array[Byte](0, 0, 0, 0, 1)),
      org.apache.spark.sql.avro.GraftAvroFunctions.to_avro(struct($"a", $"b"), schema1)),
      Seq((3L, "z")).toDF("a", "b"))
    val old = reg.decode(oldFrame).selectExpr("value.a", "value.b", "value.c").collect().head
    assert(old.getLong(0) == 3L && old.getString(1) == "z" && old.isNullAt(2))
    // unknown schema id and bad magic byte fail LOUDLY, not silently null
    val unknownId = wireOf(concat(lit(Array[Byte](0, 0, 0, 0, 9)),
      org.apache.spark.sql.avro.GraftAvroFunctions.to_avro(struct($"a", $"b"), schema1)),
      Seq((3L, "z")).toDF("a", "b"))
    val e1 = intercept[Exception](reg.decode(unknownId).collect())
    assert(e1.getMessage.contains("not in registry") || e1.getCause != null)
    val badMagic = wireOf(concat(lit(Array[Byte](1, 0, 0, 0, 2)),
      org.apache.spark.sql.avro.GraftAvroFunctions.to_avro(struct($"a", $"b"), schema1)),
      Seq((3L, "z")).toDF("a", "b"))
    assert(intercept[Exception](reg.decode(badMagic).collect()) != null)
    // config parsing wires the registry map
    val cfg = graft.core.ConfigParser.parse(
      """dataObjects:
        |  kcfg:
        |    type: kafka
        |    topic: t
        |    valueType: avro-registry
        |    schemaRegistry:
        |      "1": '{"type":"record","name":"r","fields":[{"name":"a","type":"long"}]}'
        |""".stripMargin)
    assert(cfg.dataObject("kcfg").asInstanceOf[KafkaTopicDataObject].schemaRegistry.contains(1))
  }

  test("kafka offset-range semantics and batching over a wire frame") {
    import spark.implicits._
    // 2 partitions × 12 offsets
    val wire = (0 until 2).flatMap(p => (0L until 12L).map(o => (p, o)))
      .toDF("partition", "offset")
      .select(lit("k").cast("binary").as("key"),
        concat(lit("""{"v":"""), $"offset", lit("}")).cast("binary").as("value"),
        lit("t").as("topic"), $"partition", $"offset",
        lit(new java.sql.Timestamp(0)).as("timestamp"))
    val k = KafkaTopicDataObject("k2", "t", "broker:9092",
      startingOffsets = """{"t":{"0":3}}""",
      endingOffsets = """{"t":{"0":10,"1":5}}""")
    // start inclusive, end exclusive, absent partition unbounded on start
    assert(k.offsetBounds("""{"t":{"0":3}}""") == Map(0 -> 3L))
    assert(k.offsetBounds("earliest").isEmpty && k.offsetBounds("latest").isEmpty)
    assert(k.offsetBounds("""{"other":{"0":9}}""").isEmpty)
    val bounded = k.decodeWire(wire)
    assert(bounded.count() == 7 + 5) // p0: [3,10) = 7, p1: [0,5) = 5
    // batching: chunks must partition the bounded range exactly
    val specs = k.wireBatchSpecs(wire, maxOffsets = 3)
    assert(specs.length >= 2)
    val union = specs.map { case (st, en) =>
      k.copy(startingOffsets = st, endingOffsets = en).decodeWire(wire) }
      .reduce(_.unionByName(_))
    assert(union.count() == bounded.count())
    assert(union.select($"partition", $"offset").distinct().count() == bounded.count())
  }

  test("kafka state-incremental: commits end offsets, second run reads only the delta") {
    import spark.implicits._
    import graft.operators.CopyAction
    import graft.operators.modes.KafkaStateIncrementalMode
    val dir = java.nio.file.Files.createTempDirectory("graft-kafka-inc").toString
    def wire(lo: Long, hi: Long) = (lo until hi).map(o => (0, o)).toDF("partition", "offset")
      .select(lit("k").cast("binary").as("key"),
        concat(lit("""{"v":"""), $"offset", lit("}")).cast("binary").as("value"),
        lit("t").as("topic"), $"partition", $"offset",
        lit(new java.sql.Timestamp(0)).as("timestamp"))
    wire(0, 5).write.parquet(s"$dir/arch")
    val reg = new InstanceRegistry()
    val k = KafkaTopicDataObject("ki", "t", "b:9092", archivePath = Some(s"$dir/arch"))
    reg.register(k)
    reg.register(ParquetFileDataObject("ko", s"$dir/out"))
    val a = CopyAction("inc", "ki", "ko", saveMode = Some(SdlSaveMode.Append),
      executionMode = Some(KafkaStateIncrementalMode()))
    val c2: ActionPipelineContext = ActionPipelineContext(spark, reg)
    def runOnce(): Unit = {
      a.exec(Seq.empty)(c2); a.executionMode.foreach(_.postExec(a)(c2)) }
    runOnce()
    assert(k.getState.contains("""{"t":{"0":5}}"""))
    assert(spark.read.parquet(s"$dir/out").count() == 5)
    wire(5, 12).write.mode("append").parquet(s"$dir/arch")
    runOnce()
    assert(k.getState.contains("""{"t":{"0":12}}"""))
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 12)                                   // exactly once
    assert(out.select($"offset").distinct().count() == 12)      // no dup offsets
  }

  test("kafka state-incremental with delayedMaxTimestampExpr: end offsets bounded by frame time") {
    import spark.implicits._
    import graft.operators.CopyAction
    import graft.operators.modes.KafkaStateIncrementalMode
    val dir = java.nio.file.Files.createTempDirectory("graft-kafka-delay").toString
    // partition 0: offsets 0..9, frame timestamps t0 + offset minutes
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    (0L until 10L).map(o => (0, o)).toDF("partition", "offset")
      .select(lit("k").cast("binary").as("key"),
        concat(lit("""{"v":"""), $"offset", lit("}")).cast("binary").as("value"),
        lit("t").as("topic"), $"partition", $"offset",
        (lit(t0).cast("long") + $"offset" * 60).cast("timestamp").as("timestamp"))
      .write.parquet(s"$dir/arch")
    val reg = new InstanceRegistry()
    val k = KafkaTopicDataObject("kd", "t", "b:9092", archivePath = Some(s"$dir/arch"))
    reg.register(k)
    reg.register(ParquetFileDataObject("kdo", s"$dir/out"))
    // delay bound at t0+4min → only offsets 0..4 qualify this run
    val a = CopyAction("incd", "kd", "kdo", saveMode = Some(SdlSaveMode.Append),
      executionMode = Some(KafkaStateIncrementalMode(
        Some("timestamp '2024-01-01 00:04:00'"))))
    val c2: ActionPipelineContext = ActionPipelineContext(spark, reg)
    a.exec(Seq.empty)(c2); a.executionMode.foreach(_.postExec(a)(c2))
    assert(k.getState.contains("""{"t":{"0":5}}"""))
    assert(spark.read.parquet(s"$dir/out").count() == 5)
    // next run without the delay picks up the held-back tail exactly once
    val a2 = CopyAction("incd2", "kd", "kdo", saveMode = Some(SdlSaveMode.Append),
      executionMode = Some(KafkaStateIncrementalMode()))
    a2.exec(Seq.empty)(c2); a2.executionMode.foreach(_.postExec(a2)(c2))
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 10 && out.select($"offset").distinct().count() == 10)
    // a bound before every frame → empty range (end 0), never unbounded
    assert(k.currentEndOffsets(Some(java.sql.Timestamp.valueOf("2023-01-01 00:00:00")))(c2)
      == """{"t":{"0":0}}""")
  }

  test("fileTransfer action drives a FileRef pair through the transports") {
    // with `fileRef` objects in HOCON this is the config-only remote
    // download pipeline: the action dispatches to transferTo (transport
    // streams + modification-time watermark), not the Hadoop path copy
    val srcDir = java.nio.file.Files.createTempDirectory("frta_src")
    val dstDir = java.nio.file.Files.createTempDirectory("frta_dst")
    java.nio.file.Files.writeString(srcDir.resolve("a.txt"), "one")
    java.nio.file.Files.writeString(srcDir.resolve("b.txt"), "two")
    val conf = spark.sparkContext.hadoopConfiguration
    val reg = new InstanceRegistry
    reg.register(FileRefDataObject("frsrc", s"$srcDir/*.txt", new HadoopFileRefTransport(conf)))
    reg.register(FileRefDataObject("frdst", s"$dstDir/*", new HadoopFileRefTransport(conf),
      targetDir = Some(dstDir.toString)))
    val c2: ActionPipelineContext = ActionPipelineContext(spark, reg)
    val out = graft.operators.FileTransferAction("ft", "frsrc", "frdst").exec(Seq.empty)(c2)
    assert(out.head.metrics.exists(_.recordsWritten == 2L))
    assert(new java.io.File(dstDir.toFile, "a.txt").exists())
    assert(new java.io.File(dstDir.toFile, "b.txt").exists())
    // watermark held by the src object: a re-exec moves nothing new
    val again = graft.operators.FileTransferAction("ft", "frsrc", "frdst").exec(Seq.empty)(c2)
    assert(again.head.metrics.exists(_.recordsWritten == 0L))
  }

  test("jms receiver: batchSize stop, cumulative txBatchSize acks, json parse") {
    val msgs = (1 to 10).map(i => s"""{"m":$i}""")
    var delivered = 0
    var acked = 0
    val ackTrail = scala.collection.mutable.ArrayBuffer.empty[Int]
    def consumer() = new JmsConsumer {
      override def receive(maxWaitMs: Long): JmsMessage =
        if (delivered >= msgs.size) null
        else {
          delivered += 1; val d = delivered
          new JmsMessage {
            val text: String = msgs(d - 1)
            // CLIENT_ACKNOWLEDGE: acking message d acks 1..d
            def acknowledge(): Unit = { acked = d; ackTrail += d }
          }
        }
      override def close(): Unit = ()
    }
    val jms = JmsDataObject("j1", () => consumer(), batchSize = 10,
      maxWaitMs = 0, maxBatchAgeMs = 60000, txBatchSize = 4)
    val df = jms.getDataFrame()
    assert(df.count() == 10)
    assert(acked == 10, "the final ack commits the whole batch")
    assert(ackTrail.toSeq == Seq(4, 8, 10),
      s"intermediate commits every txBatchSize, then the batch-store ack — got $ackTrail")
  }

  test("jms receiver: maxBatchAge ends an unfilled batch; empty queue yields empty frame") {
    def drained() = new JmsConsumer {
      override def receive(maxWaitMs: Long): JmsMessage = null
      override def close(): Unit = ()
    }
    val t0 = System.currentTimeMillis()
    val df = JmsDataObject("j2", () => drained(), batchSize = 100,
      maxWaitMs = 0, maxBatchAgeMs = 150, txBatchSize = 4,
      schema = Some(StructType(Seq(StructField("m", IntegerType))))).getDataFrame()
    assert(System.currentTimeMillis() - t0 >= 150, "the loop must run out the batch age")
    assert(df.count() == 0 && df.columns.toSeq == Seq("m"))
  }
}

/** Serializable fake for the distributed Splunk path: echoes its window
  * back as a row, so the test can assert exactly one search ran per window
  * (top-level class — an anonymous client would drag the suite into the
  * task closure). */
case class WindowEchoSplunkClient() extends SplunkClient {
  override def search(q: String, from: String, to: String): Seq[Map[String, String]] = {
    require(q == "search index=web", s"query must arrive validated, got '$q'")
    Seq(Map("win" -> s"$from/$to"))
  }
}
