package graft

import graft.core._
import graft.sources._
import org.scalatest.funsuite.AnyFunSuite

object SchemaMetricsSpec {
  case class Person(id: Int, name: String, score: Double)
}

class SchemaMetricsSpec extends AnyFunSuite {
  import SchemaMetricsSpec._
  lazy val spark = TestSession.spark
  implicit lazy val ctx: ActionPipelineContext =
    ActionPipelineContext(spark, new InstanceRegistry)

  test("case-class and json schema providers") {
    val s = SchemaUtil.fromCaseClass[Person]
    assert(s.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(SchemaUtil.fromJson(s.json) == s)
    assert(SchemaUtil.fromDdl("id INT, name STRING").fieldNames.length == 2)
  }

  test("json-schema provider and prefix resolution") {
    val js =
      """{"type":"object","required":["id"],"properties":{
        |  "id": {"type":"integer"},
        |  "name": {"type":"string"},
        |  "born": {"type":"string","format":"date"},
        |  "scores": {"type":"array","items":{"type":"number"}},
        |  "addr": {"type":"object","properties":{"city":{"type":"string"}}}
        |}}""".stripMargin
    val s = SchemaUtil.fromJsonSchema(js)
    assert(s("id").dataType == org.apache.spark.sql.types.LongType && !s("id").nullable)
    assert(s("born").dataType == org.apache.spark.sql.types.DateType)
    assert(s("scores").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    assert(s("addr").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    val conf = spark.sparkContext.hadoopConfiguration
    assert(SchemaUtil.resolve("ddl: x INT, y STRING", conf).fieldNames.length == 2)
    assert(SchemaUtil.resolve("x INT", conf).fieldNames.toSeq == Seq("x"))
    assert(SchemaUtil.resolve("jsonSchema:" + js, conf) == s)
  }

  test("written csv persists schema; reads skip inference and keep types") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sch").toString
    val obj = CsvFileDataObject("c1", dir)
    obj.writeDataFrame(Seq((1, "a", 2.5), (2, "b", 3.5)).toDF("id", "name", "score"),
      Seq.empty, Some(SdlSaveMode.Overwrite))
    assert(new java.io.File(dir, ".schema/currentSchema.json").exists())
    // fresh object without declared schema: read resolves the persisted one
    val back = CsvFileDataObject("c2", dir).getDataFrame()
    assert(back.schema("id").dataType == org.apache.spark.sql.types.IntegerType)
    assert(back.schema("score").dataType == org.apache.spark.sql.types.DoubleType)
    assert(back.count() == 2)
    // the .schema dir does not count as data
    val empty = java.nio.file.Files.createTempDirectory("graft_sch2").toString
    SchemaUtil.persistSchema(empty, back.schema)
    assert(!CsvFileDataObject("c3", empty).exists)
  }

  test("write metrics include stage-level records/bytes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_met").toString
    val obj = ParquetFileDataObject("m1", dir)
    val m = obj.writeDataFrame((1 to 100).map(i => (i, s"v$i")).toDF("id", "v"),
      Seq.empty, Some(SdlSaveMode.Overwrite))
    assert(m.observedMetrics("stage_records_written") == 100L)
    assert(m.observedMetrics("stage_bytes_written").asInstanceOf[Long] > 0L)
    assert(m.observedMetrics("stage_executor_run_time_ms").asInstanceOf[Long] >= 0L)
  }
}
