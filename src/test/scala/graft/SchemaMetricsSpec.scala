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

  test("avro-schema provider: records, nullable unions, logical types") {
    val avsc =
      """{"type":"record","name":"Person","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"name","type":["null","string"],"default":null},
        |  {"name":"born","type":{"type":"int","logicalType":"date"}},
        |  {"name":"scores","type":{"type":"array","items":"double"}},
        |  {"name":"addr","type":{"type":"record","name":"Addr","fields":[
        |    {"name":"city","type":"string"}]}}
        |]}""".stripMargin
    val s = SchemaUtil.fromAvroSchema(avsc)
    assert(s("id").dataType == org.apache.spark.sql.types.LongType && !s("id").nullable)
    assert(s("name").dataType == org.apache.spark.sql.types.StringType && s("name").nullable)
    assert(s("born").dataType == org.apache.spark.sql.types.DateType)
    assert(s("scores").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false))
    assert(s("addr").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    // file-prefix round trip
    val f = java.nio.file.Files.createTempFile("graft_schema", ".avsc")
    java.nio.file.Files.writeString(f, avsc)
    assert(SchemaUtil.resolve(s"avroSchemaFile:$f", spark.sparkContext.hadoopConfiguration) == s)
  }

  test("xsd provider: sequence elements, attributes, occurs/nillable, nesting") {
    val xsd =
      """<?xml version="1.0"?>
        |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |  <xs:element name="order">
        |    <xs:complexType>
        |      <xs:sequence>
        |        <xs:element name="id" type="xs:long"/>
        |        <xs:element name="note" type="xs:string" minOccurs="0"/>
        |        <xs:element name="qty" type="xs:int" nillable="true"/>
        |        <xs:element name="price" type="xs:double"/>
        |        <xs:element name="placed" type="xs:dateTime"/>
        |        <xs:element name="tag" type="xs:string" maxOccurs="unbounded"/>
        |        <xs:element name="addr">
        |          <xs:complexType><xs:sequence>
        |            <xs:element name="city" type="xs:string"/>
        |          </xs:sequence></xs:complexType>
        |        </xs:element>
        |      </xs:sequence>
        |      <xs:attribute name="version" type="xs:int" use="required"/>
        |    </xs:complexType>
        |  </xs:element>
        |</xs:schema>""".stripMargin
    val s = SchemaUtil.fromXsd(xsd)
    assert(s("id").dataType == org.apache.spark.sql.types.LongType && !s("id").nullable)
    assert(s("note").nullable)
    assert(s("qty").dataType == org.apache.spark.sql.types.IntegerType && s("qty").nullable)
    assert(s("price").dataType == org.apache.spark.sql.types.DoubleType)
    assert(s("placed").dataType == org.apache.spark.sql.types.TimestampType)
    assert(s("tag").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    assert(s("addr").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]("city").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(s("_version").dataType == org.apache.spark.sql.types.IntegerType && !s("_version").nullable)
    // xsdFile: prefix with explicit row element
    val f = java.nio.file.Files.createTempFile("graft_schema", ".xsd")
    java.nio.file.Files.writeString(f, xsd)
    assert(SchemaUtil.resolve(s"xsdFile:$f;order", spark.sparkContext.hadoopConfiguration) == s)
    // an XSD-declared schema drives a real XML read
    val dir = java.nio.file.Files.createTempDirectory("graft_xsdxml").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/orders.xml"),
      """<orders>
        |  <order version="1"><id>7</id><qty>3</qty><price>9.5</price>
        |    <placed>2024-01-01T10:00:00Z</placed><tag>a</tag><tag>b</tag>
        |    <addr><city>Bern</city></addr></order>
        |</orders>""".stripMargin)
    val xml = XmlFileDataObject("x1", dir, rowTag = "order", schema = Some(s))
    val row = xml.getDataFrame().collect().head
    assert(row.getAs[Long]("id") == 7L)
    assert(row.getAs[scala.collection.Seq[String]]("tag").toSeq == Seq("a", "b"))
    assert(row.getAs[Int]("_version") == 1)
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

  test("sample-file schema inference: .sample drives the read schema when no schema file exists") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sample").toString
    // data written by an "external" producer: no .schema dir, only raw files
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/part1.json"), "{\"a\": 1}\n")
    // a representative .sample file carries the richer schema
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/.sample"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/.sample/sampleData.json"),
      "{\"a\": 1, \"b\": \"x\"}\n")
    val obj = JsonFileDataObject("smp1", dir)
    val df = obj.getDataFrame()
    // column b exists only in the sample — proof inference used .sample,
    // not a full scan of the data files
    assert(df.schema.fieldNames.toSet == Set("a", "b"))
    assert(df.count() == 1)
    // persistSample writes a bounded sample for later inference-free reads
    obj.persistSample()
    assert(new java.io.File(s"$dir/.sample").listFiles().exists(_.getName.endsWith(".json")))
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
