package graft.sources

import graft.core.ActionPipelineContext
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.{DataType, StructType}

/** Schema definition sources ("schema providers"). Reference:
  * `sdl-core/util/misc/SchemaUtil.scala:147-151,312-325` — DDL string/file,
  * Scala case class, JSON schema; plus the persisted
  * `.schema/currentSchema.json` written next to file DataObjects
  * (`SparkFileDataObject.scala:114-170`). XSD/Avro schema providers need
  * jars not present offline.
  */
object SchemaUtil {

  /** `"id INT, name STRING"` */
  def fromDdl(ddl: String): StructType = StructType.fromDDL(ddl)

  /** Spark StructType JSON (as produced by `StructType.json`) */
  def fromJson(json: String): StructType =
    DataType.fromJson(json).asInstanceOf[StructType]

  /** schema of a Scala case class via its product encoder */
  def fromCaseClass[T <: Product : scala.reflect.runtime.universe.TypeTag]: StructType =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[T]().schema

  /** load from a file containing either DDL (`*.ddl`) or StructType JSON */
  def fromFile(path: String, hadoopConf: org.apache.hadoop.conf.Configuration): StructType = {
    val p = new Path(path)
    val in = p.getFileSystem(hadoopConf).open(p)
    val text = try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
               finally in.close()
    if (path.endsWith(".ddl")) fromDdl(text) else fromJson(text)
  }

  /** JSON Schema (draft-style: type/properties/items/required) →
    * StructType. Reference supports JSON-schema files as a provider
    * (`SchemaUtil.scala:312-325`). */
  def fromJsonSchema(jsonSchema: String): StructType = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def convert(node: com.fasterxml.jackson.databind.JsonNode): DataType =
      node.get("type").asText match {
        case "object" =>
          val required = Option(node.get("required")).map { r =>
            val b = Seq.newBuilder[String]; r.elements().forEachRemaining(e => b += e.asText); b.result().toSet
          }.getOrElse(Set.empty[String])
          val props = node.get("properties")
          val fields = Seq.newBuilder[org.apache.spark.sql.types.StructField]
          if (props != null) props.properties().forEach { e =>
            fields += org.apache.spark.sql.types.StructField(
              e.getKey, convert(e.getValue), nullable = !required.contains(e.getKey))
          }
          StructType(fields.result())
        case "array" =>
          org.apache.spark.sql.types.ArrayType(convert(node.get("items")))
        case "string" =>
          Option(node.get("format")).map(_.asText) match {
            case Some("date") => org.apache.spark.sql.types.DateType
            case Some("date-time") => org.apache.spark.sql.types.TimestampType
            case _ => org.apache.spark.sql.types.StringType
          }
        case "integer" => org.apache.spark.sql.types.LongType
        case "number" => org.apache.spark.sql.types.DoubleType
        case "boolean" => org.apache.spark.sql.types.BooleanType
        case other => throw new IllegalArgumentException(s"unsupported JSON-schema type '$other'")
      }
    convert(mapper.readTree(jsonSchema)).asInstanceOf[StructType]
  }

  /** provider-string resolution, reference-style prefixes:
    * `ddl:`, `json:` (StructType json), `jsonSchema:`,
    * `ddlFile:`, `jsonFile:`, `jsonSchemaFile:`; no prefix = DDL. */
  def resolve(spec: String, hadoopConf: org.apache.hadoop.conf.Configuration): StructType = {
    def fileText(path: String): String = {
      val p = new Path(path.trim)
      val in = p.getFileSystem(hadoopConf).open(p)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
    }
    spec.split(":", 2) match {
      case Array("ddl", s) => fromDdl(s)
      case Array("json", s) => fromJson(s)
      case Array("jsonSchema", s) => fromJsonSchema(s)
      case Array("ddlFile", p) => fromDdl(fileText(p))
      case Array("jsonFile", p) => fromJson(fileText(p))
      case Array("jsonSchemaFile", p) => fromJsonSchema(fileText(p))
      case _ => fromDdl(spec)
    }
  }

  // ---- persisted schema alongside a file DataObject --------------------

  private def schemaFile(basePath: String) = new Path(basePath, ".schema/currentSchema.json")

  /** persist the written DataFrame's schema for later schema-stable reads */
  def persistSchema(basePath: String, schema: StructType)
                   (implicit ctx: ActionPipelineContext): Unit = {
    val f = schemaFile(basePath)
    val fs = f.getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)
    val out = fs.create(f, true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
  }

  /** previously persisted schema, if any — lets schema-on-read formats
    * (csv/json/xml) skip inference scans on every read */
  def readPersistedSchema(basePath: String)
                         (implicit ctx: ActionPipelineContext): Option[StructType] = {
    val f = schemaFile(basePath)
    val fs = f.getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      val text = try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
                 finally in.close()
      Some(fromJson(text))
    }
  }
}
