package graft.sources

import graft.core.ActionPipelineContext
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.{DataType, StructType}

/** Schema definition sources ("schema providers"). Reference:
  * `sdl-core/util/misc/SchemaUtil.scala:143-151,312-325` — DDL string/file,
  * Scala case class, JSON schema, Avro schema (`getSchemaFromAvroSchema`),
  * XSD (`getSchemaFromXsd` via `SdlbXsdURIResolver`); plus the persisted
  * `.schema/currentSchema.json` written next to file DataObjects
  * (`SparkFileDataObject.scala:114-170`). Avro maps through Spark's bundled
  * `sql.avro.SchemaConverters`; XSD through xmlschema-core (both ship in
  * /opt/spark/jars).
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

  /** Avro schema (.avsc text) → StructType, exactly the reference's
    * mapping (`SchemaUtil.getSchemaFromAvroSchema:143-145`): Avro unions
    * with null become nullable fields, logical date/timestamp types map to
    * DateType/TimestampType. */
  def fromAvroSchema(avsc: String): StructType =
    org.apache.spark.sql.avro.SchemaConverters
      .toSqlType(new org.apache.avro.Schema.Parser().parse(avsc))
      .dataType.asInstanceOf[StructType]

  /** XSD → StructType (reference `getSchemaFromXsd:147-151` /
    * `SdlbXsdURIResolver.readXsd`). Supports the practical subset:
    * complexTypes with sequence/all particles, named-type references,
    * attributes (prefixed `_` like spark-xml), maxOccurs>1 → ArrayType,
    * minOccurs=0 or nillable → nullable; recursion capped at
    * `maxRecursion` (reference default 10). */
  def fromXsd(xsdContent: String, rowElementName: Option[String] = None,
              maxRecursion: Int = 10): StructType = {
    import org.apache.ws.commons.schema._
    import scala.jdk.CollectionConverters._
    val collection = new XmlSchemaCollection()
    val schema = collection.read(new java.io.StringReader(xsdContent))
    val elements = schema.getElements.asScala
    val root = rowElementName match {
      case Some(n) => elements.collectFirst { case (q, e) if q.getLocalPart == n => e }
        .getOrElse(throw new IllegalArgumentException(s"XSD: no top-level element '$n'"))
      case None =>
        require(elements.size == 1, s"XSD has ${elements.size} top-level elements; pass rowElementName")
        elements.values.head
    }
    def simpleType(qn: javax.xml.namespace.QName): DataType = qn.getLocalPart match {
      case "string" | "normalizedString" | "token" | "anyURI" | "QName" => org.apache.spark.sql.types.StringType
      case "int" | "unsignedShort" => org.apache.spark.sql.types.IntegerType
      case "long" | "integer" | "unsignedInt" | "nonNegativeInteger" | "positiveInteger" => org.apache.spark.sql.types.LongType
      case "short" | "byte" | "unsignedByte" => org.apache.spark.sql.types.ShortType
      case "decimal" => org.apache.spark.sql.types.DecimalType(38, 18)
      case "double" => org.apache.spark.sql.types.DoubleType
      case "float" => org.apache.spark.sql.types.FloatType
      case "boolean" => org.apache.spark.sql.types.BooleanType
      case "date" => org.apache.spark.sql.types.DateType
      case "dateTime" => org.apache.spark.sql.types.TimestampType
      case "base64Binary" | "hexBinary" => org.apache.spark.sql.types.BinaryType
      case _ => org.apache.spark.sql.types.StringType
    }
    def resolveType(e: XmlSchemaElement): XmlSchemaType =
      Option(e.getSchemaType).orElse(
        Option(e.getSchemaTypeName).map(collection.getTypeByQName)).orNull
    def typeOf(t: XmlSchemaType, e: XmlSchemaElement, depth: Int): DataType = t match {
      case null => org.apache.spark.sql.types.StringType
      case _: XmlSchemaSimpleType =>
        Option(e.getSchemaTypeName).map(simpleType).getOrElse(org.apache.spark.sql.types.StringType)
      case ct: XmlSchemaComplexType =>
        if (depth >= maxRecursion) org.apache.spark.sql.types.StringType
        else complexToStruct(ct, depth + 1)
      case _ => org.apache.spark.sql.types.StringType
    }
    def complexToStruct(ct: XmlSchemaComplexType, depth: Int): StructType = {
      val attrFields = ct.getAttributes.asScala.collect {
        case a: XmlSchemaAttribute =>
          val dt = Option(a.getSchemaTypeName).map(simpleType)
            .getOrElse(org.apache.spark.sql.types.StringType)
          org.apache.spark.sql.types.StructField("_" + a.getName, dt,
            nullable = a.getUse != XmlSchemaUse.REQUIRED)
      }.toSeq
      val members: Seq[XmlSchemaElement] = ct.getParticle match {
        case s: XmlSchemaSequence => s.getItems.asScala.collect { case e: XmlSchemaElement => e }.toSeq
        case a: XmlSchemaAll => a.getItems.asScala.collect { case e: XmlSchemaElement => e }.toSeq
        case c: XmlSchemaChoice => c.getItems.asScala.collect { case e: XmlSchemaElement => e }.toSeq
        case _ => Seq.empty
      }
      val elemFields = members.map { m =>
        val base = typeOf(resolveType(m), m, depth)
        val dt = if (m.getMaxOccurs > 1) org.apache.spark.sql.types.ArrayType(base) else base
        org.apache.spark.sql.types.StructField(m.getName, dt,
          nullable = m.getMinOccurs == 0 || m.isNillable || m.getMaxOccurs > 1)
      }
      StructType(attrFields ++ elemFields)
    }
    resolveType(root) match {
      case ct: XmlSchemaComplexType => complexToStruct(ct, 0)
      case _ => throw new IllegalArgumentException("XSD root element must have a complexType")
    }
  }

  /** provider-string resolution, reference-style prefixes:
    * `ddl:`, `json:` (StructType json), `jsonSchema:`, `avroSchema:`,
    * `ddlFile:`, `jsonFile:`, `jsonSchemaFile:`, `avroSchemaFile:`,
    * `xsdFile:` (optionally `xsdFile:<path>;<rowElement>`);
    * no prefix = DDL. */
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
      case Array("avroSchema", s) => fromAvroSchema(s)
      case Array("ddlFile", p) => fromDdl(fileText(p))
      case Array("jsonFile", p) => fromJson(fileText(p))
      case Array("jsonSchemaFile", p) => fromJsonSchema(fileText(p))
      case Array("avroSchemaFile", p) => fromAvroSchema(fileText(p))
      case Array("xsdFile", p) => p.split(";", 2) match {
        case Array(path, rowEl) => fromXsd(fileText(path), Some(rowEl.trim))
        case Array(path) => fromXsd(fileText(path))
      }
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
