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
