package org.apache.spark.sql.avro

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType}

/** From-scratch `from_avro`/`to_avro` Catalyst expressions. This image's
  * spark-sql jar carries the avro FILE FORMAT (AvroFileFormat,
  * AvroSerializer/AvroDeserializer, SchemaConverters) but not the
  * spark-avro module's converter expressions, so the built-in
  * `org.apache.spark.sql.avro.functions.{from_avro,to_avro}` throw
  * AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE. These expressions provide the
  * same public API semantics (binary ⇄ catalyst under an explicit Avro
  * writer schema) on top of the in-image (de)serializers: per-row
  * GenericDatum{Reader,Writer} with decoder/buffer reuse, and a codegen
  * wrapper that keeps the expression inside whole-stage codegen spans
  * (the same call-out shape Spark's own converter expressions use — the
  * datum decode itself is inherently interpreted library code).
  * Lives under `org.apache.spark.sql.avro` for `private[sql]` access to
  * AvroDeserializer/AvroSerializer — the standard extension-library shim
  * pattern. Used by `graft.sources.KafkaTopicDataObject` for Avro wire
  * decode (reference: `sdl-kafka/.../KafkaTopicDataObject.scala:129-151`).
  */
case class GraftAvroDecode(child: Expression, jsonFormatSchema: String)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_from_avro"

  @transient private lazy val avroSchema = new Schema.Parser().parse(jsonFormatSchema)
  override lazy val dataType: DataType = SchemaConverters.toSqlType(avroSchema).dataType
  @transient private lazy val reader = new GenericDatumReader[Any](avroSchema)
  @transient private lazy val deserializer =
    new AvroDeserializer(avroSchema, dataType, "CORRECTED",
      false, "", -1)
  @transient private var decoder: BinaryDecoder = _
  @transient private var result: Any = _

  override def nullSafeEval(input: Any): Any = {
    val binary = input.asInstanceOf[Array[Byte]]
    decoder = DecoderFactory.get().binaryDecoder(binary, 0, binary.length, decoder)
    result = reader.read(result, decoder)
    // a writer union ["null", T] encoding null decodes to a null datum —
    // short-circuit BEFORE the deserializer, whose primitive row updater
    // would coerce it to the type's zero value (0 for long) instead of
    // SQL NULL
    if (result == null) null
    else deserializer.deserialize(result).getOrElse(null)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("this", this)
    // nullSafeEval can RETURN null (writer union ["null", T] encoding a
    // null value): the generated code must set isNull like Spark's own
    // AvroDataToCatalyst does — assigning null into a primitive slot
    // auto-unboxes to an NPE, and a null struct with isNull=false NPEs
    // the downstream UnsafeProjection
    nullSafeCodeGen(ctx, ev, eval => {
      val tmp = ctx.freshName("avroResult")
      s"""Object $tmp = $expr.nullSafeEval($eval);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (${CodeGenerator.boxedType(dataType)}) $tmp;
         |}""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): GraftAvroDecode =
    copy(child = newChild)
}

/** Catalyst → Avro binary under an explicit writer schema (see
  * [[GraftAvroDecode]] for why this exists). */
case class GraftAvroEncode(child: Expression, jsonFormatSchema: String)
  extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_to_avro"

  @transient private lazy val avroSchema = new Schema.Parser().parse(jsonFormatSchema)
  @transient private lazy val serializer =
    new AvroSerializer(child.dataType, avroSchema, child.nullable)
  @transient private lazy val writer = new GenericDatumWriter[Any](avroSchema)
  @transient private lazy val out = new ByteArrayOutputStream()
  @transient private var encoder: BinaryEncoder = _

  override def nullSafeEval(input: Any): Any = {
    out.reset()
    encoder = EncoderFactory.get().directBinaryEncoder(out, encoder)
    writer.write(serializer.serialize(input), encoder)
    encoder.flush()
    out.toByteArray
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("this", this)
    nullSafeCodeGen(ctx, ev, eval =>
      s"${ev.value} = (byte[]) $expr.nullSafeEval($eval);")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftAvroEncode =
    copy(child = newChild)
}

/** Column-level entry points mirroring the public
  * `org.apache.spark.sql.avro.functions` API. */
object GraftAvroFunctions {
  def from_avro(data: Column, jsonFormatSchema: String): Column =
    ExpressionUtils.column(GraftAvroDecode(ExpressionUtils.expression(data), jsonFormatSchema))
  def to_avro(data: Column, jsonFormatSchema: String): Column =
    ExpressionUtils.column(GraftAvroEncode(ExpressionUtils.expression(data), jsonFormatSchema))
}
