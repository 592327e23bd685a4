package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshims.GraftSqlShims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC) kernel. Web-crawl corpora mix
  * precomposed and combining-mark encodings of the same glyph ("é" as
  * U+00E9 vs e+U+0301); every downstream hash-keyed dedup/fingerprint op
  * treats those as different documents unless the text is normalized
  * first, so NFC belongs at the head of a training-data pipeline.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan (ASCII and most
  * already-composed text short-circuits) and lets us return the INPUT
  * UTF8String without re-encoding — at 100 TB virtually all bytes take
  * this path and the op costs one vectorized scan pass, no allocation.
  */
object NfcKernel {
  def normalize(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

/** NFC normalization as a codegen'd Catalyst expression (no UDF boundary:
  * stays inside whole-stage codegen like the signature kernels). */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    NfcKernel.normalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcKernel.normalize($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object UnicodeExpressions {
  def nfcNormalize(text: Column): Column =
    GraftSqlShims.column(NfcNormalizeExpr(GraftSqlShims.expression(text)))
}
