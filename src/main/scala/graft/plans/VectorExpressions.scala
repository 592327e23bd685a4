package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshims.GraftSqlShims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** One-pass vector kernels for the similarity-search family. The HOF
  * formulation (`aggregate(zip_with(a, b, ...), 0.0, _ + _)`) is
  * interpreted per element AND builds an intermediate array per row; these
  * kernels run the same arithmetic in a tight loop over the unsafe array
  * data. BIT-COMPATIBLE with the HOF version by construction: identical
  * operations (widen to double, multiply, sequential left-fold add from
  * 0.0, same sqrt/division order), so every oracle that matched the HOF
  * results keeps matching.
  *
  * Inputs are embedding vectors: equal-length, non-null elements
  * (float or double). Unequal lengths yield 0.0 / +0 distance for the
  * overlapping prefix semantics never used in practice.
  */
object VectorKernels {
  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(a, i, aF) * get(b, i, bF); i += 1 }
    acc
  }

  /** cosine with the exact HOF expression shape:
    * denom = sqrt(a·a) * sqrt(b·b); denom > 0 ? a·b / denom : 0.0 —
    * all three accumulators folded in one pass. */
  def cosine(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, aF); val y = get(b, i, bF)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    val denom = math.sqrt(aa) * math.sqrt(bb)
    if (denom > 0) ab / denom else 0.0
  }

  def euclidean(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { val d = get(a, i, aF) - get(b, i, bF); acc += d * d; i += 1 }
    math.sqrt(acc)
  }
}

sealed abstract class VectorBinaryExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  protected def kernel: String
  protected final def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def call(a: ArrayData, b: ArrayData): Double
  override protected def nullSafeEval(a: Any, b: Any): Any =
    call(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.VectorKernels.$kernel($a, $b, ${isFloat(left)}, ${isFloat(right)})")
}

case class CosineSimilarityExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override protected def kernel: String = "cosine"
  override protected def call(a: ArrayData, b: ArrayData): Double =
    VectorKernels.cosine(a, b, isFloat(left), isFloat(right))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarityExpr =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_similarity"
}

case class DotProductExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override protected def kernel: String = "dot"
  override protected def call(a: ArrayData, b: ArrayData): Double =
    VectorKernels.dot(a, b, isFloat(left), isFloat(right))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

case class EuclideanDistanceExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override protected def kernel: String = "euclidean"
  override protected def call(a: ArrayData, b: ArrayData): Double =
    VectorKernels.euclidean(a, b, isFloat(left), isFloat(right))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): EuclideanDistanceExpr =
    copy(left = l, right = r)
  override def prettyName: String = "euclidean_distance"
}

/** Random-hyperplane LSH signature in ONE pass: all `planes.length` dot
  * products accumulate while the embedding streams through once, instead
  * of one kernel invocation (and one array traversal) per plane. Sign
  * bits pack ascending — bit-identical to the per-plane
  * `when(dot(emb, plane) > 0, 1L << i)` OR-fold it replaces. */
object HyperplaneKernel {
  def signature(emb: ArrayData, planes: Array[Array[Double]], isFloat: Boolean): Long = {
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(emb.numElements(), plane.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += (if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)) * plane(i)
        i += 1
      }
      if (acc > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

case class HyperplaneSignatureExpr(child: Expression, planes: Seq[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(planes.nonEmpty && planes.size <= 64, "1..64 hyperplanes")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  @transient private lazy val planeMatrix: Array[Array[Double]] = planes.toArray
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override protected def nullSafeEval(input: Any): Any =
    HyperplaneKernel.signature(input.asInstanceOf[ArrayData], planeMatrix, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplanes", planeMatrix, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.HyperplaneKernel.signature($c, $ref, $isFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignatureExpr =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_signature"
}

object VectorExpressions {
  def cosineSimilarity(a: Column, b: Column): Column =
    GraftSqlShims.column(CosineSimilarityExpr(
      GraftSqlShims.expression(a), GraftSqlShims.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    GraftSqlShims.column(DotProductExpr(
      GraftSqlShims.expression(a), GraftSqlShims.expression(b)))
  def euclideanDistance(a: Column, b: Column): Column =
    GraftSqlShims.column(EuclideanDistanceExpr(
      GraftSqlShims.expression(a), GraftSqlShims.expression(b)))
  def hyperplaneSignature(emb: Column, planes: Seq[Array[Double]]): Column =
    GraftSqlShims.column(HyperplaneSignatureExpr(
      GraftSqlShims.expression(emb), planes))
}
