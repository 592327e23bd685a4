package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (encode / decode / asymmetric-distance).
  *
  * PQ splits a d-dim vector into `m` subvectors of `dsub = d/m` dims and
  * replaces each subvector with the id of its nearest codebook centroid —
  * an m-BYTE code instead of 4·d bytes of floats (32× compression at
  * d=64, m=8). At 100 TB of embeddings this is the difference between
  * scanning codes and scanning vectors: probes score compressed codes and
  * only the refine step touches full vectors. Reference has no vector
  * search at all; design follows Jégou et al., "Product Quantization for
  * Nearest Neighbor Search" (TPAMI 2011) — public literature.
  *
  * All kernels run on unsafe array data in tight loops (same rationale as
  * [[VectorKernels]]): no per-element boxing, codegen-friendly single
  * static calls.
  */
object PqKernel {
  /** nearest-centroid id per subspace → m-byte code */
  def encode(emb: ArrayData, cb: Array[Array[Array[Float]]], isFloat: Boolean): Array[Byte] = {
    val m = cb.length
    val out = new Array[Byte](m)
    var off = 0
    var s = 0
    while (s < m) {
      val cents = cb(s)
      val dsub = cents(0).length
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cents.length) {
        val c = cents(j)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val x = (if (isFloat) emb.getFloat(off + i).toDouble else emb.getDouble(off + i)) - c(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best.toByte
      off += dsub
      s += 1
    }
    out
  }

  /** reconstruct the (normalized-domain) vector: concat of coded centroids */
  def decode(code: Array[Byte], cb: Array[Array[Array[Float]]]): ArrayData = {
    val m = cb.length
    val dsub = cb(0)(0).length
    val out = new Array[Float](m * dsub)
    var s = 0
    while (s < m) {
      val c = cb(s)(code(s) & 0xFF)
      System.arraycopy(c, 0, out, s * dsub, dsub)
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** asymmetric distance computation: the classic PQ scoring trick — the
    * query precomputes `lut(s)(j) = <q_sub_s, centroid_j>` once, then
    * each row scores in m table lookups + adds instead of d multiplies. */
  def adc(code: Array[Byte], lut: Array[Array[Double]]): Double = {
    var acc = 0.0
    var s = 0
    while (s < lut.length) {
      acc += lut(s)(code(s) & 0xFF)
      s += 1
    }
    acc
  }
}

/** emb (array<float|double>) → m-byte PQ code (binary). */
case class PqEncodeExpr(child: Expression, codebooks: Seq[Array[Array[Float]]])
  extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(c => c.nonEmpty && c.length <= 256),
    "PQ needs 1..256 centroids per subspace (codes are bytes)")
  override def dataType: DataType = BinaryType
  @transient private lazy val cb: Array[Array[Array[Float]]] = codebooks.toArray
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override protected def nullSafeEval(input: Any): Any =
    PqKernel.encode(input.asInstanceOf[ArrayData], cb, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", cb, "float[][][]")
    defineCodeGen(ctx, ev, c => s"graft.plans.PqKernel.encode($c, $ref, $isFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** m-byte PQ code (binary) → reconstructed array<float>. */
case class PqDecodeExpr(child: Expression, codebooks: Seq[Array[Array[Float]]])
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  @transient private lazy val cb: Array[Array[Array[Float]]] = codebooks.toArray
  override protected def nullSafeEval(input: Any): Any =
    PqKernel.decode(input.asInstanceOf[Array[Byte]], cb)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", cb, "float[][][]")
    defineCodeGen(ctx, ev, c => s"graft.plans.PqKernel.decode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqDecodeExpr =
    copy(child = newChild)
  override def prettyName: String = "pq_decode"
}

/** m-byte PQ code (binary) → ADC score against a single query's LUT. */
case class PqAdcExpr(child: Expression, lut: Seq[Array[Double]])
  extends UnaryExpression {
  override def dataType: DataType = DoubleType
  @transient private lazy val table: Array[Array[Double]] = lut.toArray
  override protected def nullSafeEval(input: Any): Any =
    PqKernel.adc(input.asInstanceOf[Array[Byte]], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", table, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.plans.PqKernel.adc($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqAdcExpr =
    copy(child = newChild)
  override def prettyName: String = "pq_adc"
}
