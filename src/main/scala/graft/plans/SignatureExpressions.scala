package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshims.GraftSqlShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static kernels for the signature expressions — called from both
  * interpreted eval and generated Java (a plain top-level object compiles
  * to static forwarders the codegen can reference). Tight `while` loops
  * over primitive longs: no per-element lambda dispatch, no intermediate
  * array allocation — the reason these beat the equivalent
  * `aggregate`/`zip_with` higher-order-function formulation ~20×.
  */
object SignatureKernels {
  /** SimHash: per bit, majority vote of the shingle-hash bits. */
  def simhash64(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** MinHash signature: k permutations simulated as seeded xxhash64 of each
    * shingle hash; bit-identical to the column formulation
    * `array_min(transform(shingles, h => xxhash64(h, seed)))` for integer
    * seeds 0..k-1 (builtin xxhash64 starts at seed 42, then folds inputs). */
  def minhash(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = XXH64.hashLong(hashes.getLong(i), 42L)
      var s = 0
      while (s < k) {
        val h = XXH64.hashInt(s, base)
        if (h < sig(s)) sig(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** 64-bit SimHash of an array of shingle hashes, as a codegen'd Catalyst
  * expression. */
case class SimHash64Expr(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SignatureKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** MinHash signature (array of k minima over seeded hashes) as a codegen'd
  * Catalyst expression. */
case class MinHashSigExpr(child: Expression, k: Int)
  extends UnaryExpression {
  require(k > 0, "minhash k must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.minhash(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SignatureKernels.minhash($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

object SignatureExpressions {
  def simhash64(hashes: Column): Column =
    GraftSqlShims.column(SimHash64Expr(GraftSqlShims.expression(hashes)))
  def minhashSignature(hashes: Column, k: Int): Column =
    GraftSqlShims.column(MinHashSigExpr(GraftSqlShims.expression(hashes), k))
}
