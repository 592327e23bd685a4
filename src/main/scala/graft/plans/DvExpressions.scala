package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-vector membership as a SCAN-side predicate (the shape of the
  * public Delta DV read path, which applies per-file bitmaps inside the
  * scan task): `(file, row_index) ∈ tombstones`, with the tombstone sets
  * shipped once per executor via a Spark broadcast — per-row cost is one
  * hash lookup + binary search, and the filter stays inside the
  * whole-stage-codegen span instead of forcing the scan through an
  * anti-join exchange. Used by the versioned table's reads when the
  * active DV volume is below the broadcast threshold; larger sets fall
  * back to the shuffle anti-join (see `VersionedTable.applyDv`).
  *
  * The expression serializes only the BROADCAST HANDLE to executors
  * (standard broadcast-in-expression pattern); the tombstone arrays are
  * fetched once per executor by the broadcast machinery.
  */
case class DvTombstoned(file: Expression, rowIndex: Expression,
                        tombstones: Broadcast[Map[String, Array[Long]]])
  extends BinaryExpression with Predicate {

  override def left: Expression = file
  override def right: Expression = rowIndex
  override def nullable: Boolean = false
  override def prettyName: String = "dv_tombstoned"

  def contains(f: UTF8String, ri: Long): Boolean =
    tombstones.value.get(f.toString)
      .exists(arr => java.util.Arrays.binarySearch(arr, ri) >= 0)

  override def nullSafeEval(f: Any, ri: Any): Any =
    contains(f.asInstanceOf[UTF8String], ri.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvExpr", this)
    nullSafeCodeGen(ctx, ev, (f, ri) => s"${ev.value} = $ref.contains($f, $ri);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DvTombstoned =
    copy(file = newLeft, rowIndex = newRight)
}
