package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType}
import scala.collection.mutable

/** `collect_set` marked deterministic.
  *
  * Spark's builtin CollectSet declares itself non-deterministic (set order),
  * which makes Catalyst reject it inside `observe()`/CollectMetrics.
  * Observing the *set of written files / partition values* of a job is a
  * legitimate aggregate whose multiset value IS deterministic, so the
  * reference ships a deterministic copy
  * (`sdl-core/util/spark/CollectSetDeterministic.scala:46-78`) — same trick
  * here, implemented against Spark 4's `Collect` base.
  */
case class CollectSetDeterministic(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.HashSet[Any]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override lazy val deterministic: Boolean = true

  // same guard as Spark's CollectSet: MapData has identity equality, so a
  // map child would never deduplicate (unbounded buffer + duplicate-laden
  // "set") — reject at analysis
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def hasMap(dt: DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType => hasMap(a.elementType)
      case _ => false
    }
    if (!hasMap(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "collect_set_deterministic() cannot have map type data")
  }

  override def createAggregationBuffer(): mutable.HashSet[Any] = mutable.HashSet.empty

  override protected def convertToBufferElement(value: Any): Any = InternalRow.copyValue(value)

  override protected lazy val bufferElementType: DataType = child.dataType

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def eval(buffer: mutable.HashSet[Any]): Any = new GenericArrayData(buffer.toSeq)

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectSetDeterministic =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectSetDeterministic =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectSetDeterministic =
    copy(child = newChild)
  override def prettyName: String = "collect_set_deterministic"
}

object CollectSetDeterministic {
  /** Column API: `collect_set_deterministic($"col")` — legal inside observe() */
  def collect_set_deterministic(c: Column): Column =
    org.apache.spark.sql.graftshims.GraftSqlShims.column(
      CollectSetDeterministic(org.apache.spark.sql.graftshims.GraftSqlShims.expression(c))
        .toAggregateExpression())
}
