package org.apache.spark.sql.graftshims

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{ClassicConversions, Dataset => ClassicDataset, ExpressionUtils}

/** Access points for Spark 4's `private[sql]` Expression↔Column and
  * Dataset↔LogicalPlan conversions, needed to expose custom Catalyst
  * expressions and logical nodes through the public Column/DataFrame API.
  * Lives under `org.apache.spark.sql` for package-private visibility — the
  * standard pattern for Spark libraries adding Catalyst extensions.
  */
object GraftSqlShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def logicalPlan(df: DataFrame): LogicalPlan =
    ClassicConversions.castToImpl(df).logicalPlan
  def ofRows(df: DataFrame, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(ClassicConversions.castToImpl(df).sparkSession, plan)
}
