package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{CollectMetrics, Filter, LocalRelation, LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Signals that an action's optimized plan can produce no data — the DAG
  * marks the action skipped. Reference `SparkPlanNoDataWarning` mapped to
  * `NoDataToProcessWarning` (`DataFrameActionImpl.scala:470-473`). */
class PlanHasNoDataException(msg: String) extends RuntimeException(msg)

/** Logical marker node: fail the job if the child produces zero rows.
  * Reference `util/spark/AssertNotEmpty.scala:33-68` (logical node +
  * physical operator + strategy). */
case class AssertNotEmpty(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): AssertNotEmpty =
    copy(child = newChild)
}

/** Physical operator: cheap emptiness probe (first non-empty partition)
  * before streaming the child through unchanged. */
case class AssertNotEmptyExec(child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] = {
    val rdd = child.execute()
    // accepted trade: isEmpty() probes partitions incrementally (first
    // non-empty wins), so a non-empty child recomputes only its first
    // partition; the full double-scan happens only on an EMPTY child,
    // where the job is about to fail/skip anyway — caching the probe
    // would pin the child in memory on every healthy run to save work
    // on the failure path
    if (rdd.isEmpty()) throw new PlanHasNoDataException(
      "AssertNotEmpty: child plan produced no rows")
    rdd
  }
  override protected def withNewChildInternal(newChild: SparkPlan): AssertNotEmptyExec =
    copy(child = newChild)
}

/** Planner strategy for [[AssertNotEmpty]]. Reference `AssertNotEmptyStrategy`. */
object AssertNotEmptyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AssertNotEmpty(child) => AssertNotEmptyExec(planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Pre-CBO / AQE rule: if the optimizer reduced every leaf of the plan to
  * an empty LocalRelation (PropagateEmptyRelation did its job), there is no
  * data to process — fail fast with [[PlanHasNoDataException]] instead of
  * scheduling an empty job. Reference `util/spark/SparkPlanNoDataCheckRule`.
  */
object PlanNoDataCheckRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val leaves = plan.collectLeaves()
    val allEmpty = leaves.nonEmpty && leaves.forall {
      case l: LocalRelation => l.data.isEmpty
      case _ => false
    }
    if (allEmpty && graft.plans.GraftSparkExtension.noDataCheckEnabled.get())
      throw new PlanHasNoDataException("optimized plan has only empty relations")
    plan
  }
}

/** Catalyst blocks predicate pushdown through CollectMetrics (an observe()
  * node) because the filter would change the observed metric. For pure
  * input-count observations that is exactly what we want — the reference
  * marks them with a name suffix and pushes the filter through
  * (`util/spark/PushPredicateThroughTolerantCollectMetricsRule.scala:31-46`).
  * Without this rule, observing input counts on a 100 TB scan would defeat
  * partition pruning.
  */
object PushPredicateThroughTolerantCollectMetrics extends Rule[LogicalPlan] {
  val tolerantSuffix = "!pushDownTolerant"
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, cm @ CollectMetrics(name, _, child, _)) if name.endsWith(tolerantSuffix) =>
      cm.withNewChildren(Seq(Filter(cond, child)))
  }
}

/** SparkSessionExtensions entry point — register with
  * `.config("spark.sql.extensions", "graft.plans.GraftSparkExtension")`.
  * Reference `util/spark/SDLSparkExtension.scala:31-46` registers the same
  * four kinds of hooks. */
class GraftSparkExtension extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AssertNotEmptyStrategy)
    ext.injectOptimizerRule(_ => PushPredicateThroughTolerantCollectMetrics)
    ext.injectPreCBORule(_ => PlanNoDataCheckRule)
    ext.injectRuntimeOptimizerRule(_ => PlanNoDataCheckRule)
  }
}
object GraftSparkExtension {
  /** no-data check toggle (reference `Environment.enableSparkPlanNoDataCheck`) */
  val noDataCheckEnabled = new java.util.concurrent.atomic.AtomicBoolean(true)

  /** wrap a DataFrame in an AssertNotEmpty marker node */
  def assertNotEmpty(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graftshims.GraftSqlShims
    GraftSqlShims.ofRows(df, AssertNotEmpty(GraftSqlShims.logicalPlan(df)))
  }
}
