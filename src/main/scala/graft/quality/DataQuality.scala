package graft.quality

import graft.core.ActionPipelineContext
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level constraint: boolean SQL expression every row must satisfy;
  * violation aborts the write with an error naming the offending row.
  * Reference `sdl-core/workflow/dataobject/Constraint.scala:37-62`.
  */
case class Constraint(name: String, expression: String, errorMsgCols: Seq[String] = Seq.empty)

/** Dataset-level expectation: an aggregate metric plus a comparison the
  * metric must satisfy. Reference
  * `sdl-core/workflow/dataobject/expectation/Expectation.scala:66-117`.
  * `expectation` is a SQL comparison with the metric bound to `value`,
  * e.g. "value = 0" / "value > 0.9".
  */
sealed trait Expectation {
  def name: String
  def expectation: Option[String]
  def scope: ExpectationScope = ExpectationScope.Job
  def failOnError: Boolean = false
  /** aggregate expression(s) computing the metric */
  def aggExpr: Column
}
sealed trait ExpectationScope
object ExpectationScope {
  /** metric over the rows written by this job (via Dataset.observe — free) */
  case object Job extends ExpectationScope
  /** metric per partition value written (groupBy partition cols) */
  case object JobPartition extends ExpectationScope
  /** metric over the whole output table (separate agg query) */
  case object All extends ExpectationScope
}

/** count rows. Reference `CountExpectation`. */
case class CountExpectation(name: String = "count", expectation: Option[String] = None,
    override val scope: ExpectationScope = ExpectationScope.Job,
    override val failOnError: Boolean = false) extends Expectation {
  def aggExpr: Column = count(lit(1)).as(name)
}
/** any SQL aggregate expression. Reference `SQLExpectation`. */
case class SQLExpectation(name: String, aggregationExpression: String,
    expectation: Option[String] = None,
    override val scope: ExpectationScope = ExpectationScope.Job,
    override val failOnError: Boolean = false) extends Expectation {
  def aggExpr: Column = expr(aggregationExpression).as(name)
}
/** fraction of rows matching a condition. Reference `SQLFractionExpectation`. */
case class SQLFractionExpectation(name: String, countConditionExpression: String,
    expectation: Option[String] = None,
    override val scope: ExpectationScope = ExpectationScope.Job,
    override val failOnError: Boolean = false) extends Expectation {
  def aggExpr: Column =
    (count(when(expr(countConditionExpression), lit(1))) / count(lit(1))).as(name)
}
/** primary-key uniqueness: distinct-count(pk) / count; `approximate` uses
  * HLL for 100TB-scale checks. Reference `UniqueKeyExpectation.scala:44-75`. */
case class UniqueKeyExpectation(name: String = "uniqueKey", keyCols: Seq[String],
    expectation: Option[String] = Some("value = 1"),
    approximate: Boolean = false, approximateRsd: Double = 0.05,
    override val scope: ExpectationScope = ExpectationScope.All,
    override val failOnError: Boolean = false) extends Expectation {
  def aggExpr: Column = {
    val distinctCnt =
      if (approximate) approx_count_distinct(struct(keyCols.map(col): _*), approximateRsd)
      else count_distinct(struct(keyCols.map(col): _*))
    (distinctCnt.cast("double") / count(lit(1))).as(name)
  }
}

/** validation failure */
case class ExpectationViolation(name: String, value: Any, condition: String)
  extends RuntimeException(s"Expectation '$name' violated: value=$value, expected $condition")

/** Applies constraints/expectations around a write. Reference
  * `ExpectationValidation.scala:106-208`.
  */
object DataQualityValidation {

  /** Wrap `df` so every row is checked against all constraints during the
    * write — zero extra scans. The failed-constraint messages are built
    * into an always-true filter (reference forces evaluation the same way
    * with array_construct_compact + dummy where,
    * `ExpectationValidation.scala:191-208`). */
  def applyConstraints(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    if (constraints.isEmpty) return df
    val checks = constraints.map { c =>
      val rowInfo: Column =
        if (c.errorMsgCols.nonEmpty) to_json(struct(c.errorMsgCols.map(col): _*))
        else lit("")
      when(!coalesce(expr(c.expression), lit(false)),
        raise_error(concat(lit(s"Constraint '${c.name}' (${c.expression}) failed for row "), rowInfo)))
    }
    df.where(size(filter(array(checks: _*), _.isNotNull)) >= 0)
  }

  /** Attach a Job-scope observation computing all expectation metrics;
    * returns (instrumented df, observation handle). Call
    * [[evaluateObserved]] after the df has been written. */
  def observeExpectations(df: DataFrame, expectations: Seq[Expectation])
      : (DataFrame, Option[org.apache.spark.sql.Observation]) = {
    val jobExp = expectations.filter(_.scope == ExpectationScope.Job)
    if (jobExp.isEmpty) (df, None)
    else {
      val obs = org.apache.spark.sql.Observation(s"graft_expectations_${System.nanoTime()}")
      (df.observe(obs, jobExp.head.aggExpr, jobExp.tail.map(_.aggExpr): _*), Some(obs))
    }
  }

  /** evaluate Job-scope metrics collected by the observation */
  def evaluateObserved(obs: org.apache.spark.sql.Observation, expectations: Seq[Expectation])
                      (implicit ctx: ActionPipelineContext): Map[String, Any] = {
    val jobExp = expectations.filter(_.scope == ExpectationScope.Job)
    val metrics = obs.get
    jobExp.foreach(e => check(e, metrics(e.name)))
    metrics.toMap
  }

  /** evaluate All/JobPartition-scope expectations with one agg query over
    * the output table (reference `ExpectationValidation.scala:132-146`) */
  def evaluateAgainstTable(table: DataFrame, expectations: Seq[Expectation],
                           partitionCols: Seq[String] = Seq.empty)
                          (implicit ctx: ActionPipelineContext): Map[String, Any] = {
    val allExp = expectations.filter(_.scope == ExpectationScope.All)
    val partExp = expectations.filter(_.scope == ExpectationScope.JobPartition)
    val allMetrics: Map[String, Any] =
      if (allExp.isEmpty) Map.empty
      else {
        val row = table.agg(allExp.head.aggExpr, allExp.tail.map(_.aggExpr): _*).collect().head
        allExp.map(e => e.name -> row.getAs[Any](e.name)).toMap
      }
    val partMetrics: Map[String, Any] =
      if (partExp.isEmpty || partitionCols.isEmpty) Map.empty
      else {
        val rows = table.groupBy(partitionCols.map(col): _*)
          .agg(partExp.head.aggExpr, partExp.tail.map(_.aggExpr): _*).collect()
        rows.flatMap { r =>
          val pv = partitionCols.map(c => s"$c=${r.getAs[Any](c)}").mkString(",")
          partExp.map(e => s"${e.name}#$pv" -> r.getAs[Any](e.name))
        }.toMap
      }
    allExp.foreach(e => check(e, allMetrics(e.name)))
    partMetrics.foreach { case (k, v) =>
      partExp.find(e => k.startsWith(e.name + "#")).foreach(e => check(e, v))
    }
    allMetrics ++ partMetrics
  }

  private def check(e: Expectation, value: Any)(implicit ctx: ActionPipelineContext): Unit =
    e.expectation.foreach { cond =>
      val lit = value match {
        case null => "NULL"
        case s: String => s"'${s.replace("'", "''")}'"
        case other => other.toString
      }
      val ok = ctx.spark.sql(s"SELECT ($lit) AS value").where(cond).count() == 1
      if (!ok) {
        if (e.failOnError) throw ExpectationViolation(e.name, value, cond)
        else System.err.println(s"[warn] expectation '${e.name}' violated: value=$value, expected $cond")
      }
    }
}
