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
  // an HLL estimate is almost never EXACTLY 1.0 — the exact-equality
  // default would fail perfectly-unique data (and pass mildly-duplicated
  // data that estimates low). Force an explicit tolerance.
  require(!approximate || !expectation.contains("value = 1"),
    s"Expectation '$name': approximate=true needs a tolerance condition " +
      s"""(e.g. expectation = Some("value >= ${1.0 - 3 * approximateRsd}")) — """ +
      "the exact-equality default 'value = 1' cannot hold for an HLL estimate")
  // Job scope evaluates inside Dataset.observe, and Catalyst rejects
  // exact distinct aggregates in observed metrics — fail at construction,
  // not with an AnalysisException mid-write
  require(scope != ExpectationScope.Job || approximate,
    s"Expectation '$name': Job scope computes inside Dataset.observe, which " +
      "disallows exact count_distinct — use approximate=true or scope All")
  def aggExpr: Column = {
    val distinctCnt =
      if (approximate) approx_count_distinct(struct(keyCols.map(col): _*), approximateRsd)
      else count_distinct(struct(keyCols.map(col): _*))
    (distinctCnt.cast("double") / count(lit(1))).as(name)
  }
}

/** full SQL query over the output table (view token `%{inputViewName}`),
  * first column of the first row is the metric. Reference
  * `SQLQueryExpectation`. */
case class SQLQueryExpectation(name: String, code: String,
    expectation: Option[String] = None,
    override val scope: ExpectationScope = ExpectationScope.All,
    override val failOnError: Boolean = false) extends Expectation {
  def aggExpr: Column =
    throw new UnsupportedOperationException("SQLQueryExpectation runs its own query")
}
/** average row count per partition of the written table. Reference
  * `AvgCountPerPartitionExpectation` (JobPartition metrics averaged). */
case class AvgCountPerPartitionExpectation(name: String = "avgCountPerPartition",
    expectation: Option[String] = None,
    override val failOnError: Boolean = false) extends Expectation {
  override def scope: ExpectationScope = ExpectationScope.All
  def aggExpr: Column =
    throw new UnsupportedOperationException("computed against partition columns at evaluation")
}
/** fraction of non-null cells over `columns` (1.0 = fully populated).
  * Reference action-level `CompletenessExpectation`. */
case class CompletenessExpectation(name: String = "completeness", columns: Seq[String],
    expectation: Option[String] = None,
    override val scope: ExpectationScope = ExpectationScope.Job,
    override val failOnError: Boolean = false) extends Expectation {
  def aggExpr: Column = {
    val nonNull = columns.map(c => count(col(c)).cast("double")).reduce(_ + _)
    (nonNull / (count(lit(1)) * columns.size)).as(name)
  }
}
/** records written per second, evaluated from write metrics (no scan).
  * Reference action-level `TransferRateExpectation`. */
case class TransferRateExpectation(name: String = "transferRate",
    expectation: Option[String] = None,
    override val failOnError: Boolean = false) extends Expectation {
  override def scope: ExpectationScope = ExpectationScope.Job
  def aggExpr: Column =
    throw new UnsupportedOperationException("computed from write metrics, not a scan")
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
  /** expectations whose metric comes from an aggregate over rows (vs.
    * own-query / metrics-derived ones) */
  private def isAggBased(e: Expectation): Boolean = e match {
    case _: SQLQueryExpectation | _: AvgCountPerPartitionExpectation |
         _: TransferRateExpectation => false
    case _ => true
  }

  /** Does ANY expectation need the post-write table pass? Not just
    * `scope != Job`: a Job-scoped SQLQueryExpectation is excluded from
    * observe() (it runs its own query) and is ONLY evaluated by
    * [[evaluateAgainstTable]] — keying the table pass off scope alone
    * silently skips that gate. */
  def needsTableEvaluation(expectations: Seq[Expectation]): Boolean =
    expectations.exists(e => e.scope != ExpectationScope.Job ||
      e.isInstanceOf[SQLQueryExpectation])

  def observeExpectations(df: DataFrame, expectations: Seq[Expectation])
      : (DataFrame, Option[org.apache.spark.sql.Observation]) = {
    val jobExp = expectations.filter(e => e.scope == ExpectationScope.Job && isAggBased(e))
    if (jobExp.isEmpty) (df, None)
    else {
      val obs = org.apache.spark.sql.Observation(s"graft_expectations_${System.nanoTime()}")
      (df.observe(obs, jobExp.head.aggExpr, jobExp.tail.map(_.aggExpr): _*), Some(obs))
    }
  }

  /** evaluate Job-scope metrics collected by the observation */
  def evaluateObserved(obs: org.apache.spark.sql.Observation, expectations: Seq[Expectation])
                      (implicit ctx: ActionPipelineContext): Map[String, Any] = {
    val jobExp = expectations.filter(e => e.scope == ExpectationScope.Job && isAggBased(e))
    val metrics = obs.get
    jobExp.foreach(e => check(e, metrics(e.name)))
    metrics.toMap
  }

  /** evaluate All/JobPartition-scope expectations with one agg query over
    * the output table (reference `ExpectationValidation.scala:132-146`) */
  def evaluateAgainstTable(table: DataFrame, expectations: Seq[Expectation],
                           partitionCols: Seq[String] = Seq.empty)
                          (implicit ctx: ActionPipelineContext): Map[String, Any] = {
    val allExp = expectations.filter(e => e.scope == ExpectationScope.All && isAggBased(e))
    val partExp = expectations.filter(e => e.scope == ExpectationScope.JobPartition && isAggBased(e))
    val queryExp = expectations.collect { case q: SQLQueryExpectation => q }
    val avgExp = expectations.collect { case a: AvgCountPerPartitionExpectation => a }
    // a partition-scoped expectation on an unpartitioned evaluation is a
    // CONFIG error — silently skipping it would let a data-quality gate
    // "pass" without ever having run (failOnError gives no protection)
    require(partitionCols.nonEmpty || (partExp.isEmpty && avgExp.isEmpty),
      s"partition-scoped expectation(s) ${(partExp ++ avgExp).map(_.name).mkString(",")} " +
        "require partition columns, but none were provided — the gate would never evaluate")
    val queryMetrics: Map[String, Any] = queryExp.map { q =>
      val view = s"graft_exp_${q.name.replaceAll("[^A-Za-z0-9_]", "_")}"
      table.createOrReplaceTempView(view)
      val sql = q.code.replace("%{inputViewName}", view)
      q.name -> ctx.spark.sql(sql).collect().headOption.map(_.get(0)).orNull
    }.toMap
    val avgMetrics: Map[String, Any] = avgExp.flatMap { a =>
      if (partitionCols.isEmpty) None
      else {
        val row = table.agg((count(lit(1)).cast("double") /
          count_distinct(struct(partitionCols.map(col): _*))).as(a.name)).collect().head
        Some(a.name -> row.getAs[Any](a.name))
      }
    }.toMap
    queryExp.foreach(q => check(q, queryMetrics(q.name)))
    avgExp.foreach(a => avgMetrics.get(a.name).foreach(v => check(a, v)))
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
    allMetrics ++ partMetrics ++ queryMetrics ++ avgMetrics
  }

  /** evaluate TransferRateExpectations from write metrics (records/sec) */
  def evaluateTransferRate(expectations: Seq[Expectation],
                           recordsWritten: Long, durationMillis: Long)
                          (implicit ctx: ActionPipelineContext): Map[String, Any] = {
    val rateExp = expectations.collect { case t: TransferRateExpectation => t }
    if (rateExp.isEmpty || recordsWritten < 0) return Map.empty
    val rate = recordsWritten.toDouble / math.max(durationMillis, 1L) * 1000.0
    rateExp.map { e => check(e, rate); e.name -> (rate: Any) }.toMap
  }

  private def check(e: Expectation, value: Any)(implicit ctx: ActionPipelineContext): Unit =
    e.expectation.foreach { cond0 =>
      // the reference writes expectations as operator+literal shorthand
      // ("= 0", "> 0.9" — Expectation.scala scaladoc); the long form
      // "value > 0.9" is also accepted
      val cond = if (cond0.trim.matches("^(=|!=|<>|<=|>=|<|>).*")) s"value ${cond0.trim}" else cond0
      // bind the metric as a TYPED one-row column, never as spliced SQL
      // text: a Timestamp's toString is not a SQL literal, and a bare
      // NaN/Infinity literal parses as a COLUMN reference — both would
      // crash evaluation instead of comparing
      import ctx.spark.implicits._
      val bound = value match {
        case null => Seq(Option.empty[String]).toDF("value")
        case v: java.lang.Integer => Seq(v.intValue).toDF("value")
        case v: java.lang.Long => Seq(v.longValue).toDF("value")
        case v: java.lang.Double => Seq(v.doubleValue).toDF("value")
        case v: java.lang.Float => Seq(v.doubleValue).toDF("value")
        case v: java.lang.Boolean => Seq(v.booleanValue).toDF("value")
        case v: java.math.BigDecimal => Seq(BigDecimal(v)).toDF("value")
        case v: java.sql.Timestamp => Seq(v).toDF("value")
        case v: java.sql.Date => Seq(v).toDF("value")
        case v: String => Seq(v).toDF("value")
        case other => Seq(other.toString).toDF("value")
      }
      val ok = bound.where(cond).count() == 1
      if (!ok) {
        if (e.failOnError) throw ExpectationViolation(e.name, value, cond)
        else System.err.println(s"[warn] expectation '${e.name}' violated: value=$value, expected $cond")
      }
    }
}
