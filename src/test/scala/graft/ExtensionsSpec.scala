package graft

import graft.plans._
import graft.plans.CollectSetDeterministic.collect_set_deterministic
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom Catalyst pieces: AssertNotEmpty strategy, no-data rule,
  * pushdown-tolerant CollectMetrics, deterministic collect_set. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("AssertNotEmpty passes data through and fails on empty input") {
    spark.experimental.extraStrategies = Seq(AssertNotEmptyStrategy)
    try {
      val ok = GraftSparkExtension.assertNotEmpty(Seq(1, 2).toDF("x"))
      assert(ok.collect().map(_.getInt(0)).toSet == Set(1, 2))
      val empty = GraftSparkExtension.assertNotEmpty(Seq(1, 2).toDF("x").where("x > 10"))
      val e = intercept[Exception] { empty.collect() }
      def chain(t: Throwable): Seq[Throwable] = if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(_.isInstanceOf[PlanHasNoDataException]))
    } finally spark.experimental.extraStrategies = Nil
  }

  test("PlanNoDataCheckRule throws on all-empty-leaf optimized plans") {
    val emptyPlan = org.apache.spark.sql.graftshims.GraftSqlShims.logicalPlan(
      Seq(1).toDF("x").where("x > 100"))
    val optimized = spark.sessionState.optimizer.execute(
      spark.sessionState.analyzer.execute(emptyPlan))
    intercept[PlanHasNoDataException] { PlanNoDataCheckRule(optimized) }
    // non-empty plan passes through
    val fullPlan = spark.sessionState.optimizer.execute(
      spark.sessionState.analyzer.execute(
        org.apache.spark.sql.graftshims.GraftSqlShims.logicalPlan(Seq(1).toDF("x"))))
    assert(PlanNoDataCheckRule(fullPlan) eq fullPlan)
  }

  test("filter is pushed through a pushDownTolerant CollectMetrics node") {
    import org.apache.spark.sql.catalyst.plans.logical.{CollectMetrics, Filter}
    val base = Seq((1, "a"), (20, "b")).toDF("x", "s")
    val observed = base.observe("cnt!pushDownTolerant", count(lit(1)).as("n")).where($"x" > 5)
    val plan = org.apache.spark.sql.graftshims.GraftSqlShims.logicalPlan(observed)
    val analyzed = spark.sessionState.analyzer.execute(plan)
    val rewritten = PushPredicateThroughTolerantCollectMetrics(analyzed)
    // after the rule, the Filter must sit BELOW CollectMetrics
    val cmChildIsFilter = rewritten.collect {
      case cm: CollectMetrics => cm.child.isInstanceOf[Filter] ||
        cm.child.children.exists(_.isInstanceOf[Filter])
    }
    assert(cmChildIsFilter.nonEmpty && cmChildIsFilter.forall(identity))
    // a non-tolerant observe is untouched
    val plain = org.apache.spark.sql.graftshims.GraftSqlShims.logicalPlan(
      base.observe("cnt_plain", count(lit(1)).as("n")).where($"x" > 5))
    val analyzedPlain = spark.sessionState.analyzer.execute(plain)
    assert(PushPredicateThroughTolerantCollectMetrics(analyzedPlain) == analyzedPlain)
  }

  test("collect_set_deterministic works inside observe and in aggregations") {
    val obs = org.apache.spark.sql.Observation("good")
    Seq(1, 2, 2).toDF("x").observe(obs, collect_set_deterministic($"x").as("xs")).collect()
    val got = obs.get("xs").asInstanceOf[Seq[Int]].toSet
    assert(got == Set(1, 2))
  }

  test("extension class registers via SparkSessionExtensions") {
    // smoke: applying the extension to a fresh builder-level extensions
    // object must not throw and must register our strategy hook
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftSparkExtension()(ext)
  }

  test("the DAG maps PlanHasNoDataException to a SKIP, even wrapped executor-side") {
    import graft.core._
    val reg = new InstanceRegistry
    val dir = java.nio.file.Files.createTempDirectory("graft-nodata").toString
    reg.register(graft.sources.ParquetFileDataObject("out", s"$dir/out"))
    implicit val ctx: ActionPipelineContext = ActionPipelineContext(spark, reg)
    // an action whose plan hits AssertNotEmpty on empty input: the DAG
    // must mark it skipped (the documented NoDataToProcessWarning
    // mapping), not fail the run
    val throwing = new graft.operators.Action {
      def id = "noData"
      def inputIds = Seq.empty
      def outputIds = Seq("out")
      override def init(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext) =
        Seq(SubFeed("out"))
      override def exec(subFeeds: Seq[SubFeed])(implicit ctx: ActionPipelineContext) =
        // executor-side throws arrive wrapped (SparkException-like)
        throw new RuntimeException("Job aborted",
          new PlanHasNoDataException("AssertNotEmpty: child plan produced no rows"))
    }
    val results = new ActionDAGRun(Seq(throwing)).run()
    assert(results("noData").forall(_.isSkipped))
  }
}
