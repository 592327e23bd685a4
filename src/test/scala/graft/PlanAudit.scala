package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val dir = "/root/testdata/sf0.01"
    val interesting = Seq("q2_filter_project", "q3_revenue_by_nation", "q6_latest_event_per_user",
      "q7_customers_without_orders", "q14_pk_violators", "q15_orders_per_customer", "q4_topk_orders")
    interesting.foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val broadcasts = "BroadcastHashJoin|BroadcastExchange".r.findAllIn(plan).length
      val smj = "SortMergeJoin".r.findAllIn(plan).length
      val exchanges = "Exchange ".r.findAllIn(plan).length
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan).mkString(" | ").take(300)
      val codegen = "WholeStageCodegen".r.findAllIn(plan).length
      println(s"=== $q: broadcastJoins=$broadcasts sortMergeJoins=$smj exchanges=$exchanges codegenSpans=$codegen")
      if (pushed.nonEmpty) println(s"    $pushed")
    }
  }
}
