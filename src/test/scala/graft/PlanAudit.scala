package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val dir = "/root/testdata/sf0.01"
    val interesting = Seq("q17_dedup_two_loads", "q18_historize_full", "q19_historize_incremental",
      "q20_cdc_historize", "q21_merge_upsert", "q24_exact_dedup", "q10_rollup_summary", "q16_approx_distinct")
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
