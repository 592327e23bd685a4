package graft
import org.apache.spark.sql.SparkSession
/** Plan-capture harness (optimization guide §1: measure first, read the
  * plan). Builds each selected query's DataFrame exactly as Bench/Verify do
  * and dumps `.explain("formatted")` to `<outDir>/<name>.txt`. Queries with
  * side effects (pipeline/streaming scenarios) run those side effects while
  * the DataFrame is constructed — the captured plan is the plan of the
  * RESULT frame, the thing the noop sink times.
  *
  * Usage: SPARK_GRAFT_ONLY=q1_pricing_summary,q3_revenue_by_nation \
  *   sbt "runMain graft.Explain /root/testdata/sf0.1 plans/r19"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/$name$suffix.txt"), plan)
          println(s"[explain] $name -> $outDir/$name$suffix.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[explain] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
