package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** One-off plan capture for the r20 probe-gate evidence: a fully capped
  * boilerplate corpus through the probe-gated batch minhash entry. */
object CappedPlanDump {
  def main(args: Array[String]): Unit = {
    val Array(out) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val baseText = (1 to 60).map(i => s"tok$i").mkString(" ")
    val boiler = (1L to 40L).map(i => (i, baseText)).toDF("doc_id", "text")
    val sigs = functions.Dedup.minhashSignatures(boiler, "doc_id", "text", 5, 32).persist()
    val pairs = functions.Dedup.minhashPairsFromSigs(sigs, bands = 8, rowsPerBand = 4,
      threshold = 0.5, maxBucketSize = 10, probeGateUncapped = true)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      pairs.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    println(s"[cappedplan] -> $out")
    spark.stop()
  }
}
