package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) which Spark only reads as
      // long; SparkEntry converts back to µs timestamps (values are µs-aligned)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional comma-separated filter for iterating on single queries
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Failures must be LOUD: a query that throws writes a one-row parquet
    // with an `err` column (guaranteed red rows/schema/hash row in the
    // driver's compare — never a silently missing row) and is collected
    // into errors.json. Round-8 postmortem: three broken queries vanished
    // from CORRECTNESS entirely because this loop only logged to stderr.
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
        failures(name) = msg
        System.err.println(s"[verify] $name FAILED: $msg")
        try {
          import spark.implicits._
          Seq(msg).toDF("err").coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name.parquet")
        } catch { case _: Throwable => () }
      }
      // several operators persist intermediates (LSH/OPH signatures, IVF
      // assignment) — drop them between queries so cached blocks don't
      // accumulate across the 70+ query dump (Bench does the same)
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // The driver keys result files as "<name>.parquet"; emit every oracle
    // under BOTH "<name>" and "<name>.parquet" so either lookup convention
    // matches (round-1 postmortem: suffix mismatch zeroed all 36 rows).
    val json = SparkEntry.oracleSql
      .flatMap { case (k, v) => Seq(k -> v, s"$k.parquet" -> v) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Machine-readable failure manifest next to the results; empty object
    // when the round is clean. (Deliberately NOT exiting nonzero: the
    // err-parquet rows above already make every failure a RED row in the
    // driver's compare, and a nonzero exit could make a harness discard
    // the 100+ good results along with the one bad one.)
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // Parity guard: every query must ship an oracle and vice versa (also
    // spec-asserted in VerifyParitySpec; duplicated here so a drifted
    // driver-side run still screams).
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    if (only.isEmpty && qk != ok) {
      System.err.println(s"[verify] KEY MISMATCH queries-only=${(qk -- ok).toSeq.sorted.mkString(",")} oracle-only=${(ok -- qk).toSeq.sorted.mkString(",")}")
    }
    spark.stop()
  }
}
