package graft

import graft.core._
import graft.quality._
import graft.sources.ParquetFileDataObject
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Constraints + expectations around writes (reference
  * `ExpectationValidation` tests). */
class DataQualitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  def newCtx() = ActionPipelineContext(spark, new InstanceRegistry())

  test("constraint violation aborts the write") {
    implicit val ctx: ActionPipelineContext = newCtx()
    val dir = Files.createTempDirectory("graft-dq").toString
    val out = ParquetFileDataObject("out", s"$dir/out",
      constraints = Seq(Constraint("positive_value", "v > 0", errorMsgCols = Seq("id"))))
    val bad = Seq((1, 10), (2, -5)).toDF("id", "v")
    val e = intercept[Exception] {
      out.writeDataFrame(bad)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("positive_value")))
  }

  test("constraints pass and expectations computed via observe") {
    implicit val ctx: ActionPipelineContext = newCtx()
    val dir = Files.createTempDirectory("graft-dq").toString
    val out = ParquetFileDataObject("out", s"$dir/out",
      constraints = Seq(Constraint("positive_value", "v > 0")),
      expectations = Seq(
        CountExpectation("cnt", Some("value = 3"), failOnError = true),
        SQLFractionExpectation("frac_big", "v >= 20", Some("value >= 0.5"), failOnError = true)))
    val metrics = out.writeDataFrame(Seq((1, 10), (2, 20), (3, 30)).toDF("id", "v"))
    assert(metrics.recordsWritten == 3)
    assert(metrics.observedMetrics("cnt") == 3L)
    assert(metrics.observedMetrics("frac_big").asInstanceOf[Double] > 0.6)
  }

  test("failing expectation with failOnError throws") {
    implicit val ctx: ActionPipelineContext = newCtx()
    val dir = Files.createTempDirectory("graft-dq").toString
    val out = ParquetFileDataObject("out", s"$dir/out",
      expectations = Seq(CountExpectation("cnt", Some("value > 100"), failOnError = true)))
    intercept[ExpectationViolation] {
      out.writeDataFrame(Seq((1, 10)).toDF("id", "v"))
    }
  }

  test("UniqueKeyExpectation All-scope checks the output table") {
    implicit val ctx: ActionPipelineContext = newCtx()
    val dir = Files.createTempDirectory("graft-dq").toString
    val out = ParquetFileDataObject("out", s"$dir/out",
      expectations = Seq(UniqueKeyExpectation("uk", Seq("id"), failOnError = true)))
    out.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    // now append a duplicate id -> uniqueness on whole table violated
    intercept[ExpectationViolation] {
      out.writeDataFrame(Seq((2, "dup")).toDF("id", "v"), saveMode = Some(SdlSaveMode.Append))
    }
  }

  test("SQLQueryExpectation runs its own query over the output table") {
    implicit val ctx: ActionPipelineContext = newCtx()
    val dir = Files.createTempDirectory("graft-dq").toString
    val out = ParquetFileDataObject("out", s"$dir/out",
      expectations = Seq(SQLQueryExpectation("max_v",
        "SELECT max(v) FROM %{inputViewName}", Some("value = 30"), failOnError = true)))
    val m = out.writeDataFrame(Seq((1, 10), (2, 30)).toDF("id", "v"))
    assert(m.observedMetrics("max_v") == 30)
    intercept[ExpectationViolation] {
      out.writeDataFrame(Seq((3, 99)).toDF("id", "v"), saveMode = Some(SdlSaveMode.Append))
    }
  }

  test("Job-scoped SQLQueryExpectation is evaluated, not silently skipped") {
    implicit val ctx: ActionPipelineContext = newCtx()
    val dir = Files.createTempDirectory("graft-dq").toString
    // the ONLY expectation is Job-scoped + query-based: it is excluded
    // from observe() and must still trigger the table pass
    val out = ParquetFileDataObject("out", s"$dir/out",
      expectations = Seq(SQLQueryExpectation("gate",
        "SELECT count(*) FROM %{inputViewName} WHERE v < 0",
        Some("value = 0"), scope = ExpectationScope.Job, failOnError = true)))
    val m = out.writeDataFrame(Seq((1, 10)).toDF("id", "v"))
    assert(m.observedMetrics("gate") == 0L)
    intercept[ExpectationViolation] {
      out.writeDataFrame(Seq((2, -5)).toDF("id", "v"), saveMode = Some(SdlSaveMode.Append))
    }
  }

  test("UniqueKeyExpectation rejects unusable configs at construction") {
    // approximate + exact-equality default: an HLL estimate is never
    // exactly 1.0 — require an explicit tolerance
    intercept[IllegalArgumentException] {
      UniqueKeyExpectation("uk", Seq("id"), approximate = true)
    }
    // Job scope + exact distinct: observe() rejects count_distinct
    intercept[IllegalArgumentException] {
      UniqueKeyExpectation("uk", Seq("id"), scope = ExpectationScope.Job)
    }
    // valid forms construct
    UniqueKeyExpectation("uk", Seq("id"), Some("value >= 0.95"), approximate = true)
    UniqueKeyExpectation("uk", Seq("id"), Some("value >= 0.95"), approximate = true,
      scope = ExpectationScope.Job)
  }

  test("expectation conditions bind TYPED metrics: timestamps and NaN compare, never splice") {
    implicit val ctx: ActionPipelineContext = newCtx()
    val dir = Files.createTempDirectory("graft-dq").toString
    // Timestamp metric: max(load_ts) compared against a timestamp literal —
    // a spliced toString would be unparseable SQL
    val fresh = ParquetFileDataObject("outts", s"$dir/outts",
      expectations = Seq(SQLExpectation("freshness", "max(ts)",
        Some("value >= to_timestamp('2024-01-01')"), ExpectationScope.All, failOnError = true)))
    fresh.writeDataFrame(Seq(("a", java.sql.Timestamp.valueOf("2024-06-01 00:00:00")))
      .toDF("k", "ts"))
    intercept[ExpectationViolation] {
      val stale = ParquetFileDataObject("outts2", s"$dir/outts2",
        expectations = Seq(SQLExpectation("freshness", "max(ts)",
          Some("value >= to_timestamp('2024-01-01')"), ExpectationScope.All, failOnError = true)))
      stale.writeDataFrame(Seq(("a", java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
        .toDF("k", "ts"))
    }
    // NaN metric (stddev of one row): a bare NaN literal would parse as a
    // column reference — the typed binding makes the comparison just false
    val nan = ParquetFileDataObject("outnan", s"$dir/outnan",
      expectations = Seq(SQLExpectation("spread", "stddev_samp(v)",
        Some("value < 100.0"), ExpectationScope.All, failOnError = true)))
    intercept[ExpectationViolation] {
      nan.writeDataFrame(Seq((1, 5.0)).toDF("k", "v"))  // stddev of 1 row = NaN → NOT < 100
    }
  }

  test("partition-scoped expectation without partition columns is a loud config error") {
    implicit val ctx: ActionPipelineContext = newCtx()
    val dir = Files.createTempDirectory("graft-dq").toString
    val out = ParquetFileDataObject("outps", s"$dir/outps",  // NOT partitioned
      expectations = Seq(AvgCountPerPartitionExpectation("avgc", Some("> 1"), failOnError = true)))
    val e = intercept[IllegalArgumentException] {
      out.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("partition"))
  }

  test("CompletenessExpectation measures non-null cell fraction") {
    implicit val ctx: ActionPipelineContext = newCtx()
    val dir = Files.createTempDirectory("graft-dq").toString
    val out = ParquetFileDataObject("out", s"$dir/out",
      expectations = Seq(CompletenessExpectation("comp", Seq("a", "b"), Some("value >= 0.7"), failOnError = true)))
    val df = Seq((Some(1), Some("x")), (Some(2), None), (Some(3), Some("z")))
      .toDF("a", "b")
    val m = out.writeDataFrame(df)
    val v = m.observedMetrics("comp").asInstanceOf[Double]
    assert(math.abs(v - 5.0 / 6.0) < 1e-9)
  }

  test("AvgCountPerPartitionExpectation and TransferRateExpectation compute metrics") {
    implicit val ctx: ActionPipelineContext = newCtx()
    val dir = Files.createTempDirectory("graft-dq").toString
    val out = ParquetFileDataObject("out", s"$dir/out", partitions = Seq("dt"),
      expectations = Seq(
        AvgCountPerPartitionExpectation("avg_cnt", Some("value >= 1"), failOnError = true),
        TransferRateExpectation("rate", Some("value > 0"), failOnError = true)))
    val df = Seq(("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 3)).toDF("dt", "v")
    val m = out.writeDataFrame(df)
    assert(m.observedMetrics("avg_cnt").asInstanceOf[Double] == 1.5)
    assert(m.observedMetrics("rate").asInstanceOf[Double] > 0)
  }
}
