package graft

import graft.core._
import graft.sources._
import org.scalatest.funsuite.AnyFunSuite

class HousekeepingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  implicit lazy val ctx: ActionPipelineContext =
    ActionPipelineContext(spark, new InstanceRegistry)

  def freshObj(mode: Option[HousekeepingMode] = None): ParquetFileDataObject = {
    val dir = java.nio.file.Files.createTempDirectory("graft_hk").toString
    ParquetFileDataObject("hk", dir, partitions = Seq("dt"), housekeepingMode = mode)
  }

  def writeDays(obj: ParquetFileDataObject, days: String*): Unit = {
    import spark.implicits._
    val df = days.flatMap(d => Seq((d, 1, "x"), (d, 2, "y"))).toDF("dt", "id", "v")
    obj.copy(housekeepingMode = None)
      .writeDataFrame(df, Seq.empty, Some(SdlSaveMode.Overwrite))
  }

  test("retention mode deletes partitions failing the condition post-write") {
    import spark.implicits._
    val obj = freshObj(Some(PartitionRetentionMode("dt >= '2024-01-02'")))
    writeDays(obj, "2024-01-01", "2024-01-02", "2024-01-03")
    // trigger housekeeping via a write through the configured object
    obj.writeDataFrame(Seq(("2024-01-04", 9, "z")).toDF("dt", "id", "v"),
      Seq.empty, Some(SdlSaveMode.Append))
    val kept = obj.listPartitions.map(_.elements("dt")).sorted
    assert(kept == Seq("2024-01-02", "2024-01-03", "2024-01-04"))
  }

  test("archive mode re-bins day partitions into a month partition") {
    val obj = freshObj()
    writeDays(obj, "2024-01-01", "2024-01-02", "2024-02-10")
    val mode = PartitionArchiveCompactionMode(
      archiveCondition = Some("dt < '2024-02-01'"),
      archiveExpression = Some("named_struct('dt', substring(dt, 1, 7))"))
    mode.exec(obj)
    val parts = obj.listPartitions.map(_.elements("dt")).sorted
    assert(parts == Seq("2024-01", "2024-02-10"))
    // all january rows live in the archive partition
    val jan = obj.getDataFrame(Seq(PartitionValues(Map("dt" -> "2024-01"))))
    assert(jan.count() == 4)
    // total preserved
    assert(obj.getDataFrame().count() == 6)
  }

  test("compaction rewrites a partition into one file") {
    import spark.implicits._
    val obj = freshObj()
    // write the same partition in 3 appends -> >= 3 files
    (1 to 3).foreach { i =>
      obj.writeDataFrame(Seq(("2024-03-01", i, "v")).toDF("dt", "id", "v"),
        Seq.empty, Some(SdlSaveMode.Append))
    }
    val dir = new java.io.File(obj.path, "dt=2024-03-01")
    def dataFiles = dir.listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(dataFiles >= 3)
    PartitionArchiveCompactionMode(compactCondition = Some("dt = '2024-03-01'")).exec(obj)
    assert(dataFiles == 1)
    assert(obj.getDataFrame().count() == 3)
  }
}
