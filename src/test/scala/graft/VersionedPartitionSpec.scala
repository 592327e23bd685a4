package graft

import graft.core._
import graft.sources._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Partitioned versioned table: logged partition values (the Delta
  * `add.partitionValues` design) — metadata-only partition deletes,
  * dynamic partition overwrite, plan-time partition pruning with the
  * columns reconstructed from the log (not stored in the files). */
class VersionedPartitionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  implicit lazy val ctx: ActionPipelineContext =
    ActionPipelineContext(spark, new InstanceRegistry)
  import spark.implicits._

  private def table(dir: String) =
    VersionedTableDataObject("vpt", s"$dir/t", primaryKey = Seq("k"),
      partitions = Seq("dt"))

  test("round trip: partition columns live in the log, come back typed and ordered") {
    val dir = Files.createTempDirectory("graft-vp").toString
    val t = table(dir)
    t.writeDataFrame(Seq((1, "a", "d1"), (2, "b", "d2"), (3, "c", "d2"))
      .toDF("k", "v", "dt"))
    val got = t.getDataFrame()
    assert(got.columns.toSeq == Seq("k", "v", "dt"))           // original order
    assert(got.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet ==
      Set((1, "a", "d1"), (2, "b", "d2"), (3, "c", "d2")))
    assert(t.listPartitions.map(_.elements).toSet ==
      Set(Map("dt" -> "d1"), Map("dt" -> "d2")))
    // the staged data files do NOT contain the partition column
    val aFile = t.snapshotFiles().head
    val raw = spark.read.parquet(s"$dir/t/$aFile")
    assert(!raw.columns.contains("dt"))
  }

  test("partition filter prunes files at plan time (log-only, no footers)") {
    val dir = Files.createTempDirectory("graft-vp").toString
    val t = table(dir)
    t.writeDataFrame((1 to 40).map(i => (i, s"v$i", s"d${i % 4}")).toDF("k", "v", "dt"))
    val planned = t.getDataFrame().where($"dt" === "d1")
      .queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s.inputRDDs().head.partitions.length
      }
    // physical numFiles metric: only d1's file(s) scanned
    val scan = t.getDataFrame().where($"dt" === "d1")
    assert(scan.count() == 10)
    val files = scan.select(org.apache.spark.sql.functions.input_file_name()).distinct().count()
    val allFiles = t.snapshotFiles().size
    assert(files < allFiles, s"partition filter scanned $files of $allFiles files — no pruning")
    assert(planned.forall(_ >= 1))
  }

  test("deletePartitions: one metadata commit, zero files touched on disk") {
    val dir = Files.createTempDirectory("graft-vp").toString
    val t = table(dir)
    t.writeDataFrame(Seq((1, "a", "d1"), (2, "b", "d2")).toDF("k", "v", "dt"))
    val before = t.snapshotFiles().toSet
    val v0 = t.latestVersion.get
    t.deletePartitions(Seq(PartitionValues("dt" -> "d1")))
    assert(t.latestVersion.contains(v0 + 1))
    assert(t.getDataFrame().select("dt").as[String].collect().toSet == Set("d2"))
    // every pre-delete file still physically present (time travel intact)
    before.foreach(f => assert(Files.exists(java.nio.file.Paths.get(s"$dir/t/$f"))))
    assert(t.getDataFrameAsOf(Some(v0)).count() == 2)
  }

  test("OverwriteOptimized: dynamic partition overwrite supersedes only written partitions") {
    val dir = Files.createTempDirectory("graft-vp").toString
    val t = table(dir)
    t.writeDataFrame(Seq((1, "a", "d1"), (2, "b", "d2")).toDF("k", "v", "dt"))
    t.writeDataFrame(Seq((9, "z", "d2")).toDF("k", "v", "dt"),
      saveMode = Some(SdlSaveMode.OverwriteOptimized))
    val got = t.getDataFrame().collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1, "a", "d1"), (9, "z", "d2")))          // d1 untouched, d2 replaced
  }

  test("PartitionDiffMode diffs against a versioned-table output's logged partitions") {
    val dir = Files.createTempDirectory("graft-vp").toString
    val reg = new InstanceRegistry()
    implicit val c2: ActionPipelineContext = ActionPipelineContext(spark, reg)
    reg.register(ParquetFileDataObject("pin", s"$dir/in", partitions = Seq("dt")))
    reg.register(VersionedTableDataObject("vout", s"$dir/out", partitions = Seq("dt")))
    def copy() = new ActionDAGRun(Seq(graft.operators.CopyAction(
      "c", "pin", "vout", saveMode = Some(SdlSaveMode.Append),
      executionMode = Some(graft.operators.modes.PartitionDiffMode())))).run()(c2)

    Seq((1, "d1"), (2, "d2")).toDF("k", "dt").write.partitionBy("dt").parquet(s"$dir/in")
    copy()
    val vt = reg.dataObject("vout").asInstanceOf[VersionedTableDataObject]
    assert(vt.getDataFrame()(c2).count() == 2)
    val v1 = vt.latestVersion(c2).get
    // new input partition d3: the diff selects ONLY it against the LOG
    Seq((3, "d3")).toDF("k", "dt").write.mode("append").partitionBy("dt").parquet(s"$dir/in")
    copy()
    assert(vt.getDataFrame()(c2).count() == 3)
    // run 3: nothing missing → no new commit
    copy()
    assert(vt.getDataFrame()(c2).count() == 3)
  }

  test("merge schema auto-merge: a new feed column evolves the table, old rows null-fill") {
    val dir = Files.createTempDirectory("graft-vp").toString
    val t = VersionedTableDataObject("vse", s"$dir/t", primaryKey = Seq("k"))
    t.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    t.mergeDataFrame(Seq((2, "B", 9.5), (3, "c", 1.5)).toDF("k", "v", "w"), Seq("k"))
    val got = t.getDataFrame()
    assert(got.columns.toSeq == Seq("k", "v", "w"))
    val rows = got.collect().map(r => (r.getInt(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(rows == Set((1, "a", None), (2, "B", Some(9.5)), (3, "c", Some(1.5))))
  }

  test("insertColumnsToIgnore columns never evolve the merged schema (historize op tag)") {
    val dir = Files.createTempDirectory("graft-vp").toString
    val t = VersionedTableDataObject("vsi", s"$dir/t", primaryKey = Seq("k"))
    t.writeDataFrame(Seq((1, "a")).toDF("k", "v"))
    t.mergeDataFrame(Seq((2, "b", "insertNew")).toDF("k", "v", "_op"), Seq("k"),
      graft.core.SaveModeMergeOptions(insertColumnsToIgnore = Seq("_op")))
    val got = t.getDataFrame()
    assert(got.columns.toSeq == Seq("k", "v"))                   // _op stayed feed-technical
    assert(got.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "a"), (2, "b")))
  }

  test("partition-scoped OPTIMIZE rewrites only the selected partition's files") {
    val dir = Files.createTempDirectory("graft-vp").toString
    val t = table(dir)
    t.writeDataFrame((1 to 40).map(i => (i, s"v$i", s"d${i % 2}")).toDF("k", "v", "dt")
      .repartition(8))
    val before = t.snapshotFiles()
    val d0Before = before.filter(f => t.liveFileStats().get(f).exists(_.pv.get("dt").contains("d0")))
    val d1Before = before.filter(f => t.liveFileStats().get(f).exists(_.pv.get("dt").contains("d1")))
    assert(d1Before.size > 1)
    t.optimize(1, partitionValues = Seq(PartitionValues("dt" -> "d1")))
    val after = t.snapshotFiles()
    // d0's files carried BY REFERENCE (same rel paths), d1 compacted
    assert(d0Before.forall(after.contains))
    assert(d1Before.forall(f => !after.contains(f)))
    assert(after.count(f => t.liveFileStats().get(f).exists(_.pv.get("dt").contains("d1"))) == 1)
    assert(t.getDataFrame().count() == 40)
  }

  test("merge prunes by partition stats; checkpoint round-trips partition values") {
    val dir = Files.createTempDirectory("graft-vp").toString
    val t = VersionedTableDataObject("vpt2", s"$dir/t", primaryKey = Seq("k"),
      partitions = Seq("dt"), checkpointInterval = 3)
    t.writeDataFrame(Seq((1, "a", "d1"), (2, "b", "d2")).toDF("k", "v", "dt"))
    (0 until 4).foreach(i => t.mergeDataFrame(
      Seq((2, s"b$i", "d2")).toDF("k", "v", "dt"), Seq("k")))   // versions 1..4, checkpoint at 3
    val logDir = java.nio.file.Paths.get(s"$dir/t/_graft_log")
    assert(Files.exists(logDir.resolve("00000003.checkpoint.json")))
    // after the checkpoint-based read, partition values still reconstruct
    val got = t.getDataFrame().collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1, "a", "d1"), (2, "b3", "d2")))
    assert(t.listPartitions.map(_.elements).toSet ==
      Set(Map("dt" -> "d1"), Map("dt" -> "d2")))
  }
}
