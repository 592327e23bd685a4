package graft

import graft.core._
import graft.sources._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class VersionedTableSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  implicit lazy val ctx: ActionPipelineContext =
    ActionPipelineContext(spark, new InstanceRegistry)
  import spark.implicits._

  test("versioned table: overwrite/append/merge commits, time travel reads") {
    val dir = Files.createTempDirectory("graft-vt").toString
    val t = VersionedTableDataObject("vt1", s"$dir/t", primaryKey = Seq("k"))
    t.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v"))                     // v0
    t.writeDataFrame(Seq((3, "c")).toDF("k", "v"), saveMode = Some(SdlSaveMode.Append)) // v1
    t.mergeDataFrame(Seq((2, "B"), (4, "d")).toDF("k", "v"), Seq("k"))           // v2

    assert(t.latestVersion.contains(2))
    def state(v: Int) = t.getDataFrameAsOf(Some(v))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(state(0) == Set((1, "a"), (2, "b")))
    assert(state(1) == Set((1, "a"), (2, "b"), (3, "c")))
    assert(state(2) == Set((1, "a"), (2, "B"), (3, "c"), (4, "d")))
    // latest == asOf(latest)
    assert(t.getDataFrame().collect().map(r => (r.getInt(0), r.getString(1))).toSet == state(2))
  }

  test("optimize compacts files; vacuum drops pre-horizon versions and files") {
    val dir = Files.createTempDirectory("graft-vt").toString
    val t = VersionedTableDataObject("vt2", s"$dir/t")
    t.writeDataFrame((1 to 100).toDF("k").repartition(8))                       // v0: 8 files
    t.writeDataFrame((101 to 110).toDF("k").repartition(4),
      saveMode = Some(SdlSaveMode.Append))                                      // v1: +4 files
    val nAfter = t.optimize(targetFileCount = 2)                                // v2
    assert(nAfter <= 2)
    // data identical after compaction; pre-compaction version still reads
    assert(t.getDataFrame().count() == 110)
    assert(t.getDataFrameAsOf(Some(1)).count() == 110)
    assert(t.getDataFrameAsOf(Some(0)).count() == 100)

    val deleted = t.vacuum(retainVersions = 1)                                  // keep only v2
    assert(deleted.nonEmpty)                                                    // 12 stale files go
    assert(t.getDataFrame().count() == 110)                                     // live unaffected
    intercept[Exception](t.getDataFrameAsOf(Some(1)).count())                   // horizon enforced... v1 rebased away
  }

  test("append-evolution: committed union schema serves every version") {
    val dir = Files.createTempDirectory("graft-vt").toString
    val t = VersionedTableDataObject("vt4", s"$dir/t")
    t.writeDataFrame(Seq((1, "a")).toDF("k", "v"))                              // v0: (k, v)
    t.writeDataFrame(Seq((2, 9.5)).toDF("k", "w"),
      saveMode = Some(SdlSaveMode.Append))                                      // v1: +w
    val latest = t.getDataFrame()
    assert(latest.columns.toSet == Set("k", "v", "w"))
    val rows = latest.collect().map(r =>
      (r.getInt(0), Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(rows == Set((1, Some("a"), None), (2, None, Some(9.5))))             // null-fill both ways
    assert(t.getDataFrameAsOf(Some(0)).columns.toSet == Set("k", "v"))          // v0 schema preserved
  }

  test("streaming merge sink: each micro-batch commits one upsert version") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-vt").toString
    val schema = StructType(Seq(StructField("k", IntegerType), StructField("v", StringType)))
    // two files → two micro-batches (maxFilesPerTrigger=1); batch 2 upserts k=2
    Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1).write.json(s"$dir/in1")
    Seq((2, "B2"), (3, "c")).toDF("k", "v").coalesce(1).write.json(s"$dir/in2")
    Files.createDirectory(java.nio.file.Paths.get(s"$dir/src"))
    def link(n: Int): Unit = {
      val part = new java.io.File(s"$dir/in$n").listFiles()
        .filter(_.getName.endsWith(".json")).head
      java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(s"$dir/src/b$n.json"))
      assert(new java.io.File(s"$dir/src/b$n.json").setLastModified(1700000000000L + n * 10000))
    }
    link(1); link(2)
    val t = VersionedTableDataObject("vt5", s"$dir/t", primaryKey = Seq("k"))
    val sdf = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(s"$dir/src")
    val q = t.writeStreamingDataFrame(sdf,
      org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      Map("graft.saveMode" -> "merge"), s"$dir/cp", "vt5_stream")
    q.awaitTermination()
    val finalState = t.getDataFrame().collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(finalState == Set((1, "a"), (2, "B2"), (3, "c")))
    assert(t.latestVersion.contains(1)) // two micro-batches → two commits
    // time travel to the first micro-batch's state
    assert(t.getDataFrameAsOf(Some(0)).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet == Set((1, "a"), (2, "b")))
  }

  test("config-parsed versioned table works as a copy sink with merge") {
    val dir = Files.createTempDirectory("graft-vt").toString
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.parquet(s"$dir/src")
    val cfg =
      s"""dataObjects:
         |  vsrc: {type: parquet, path: $dir/src}
         |  vdst: {type: versionedTable, path: $dir/t, primaryKey: [k]}
         |actions:
         |  load: {type: copy, inputId: vsrc, outputId: vdst, saveMode: overwrite, metadata: {feed: vt}}
         |""".stripMargin
    PipelineRunner.run(cfg, spark, feedSel = Some("vt"))
    val t = VersionedTableDataObject("vdst2", s"$dir/t")
    assert(t.getDataFrame().count() == 2)
    assert(t.latestVersion.contains(0))
  }

  test("vacuum keeps files still referenced by retained snapshots") {
    val dir = Files.createTempDirectory("graft-vt").toString
    val t = VersionedTableDataObject("vt3", s"$dir/t")
    t.writeDataFrame((1 to 50).toDF("k"))                                       // v0
    t.writeDataFrame((51 to 60).toDF("k"), saveMode = Some(SdlSaveMode.Append)) // v1 (reuses v0 files)
    t.writeDataFrame((61 to 70).toDF("k"), saveMode = Some(SdlSaveMode.Append)) // v2
    t.vacuum(retainVersions = 2)                                                // retain v1, v2
    // v0's files are still referenced by v1/v2 snapshots — nothing breaks
    assert(t.getDataFrameAsOf(Some(1)).count() == 60)
    assert(t.getDataFrame().count() == 70)
  }
}
