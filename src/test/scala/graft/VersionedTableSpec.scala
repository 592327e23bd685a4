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

  test("restore rolls back to a prior version metadata-only, preserving history") {
    val dir = Files.createTempDirectory("graft-vt").toString
    val t = VersionedTableDataObject("vtr", s"$dir/t", primaryKey = Seq("k"))
    t.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v"))                    // v0
    t.mergeDataFrame(Seq((2, "B"), (3, "c")).toDF("k", "v"), Seq("k"))          // v1
    val filesV0 = t.snapshotFiles(Some(0))
    val dataFilesBefore = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    val v = t.restore(0)                                                        // v2 = v0's content
    assert(v == 2 && t.latestVersion.contains(2))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows(t.getDataFrame()) == Set((1, "a"), (2, "b")))                   // head == v0
    assert(t.snapshotFiles().toSet == filesV0.toSet)                            // same physical files
    assert(rows(t.getDataFrameAsOf(Some(1))) == Set((1, "a"), (2, "B"), (3, "c"))) // history intact
    // metadata-only: no data file was created, deleted, or rewritten
    val dataFilesAfter = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    assert(dataFilesAfter == dataFilesBefore)
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
    val results = PipelineRunner.run(cfg, spark, feedSel = Some("vt"))
    val t = VersionedTableDataObject("vdst2", s"$dir/t")
    assert(t.getDataFrame().count() == 2)
    assert(t.latestVersion.contains(0))
    // metrics contract: the versioned-table sink reports real records_written
    assert(results("load").head.metrics.exists(_.recordsWritten == 2L))
  }

  test("merge rewrites only files containing matched keys; the rest are untouched bytes") {
    val dir = Files.createTempDirectory("graft-vt").toString
    val t = VersionedTableDataObject("vt6", s"$dir/t", primaryKey = Seq("k"))
    // 4 files with disjoint key ranges → stats pruning can isolate one
    t.writeDataFrame((1 to 400).map(i => (i, s"v$i")).toDF("k", "v")
      .repartitionByRange(4, $"k"))                                             // v0
    val v0Files = t.snapshotFiles()
    assert(v0Files.size == 4)
    def bytes(rel: String) = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/t/$rel")).toSeq
    val before = v0Files.map(f => f -> bytes(f)).toMap

    // update two keys in ONE file's range (+ one insert beyond all ranges)
    t.mergeDataFrame(Seq((10, "X"), (20, "Y"), (999, "new")).toDF("k", "v"), Seq("k"))

    val live = t.snapshotFiles()
    val carried = v0Files.filter(live.contains)
    assert(carried.size == 3, s"expected 3 of 4 v0 files carried by reference, got $carried")
    carried.foreach(f => assert(bytes(f) == before(f), s"carried file $f changed bytes"))
    // final state correct: updates applied, insert present, everything else kept
    val state = t.getDataFrame().collect().map(r => (r.getInt(0), r.getString(1))).toMap
    assert(state.size == 401 && state(10) == "X" && state(20) == "Y" &&
      state(999) == "new" && state(5) == "v5" && state(399) == "v399")
  }

  test("merge stats pruning: files outside the feed's key bounds are not even scanned candidates") {
    val dir = Files.createTempDirectory("graft-vt").toString
    val t = VersionedTableDataObject("vt7", s"$dir/t", primaryKey = Seq("k"))
    t.writeDataFrame((1 to 300).map(i => (i, i.toString)).toDF("k", "v")
      .repartitionByRange(3, $"k"))
    val live = t.snapshotFiles()
    val stats = t.liveFileStats()
    assert(stats.size == 3 && stats.values.forall(s => s.rows == 100 && s.min.contains("k")))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k INT, v STRING")
    // feed bounds [5, 15] → only the file covering low keys survives
    val pruned = t.pruneByKeyBounds(live, stats, schema, Seq("k"),
      Map("k" -> (("5", "15"))), feedHasNullKeys = false)
    assert(pruned.size == 1, s"expected 1 candidate file, got $pruned")
    // null keys in the feed disable stats pruning (conservative)
    assert(t.pruneByKeyBounds(live, stats, schema, Seq("k"),
      Map("k" -> (("5", "15"))), feedHasNullKeys = true).size == 3)
  }

  test("data skipping: selective read plans fewer files than the snapshot holds") {
    import org.apache.spark.sql.sources._
    val dir = Files.createTempDirectory("graft-vt").toString
    val t = VersionedTableDataObject("vt8", s"$dir/t")
    t.writeDataFrame((1 to 400).map(i => (i, s"s$i")).toDF("k", "v")
      .repartitionByRange(4, $"k"))
    assert(t.snapshotFiles().size == 4)
    val planned = t.filesForFilters(Seq(EqualTo("k", 42)))
    assert(planned.size == 1, s"point lookup should plan 1 file, got $planned")
    assert(t.filesForFilters(Seq(GreaterThan("k", 350))).size == 1)
    assert(t.filesForFilters(Seq(LessThanOrEqual("k", 1))).size == 1)
    assert(t.filesForFilters(Seq(In("k", Array(1, 400)))).size == 2)
    assert(t.filesForFilters(Seq(IsNotNull("k"))).size == 4)
    // the read itself is still exactly the filtered table
    val rows = t.getDataFrameFiltered(Seq(GreaterThan("k", 397))).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows == Set((398, "s398"), (399, "s399"), (400, "s400")))
    // impossible predicate → zero files, empty frame with the table schema
    val none = t.getDataFrameFiltered(Seq(GreaterThan("k", 10000)))
    assert(t.filesForFilters(Seq(GreaterThan("k", 10000))).isEmpty)
    assert(none.count() == 0 && none.columns.toSeq == Seq("k", "v"))

    // the SAME pruning fires automatically for any .where on the plain
    // read path: the log-backed FileIndex serves listFiles from stats,
    // so the physical scan plans 1 of 4 files for a point lookup
    def scanNumFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.getOrElse(fail("no FileSourceScanExec in plan"))
    }
    import org.apache.spark.sql.functions.col
    assert(scanNumFiles(t.getDataFrame().where(col("k") === 42)) == 1)
    assert(scanNumFiles(t.getDataFrame().where(col("k") > 350)) == 1)
    assert(scanNumFiles(t.getDataFrame()) == 4)
  }

  test("OPTIMIZE ZORDER: point filters on EITHER clustered column prune files") {
    import org.apache.spark.sql.sources.EqualTo
    val dir = Files.createTempDirectory("graft-vt").toString
    val t = VersionedTableDataObject("vtz", s"$dir/t")
    // two decorrelated columns; initial layout ordered by `a` only, so a
    // `b` filter can never prune (every file spans b's full range)
    val rows = (0 until 4096).map(i => (i, (i * 2654435761L % 4096).toInt))
    t.writeDataFrame(rows.toDF("a", "b").repartitionByRange(8, $"a"))
    assert(t.filesForFilters(Seq(EqualTo("a", 100))).size == 1)   // a-sorted: prunes
    assert(t.filesForFilters(Seq(EqualTo("b", 100))).size == 8)   // b: no pruning
    val n = t.optimize(8, zorderBy = Seq("a", "b"))
    assert(n == 8)
    // z-clustered: BOTH columns prune (each file covers a compact
    // hyper-rectangle, so ~half the bits of each column are fixed)
    val aPruned = t.filesForFilters(Seq(EqualTo("a", 100))).size
    val bPruned = t.filesForFilters(Seq(EqualTo("b", 100))).size
    // (range-partition boundaries come from sampling and don't align
    // exactly to bit boundaries, so the split is uneven — what matters is
    // that the previously-unprunable column now prunes hard while the
    // other still does)
    assert(aPruned < 8 && bPruned < 8, s"a=$aPruned b=$bPruned of 8")
    assert(bPruned <= 4, s"b=$bPruned — the previously-unprunable column must fix ≥1 bit")
    // clustering is data-invariant
    assert(t.getDataFrame().collect().map(r => (r.getInt(0), r.getInt(1))).toSet == rows.toSet)
    // pre-optimize version still time-travels
    assert(t.getDataFrameAsOf(Some(0)).count() == 4096)
  }

  test("write and merge report real records_written from parquet footers") {
    val dir = Files.createTempDirectory("graft-vt").toString
    val t = VersionedTableDataObject("vt9", s"$dir/t", primaryKey = Seq("k"))
    val m0 = t.writeDataFrame((1 to 123).map(i => (i, s"v$i")).toDF("k", "v"))
    assert(m0.recordsWritten == 123)
    val m1 = t.writeDataFrame(Seq((200, "a")).toDF("k", "v"), saveMode = Some(SdlSaveMode.Append))
    assert(m1.recordsWritten == 1)
    // merge metrics count the rewritten rows (touched-file rows + inserts)
    val m2 = t.mergeDataFrame(Seq((1, "X"), (500, "ins")).toDF("k", "v"), Seq("k"))
    assert(m2.recordsWritten >= 2)
    assert(t.getDataFrame().count() == 125)
  }

  test("optimistic concurrency: parallel appends all land, distinct versions, no lost rows") {
    val dir = Files.createTempDirectory("graft-vt").toString
    val t = VersionedTableDataObject("vtc", s"$dir/t")
    t.writeDataFrame(Seq((0, "base")).toDF("k", "v"))                          // v0
    // 6 writers race appends; every one must retry past rename losses
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val writes = (1 to 6).map { i =>
      scala.concurrent.Future {
        t.writeDataFrame(Seq((i, s"w$i")).toDF("k", "v"), saveMode = Some(SdlSaveMode.Append))
      }
    }
    scala.concurrent.Await.result(scala.concurrent.Future.sequence(writes),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    assert(t.latestVersion.contains(6))                                        // v1..v6 all claimed
    val rows = t.getDataFrame().collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows == (Set((0, "base")) ++ (1 to 6).map(i => (i, s"w$i"))), rows.toString)
  }

  test("merge conflict rules: disjoint concurrent appends retry, overlapping keys abort") {
    val dir = Files.createTempDirectory("graft-vt").toString
    val t = VersionedTableDataObject("vtm", s"$dir/t", primaryKey = Seq("k"))
    t.writeDataFrame((1 to 100).map(i => (i, s"v$i")).toDF("k", "v"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k INT, v STRING")
    val myTouched = t.snapshotFiles()
    // a concurrent append of keys 200..300 with logged stats: DISJOINT
    // from a merge whose feed bounds are [5, 10] → retryable
    t.writeDataFrame((200 to 300).map(i => (i, s"n$i")).toDF("k", "v"),
      saveMode = Some(SdlSaveMode.Append))
    val newFiles = t.snapshotFiles().filterNot(myTouched.contains)
    val stats = t.liveFileStats()
    // reconstruct: concurrent commit = the appended files with their stats
    val cc = Seq((newFiles, stats.filter(kv => newFiles.contains(kv._1))))
    // disjoint bounds → no conflict
    assert(!t.mergeConflicts(
      cc.map { case (f, s) => t.Commit(1, f, Seq.empty, None, s) },
      myTouched.take(1), Seq("k"), Map("k" -> (("5", "10"))), schema, feedHasNullKeys = false))
    // overlapping bounds → conflict
    assert(t.mergeConflicts(
      cc.map { case (f, s) => t.Commit(1, f, Seq.empty, None, s) },
      myTouched.take(1), Seq("k"), Map("k" -> (("250", "260"))), schema, feedHasNullKeys = false))
    // concurrent removal of a file this merge rewrote → conflict
    assert(t.mergeConflicts(
      Seq(t.Commit(1, Seq.empty, myTouched.take(1), None, Map.empty)),
      myTouched.take(1), Seq("k"), Map("k" -> (("5", "10"))), schema, feedHasNullKeys = false))
    // null feed keys → conservative conflict on any concurrent add
    assert(t.mergeConflicts(
      cc.map { case (f, s) => t.Commit(1, f, Seq.empty, None, s) },
      myTouched.take(1), Seq("k"), Map("k" -> (("5", "10"))), schema, feedHasNullKeys = true))
  }

  test("change data feed: typed row changes; compaction rewrites emit nothing") {
    val dir = Files.createTempDirectory("graft-vt").toString
    val t = VersionedTableDataObject("vtcdf", s"$dir/t", primaryKey = Seq("k"))
    t.writeDataFrame((1 to 10).map(i => (i, s"v$i")).toDF("k", "v"))            // v0
    t.mergeDataFrame(Seq((5, "V5"), (11, "new")).toDF("k", "v"), Seq("k"))     // v1
    t.optimize(1)                                                              // v2: same data
    def changes(a: Int, b: Int) = t.changesBetween(a, Some(b)).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(changes(0, 1) == Set(
      (5, "v5", "update_preimage"), (5, "V5", "update_postimage"), (11, "new", "insert")))
    // compaction rewrote every row identically → zero change rows
    assert(changes(1, 2).isEmpty)
    // net diff across the range collapses the compaction
    assert(t.changesBetween(0, None).count() == 3)
    // delete via merge deleteCondition surfaces the OLD row
    t.mergeDataFrame(Seq((3, "__DEL__")).toDF("k", "v"), Seq("k"),
      SaveModeMergeOptions(deleteCondition = Some("new.v = '__DEL__'")))       // v3
    assert(changes(2, 3) == Set((3, "v3", "delete")))
  }

  test("change data feed streams: per-commit CDC files consumed by a plain file stream") {
    val dir = Files.createTempDirectory("graft-vt").toString
    val t = VersionedTableDataObject("vtcdfs", s"$dir/t", primaryKey = Seq("k"),
      changeDataFeed = true)
    t.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v"))                 // v0: 2 inserts
    t.mergeDataFrame(Seq((2, "B"), (3, "c")).toDF("k", "v"), Seq("k"))       // v1: update + insert
    t.mergeDataFrame(Seq((1, "__DEL__")).toDF("k", "v"), Seq("k"),
      SaveModeMergeOptions(deleteCondition = Some("new.v = '__DEL__'")))     // v2: delete
    def drain(): Set[(Int, String, String, Long)] = {
      val q = t.getStreamingDataFrame(Map.empty, None)
        .writeStream.format("parquet").option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(s"$dir/out").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    }
    assert(drain() == Set(
      (1, "a", "insert", 0L), (2, "b", "insert", 0L),
      (2, "b", "update_preimage", 1L), (2, "B", "update_postimage", 1L), (3, "c", "insert", 1L),
      (1, "a", "delete", 2L)))
    // optimize rewrites identical data → NO cdc emitted; a later append is
    // picked up by a RESTARTED query from the same checkpoint
    t.optimize(1)                                                            // v3: no changes
    t.writeDataFrame(Seq((9, "z")).toDF("k", "v"), saveMode = Some(SdlSaveMode.Append)) // v4
    val got2 = drain()
    assert(got2.contains((9, "z", "insert", 4L)) && got2.size == 7, s"restart drained: $got2")
    // optimize left an EMPTY marker dir so the version sequence is gapless
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/t/_graft_cdc/v00000003/_SUCCESS")))
  }

  test("CDF self-heals a crash gap: the next commit backfills the missing version") {
    val dir = Files.createTempDirectory("graft-vt").toString
    val t = VersionedTableDataObject("vtcdfh", s"$dir/t", primaryKey = Seq("k"),
      changeDataFeed = true)
    t.writeDataFrame(Seq((1, "a")).toDF("k", "v"))                           // v0
    t.mergeDataFrame(Seq((2, "b")).toDF("k", "v"), Seq("k"))                 // v1
    // simulate a crash between commit v1 and its CDC write: remove the dir
    def rmr(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (Files.exists(p)) {
        val s = Files.walk(p)
        try s.iterator().asScala.toSeq.reverse.foreach(Files.delete) finally s.close()
      }
    }
    rmr(java.nio.file.Paths.get(s"$dir/t/_graft_cdc/v00000001"))
    // a compaction MARKER must not paper over the gap — it backfills first
    t.optimize(1)                                                            // v2: marker + backfill of v1
    t.writeDataFrame(Seq((3, "c")).toDF("k", "v"), saveMode = Some(SdlSaveMode.Append)) // v3
    val q = t.getStreamingDataFrame(Map.empty, None)
      .writeStream.format("parquet").option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set((1, "a", "insert", 0L), (2, "b", "insert", 1L), (3, "c", "insert", 3L)),
      s"gap not healed: $got")
  }

  test("checkpointed log: reads replay checkpoint + tail, never the full history") {
    val dir = Files.createTempDirectory("graft-vt").toString
    val t = VersionedTableDataObject("vtcp", s"$dir/t", primaryKey = Seq("k"),
      checkpointInterval = 10)
    (0 until 25).foreach(i =>
      t.writeDataFrame(Seq((i, s"v$i")).toDF("k", "v"), saveMode = Some(SdlSaveMode.Append)))
    // winners of versions 10 and 20 wrote checkpoints
    val logDir = java.nio.file.Paths.get(s"$dir/t/_graft_log")
    assert(Files.exists(logDir.resolve("00000010.checkpoint.json")))
    assert(Files.exists(logDir.resolve("00000020.checkpoint.json")))
    // a head read parses the newest checkpoint + the 4-commit tail (21..24),
    // NOT the 25-commit history
    t.logFilesParsed = 0
    assert(t.getDataFrame().count() == 25)
    assert(t.logFilesParsed <= 5, s"parsed ${t.logFilesParsed} log files for a head read")
    // latestVersion is pure listing — zero parses
    t.logFilesParsed = 0
    assert(t.latestVersion.contains(24))
    assert(t.logFilesParsed == 0)
    // time travel BELOW the newest checkpoint picks the right older base
    assert(t.getDataFrameAsOf(Some(15)).count() == 16)
    assert(t.getDataFrameAsOf(Some(3)).count() == 4)   // before any checkpoint: plain replay
    // checkpoints carry stats: merge pruning and data skipping still engage
    t.logFilesParsed = 0
    val skipped = t.filesForFilters(Seq(org.apache.spark.sql.sources.EqualTo("k", 7)))
    assert(t.logFilesParsed <= 5)
    assert(skipped.size == 1, s"stats lost through checkpoint: ${skipped.size} candidate files")
    // vacuum drops pre-horizon checkpoints so rebased replay can't double-add
    t.vacuum(retainVersions = 3)                       // horizon = v22 > checkpoint 20
    assert(!Files.exists(logDir.resolve("00000010.checkpoint.json")))
    assert(!Files.exists(logDir.resolve("00000020.checkpoint.json")))
    assert(t.getDataFrame().count() == 25)
    assert(t.getDataFrame().where($"k" === 13).count() == 1)
  }

  test("vacuum crash ordering: every phase boundary leaves a readable, correct log") {
    // build: v0 (8 files), v1 append, v2 compaction → vacuum(retain 1)
    // has real pre-horizon history AND deletable files. Interrupt the
    // sequence at EACH phase boundary, prove the interrupted state reads
    // the correct head snapshot with zero data files lost, then re-run
    // vacuum (crash recovery) and prove it completes.
    val phases = Seq("checkpointed", "old-checkpoints-deleted", "old-commits-deleted", "rebased")
    for (stopAt <- phases) {
      val dir = Files.createTempDirectory("graft-vtcrash").toString
      val t = VersionedTableDataObject("vtcrash", s"$dir/t")
      t.writeDataFrame((1 to 100).toDF("k").repartition(8))                     // v0
      t.writeDataFrame((101 to 110).toDF("k").repartition(2),
        saveMode = Some(SdlSaveMode.Append))                                    // v1
      t.optimize(targetFileCount = 2)                                           // v2
      def allParquet() = {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/t"))
        try s.iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toSet
        finally s.close()
      }
      val filesBefore = allParquet()
      class Stop extends RuntimeException(stopAt)
      t.vacuumPhaseHook = p => if (p == stopAt) throw new Stop
      intercept[Stop](t.vacuum(retainVersions = 1))
      t.vacuumPhaseHook = _ => ()
      // crash window invariants: head reads the correct snapshot and NO
      // data file has been physically deleted (deletes are phase 5, after
      // every hooked boundary)
      assert(allParquet() == filesBefore, s"[$stopAt] data files deleted before log consistent")
      assert(t.getDataFrame().count() == 110, s"[$stopAt] head snapshot wrong after crash")
      assert(t.latestVersion.contains(2), s"[$stopAt] head version lost")
      // a NEW writer in the crash window commits at the right version
      t.writeDataFrame(Seq(999).toDF("k"), saveMode = Some(SdlSaveMode.Append)) // v3
      assert(t.getDataFrame().count() == 111, s"[$stopAt] append after crash broken")
      // recovery: re-running vacuum completes the rebase and reclaims the
      // superseded files (orphanRetention 0 → crash leftovers sweep too)
      t.vacuum(retainVersions = 1, orphanRetentionMillis = 0L)
      assert(t.getDataFrame().count() == 111, s"[$stopAt] snapshot wrong after recovery")
      // all 10 pre-compaction files are gone, the log replays cleanly
      assert(allParquet().size < filesBefore.size, s"[$stopAt] superseded files not reclaimed")
      assert(t.getDataFrame().where($"k" === 55).count() == 1)
    }
  }

  test("vacuum orphan sweep reclaims a crashed writer's staging leftovers, age-guarded") {
    val dir = Files.createTempDirectory("graft-vtorph").toString
    val t = VersionedTableDataObject("vtorph", s"$dir/t")
    t.writeDataFrame((1 to 20).toDF("k"))                                       // v0
    (1 to 3).foreach(i => t.writeDataFrame(Seq(100 + i).toDF("k"),
      saveMode = Some(SdlSaveMode.Append)))                                     // v1..v3
    // fake a crashed writer: a staged-but-never-committed dir below the horizon
    val orphan = java.nio.file.Paths.get(s"$dir/t/v00000001-deadbeef")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("part-00000-junk.parquet"), Array[Byte](1, 2, 3))
    // young orphan + default retention → survives the sweep
    t.vacuum(retainVersions = 2)
    assert(Files.exists(orphan.resolve("part-00000-junk.parquet")))
    // aged out → swept
    val swept = t.vacuum(retainVersions = 2, orphanRetentionMillis = 0L)
    assert(swept.exists(_.endsWith("part-00000-junk.parquet")))
    assert(!Files.exists(orphan))
    assert(t.getDataFrame().count() == 23)
  }

  test("deletePartitions recomputes its doomed set when it loses the commit race") {
    val dir = Files.createTempDirectory("graft-vtdp").toString
    val t = VersionedTableDataObject("vtdp", s"$dir/t", partitions = Seq("p"))
    t.writeDataFrame(Seq((1, "a", 10), (1, "b", 11), (2, "c", 20)).toDF("p", "k", "x"))
    // land a concurrent append INTO the doomed partition inside the race
    // window (after deletePartitions read state, before its commit)
    var fired = false
    t.deletePartitionsRaceHook = () => if (!fired) { fired = true
      t.writeDataFrame(Seq((1, "z", 12)).toDF("p", "k", "x"), saveMode = Some(SdlSaveMode.Append))
    }
    t.deletePartitions(Seq(PartitionValues("p" -> "1")))
    t.deletePartitionsRaceHook = () => ()
    // the retry saw the fresh state: the racing file is deleted too
    val left = t.getDataFrame().select("p", "k").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(left == Set((2, "c")), s"stale doomed set left partition rows: $left")
  }

  test("null partition values round-trip as NULL, prune correctly, list and delete") {
    val dir = Files.createTempDirectory("graft-vtnull").toString
    val t = VersionedTableDataObject("vtnull", s"$dir/t", partitions = Seq("p"))
    t.writeDataFrame(Seq(("eu", "a", 1), (null, "b", 2), (null, "c", 3), ("us", "d", 4))
      .toDF("p", "k", "x"))
    // string partition column reads back NULL, not the sentinel
    val rows = t.getDataFrame().select("p", "k").collect()
      .map(r => (Option(r.getString(0)), r.getString(1))).toSet
    assert(rows == Set((Some("eu"), "a"), (None, "b"), (None, "c"), (Some("us"), "d")))
    // IsNull keeps ONLY the null-partition file; IsNotNull + EqualTo prune it
    import org.apache.spark.sql.sources.{EqualTo, IsNull, IsNotNull}
    val all = t.snapshotFiles()
    val nullFiles = all.filter(_.contains("__HIVE_DEFAULT_PARTITION__"))
    assert(nullFiles.nonEmpty)
    assert(t.filesForFilters(Seq(IsNull("p"))).toSet == nullFiles.toSet)
    assert(t.filesForFilters(Seq(IsNotNull("p"))).toSet == (all.toSet -- nullFiles))
    assert(!t.filesForFilters(Seq(EqualTo("p", "eu"))).exists(nullFiles.contains))
    // predicate results match (filter on the real read path)
    assert(t.getDataFrame().where($"p".isNull).count() == 2)
    assert(t.getDataFrame().where($"p" === "eu").count() == 1)
    // listPartitions surfaces null, and a null spec deletes the null partition
    val parts = t.listPartitions.map(_.elements("p")).toSet
    assert(parts == Set("eu", "us", null))
    t.deletePartitions(Seq(PartitionValues(Map("p" -> null))))
    assert(t.getDataFrame().where($"p".isNull).count() == 0)
    assert(t.getDataFrame().count() == 2)
  }

  test("optimize retries a lost race with disjoint commits; conflicts when inputs were rewritten") {
    val dir = Files.createTempDirectory("graft-vtopt").toString
    val t = VersionedTableDataObject("vtopt", s"$dir/t", primaryKey = Seq("k"))
    t.writeDataFrame((1 to 100).map(i => (i, s"v$i")).toDF("k", "v").repartition(6)) // v0
    // disjoint concurrent APPEND lands in optimize's race window → retry wins
    var fired = false
    t.maintenanceRaceHook = () => if (!fired) { fired = true
      t.writeDataFrame(Seq((999, "z")).toDF("k", "v"), saveMode = Some(SdlSaveMode.Append))
    }
    t.optimize(targetFileCount = 2)
    t.maintenanceRaceHook = () => ()
    assert(t.getDataFrame().count() == 101)                        // append survived compaction
    assert(t.getDataFrame().where($"k" === 999).count() == 1)
    assert(t.getDataFrame().where($"k" === 50).count() == 1)
    // concurrent MERGE that rewrites a compaction input file → loud conflict
    fired = false
    t.maintenanceRaceHook = () => if (!fired) { fired = true
      t.mergeDataFrame(Seq((50, "FIFTY")).toDF("k", "v"), Seq("k"))
    }
    intercept[java.util.ConcurrentModificationException](t.optimize(targetFileCount = 1))
    t.maintenanceRaceHook = () => ()
    assert(t.getDataFrame().where($"v" === "FIFTY").count() == 1)  // the merge won; no resurrection
  }

  test("restore recomputes its diff when it loses the commit race (last-writer-wins)") {
    val dir = Files.createTempDirectory("graft-vtres").toString
    val t = VersionedTableDataObject("vtres", s"$dir/t", primaryKey = Seq("k"))
    t.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v"))                   // v0
    t.mergeDataFrame(Seq((3, "c")).toDF("k", "v"), Seq("k"))                   // v1
    var fired = false
    t.maintenanceRaceHook = () => if (!fired) { fired = true
      t.writeDataFrame(Seq((4, "d")).toDF("k", "v"), saveMode = Some(SdlSaveMode.Append)) // races in
    }
    val v = t.restore(0)
    t.maintenanceRaceHook = () => ()
    assert(v == 3)                                                              // retried at new head
    // restore is last-writer-wins: the head equals v0 EXACTLY — the racing
    // append was diffed against and removed, not leaked into the snapshot
    assert(t.getDataFrame().collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "a"), (2, "b")))
    assert(t.getDataFrameAsOf(Some(2)).where($"k" === 4).count() == 1)          // but it time-travels
  }

  test("timestamp time travel: in-commit timestamps resolve versions; rebase preserves them") {
    val dir = Files.createTempDirectory("graft-vtts").toString
    val t = VersionedTableDataObject("vtts", s"$dir/t", primaryKey = Seq("k"))
    var now = 1000L
    t.clock = () => now
    t.writeDataFrame(Seq((1, "a")).toDF("k", "v"))                               // v0 @ 1000
    now = 2000L
    t.writeDataFrame(Seq((2, "b")).toDF("k", "v"), saveMode = Some(SdlSaveMode.Append)) // v1 @ 2000
    now = 3000L
    t.mergeDataFrame(Seq((1, "A")).toDF("k", "v"), Seq("k"))                     // v2 @ 3000
    assert(t.versionAsOfTimestamp(1000L) == 0)
    assert(t.versionAsOfTimestamp(2500L) == 1)                                   // between commits → earlier
    assert(t.versionAsOfTimestamp(99999L) == 2)                                  // after head → head
    assert(t.getDataFrameAsOfTimestamp(2500L).count() == 2)
    assert(t.getDataFrameAsOfTimestamp(2500L).where($"v" === "A").count() == 0)  // pre-merge state
    intercept[IllegalArgumentException](t.versionAsOfTimestamp(500L))            // predates the log
    // vacuum's rebase carries the horizon commit's ORIGINAL timestamp
    now = 4000L
    t.vacuum(retainVersions = 2)                                                 // horizon = v1
    assert(t.versionAsOfTimestamp(2500L) == 1)                                   // still resolves @ 2000
    intercept[IllegalArgumentException](t.versionAsOfTimestamp(1500L))           // v0 rebased away
  }

  test("history(): per-commit version/timestamp/operation/deltas, newest first") {
    val dir = Files.createTempDirectory("graft-vthist").toString
    val t = VersionedTableDataObject("vthist", s"$dir/t", primaryKey = Seq("k"),
      partitions = Seq.empty)
    var now = 1000L
    t.clock = () => now
    t.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1))         // v0 WRITE
    now = 2000L
    t.writeDataFrame(Seq((3, "c")).toDF("k", "v").coalesce(1),
      saveMode = Some(SdlSaveMode.Append))                                        // v1 APPEND
    now = 3000L
    t.mergeDataFrame(Seq((2, "B")).toDF("k", "v"), Seq("k"))                      // v2 MERGE
    now = 4000L
    t.optimize(1)                                                                 // v3 OPTIMIZE
    now = 5000L
    t.restore(1)                                                                  // v4 RESTORE(1)
    val h = t.history().collect()
      .map(r => (r.getInt(0), r.getTimestamp(1).getTime, r.getString(2),
        r.getInt(3), r.getInt(4), r.getLong(5)))
    assert(h.map(_._1).toSeq == Seq(4, 3, 2, 1, 0), "newest first")
    assert(h.map(_._3).toSeq == Seq("RESTORE(1)", "OPTIMIZE", "MERGE", "APPEND", "WRITE"))
    assert(h.map(_._2).toSeq == Seq(5000L, 4000L, 3000L, 2000L, 1000L))
    val byV = h.map(x => x._1 -> x).toMap
    assert(byV(0)._6 == 2 && byV(1)._6 == 1)            // added-row counts from footer stats
    assert(byV(2)._4 == 1 && byV(2)._5 == 1)            // merge: 1 file rewritten
    assert(t.history(limit = 2).count() == 2)
  }

  test("commit timestamps are monotonic under a backward clock step") {
    val dir = Files.createTempDirectory("graft-vtmono").toString
    val t = VersionedTableDataObject("vtmono", s"$dir/t", primaryKey = Seq("k"))
    var now = 5000L
    t.clock = () => now
    t.writeDataFrame(Seq((1, "a")).toDF("k", "v"))                               // v0 @ 5000
    now = 2000L                                                                  // clock steps BACK
    t.writeDataFrame(Seq((2, "b")).toDF("k", "v"), saveMode = Some(SdlSaveMode.Append)) // v1: clamped to 5001
    // the Delta clamp (max(parent+1, now)): a timestamp between the raw
    // clocks must NOT resolve to the later version's data
    assert(t.versionAsOfTimestamp(5000L) == 0)
    assert(t.versionAsOfTimestamp(5001L) == 1)
    intercept[IllegalArgumentException](t.versionAsOfTimestamp(2000L))           // predates v0's ts
  }

  test("vacuum crash recovery preserves the horizon's exact timestamp (checkpoint carries it)") {
    val dir = Files.createTempDirectory("graft-vtrects").toString
    val t = VersionedTableDataObject("vtrects", s"$dir/t")
    var now = 1000L
    t.clock = () => now
    t.writeDataFrame(Seq(1).toDF("k"))                                           // v0 @ 1000
    now = 2000L
    t.writeDataFrame(Seq(2).toDF("k"), saveMode = Some(SdlSaveMode.Append))      // v1 @ 2000
    now = 3000L
    t.writeDataFrame(Seq(3).toDF("k"), saveMode = Some(SdlSaveMode.Append))      // v2 @ 3000
    class Stop extends RuntimeException
    t.vacuumPhaseHook = p => if (p == "old-commits-deleted") throw new Stop
    now = 9000L
    intercept[Stop](t.vacuum(retainVersions = 2))                                // horizon = v1
    t.vacuumPhaseHook = _ => ()
    t.vacuum(retainVersions = 2)                                                 // recovery completes the rebase
    assert(t.versionAsOfTimestamp(2500L) == 1, "recovered base must keep v1's original ts=2000")
    assert(t.getDataFrameAsOfTimestamp(2500L).count() == 2)
  }

  test("primary-key columns carry parquet bloom filters; other columns don't") {
    val dir = Files.createTempDirectory("graft-vtbloom").toString
    val t = VersionedTableDataObject("vtbloom", s"$dir/t", primaryKey = Seq("k"))
    t.writeDataFrame((1 to 5000).map(i => (i.toLong, s"v$i")).toDF("k", "v"))
    val file = new java.io.File(s"$dir/t").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v")).head
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    try {
      import scala.jdk.CollectionConverters._
      val block = reader.getFooter.getBlocks.get(0)
      val bfr = reader.getBloomFilterDataReader(block)
      val byName = block.getColumns.asScala.map(c => c.getPath.toDotString -> c).toMap
      assert(bfr.readBloomFilter(byName("k")) != null, "pk column missing its bloom filter")
      assert(bfr.readBloomFilter(byName("v")) == null, "non-key column should carry no bloom")
    } finally reader.close()
    // and the skipping path still answers correctly through a point filter
    assert(t.getDataFrame().where($"k" === 4321L).count() == 1)
  }

  test("streaming sink auto-compaction bounds the file count across micro-batches") {
    val dir = Files.createTempDirectory("graft-vtac").toString
    val t = VersionedTableDataObject("vtac", s"$dir/t", primaryKey = Seq("k"))
    // 4 single-file batches through the streaming sink with minFiles=3:
    // without auto-compact the snapshot would hold 4 files
    (0 until 4).foreach(i => Seq((i, s"v$i")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(s"$dir/src"))
    val sdf = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL("k INT, v STRING"))
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src")
    val q = t.writeStreamingDataFrame(sdf,
      org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      Map("graft.autoCompact.minFiles" -> "3"), s"$dir/cp", "vtac_stream")
    q.awaitTermination()
    assert(t.getDataFrame().count() == 4)                                   // data intact
    assert(t.snapshotFiles().size < 4,
      s"auto-compact never fired: ${t.snapshotFiles().size} live files")
    // compaction commits interleave with the batch commits in the log
    assert(t.latestVersion.exists(_ >= 4))
  }

  test("optimizeBySize sizes the compaction from logged byte stats") {
    val dir = Files.createTempDirectory("graft-vtobs").toString
    val t = VersionedTableDataObject("vtobs", s"$dir/t")
    t.writeDataFrame((1 to 20000).map(i => (i, s"value_$i" * 8)).toDF("k", "v").repartition(16))
    val totalBytes = t.liveFileStats().values.map(_.bytes).sum
    assert(totalBytes > 0)
    val target = totalBytes / 3                                                  // expect ~3-4 files
    val n = t.optimizeBySize(targetFileBytes = target)
    assert(n >= 3 && n <= 4, s"expected ~ceil(bytes/target) files, got $n")
    assert(t.getDataFrame().count() == 20000)
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

  test("merge emulation preserves NULL-keyed rows (null-safe join, marker-based presence)") {
    // the join matches keys with <=>, so NULL keys are legitimate values:
    // a NULL-keyed existing row must not vanish, and a NULL-keyed feed row
    // must match it (update), not be dropped
    val existing = Seq((Some(1), "a"), (Option.empty[Int], "oldnull"))
      .toDF("k", "v")
    val feed = Seq((Some(1), "A"), (Option.empty[Int], "newnull"), (Some(2), "b"))
      .toDF("k", "v")
    val merged = MergeEmulation.computeMergedState(existing, feed, Seq("k"))
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Int]), r.getString(1))).toSet
    assert(merged == Set((Some(1), "A"), (None, "newnull"), (Some(2), "b")))
    // and an existing NULL-keyed row untouched by the feed stays
    val merged2 = MergeEmulation.computeMergedState(existing,
        Seq((Some(1), "A2")).toDF("k", "v"), Seq("k"))
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Int]), r.getString(1))).toSet
    assert(merged2 == Set((Some(1), "A2"), (None, "oldnull")))
  }

  test("detail(): one-row summary off the log — files/bytes/rows/flags, zero data I/O") {
    val dir = Files.createTempDirectory("graft-vt-detail").toString
    val t = VersionedTableDataObject("vtd", s"$dir/t", primaryKey = Seq("k"),
      partitions = Seq("p"))
    t.writeDataFrame(Seq((1, "a", "x"), (2, "b", "y")).toDF("k", "v", "p"))
    t.writeDataFrame(Seq((3, "c", "x")).toDF("k", "v", "p"),
      saveMode = Some(SdlSaveMode.Append))
    val d = t.detail().collect()
    assert(d.length == 1)
    val r = d.head
    assert(r.getAs[String]("id") == "vtd")
    assert(r.getAs[Int]("version") == t.latestVersion.get)
    assert(r.getSeq[String](r.fieldIndex("partition_columns")) == Seq("p"))
    assert(r.getAs[Long]("num_rows") == 3L)
    val nf = r.getAs[Long]("num_files")
    assert(nf >= 2L) // one file per touched partition dir, at least
    // size matches the actual bytes on disk of the LIVE files (stats truth)
    val live = t.snapshotFiles().map(f =>
      java.nio.file.Paths.get(s"$dir/t", f.split("/"): _*).toFile.length).sum
    assert(r.getAs[Long]("size_in_bytes") == live && live > 0)
    assert(!r.getAs[Boolean]("deletion_vectors") && !r.getAs[Boolean]("column_mapping"))
    // detail is a metadata read: version/timestamp track the head commit
    assert(Option(r.getAs[java.sql.Timestamp]("last_modified")).nonEmpty)
  }
}
