package graft

import graft.core._
import graft.sources._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Idempotent writes on the versioned table — the public Delta
  * txnAppId/txnVersion (SetTransaction) design: a write carrying a
  * transaction mark at or below the table's recorded mark for that appId
  * is a no-op, so replayed micro-batches and re-run jobs land exactly
  * once. */
class IdempotentWriteSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  implicit lazy val ctx: ActionPipelineContext =
    ActionPipelineContext(spark, new InstanceRegistry)
  import spark.implicits._

  test("same (appId, txnVersion) twice: second write is a no-op; higher version lands") {
    val dir = Files.createTempDirectory("graft-txn").toString
    val t = VersionedTableDataObject("txn1", s"$dir/t", primaryKey = Seq("k"))
    val m1 = t.writeDataFrameIdempotent(Seq((1, "a")).toDF("k", "v"), "app", 0L)
    assert(m1.recordsWritten == 1 && t.lastTxnVersion("app").contains(0L))
    val v1 = t.latestVersion.get
    // exact replay: skipped, no commit, no rows
    val m2 = t.writeDataFrameIdempotent(Seq((1, "a")).toDF("k", "v"), "app", 0L,
      saveMode = Some(SdlSaveMode.Append))
    assert(m2.recordsWritten == 0 && t.latestVersion.get == v1)
    assert(t.getDataFrame().count() == 1)
    // a DIFFERENT app is independent
    val m3 = t.writeDataFrameIdempotent(Seq((2, "b")).toDF("k", "v"), "app2", 0L,
      saveMode = Some(SdlSaveMode.Append))
    assert(m3.recordsWritten == 1 && t.getDataFrame().count() == 2)
    // and the next version for the first app lands
    val m4 = t.writeDataFrameIdempotent(Seq((3, "c")).toDF("k", "v"), "app", 1L,
      saveMode = Some(SdlSaveMode.Append))
    assert(m4.recordsWritten == 1 && t.lastTxnVersion("app").contains(1L))
    assert(t.getDataFrame().count() == 3)
  }

  test("idempotent merge: replayed merge does not re-apply") {
    val dir = Files.createTempDirectory("graft-txn2").toString
    val t = VersionedTableDataObject("txn2", s"$dir/t", primaryKey = Seq("k"))
    t.mergeDataFrameIdempotent(Seq((1, 10), (2, 20)).toDF("k", "n"), Seq("k"), "st", 0L)
    t.mergeDataFrameIdempotent(Seq((2, 21), (3, 30)).toDF("k", "n"), Seq("k"), "st", 1L)
    val v = t.latestVersion.get
    // replay of batch 1: skipped entirely
    val m = t.mergeDataFrameIdempotent(Seq((2, 99), (3, 99)).toDF("k", "n"), Seq("k"), "st", 1L)
    assert(m.recordsWritten == 0 && t.latestVersion.get == v)
    assert(t.getDataFrame().select("k", "n").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      == Set((1, 10), (2, 21), (3, 30)))
  }

  test("idempotent merge on a deletionVectors table: replay skipped, txn mark advances") {
    // r12 high ADVICE: mergeViaDv/dvCommitLoop never recorded txnSet, so
    // lastTxnVersion never advanced and every foreachBatch replay
    // re-applied the merge (duplicate CDC rows, re-applied clauses)
    val dir = Files.createTempDirectory("graft-txn-dv").toString
    val t = VersionedTableDataObject("txndv", s"$dir/t", primaryKey = Seq("k"),
      deletionVectors = true, changeDataFeed = true)
    t.mergeDataFrameIdempotent(Seq((1, 10), (2, 20)).toDF("k", "n"), Seq("k"), "st", 0L)
    assert(t.lastTxnVersion("st").contains(0L),
      "the DV-merge commit must record the transaction mark")
    t.mergeDataFrameIdempotent(Seq((2, 21), (3, 30)).toDF("k", "n"), Seq("k"), "st", 1L)
    assert(t.lastTxnVersion("st").contains(1L))
    val v = t.latestVersion.get
    // replay of batch 1: skipped entirely — no commit, no new CDC rows
    val m = t.mergeDataFrameIdempotent(Seq((2, 99), (3, 99)).toDF("k", "n"), Seq("k"), "st", 1L)
    assert(m.recordsWritten == 0 && t.latestVersion.get == v)
    assert(t.getDataFrame().select("k", "n").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      == Set((1, 10), (2, 21), (3, 30)))
    // CDC carries each change exactly once (no replay duplicates)
    val cdc = t.changesBetween(0, Some(v))
    assert(cdc.where(col("k") === 2 && col("_change_type") === "update_postimage").count() == 1,
      "a replayed DV merge must not re-emit CDC rows")
  }

  test("racing retry of the same DV-merge transaction applies exactly once") {
    val dir = Files.createTempDirectory("graft-txn-dv2").toString
    val t = VersionedTableDataObject("txndv2", s"$dir/t", primaryKey = Seq("k"),
      deletionVectors = true)
    t.writeDataFrame(Seq((1, 0), (2, 0)).toDF("k", "n"))
    val seedV = t.latestVersion.get
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 4).map(_ => Future {
      t.mergeDataFrameIdempotent(Seq((1, 7)).toDF("k", "n"), Seq("k"), "race", 3L)
        .recordsWritten
    })
    val written = Await.result(Future.sequence(fs), 120.seconds)
    assert(written.count(_ > 0) <= 1, s"at most one racer may land: $written")
    assert(t.latestVersion.get == seedV + 1,
      "exactly ONE merge commit may land — losers must skip, not re-commit")
    assert(t.lastTxnVersion("race").contains(3L))
    assert(t.getDataFrame().select("k", "n").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      == Set((1, 7), (2, 0)))
  }

  test("txn marks survive checkpoint replay and the vacuum rebase") {
    val dir = Files.createTempDirectory("graft-txn3").toString
    val t = VersionedTableDataObject("txn3", s"$dir/t", primaryKey = Seq("k"),
      checkpointInterval = 2)
    (0 to 4).foreach(i => t.writeDataFrameIdempotent(Seq((i, s"v$i")).toDF("k", "v"),
      "app", i.toLong, saveMode = if (i == 0) None else Some(SdlSaveMode.Append)))
    assert(t.lastTxnVersion("app").contains(4L))
    t.vacuum(retainVersions = 2)
    assert(t.lastTxnVersion("app").contains(4L), "vacuum rebase carries the txn ledger")
    // a replay of an old batch after vacuum still skips
    val m = t.writeDataFrameIdempotent(Seq((9, "dup")).toDF("k", "v"), "app", 2L,
      saveMode = Some(SdlSaveMode.Append))
    assert(m.recordsWritten == 0 && t.getDataFrame().count() == 5)
  }

  test("racing retry of the same transaction commits exactly once") {
    val dir = Files.createTempDirectory("graft-txn4").toString
    val t = VersionedTableDataObject("txn4", s"$dir/t", primaryKey = Seq("k"))
    t.writeDataFrame(Seq((0, "seed")).toDF("k", "v"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 4).map(i => Future {
      t.writeDataFrameIdempotent(Seq((i * 100, "x")).toDF("k", "v"), "race", 7L,
        saveMode = Some(SdlSaveMode.Append)).recordsWritten
    })
    val written = Await.result(Future.sequence(fs), 120.seconds)
    assert(written.count(_ > 0) == 1, s"exactly one racer may land: $written")
    assert(t.getDataFrame().count() == 2)
    assert(t.lastTxnVersion("race").contains(7L))
  }

  test("streaming sink with graft.txnAppId: a replayed foreachBatch lands exactly once") {
    val dir = Files.createTempDirectory("graft-txn5").toString
    val t = VersionedTableDataObject("txn5", s"$dir/t", primaryKey = Seq("id"))
    val srcSchema = org.apache.spark.sql.types.StructType.fromDDL("id LONG, v STRING")
    new java.io.File(s"$dir/src").mkdirs()
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1).write.json(s"$dir/src/f1")
    def runStream(cp: String): Unit = {
      val q = t.writeStreamingDataFrame(
        spark.readStream.schema(srcSchema).json(s"$dir/src/*"),
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        Map("graft.txnAppId" -> "stream5"), cp, "txn5q")
      q.awaitTermination() // AvailableNow self-terminates and unregisters
      ()
    }
    runStream(s"$dir/cp")
    assert(t.getDataFrame().count() == 2)
    val txnAfter = t.lastTxnVersion("stream5")
    assert(txnAfter.contains(0L))
    // simulate the replay window: the sink committed batch 0 but the
    // stream checkpoint's commit marker was lost (e.g. checkpoint restored
    // from a backup taken mid-batch) — Spark re-runs batch 0. A FRESH
    // checkpoint path sidesteps Spark 4's per-session metadata-log cache,
    // which (correctly) flags in-place external edits as concurrent use.
    import java.nio.file.{Files => JFiles, Path => JPath}
    import scala.jdk.CollectionConverters._
    val from = JPath.of(s"$dir/cp"); val to = JPath.of(s"$dir/cp2")
    JFiles.walk(from).iterator().asScala.foreach { p =>
      val rel = from.relativize(p)
      // drop the lost commit marker AND every Hadoop .crc sidecar (a stale
      // crc for a missing file fails the local-FS rename on rewrite)
      if (rel.toString != s"commits${java.io.File.separator}0" &&
          !p.getFileName.toString.endsWith(".crc")) {
        val dst = to.resolve(rel)
        if (JFiles.isDirectory(p)) JFiles.createDirectories(dst)
        else { JFiles.createDirectories(dst.getParent); JFiles.copy(p, dst) }
      }
    }
    runStream(s"$dir/cp2")
    assert(t.getDataFrame().count() == 2,
      "replayed batch 0 must be skipped by its transaction mark")
    assert(t.lastTxnVersion("stream5").contains(0L))
  }
}
