package graft

import graft.core._
import graft.sources._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Row-level DELETE / UPDATE on the versioned table — copy-on-write and
  * deletion-vector (merge-on-read) modes, including CDC, time travel,
  * restore, optimize, materialization and vacuum interplay. */
class DeletionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  implicit lazy val ctx: ActionPipelineContext =
    ActionPipelineContext(spark, new InstanceRegistry)
  import spark.implicits._

  private def dataFileState(dir: String): Map[String, Long] = {
    val buf = scala.collection.mutable.Map.empty[String, Long]
    def walk(f: java.io.File): Unit =
      if (f.isDirectory && !f.getName.startsWith("_")) f.listFiles.foreach(walk)
      else if (f.getName.endsWith(".parquet")) buf += f.getAbsolutePath -> f.lastModified
    walk(new java.io.File(dir))
    buf.toMap
  }

  private def kv(df: org.apache.spark.sql.DataFrame): Set[(Int, String)] =
    df.select("k", "v").collect().map(r => (r.getInt(0), r.getString(1))).toSet

  test("copy-on-write DELETE rewrites only touched files; time travel keeps the pre-image") {
    val dir = Files.createTempDirectory("graft-del").toString
    val t = VersionedTableDataObject("d1", s"$dir/t", primaryKey = Seq("k"))
    // two appends → at least two data files with disjoint key ranges
    t.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v"))                      // v0
    t.writeDataFrame(Seq((100, "x"), (101, "y")).toDF("k", "v"),
      saveMode = Some(SdlSaveMode.Append))                                        // v1
    val before = dataFileState(s"$dir/t")
    val deleted = t.deleteWhere("k = 100")                                        // v2
    assert(deleted == 1L)
    assert(kv(t.getDataFrame()) == Set((1, "a"), (2, "b"), (101, "y")))
    // the v0 file was untouched: still on disk, same mtime
    val after = dataFileState(s"$dir/t")
    val untouched = before.filter { case (p, m) => after.get(p).contains(m) }
    assert(untouched.nonEmpty, "at least the non-matching file must be carried by reference")
    // only ONE file was removed by the commit (stats-pruned + exact touched)
    assert(t.getDataFrameAsOf(Some(1)).count() == 4)                              // pre-image intact
    val hist = t.history(1).collect().head
    assert(hist.getAs[String]("operation") == "DELETE")
    assert(hist.getAs[Int]("num_removed_files") == 1)
  }

  test("DELETE keeps rows where the predicate evaluates to NULL") {
    val dir = Files.createTempDirectory("graft-del").toString
    val t = VersionedTableDataObject("d2", s"$dir/t")
    Seq((1, Some("a")), (2, Option.empty[String]), (3, Some("z")))
      .toDF("k", "v").write.format("noop").mode("overwrite").save() // force schema inference warm-up
    t.writeDataFrame(Seq((1, Some("a")), (2, Option.empty[String]), (3, Some("z"))).toDF("k", "v"))
    val n = t.deleteWhere("v = 'z'")
    assert(n == 1L)
    // k=2 (v NULL → predicate NULL) survives
    assert(t.getDataFrame().select("k").as[Int].collect().toSet == Set(1, 2))
  }

  test("copy-on-write UPDATE: assignments see pre-update values; CDC emits update pairs") {
    val dir = Files.createTempDirectory("graft-upd").toString
    val t = VersionedTableDataObject("u1", s"$dir/t", primaryKey = Seq("k"), changeDataFeed = true)
    t.writeDataFrame(Seq((1, 10, 20), (2, 3, 4)).toDF("k", "a", "b"))             // v0
    // swap a and b for k=1 — both RHS must read the PRE-image
    t.updateWhere(Map("a" -> "b", "b" -> "a"), "k = 1")                           // v1
    val got = t.getDataFrame().select("k", "a", "b").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == Set((1, 20, 10), (2, 3, 4)))
    val changes = t.changesBetween(0, Some(1))
      .select("k", "a", "_change_type").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(changes == Set((1, 10, "update_preimage"), (1, 20, "update_postimage")))
  }

  test("UPDATE rejects unknown assignment columns at the API") {
    val dir = Files.createTempDirectory("graft-upd").toString
    val t = VersionedTableDataObject("u2", s"$dir/t")
    t.writeDataFrame(Seq((1, "a")).toDF("k", "v"))
    val e = intercept[IllegalArgumentException](t.updateWhere(Map("nope" -> "1"), "k = 1"))
    assert(e.getMessage.contains("unknown columns"))
  }

  test("deletion-vector DELETE: zero data-file writes, reads exclude, time travel restores") {
    val dir = Files.createTempDirectory("graft-dv").toString
    val t = VersionedTableDataObject("dv1", s"$dir/t", primaryKey = Seq("k"),
      deletionVectors = true)
    t.writeDataFrame((1 to 10).map(i => (i, s"v$i")).toDF("k", "v"))              // v0
    val before = dataFileState(s"$dir/t")
    val deleted = t.deleteWhere("k <= 3")                                         // v1 (DV)
    assert(deleted == 3L)
    // NOT A SINGLE data file changed — merge-on-read
    assert(dataFileState(s"$dir/t") == before)
    assert(t.latestVersion.contains(1))
    assert(t.getDataFrame().select("k").as[Int].collect().toSet == (4 to 10).toSet)
    // pre-delete snapshot still reads the full table
    assert(t.getDataFrameAsOf(Some(0)).count() == 10)
    // the state carries the DV dir (writer-unique, version-prefixed)
    val dv = t.readState(None).get.dv
    assert(dv.size == 1 && dv.head.startsWith("v00000001-"))
  }

  test("second DV delete tombstones only newly-matching rows") {
    val dir = Files.createTempDirectory("graft-dv").toString
    val t = VersionedTableDataObject("dv2", s"$dir/t", deletionVectors = true)
    t.writeDataFrame((1 to 6).map(i => (i, i % 2)).toDF("k", "par"))              // v0
    assert(t.deleteWhere("par = 0") == 3L)                                        // v1: 2,4,6
    // overlapping predicate: only k=1 is newly matched (2 is already dead)
    assert(t.deleteWhere("k <= 2") == 1L)                                         // v2: 1
    assert(t.getDataFrame().select("k").as[Int].collect().toSet == Set(3, 5))
    val dv = t.readState(None).get.dv
    assert(dv.size == 2 && dv(0).startsWith("v00000001-") && dv(1).startsWith("v00000002-"))
  }

  test("DV delete feeds CDC and the change feed; restore reverts tombstones as inserts") {
    val dir = Files.createTempDirectory("graft-dv").toString
    val t = VersionedTableDataObject("dv3", s"$dir/t", primaryKey = Seq("k"),
      changeDataFeed = true, deletionVectors = true)
    t.writeDataFrame(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))            // v0
    t.deleteWhere("k = 2")                                                        // v1 (DV)
    val del = t.changesBetween(0, Some(1)).select("k", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(del == Set((2, "delete")))
    val v2 = t.restore(0)                                                         // v2: DV set reverts
    assert(t.readState(None).get.dv.isEmpty)
    assert(kv(t.getDataFrame()) == Set((1, "a"), (2, "b"), (3, "c")))
    val back = t.changesBetween(1, Some(v2)).select("k", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(back == Set((2, "insert")))
  }

  test("MERGE through a DV'd table does not resurrect tombstoned rows") {
    val dir = Files.createTempDirectory("graft-dv").toString
    val t = VersionedTableDataObject("dv4", s"$dir/t", primaryKey = Seq("k"),
      deletionVectors = true)
    t.writeDataFrame(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))            // v0
    t.deleteWhere("k = 2")                                                        // v1
    // merge touches the file holding k=1..3; the rewrite must NOT bring
    // back the tombstoned k=2
    t.mergeDataFrame(Seq((1, "A"), (4, "d")).toDF("k", "v"), Seq("k"))            // v2
    assert(kv(t.getDataFrame()) == Set((1, "A"), (3, "c"), (4, "d")))
  }

  test("OPTIMIZE compacts through DVs; materialization clears the set without changing content") {
    val dir = Files.createTempDirectory("graft-dv").toString
    val t = VersionedTableDataObject("dv5", s"$dir/t", deletionVectors = true)
    t.writeDataFrame((1 to 8).map(i => (i, s"v$i")).toDF("k", "v"))               // v0
    t.writeDataFrame((9 to 12).map(i => (i, s"v$i")).toDF("k", "v"),
      saveMode = Some(SdlSaveMode.Append))                                        // v1
    t.deleteWhere("k % 3 = 0")                                                    // v2: 3,6,9,12
    val expect = (1 to 12).filter(_ % 3 != 0).toSet
    assert(t.getDataFrame().select("k").as[Int].collect().toSet == expect)
    val rewritten = t.materializeDeletionVectors()                                // v3
    assert(rewritten >= 1)
    assert(t.readState(None).get.dv.isEmpty)
    assert(t.getDataFrame().select("k").as[Int].collect().toSet == expect)
    // a second materialization is a no-op
    assert(t.materializeDeletionVectors() == 0)
  }

  test("VACUUM defers DVs (retained refs survive); materialization + re-vacuum sweeps them") {
    val dir = Files.createTempDirectory("graft-dv").toString
    val t = VersionedTableDataObject("dv6", s"$dir/t", deletionVectors = true)
    t.writeDataFrame((1 to 6).map(i => (i, s"v$i")).toDF("k", "v"))               // v0
    t.deleteWhere("k = 1")                                                        // v1 (DV)
    t.writeDataFrame(Seq((7, "v7")).toDF("k", "v"),
      saveMode = Some(SdlSaveMode.Append))                                        // v2
    t.vacuum(retainVersions = 1, orphanRetentionMillis = 0)
    // vacuum DEFERS the rewrite (Delta semantics): the head still reads
    // through its DV, whose dir survives because the retained snapshot
    // references it
    assert(t.readState(None).get.dv.size == 1)
    assert(t.getDataFrame().select("k").as[Int].collect().toSet == (2 to 7).toSet)
    val dvRoot = new java.io.File(s"$dir/t/_graft_dv")
    assert(dvRoot.exists && dvRoot.listFiles.nonEmpty)
    // explicit purge + another vacuum: now nothing references the dir
    assert(t.materializeDeletionVectors() == 1)
    t.vacuum(retainVersions = 1, orphanRetentionMillis = 0)
    assert(t.readState(None).get.dv.isEmpty)
    assert(t.getDataFrame().select("k").as[Int].collect().toSet == (2 to 7).toSet)
    assert(!dvRoot.exists || dvRoot.listFiles.isEmpty)
  }

  test("DELETE and DV delete handle partition values that URL-encode in scan URIs") {
    // partition value 'a b' scans as 'p=a%20b' via input_file_name(), but
    // the log stores the decoded name — the touched-set match must decode
    val dir = Files.createTempDirectory("graft-enc").toString
    val t = VersionedTableDataObject("enc1", s"$dir/t", partitions = Seq("p"))
    t.writeDataFrame(Seq((1, "a b"), (2, "a b"), (3, "plain")).toDF("k", "p"))
    assert(t.deleteWhere("k = 1") == 1L)                            // CoW in encoded partition
    assert(t.getDataFrame().select("k").as[Int].collect().toSet == Set(2, 3))

    val t2 = VersionedTableDataObject("enc2", s"$dir/t2", partitions = Seq("p"),
      deletionVectors = true)
    t2.writeDataFrame(Seq((1, "a b"), (2, "a b"), (3, "plain")).toDF("k", "p"))
    assert(t2.deleteWhere("k = 2") == 1L)                           // DV in encoded partition
    assert(t2.getDataFrame().select("k").as[Int].collect().toSet == Set(1, 3))
    // materialization must find the encoded-partition file as a target
    assert(t2.materializeDeletionVectors() == 1)
    assert(t2.getDataFrame().select("k").as[Int].collect().toSet == Set(1, 3))
  }

  test("CHECK constraints + expectations gate versioned-table writes, merges and updates") {
    import graft.quality._
    val dir = Files.createTempDirectory("graft-cc").toString
    val t = VersionedTableDataObject("cc1", s"$dir/t", primaryKey = Seq("k"),
      constraints = Seq(Constraint("positive", "v > 0", Seq("k"))),
      expectations = Seq(SQLExpectation("row_cnt", "count(*)", Some("value >= 1"),
        failOnError = true)))
    val m = t.writeDataFrame(Seq((1, 10), (2, 20)).toDF("k", "v"))
    assert(m.observedMetrics("row_cnt") == 2L)
    // write violating the constraint aborts before any commit
    val headBefore = t.latestVersion
    intercept[Exception](t.writeDataFrame(Seq((3, -1)).toDF("k", "v"),
      saveMode = Some(SdlSaveMode.Append)))
    assert(t.latestVersion == headBefore)
    // merge feed violating the constraint aborts too
    intercept[Exception](t.mergeDataFrame(Seq((1, -9)).toDF("k", "v"), Seq("k")))
    assert(kv2(t.getDataFrame()) == Set((1, 10), (2, 20)))
    // update moving a row out of the constraint aborts; a legal one lands
    intercept[Exception](t.updateWhere(Map("v" -> "-v"), "k = 1"))
    t.updateWhere(Map("v" -> "v + 1"), "k = 1")
    assert(kv2(t.getDataFrame()) == Set((1, 11), (2, 20)))
  }

  private def kv2(df: org.apache.spark.sql.DataFrame): Set[(Int, Int)] =
    df.select("k", "v").collect().map(r => (r.getInt(0), r.getInt(1))).toSet

  test("concurrent dvSet-bearing commits are MERGE conflicts (stale DV view must not commit)") {
    val dir = Files.createTempDirectory("graft-dvc").toString
    val t = VersionedTableDataObject("dvc", s"$dir/t", primaryKey = Seq("k"))
    t.writeDataFrame(Seq((1, "a")).toDF("k", "v"))
    val schema = t.readState(None).get.schema.get
    // a DELETE_DV that landed concurrently: no files touched, but row
    // liveness changed — a merge retry from the old view must conflict
    val dvCommit = t.Commit(1, Seq.empty, Seq.empty, None,
      op = "DELETE_DV", dvSet = Some(Seq("v00000001-deadbeef")))
    assert(t.mergeConflicts(Seq(dvCommit), touched = Seq.empty,
      joinCols = Seq("k"), bounds = Map.empty, schema = schema, feedHasNullKeys = false))
    // a plain disjoint append is NOT a conflict
    val appendCommit = t.Commit(1, Seq("v00000001-aa/f.parquet"), Seq.empty, None,
      stats = Map("v00000001-aa/f.parquet" ->
        t.FileStat(1, Map("k" -> "999"), Map("k" -> "999"), Map("k" -> 0L))),
      op = "APPEND")
    assert(!t.mergeConflicts(Seq(appendCommit), touched = Seq.empty,
      joinCols = Seq("k"), bounds = Map("k" -> ("1", "5")), schema = schema,
      feedHasNullKeys = false))
  }

  test("merge-on-read MERGE: tombstone + append, zero rewrites, full clause semantics + CDC") {
    val dir = Files.createTempDirectory("graft-dvm").toString
    val t = VersionedTableDataObject("dvm", s"$dir/t", primaryKey = Seq("k"),
      changeDataFeed = true, deletionVectors = true)
    t.writeDataFrame(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))            // v0
    val before = dataFileState(s"$dir/t")
    // update k=1, delete k=2 (condition clause), insert k=4; k=3 untouched
    t.mergeDataFrame(
      Seq((1, "A"), (2, "__DEL__"), (4, "d")).toDF("k", "v"), Seq("k"),
      SaveModeMergeOptions(deleteCondition = Some("new.v = '__DEL__'")))          // v1 (DV)
    // no data file was rewritten or removed — tombstones + appends only
    assert(before.forall { case (p, m) => dataFileState(s"$dir/t").get(p).contains(m) })
    val c = t.history(1).collect().head
    assert(c.getAs[String]("operation") == "MERGE_DV")
    assert(c.getAs[Int]("num_removed_files") == 0)
    assert(kv(t.getDataFrame()) == Set((1, "A"), (3, "c"), (4, "d")))
    assert(kv(t.getDataFrameAsOf(Some(0))) == Set((1, "a"), (2, "b"), (3, "c")))
    val ch = t.changesBetween(0, Some(1)).select("k", "v", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(ch == Set(
      (1, "a", "update_preimage"), (1, "A", "update_postimage"),
      (2, "b", "delete"), (4, "d", "insert")))
  }

  test("merge-on-read UPDATE: tombstone + append, zero rewrites, CDC update pairs") {
    val dir = Files.createTempDirectory("graft-dvu").toString
    val t = VersionedTableDataObject("dvu", s"$dir/t", primaryKey = Seq("k"),
      changeDataFeed = true, deletionVectors = true)
    t.writeDataFrame(Seq((1, 10), (2, 20), (3, 30)).toDF("k", "v"))               // v0
    val before = dataFileState(s"$dir/t")
    val n = t.updateWhere(Map("v" -> "v + 1"), "k <= 2")                          // v1 (DV)
    assert(n == 2L)
    // original data files untouched; the commit only ADDED the rewrite
    assert(before.forall { case (p, m) => dataFileState(s"$dir/t").get(p).contains(m) })
    val c = t.history(1).collect().head
    assert(c.getAs[String]("operation") == "UPDATE_DV")
    assert(c.getAs[Int]("num_removed_files") == 0)
    val got = t.getDataFrame().select("k", "v").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == Set((1, 11), (2, 21), (3, 30)))
    // pre-update snapshot intact
    assert(t.getDataFrameAsOf(Some(0)).select("v").as[Int].collect().toSet == Set(10, 20, 30))
    // CDC classifies the DV update as pre/post image pairs
    val ch = t.changesBetween(0, Some(1)).select("k", "v", "_change_type").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(ch == Set((1, 10, "update_preimage"), (1, 11, "update_postimage"),
      (2, 20, "update_preimage"), (2, 21, "update_postimage")))
  }

  test("NULL-evaluating merge clause conditions: DV merge matches copy-on-write (row updated, not lost)") {
    // deleteCondition "new.v = '__DEL__'" evaluates NULL for a feed row
    // with v = NULL: the when-chain treats that as not-fired, so the row
    // must be UPDATED (to NULL) by the default update clause — on BOTH
    // merge paths. Pre-fix the MoR path tombstoned it (NULL or true) while
    // suppressing the append (NULL and …) — silent row loss.
    val dir = Files.createTempDirectory("graft-dvnull").toString
    def run(dv: Boolean, sub: String): Set[(Int, String)] = {
      val t = VersionedTableDataObject(s"nul$sub", s"$dir/$sub", primaryKey = Seq("k"),
        deletionVectors = dv)
      t.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v"))
      t.mergeDataFrame(
        Seq((1, null.asInstanceOf[String]), (2, "__DEL__")).toDF("k", "v"), Seq("k"),
        SaveModeMergeOptions(deleteCondition = Some("new.v = '__DEL__'")))
      kv(t.getDataFrame())
    }
    val cow = run(dv = false, "cow")
    val mor = run(dv = true, "mor")
    assert(cow == Set((1, null)), s"copy-on-write: $cow")
    assert(mor == cow, s"DV merge diverged from copy-on-write: $mor vs $cow")
  }

  test("merge-on-read DML retries through a non-conflicting concurrent append") {
    val dir = Files.createTempDirectory("graft-dvrace").toString
    val t = VersionedTableDataObject("dvr", s"$dir/t", primaryKey = Seq("k"),
      deletionVectors = true)
    val other = VersionedTableDataObject("dvr2", s"$dir/t", primaryKey = Seq("k"))
    t.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v"))                      // v0
    // a disjoint-key append lands in the race window → the delete loses
    // its first commit, validates (APPEND with stats, keys disjoint from
    // the touched file's rows), and retries at the new head
    t.dmlRaceHook = () => {
      t.dmlRaceHook = () => ()
      other.writeDataFrame(Seq((100, "x")).toDF("k", "v"),
        saveMode = Some(SdlSaveMode.Append))
    }
    val n = t.deleteWhere("k = 2")
    assert(n == 1L)
    assert(kv(t.getDataFrame()) == Set((1, "a"), (100, "x")))
    val ops = t.history().collect().map(_.getAs[String]("operation")).toSeq
    assert(ops.contains("DELETE_DV") && ops.contains("APPEND"))
  }

  test("merge-on-read MERGE conflicts loudly when a concurrent append overlaps its keys") {
    val dir = Files.createTempDirectory("graft-dvconf").toString
    val t = VersionedTableDataObject("dvc2", s"$dir/t", primaryKey = Seq("k"),
      deletionVectors = true)
    val other = VersionedTableDataObject("dvc2b", s"$dir/t", primaryKey = Seq("k"))
    t.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    // the concurrent append's key range CONTAINS the merge feed's key →
    // the merge could have missed a row it should have matched: conflict,
    // and the staged dv dir is cleaned up
    t.dmlRaceHook = () => {
      t.dmlRaceHook = () => ()
      other.writeDataFrame(Seq((1, "raced")).toDF("k", "v"),
        saveMode = Some(SdlSaveMode.Append))
    }
    intercept[java.util.ConcurrentModificationException] {
      t.mergeDataFrame(Seq((1, "A")).toDF("k", "v"), Seq("k"))
    }
    val dvDir = new java.io.File(s"$dir/t/_graft_dv")
    assert(!dvDir.exists || dvDir.listFiles.isEmpty, "lost merge must clean its staged dv dir")
  }

  test("copy-on-write MERGE retry never regresses a concurrent append's schema evolution") {
    val dir = Files.createTempDirectory("graft-mschema").toString
    val t = VersionedTableDataObject("ms", s"$dir/t", primaryKey = Seq("k"))
    val other = VersionedTableDataObject("ms2", s"$dir/t", primaryKey = Seq("k"))
    t.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v"))                      // v0
    // concurrent append with DISJOINT keys and a NEW column `extra` lands
    // in the race window: the merge retry must commit the UNION schema,
    // not its pre-race DDL (which would drop `extra` from every later read)
    t.dmlRaceHook = () => {
      t.dmlRaceHook = () => ()
      other.writeDataFrame(Seq((100, "x", "e1")).toDF("k", "v", "extra"),
        saveMode = Some(SdlSaveMode.Append))
    }
    t.mergeDataFrame(Seq((1, "A")).toDF("k", "v"), Seq("k"))
    val cols = t.getDataFrame().columns.toSet
    assert(cols == Set("k", "v", "extra"), s"evolved column lost: $cols")
    val got = t.getDataFrame().select("k", "v", "extra").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1, "A", null), (2, "b", null), (100, "x", "e1")))
  }

  test("DV read paths agree: broadcast scan-predicate vs shuffle anti-join") {
    val dir = Files.createTempDirectory("graft-dvp").toString
    val t = VersionedTableDataObject("dvp", s"$dir/t", deletionVectors = true)
    t.writeDataFrame((1 to 50).map(i => (i, s"v$i")).toDF("k", "v"))
    t.deleteWhere("k % 5 = 0")
    val expect = (1 to 50).filterNot(_ % 5 == 0).toSet
    // default threshold: tiny tombstone set → broadcast predicate path —
    // the exclusion is a scan-side FILTER, no join operator in the plan
    val df = t.getDataFrame()
    assert(df.select("k").as[Int].collect().toSet == expect)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"broadcast DV path must not add a join:\n$plan")
    assert(plan.contains("dv_tombstoned") || plan.contains("DvTombstoned"))
    // force the ABOVE-THRESHOLD path on a FRESH instance (threshold is
    // read at construction): with sidecars staged (every dv write stages
    // them) the read takes the per-file sidecar SCAN predicate — still no
    // join at any tombstone volume (the r12 cliff fix)
    System.setProperty("graft.dv.broadcastMaxBytes", "0")
    try {
      val t2 = VersionedTableDataObject("dvp2", s"$dir/t", deletionVectors = true)
      val df2 = t2.getDataFrame()
      assert(df2.select("k").as[Int].collect().toSet == expect)
      val plan2 = df2.queryExecution.executedPlan.toString
      assert(!plan2.contains("Join"),
        s"sidecar DV path must not add a join:\n$plan2")
      assert(plan2.contains("dv_tombstoned_scan"), s"expected sidecar predicate:\n$plan2")
      // a SECOND delete layers a second dv version over the same file —
      // the sidecar path must merge positions across versions
      t2.deleteWhere("k % 7 = 0")
      val expect2 = (1 to 50).filterNot(k => k % 5 == 0 || k % 7 == 0).toSet
      assert(t2.getDataFrame().select("k").as[Int].collect().toSet == expect2)
      // sidecars removed (legacy/foreign dv dirs) → anti-join fallback,
      // same result
      val fs = new org.apache.hadoop.fs.Path(s"$dir/t").getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val dvRoot = new org.apache.hadoop.fs.Path(s"$dir/t/_graft_dv")
      fs.listStatus(dvRoot).foreach { d =>
        fs.delete(new org.apache.hadoop.fs.Path(d.getPath, "_sidecar"), true)
      }
      val t3 = VersionedTableDataObject("dvp3", s"$dir/t", deletionVectors = true)
      val df3 = t3.getDataFrame()
      assert(df3.select("k").as[Int].collect().toSet == expect2)
      assert(df3.queryExecution.executedPlan.toString.contains("Join"),
        "without sidecars the above-threshold read must fall back to the anti-join")
    } finally System.clearProperty("graft.dv.broadcastMaxBytes")
  }

  test("DV sidecar cache: reads stay correct under a tiny eviction budget") {
    // byte-budgeted LRU: with a budget smaller than any loaded array the
    // cache evicts constantly — every lookup re-reads its sidecar, results
    // must be unchanged (eviction is a perf trade, never a correctness one)
    val dir = Files.createTempDirectory("graft-dvc").toString
    val t = VersionedTableDataObject("dvc", s"$dir/t", deletionVectors = true)
    t.writeDataFrame((1 to 200).map(i => (i, s"v$i")).toDF("k", "v").repartition(8))
    t.deleteWhere("k % 3 = 0")
    t.deleteWhere("k % 7 = 1")
    val expect = (1 to 200).filterNot(k => k % 3 == 0 || k % 7 == 1).toSet
    System.setProperty("graft.dv.broadcastMaxBytes", "0")
    System.setProperty("graft.dv.sidecarCacheBytes", "1")
    try {
      val t2 = VersionedTableDataObject("dvc2", s"$dir/t", deletionVectors = true)
      val df = t2.getDataFrame()
      assert(df.queryExecution.executedPlan.toString.contains("dv_tombstoned_scan"))
      assert(df.select("k").as[Int].collect().toSet == expect)
    } finally {
      System.clearProperty("graft.dv.broadcastMaxBytes")
      System.clearProperty("graft.dv.sidecarCacheBytes")
    }
  }

  test("DV state survives the checkpoint shadow") {
    val dir = Files.createTempDirectory("graft-dv").toString
    val t = VersionedTableDataObject("dv7", s"$dir/t", checkpointInterval = 2,
      deletionVectors = true)
    t.writeDataFrame((1 to 5).map(i => (i, s"v$i")).toDF("k", "v"))               // v0
    t.deleteWhere("k = 5")                                                        // v1 (DV)
    t.writeDataFrame(Seq((6, "v6")).toDF("k", "v"),
      saveMode = Some(SdlSaveMode.Append))                                        // v2 → checkpoint
    // state read through the checkpoint must still carry the DV dir
    val cpDv = t.readState(Some(2)).get.dv
    assert(cpDv.size == 1 && cpDv.head.startsWith("v00000001-"))
    assert(t.getDataFrame().select("k").as[Int].collect().toSet == Set(1, 2, 3, 4, 6))
  }

  // ---- sidecar lifecycle -------------------------------------------
  // Per-file sidecars are staged INSIDE their dv-set dir (_sidecar/), so
  // every lifecycle edge that keeps or reclaims a dv dir keeps or
  // reclaims its sidecars with it — these specs pin that containment
  // through optimize, REORG-style materialization, restore and vacuum.

  private def dvDirNames(dir: String): Seq[String] = {
    val root = new java.io.File(s"$dir/t/_graft_dv")
    if (!root.exists) Seq.empty
    else root.listFiles.filter(_.isDirectory).map(_.getName).toSeq.sorted
  }
  private def sidecarBins(dir: String, dvName: String): Seq[String] = {
    val sc = new java.io.File(s"$dir/t/_graft_dv/$dvName/_sidecar")
    if (!sc.exists) Seq.empty
    else sc.listFiles.filter(_.getName.endsWith(".bin")).map(_.getName).toSeq.sorted
  }

  test("DV sidecar lifecycle: staged per dv-set; optimize + materialize + vacuum reclaims them together") {
    val dir = Files.createTempDirectory("graft-dvlc").toString
    val t = VersionedTableDataObject("dvlc", s"$dir/t", deletionVectors = true)
    t.writeDataFrame((1 to 100).map(i => (i, s"v$i")).toDF("k", "v").repartition(4)) // v0
    t.deleteWhere("k % 3 = 0")                                                       // v1: dv A
    t.deleteWhere("k % 7 = 1")                                                       // v2: dv B
    val expect = (1 to 100).filterNot(k => k % 3 == 0 || k % 7 == 1).toSet
    // 1. staging: each dv dir carries its own _sidecar/ with ≥1 .bin
    val dirs0 = dvDirNames(dir)
    assert(dirs0.size == 2, s"got $dirs0")
    dirs0.foreach(d => assert(sidecarBins(dir, d).nonEmpty, s"dv dir $d staged no sidecars"))
    // 2. OPTIMIZE compacts THROUGH the DVs; the dv dirs (and sidecars)
    // survive for older versions' time travel
    t.optimize(1)                                                                    // v3
    assert(t.getDataFrame().select("k").as[Int].collect().toSet == expect)
    assert(dvDirNames(dir) == dirs0, "optimize must not touch dv dirs")
    // 3. REORG purge: after compaction every tombstone references a dead
    // file name — materialization clears the set in one metadata commit
    t.materializeDeletionVectors()                                                   // v4
    assert(t.readState(None).get.dv.isEmpty)
    assert(dvDirNames(dir) == dirs0, "materialize clears the SET, vacuum reclaims the dirs")
    // 4. VACUUM horizon past both dv versions: dirs swept WITH their
    // _sidecar subdirs (recursive delete — no orphaned sidecar dirs)
    t.vacuum(1, orphanRetentionMillis = 0L)
    assert(dvDirNames(dir).isEmpty,
      s"unreferenced dv dirs must be reclaimed, still present: ${dvDirNames(dir)}")
    assert(!new java.io.File(s"$dir/t/_graft_dv").exists ||
      new java.io.File(s"$dir/t/_graft_dv").listFiles.forall(f => !f.getName.contains("_sidecar")))
    assert(t.getDataFrame().select("k").as[Int].collect().toSet == expect)
  }

  test("DV sidecar lifecycle: restore keeps exactly the restored version's dv dirs through vacuum") {
    val dir = Files.createTempDirectory("graft-dvlr").toString
    val t = VersionedTableDataObject("dvlr", s"$dir/t", deletionVectors = true)
    t.writeDataFrame((1 to 60).map(i => (i, s"v$i")).toDF("k", "v").repartition(3))  // v0
    t.deleteWhere("k % 4 = 0")                                                       // v1: dv A
    t.deleteWhere("k % 9 = 2")                                                       // v2: dv B
    val dirs0 = dvDirNames(dir)
    assert(dirs0.size == 2)
    val dvA = dirs0.find(_.startsWith("v00000001-")).get
    val dvB = dirs0.find(_.startsWith("v00000002-")).get
    // restore to v1: head's dv list reverts to [A] — rows tombstoned by
    // v2 come back
    t.restore(1)                                                                     // v3
    val afterRestore = (1 to 60).filterNot(_ % 4 == 0).toSet
    assert(t.getDataFrame().select("k").as[Int].collect().toSet == afterRestore)
    assert(t.readState(None).get.dv == Seq(dvA))
    // vacuum to the restore head only: dv A is retained (head references
    // it) and keeps its sidecars; dv B is unreferenced → swept entirely
    t.vacuum(1, orphanRetentionMillis = 0L)
    assert(dvDirNames(dir) == Seq(dvA), s"got ${dvDirNames(dir)}")
    assert(sidecarBins(dir, dvA).nonEmpty, "retained dv dir must keep its sidecars")
    assert(!new java.io.File(s"$dir/t/_graft_dv/$dvB").exists)
    assert(t.getDataFrame().select("k").as[Int].collect().toSet == afterRestore)
    // and the retained sidecars still drive the above-threshold scan path
    System.setProperty("graft.dv.broadcastMaxBytes", "0")
    try {
      val t2 = VersionedTableDataObject("dvlr2", s"$dir/t", deletionVectors = true)
      val df = t2.getDataFrame()
      assert(df.queryExecution.executedPlan.toString.contains("dv_tombstoned_scan"))
      assert(df.select("k").as[Int].collect().toSet == afterRestore)
    } finally System.clearProperty("graft.dv.broadcastMaxBytes")
  }

  test("DV sidecar race: vacuum never sweeps a concurrent writer's in-flight dv staging") {
    val dir = Files.createTempDirectory("graft-dvrace").toString
    val t = VersionedTableDataObject("dvrace", s"$dir/t", deletionVectors = true)
    t.writeDataFrame((1 to 60).map(i => (i, s"v$i")).toDF("k", "v").repartition(3)) // v0
    t.deleteWhere("k % 4 = 0")                                                      // v1: dv A
    t.deleteWhere("k % 9 = 2")                                                      // v2: dv B
    val expect = (1 to 60).filterNot(k => k % 4 == 0 || k % 9 == 2).toSet
    // a concurrent DV merge stages its tombstone sidecars at head+1 INSIDE
    // vacuum's race window (after the log rebase, before the dv-dir
    // sweep) — the worst-case interleaving: the sweep runs with the
    // in-flight dir already on disk but no commit referencing it yet
    val inflight = f"v${3}%08d-inflight"
    t.vacuumPhaseHook = p => if (p == "rebased") {
      val d = new java.io.File(s"$dir/t/_graft_dv/$inflight/_sidecar")
      assert(d.mkdirs())
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/t/_graft_dv/$inflight/_sidecar/0.bin"),
        Array[Byte](1, 2, 3))
    }
    try t.vacuum(1, orphanRetentionMillis = 0L)
    finally t.vacuumPhaseHook = _ => ()
    // the version guard (staged at head+1 >= cut) protects the in-flight
    // dir even with a ZERO age guard — a concurrent merge can never lose
    // its sidecars to a racing vacuum
    assert(new java.io.File(s"$dir/t/_graft_dv/$inflight/_sidecar/0.bin").exists,
      "in-flight dv staging at head+1 must survive the sweep")
    // referenced dv dirs survived, reads unchanged
    assert(t.getDataFrame().select("k").as[Int].collect().toSet == expect)

    // the complementary guard: an ABANDONED staging BELOW the horizon is
    // age-guarded — young dirs survive a default-retention vacuum (a slow
    // writer), only an explicit zero-retention vacuum reclaims them
    val abandoned = f"v${0}%08d-crashed"
    val ad = new java.io.File(s"$dir/t/_graft_dv/$abandoned/_sidecar")
    assert(ad.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/t/_graft_dv/$abandoned/_sidecar/0.bin"), Array[Byte](7))
    t.vacuum(1)                                    // default 7-day age guard
    assert(new java.io.File(s"$dir/t/_graft_dv/$abandoned").exists,
      "young abandoned staging must survive the age guard")
    t.vacuum(1, orphanRetentionMillis = 0L)
    assert(!new java.io.File(s"$dir/t/_graft_dv/$abandoned").exists,
      "zero-retention vacuum reclaims the crashed writer's staging")
    assert(t.getDataFrame().select("k").as[Int].collect().toSet == expect)
  }
}
