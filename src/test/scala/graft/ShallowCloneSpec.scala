package graft

import graft.core._
import graft.sources._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Shallow clone on the versioned table: zero-copy creation, independent
  * evolution, DML on absolute source references, vacuum safety. */
class ShallowCloneSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  implicit lazy val ctx: ActionPipelineContext =
    ActionPipelineContext(spark, new InstanceRegistry)
  import spark.implicits._

  private def parquetFilesUnder(dir: String): Seq[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles.foreach(walk)
      else if (f.getName.endsWith(".parquet")) buf += f.getAbsolutePath
    val root = new java.io.File(dir)
    if (root.exists) walk(root)
    buf.toSeq
  }

  test("clone is zero-copy and pinned: reads equal the source version, source evolves independently") {
    val dir = Files.createTempDirectory("graft-cl").toString
    val src = VersionedTableDataObject("cls", s"$dir/src", primaryKey = Seq("k"))
    src.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v"))                   // v0
    val clone = src.shallowCloneTo("clc", s"$dir/clone")
    // zero data files under the clone root — only the log
    assert(parquetFilesUnder(s"$dir/clone").isEmpty)
    assert(clone.getDataFrame().select("k", "v").collect().map(r =>
      (r.getInt(0), r.getString(1))).toSet == Set((1, "a"), (2, "b")))
    // source evolves; the clone stays pinned at the cloned version
    src.writeDataFrame(Seq((3, "c")).toDF("k", "v"), saveMode = Some(SdlSaveMode.Append))
    assert(clone.getDataFrame().count() == 2)
    assert(src.getDataFrame().count() == 3)
    assert(clone.history(1).collect().head.getAs[String]("operation").startsWith("CLONE(cls@0)"))
  }

  test("DML on a clone: merge/delete match rows inside absolute source references") {
    val dir = Files.createTempDirectory("graft-cld").toString
    val src = VersionedTableDataObject("cls2", s"$dir/src", primaryKey = Seq("k"))
    src.writeDataFrame(Seq((1, 10), (2, 20), (3, 30)).toDF("k", "n"))
    val clone = src.shallowCloneTo("clc2", s"$dir/clone")
    // copy-on-write DELETE: the touched (source-referenced) file rewrites
    // INTO the clone's own dir; the source file is untouched
    val srcFiles = parquetFilesUnder(s"$dir/src")
    val deleted = clone.deleteWhere("k = 2")
    assert(deleted == 1L)
    assert(clone.getDataFrame().select("k").as[Int].collect().toSet == Set(1, 3))
    assert(parquetFilesUnder(s"$dir/src") == srcFiles, "clone DML must not touch source files")
    assert(parquetFilesUnder(s"$dir/clone").nonEmpty, "rewrite lands in the clone dir")
    // source unaffected
    assert(src.getDataFrame().count() == 3)
    // MERGE on the clone upserts through the same suffix-matched identity
    clone.mergeDataFrame(Seq((3, 300), (4, 40)).toDF("k", "n"), Seq("k"))
    assert(clone.getDataFrame().select("k", "n").collect().map(r =>
      (r.getInt(0), r.getInt(1))).toSet == Set((1, 10), (3, 300), (4, 40)))
  }

  test("clone vacuum never deletes outside its own root; own rewrites are reclaimed") {
    val dir = Files.createTempDirectory("graft-clv").toString
    val src = VersionedTableDataObject("cls3", s"$dir/src")
    src.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val clone = src.shallowCloneTo("clc3", s"$dir/clone")
    val srcFiles = parquetFilesUnder(s"$dir/src").toSet
    // detach: overwrite the clone (source refs leave the clone's snapshot)
    clone.writeDataFrame(Seq((9, "z")).toDF("k", "v"))
    clone.vacuum(retainVersions = 1, orphanRetentionMillis = 0)
    // the source's files survive the clone's vacuum even though the
    // clone's log no longer references them
    assert(parquetFilesUnder(s"$dir/src").toSet == srcFiles)
    assert(src.getDataFrame().count() == 2)
    assert(clone.getDataFrame().select("k").as[Int].collect().toSet == Set(9))
  }

  test("clone carries stats (data skipping) and refuses active DVs / existing targets") {
    val dir = Files.createTempDirectory("graft-clg").toString
    val src = VersionedTableDataObject("cls4", s"$dir/src", primaryKey = Seq("k"),
      deletionVectors = true)
    src.writeDataFrame(Seq((1, 10), (2, 20)).toDF("k", "n").coalesce(1))
    src.writeDataFrame(Seq((100, 1000)).toDF("k", "n").coalesce(1),
      saveMode = Some(SdlSaveMode.Append))
    val clone = src.shallowCloneTo("clc4", s"$dir/clone")
    // carried per-file stats prune on the clone immediately
    val hit = clone.filesForFilters(Seq(org.apache.spark.sql.sources.GreaterThan("k", 50)))
    assert(hit.size == 1, s"expected 1 candidate, got $hit")
    // a second clone into the same dir refuses
    intercept[IllegalArgumentException] { src.shallowCloneTo("clc4b", s"$dir/clone") }
    // active DVs refuse until materialized
    src.deleteWhere("k = 1")
    intercept[IllegalArgumentException] { src.shallowCloneTo("clc4c", s"$dir/clone2") }
    src.materializeDeletionVectors()
    val c2 = src.shallowCloneTo("clc4c", s"$dir/clone2")
    assert(c2.getDataFrame().select("k").as[Int].collect().toSet == Set(2, 100))
  }

  test("clone carries the identity high-water: clone appends stay above source ids") {
    val dir = Files.createTempDirectory("graft-clid").toString
    val src = VersionedTableDataObject("clid", s"$dir/src", primaryKey = Seq("rid"),
      identityColumns = Seq("rid"))
    src.writeDataFrame(Seq("a", "b", "c").toDF("v"))
    val hw = src.readState(None).get.idHw("rid")
    val clone = src.shallowCloneTo("clidc", s"$dir/clone")
    assert(clone.readState(None).get.idHw("rid") == hw,
      "the clone's v0 must inherit the source's identity high-water")
    clone.writeDataFrame(Seq("d", "e").toDF("v"), saveMode = Some(SdlSaveMode.Append))
    val all = clone.getDataFrame().select("rid").as[Long].collect().toSeq
    assert(all.distinct.size == 5, s"clone append must not reuse source ids: $all")
    assert(all.count(_ > hw) == 2, "new clone ids start above the inherited mark")
  }

  test("clone of a clone: inherited absolute references pass through unprefixed") {
    val dir = Files.createTempDirectory("graft-clcc").toString
    val src = VersionedTableDataObject("cls5", s"$dir/src", primaryKey = Seq("k"))
    src.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val cloneA = src.shallowCloneTo("clca", s"$dir/cloneA")
    // cloneA gains a file of its own, so cloneB's v0 mixes an inherited
    // ABSOLUTE source reference with cloneA's own relative file
    cloneA.writeDataFrame(Seq((3, "c")).toDF("k", "v"), saveMode = Some(SdlSaveMode.Append))
    val cloneB = cloneA.shallowCloneTo("clcb", s"$dir/cloneB")
    assert(parquetFilesUnder(s"$dir/cloneB").isEmpty)
    assert(cloneB.getDataFrame().select("k", "v").collect().map(r =>
      (r.getInt(0), r.getString(1))).toSet == Set((1, "a"), (2, "b"), (3, "c")))
    // and cloneB's stats still prune (keys carried for both reference kinds)
    assert(cloneB.filesForFilters(Seq(org.apache.spark.sql.sources.EqualTo("k", 3))).nonEmpty)
  }
}
