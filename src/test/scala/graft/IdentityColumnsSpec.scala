package graft

import graft.core._
import graft.sources._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Identity columns on the versioned table (the public Delta GENERATED
  * ALWAYS AS IDENTITY design): unique increasing values, logged high-water
  * mark, GENERATED ALWAYS refusal, monotonic across RESTORE and vacuum. */
class IdentityColumnsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  implicit lazy val ctx: ActionPipelineContext =
    ActionPipelineContext(spark, new InstanceRegistry)
  import spark.implicits._

  private def table(dir: String, interval: Int = 10) =
    VersionedTableDataObject("idt", s"$dir/t", primaryKey = Seq("rid"),
      checkpointInterval = interval, identityColumns = Seq("rid"))

  private def ids(t: VersionedTableDataObject): Seq[Long] =
    t.getDataFrame().select("rid").as[Long].collect().toSeq

  test("appends assign unique ids; each write starts above the logged high-water") {
    val dir = Files.createTempDirectory("graft-id").toString
    val t = table(dir)
    t.writeDataFrame(Seq("a", "b", "c").toDF("v"))
    val first = ids(t)
    assert(first.distinct.size == 3 && first.forall(_ >= 1L))
    val hw1 = t.readState(None).get.idHw("rid")
    assert(hw1 == first.max)
    t.writeDataFrame(Seq("d", "e").toDF("v"), saveMode = Some(SdlSaveMode.Append))
    val all = ids(t)
    assert(all.distinct.size == 5, s"ids must stay unique across commits: $all")
    assert((all.toSet -- first.toSet).forall(_ > hw1), "new ids start above the high-water")
    assert(t.readState(None).get.idHw("rid") == all.max)
  }

  test("GENERATED ALWAYS: provided identity values, UPDATE and MERGE are refused") {
    val dir = Files.createTempDirectory("graft-id2").toString
    val t = table(dir)
    t.writeDataFrame(Seq("a").toDF("v"))
    intercept[IllegalArgumentException] {
      t.writeDataFrame(Seq((99L, "x")).toDF("rid", "v"), saveMode = Some(SdlSaveMode.Append)) }
    intercept[IllegalArgumentException] { t.updateWhere(Map("rid" -> "7"), "v = 'a'") }
    intercept[IllegalArgumentException] {
      t.mergeDataFrame(Seq("z").toDF("v"), Seq("rid")) }
    // non-identity updates keep the assigned id
    val before = ids(t)
    t.updateWhere(Map("v" -> "'a2'"), "v = 'a'")
    assert(ids(t) == before)
  }

  test("RESTORE never lowers the mark: post-restore appends cannot collide") {
    val dir = Files.createTempDirectory("graft-id3").toString
    val t = table(dir)
    t.writeDataFrame(Seq("a").toDF("v"))                                          // v0
    val v0ids = ids(t)
    t.writeDataFrame(Seq("b", "c").toDF("v"), saveMode = Some(SdlSaveMode.Append)) // v1
    val hw = t.readState(None).get.idHw("rid")
    t.restore(0)                                                                 // v2
    assert(t.readState(None).get.idHw("rid") == hw, "restore inherits the high-water")
    t.writeDataFrame(Seq("d").toDF("v"), saveMode = Some(SdlSaveMode.Append))      // v3
    val after = ids(t)
    assert(after.distinct.size == after.size)
    assert((after.toSet -- v0ids.toSet).forall(_ > hw), "post-restore ids stay above the mark")
  }

  test("high-water survives checkpoint replay and the vacuum rebase") {
    val dir = Files.createTempDirectory("graft-id4").toString
    val t = table(dir, interval = 2)
    (1 to 5).foreach(i => t.writeDataFrame(Seq(s"v$i").toDF("v"),
      saveMode = if (i == 1) None else Some(SdlSaveMode.Append)))
    val hw = t.readState(None).get.idHw("rid")
    val n0 = ids(t).size
    t.vacuum(retainVersions = 2)
    assert(t.readState(None).get.idHw("rid") == hw, "vacuum rebase carries idhw")
    t.writeDataFrame(Seq("post").toDF("v"), saveMode = Some(SdlSaveMode.Append))
    val all = ids(t)
    assert(all.size == n0 + 1 && all.distinct.size == all.size)
    assert(all.max > hw)
  }
}
