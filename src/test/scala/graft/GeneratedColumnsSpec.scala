package graft

import graft.core._
import graft.sources._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Generated columns on the versioned table (the public Delta GENERATED
  * ALWAYS AS design): population in the write plan, row-level validation
  * of provided values, regeneration through UPDATE, partition layout. */
class GeneratedColumnsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  implicit lazy val ctx: ActionPipelineContext =
    ActionPipelineContext(spark, new InstanceRegistry)
  import spark.implicits._

  private def table(dir: String, dv: Boolean = false) =
    VersionedTableDataObject("gc1", s"$dir/t", primaryKey = Seq("k"),
      partitions = Seq("bucket"), deletionVectors = dv,
      generatedColumns = Seq("bucket" -> "CASE WHEN n < 100 THEN 'small' ELSE 'big' END"))

  test("omitted generated column is populated and drives the partition layout") {
    val dir = Files.createTempDirectory("graft-gen").toString
    val t = table(dir)
    t.writeDataFrame(Seq((1, 10L), (2, 500L)).toDF("k", "n"))
    assert(t.getDataFrame().select("k", "bucket").collect().map(r =>
      (r.getInt(0), r.getString(1))).toSet == Set((1, "small"), (2, "big")))
    // physical partition dirs (under the staging subdir) carry the
    // generated values
    def walk(f: java.io.File): Seq[String] =
      if (f.isDirectory) f.getName +: f.listFiles.toSeq.flatMap(walk) else Seq.empty
    assert(walk(new java.io.File(s"$dir/t")).exists(_.startsWith("bucket=")))
    // generated-partition filter prunes at plan time
    assert(t.filesForFilters(Seq(org.apache.spark.sql.sources.EqualTo("bucket", "small"))).size <
      t.snapshotFiles().size)
  }

  test("provided value validates: matching passes, contradicting fails the write") {
    val dir = Files.createTempDirectory("graft-gen2").toString
    val t = table(dir)
    t.writeDataFrame(Seq((1, 10L, "small")).toDF("k", "n", "bucket"))
    assert(t.getDataFrame().count() == 1)
    val e = intercept[Exception] {
      t.writeDataFrame(Seq((2, 10L, "big")).toDF("k", "n", "bucket"),
        saveMode = Some(SdlSaveMode.Append)) }
    assert(e.getMessage != null && e.getMessage.contains("generated:bucket"))
  }

  test("UPDATE of a source column regenerates; direct assignment is refused") {
    for (dv <- Seq(false, true)) {
      val dir = Files.createTempDirectory("graft-gen3").toString
      val t = table(dir, dv = dv)
      t.writeDataFrame(Seq((1, 10L), (2, 500L)).toDF("k", "n"))
      intercept[IllegalArgumentException] {
        t.updateWhere(Map("bucket" -> "'big'"), "k = 1") }
      assert(t.updateWhere(Map("n" -> "n + 1000"), "k = 1") == 1L)
      assert(t.getDataFrame().where(col("k") === 1).select("bucket")
        .as[String].head() == "big", s"dv=$dv: bucket must regenerate from post-image")
    }
  }

  test("optimizedWrite: one file per partition value instead of tasks x values") {
    val dir = Files.createTempDirectory("graft-genow").toString
    def files(p: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles.map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(p))
    }
    val rows = (1 to 400).map(i => (i, i % 8)).toDF("k", "b").repartition(8)
    val plain = VersionedTableDataObject("ow1", s"$dir/p", partitions = Seq("b"))
    plain.writeDataFrame(rows)
    val opt = VersionedTableDataObject("ow2", s"$dir/o", partitions = Seq("b"),
      optimizedWrite = true)
    opt.writeDataFrame(rows)
    assert(files(s"$dir/o") == 8, s"optimized: 1 file per value, got ${files(s"$dir/o")}")
    assert(files(s"$dir/p") > 8, "plain write sprays tasks x values files")
    assert(opt.getDataFrame().count() == 400)
  }

  test("merge feed without the generated column populates it for inserts and updates") {
    val dir = Files.createTempDirectory("graft-gen4").toString
    val t = table(dir)
    t.writeDataFrame(Seq((1, 10L), (2, 500L)).toDF("k", "n"))
    t.mergeDataFrame(Seq((1, 900L), (3, 5L)).toDF("k", "n"), Seq("k"))
    assert(t.getDataFrame().select("k", "bucket").collect().map(r =>
      (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "big"), (2, "big"), (3, "small")))
  }

  test("merge update clause limited to the source column still regenerates (CoW and DV)") {
    // the r12 ADVICE defect: updateColumns = Seq("n") changes the
    // generated column's SOURCE but not the generated value — without
    // post-merge regeneration the row commits bucket='small' with n=900
    // (contradicting its expression, in the wrong partition)
    for (dv <- Seq(false, true)) {
      val dir = Files.createTempDirectory(s"graft-gen5-$dv").toString
      val t = table(dir, dv)
      t.writeDataFrame(Seq((1, 10L), (2, 500L)).toDF("k", "n"))
      t.mergeDataFrame(Seq((1, 900L), (2, 5L)).toDF("k", "n"), Seq("k"),
        SaveModeMergeOptions(updateColumns = Seq("n")))
      assert(t.getDataFrame().select("k", "n", "bucket").collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getString(2))).toSet ==
        Set((1, 900L, "big"), (2, 5L, "small")),
        s"deletionVectors=$dv: generated column must follow the updated source")
    }
  }
}
