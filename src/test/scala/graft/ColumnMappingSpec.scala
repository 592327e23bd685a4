package graft

import graft.core._
import graft.sources._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Column mapping on the versioned table (the public Delta column-mapping
  * design): immutable physical column names, metadata-only RENAME/DROP
  * COLUMN, no-resurrect re-add, pruning/merge/vacuum across renames. */
class ColumnMappingSpec extends AnyFunSuite {
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

  test("physical names are writer-unique; reads present logical names") {
    val dir = Files.createTempDirectory("graft-cm").toString
    val t = VersionedTableDataObject("cm1", s"$dir/t", columnMapping = true)
    t.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    // the footer truth: data files carry uuid'd physical names, not k/v
    val file = dataFileState(s"$dir/t").keys.head
    val physCols = spark.read.parquet(file).columns.toSet
    assert(physCols.forall(c => c.startsWith("k-x") || c.startsWith("v-x")),
      s"expected uuid'd physical names, got $physCols")
    // the logical surface is unchanged
    val got = t.getDataFrame().select("k", "v").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "a"), (2, "b")))
  }

  test("RENAME COLUMN is metadata-only; time travel keeps the old name") {
    val dir = Files.createTempDirectory("graft-cmr").toString
    val t = VersionedTableDataObject("cm2", s"$dir/t", columnMapping = true)
    t.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v"))                      // v0
    val before = dataFileState(s"$dir/t")
    val v = t.renameColumn("v", "value")                                          // v1
    assert(v == 1)
    // ZERO data bytes moved
    assert(dataFileState(s"$dir/t") == before)
    assert(t.getDataFrame().columns.toSeq == Seq("k", "value"))
    assert(t.getDataFrame().select("value").as[String].collect().toSet == Set("a", "b"))
    // pre-rename snapshot still reads under the old logical name
    assert(t.getDataFrameAsOf(Some(0)).columns.toSeq == Seq("k", "v"))
    assert(t.history(1).collect().head.getAs[String]("operation") == "RENAME_COLUMN(v->value)")
  }

  test("data skipping keeps pruning across a rename (stats keys are physical)") {
    val dir = Files.createTempDirectory("graft-cms").toString
    val t = VersionedTableDataObject("cm3", s"$dir/t", columnMapping = true)
    t.writeDataFrame(Seq((1, 10), (2, 20)).toDF("k", "n").coalesce(1))            // v0
    t.writeDataFrame(Seq((100, 1000), (101, 1001)).toDF("k", "n").coalesce(1),
      saveMode = Some(SdlSaveMode.Append))                                        // v1
    t.renameColumn("n", "amount")                                                 // v2
    // file-level pruning through the renamed LOGICAL name
    val hit = t.filesForFilters(Seq(org.apache.spark.sql.sources.GreaterThan("amount", 500)))
    assert(hit.size == 1, s"expected 1 candidate file, got $hit")
    assert(t.getDataFrame().where(col("amount") > 500).count() == 2)
  }

  test("DROP COLUMN + re-add: fresh physical name, dropped data never resurrects") {
    val dir = Files.createTempDirectory("graft-cmd").toString
    val t = VersionedTableDataObject("cm4", s"$dir/t", columnMapping = true)
    t.writeDataFrame(Seq((1, "secret1"), (2, "secret2")).toDF("k", "c"))          // v0
    t.dropColumn("c")                                                             // v1
    assert(t.getDataFrame().columns.toSeq == Seq("k"))
    // re-add the same logical name via append evolution
    t.writeDataFrame(Seq((3, "fresh")).toDF("k", "c"),
      saveMode = Some(SdlSaveMode.Append))                                        // v2
    val got = t.getDataFrame().select("k", "c").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)))).toSet
    // old rows are NULL in the re-added column — the dropped physical data
    // stays invisible even though it is still inside the v0 files
    assert(got == Set((1, None), (2, None), (3, Some("fresh"))))
    // time travel to v0 still sees the pre-drop values
    assert(t.getDataFrameAsOf(Some(0)).select("c").as[String].collect().toSet ==
      Set("secret1", "secret2"))
  }

  test("MERGE works across a rename; file-pruned on the mapped key stats") {
    val dir = Files.createTempDirectory("graft-cmm").toString
    val t = VersionedTableDataObject("cm5", s"$dir/t", primaryKey = Seq("k"),
      columnMapping = true)
    t.writeDataFrame(Seq((1, "a"), (2, "b")).toDF("k", "v"))                      // v0
    t.renameColumn("v", "value")                                                  // v1
    t.mergeDataFrame(Seq((2, "B"), (3, "c")).toDF("k", "value"), Seq("k"))        // v2
    val got = t.getDataFrame().select("k", "value").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "a"), (2, "B"), (3, "c")))
  }

  test("partitioned mapping table: physical dirs, logical listPartitions and deletes") {
    val dir = Files.createTempDirectory("graft-cmp").toString
    val t = VersionedTableDataObject("cm6", s"$dir/t", partitions = Seq("dt"),
      columnMapping = true)
    t.writeDataFrame(Seq((1, "d1"), (2, "d2")).toDF("k", "dt"))
    // partition directories carry the PHYSICAL column name
    val dirs = new java.io.File(s"$dir/t").listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles).map(_.getName).filter(_.contains("="))
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("dt-x")), s"got ${dirs.toSeq}")
    // the API surface stays logical
    assert(t.listPartitions.map(_.elements("dt")).toSet == Set("d1", "d2"))
    t.deletePartitions(Seq(PartitionValues(Map("dt" -> "d1"))))
    assert(t.getDataFrame().select("dt").as[String].collect().toSet == Set("d2"))
  }

  test("checkpoint + vacuum carry the column map; restore reverts a rename") {
    val dir = Files.createTempDirectory("graft-cmv").toString
    val t = VersionedTableDataObject("cm7", s"$dir/t", checkpointInterval = 2,
      columnMapping = true)
    t.writeDataFrame(Seq((1, "a")).toDF("k", "v"))                                // v0
    t.renameColumn("v", "value")                                                  // v1
    t.writeDataFrame(Seq((2, "b")).toDF("k", "value"),
      saveMode = Some(SdlSaveMode.Append))                                        // v2 → checkpoint
    // state THROUGH the checkpoint still maps value → physical v name
    assert(t.readState(Some(2)).get.colMap.keySet == Set("k", "value"))
    t.vacuum(retainVersions = 1)
    assert(t.getDataFrame().select("value").as[String].collect().toSet == Set("a", "b"))
    // restore to the pre-vacuum head is a no-op rename-wise; restore to a
    // pre-rename version is exercised on a fresh table (vacuum dropped v0)
    val dir2 = Files.createTempDirectory("graft-cmv2").toString
    val t2 = VersionedTableDataObject("cm8", s"$dir2/t", columnMapping = true)
    t2.writeDataFrame(Seq((1, "a")).toDF("k", "v"))                               // v0
    t2.renameColumn("v", "value")                                                 // v1
    t2.restore(0)                                                                 // v2
    assert(t2.getDataFrame().columns.toSeq == Seq("k", "v"))
  }

  test("rename/drop refuse without columnMapping and on structural columns") {
    val dir = Files.createTempDirectory("graft-cmx").toString
    val plain = VersionedTableDataObject("cm9", s"$dir/t")
    plain.writeDataFrame(Seq((1, "a")).toDF("k", "v"))
    intercept[IllegalArgumentException] { plain.renameColumn("v", "w") }
    intercept[IllegalArgumentException] { plain.dropColumn("v") }
    val keyed = VersionedTableDataObject("cm10", s"$dir/t2", primaryKey = Seq("k"),
      partitions = Seq("p"), columnMapping = true)
    keyed.writeDataFrame(Seq((1, "a", "x")).toDF("k", "v", "p"))
    intercept[IllegalArgumentException] { keyed.renameColumn("k", "kk") }
    intercept[IllegalArgumentException] { keyed.dropColumn("p") }
  }

  test("deletion vectors + CDC compose with column mapping across a rename") {
    val dir = Files.createTempDirectory("graft-cmdv").toString
    val t = VersionedTableDataObject("cm11", s"$dir/t", primaryKey = Seq("k"),
      columnMapping = true, deletionVectors = true, changeDataFeed = true)
    t.writeDataFrame(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))            // v0
    t.renameColumn("v", "value")                                                  // v1 (marker)
    val n = t.deleteWhere("value = 'b'")                                          // v2 (DV)
    assert(n == 1L)
    assert(t.getDataFrame().select("k").as[Int].collect().toSet == Set(1, 3))
    // CDC across the rename window reads under the CURRENT logical schema
    val ch = t.changesBetween(0, Some(2)).select("k", "value", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(ch == Set((2, "b", "delete")))
  }

  test("columnMapping flag is fixed at creation: flipping it on an existing table is refused") {
    val dir = Files.createTempDirectory("graft-cmflag").toString
    // created WITHOUT mapping, flag flipped on → write refused (pre-flip
    // files would read all-NULL under freshly assigned physical names)
    VersionedTableDataObject("cmf1", s"$dir/t").writeDataFrame(Seq((1, "a")).toDF("k", "v"))
    val flippedOn = VersionedTableDataObject("cmf1b", s"$dir/t", columnMapping = true)
    val e1 = intercept[IllegalArgumentException] {
      flippedOn.writeDataFrame(Seq((2, "b")).toDF("k", "v"), saveMode = Some(SdlSaveMode.Append)) }
    assert(e1.getMessage.contains("fixed at table creation"))
    // created WITH mapping, flag flipped off → write refused (mapped files
    // would read all-NULL under logical names)
    VersionedTableDataObject("cmf2", s"$dir/t2", columnMapping = true)
      .writeDataFrame(Seq((1, "a")).toDF("k", "v"))
    val flippedOff = VersionedTableDataObject("cmf2b", s"$dir/t2")
    val e2 = intercept[IllegalArgumentException] {
      flippedOff.writeDataFrame(Seq((2, "b")).toDF("k", "v"), saveMode = Some(SdlSaveMode.Append)) }
    assert(e2.getMessage.contains("fixed at table creation"))
    // merge path guards too
    val e3 = intercept[IllegalArgumentException] {
      flippedOn.mergeDataFrame(Seq((1, "z")).toDF("k", "v"), Seq("k")) }
    assert(e3.getMessage.contains("fixed at table creation"))
  }

  test("rename/drop resolve case-insensitively; case-only rename is legal") {
    val dir = Files.createTempDirectory("graft-cmcase").toString
    val t = VersionedTableDataObject("cmc1", s"$dir/t", columnMapping = true)
    t.writeDataFrame(Seq((1, "a")).toDF("k", "Value"))
    t.renameColumn("value", "V2")          // case-insensitive old-name lookup
    assert(t.getDataFrame().columns.toSeq == Seq("k", "V2"))
    t.renameColumn("V2", "v2")             // case-ONLY rename (Delta permits)
    assert(t.getDataFrame().columns.toSeq == Seq("k", "v2"))
    assert(t.getDataFrame().select("v2").as[String].collect().toSeq == Seq("a"))
    // a DIFFERENT column holding the name (any case) still refuses
    intercept[IllegalArgumentException] { t.renameColumn("v2", "K") }
    // drop resolves case-insensitively
    t.dropColumn("V2")
    assert(t.getDataFrame().columns.toSeq == Seq("k"))
  }

  test("concurrent column DDL on a staged column is a commit conflict, unrelated DDL is not") {
    val dir = Files.createTempDirectory("graft-cmrace").toString
    val t = VersionedTableDataObject("cmr1", s"$dir/t", columnMapping = true)
    t.writeDataFrame(Seq((1, "a", "x")).toDF("k", "v", "w"))
    val pre = t.readState(None).get.colMap
    val stagedCols = Seq("k", "v", "w")
    // concurrent RENAME v->value: head map lost "v" that our staged files bind
    assert(t.colMapConflicts((pre - "v") + ("value" -> pre("v")), pre, pre, stagedCols))
    // concurrent DROP w: same
    assert(t.colMapConflicts(pre - "w", pre, pre, stagedCols))
    // same-name concurrent add race: head assigned a DIFFERENT phys for a
    // column we also staged fresh
    val stagedNew = pre + ("n" -> "n-xaaaa")
    assert(t.colMapConflicts(pre + ("n" -> "n-xbbbb"), stagedNew, pre, stagedCols :+ "n"))
    // our brand-new column, absent from head: no conflict
    assert(!t.colMapConflicts(pre, stagedNew, pre, stagedCols :+ "n"))
    // unrelated rename (column we did not stage): no conflict
    assert(!t.colMapConflicts((pre - "w") + ("w2" -> pre("w")), pre, pre, Seq("k", "v")))
    // identical head: no conflict
    assert(!t.colMapConflicts(pre, pre, pre, stagedCols))
    // mergeConflicts surfaces the same rule off a colMapSet-bearing commit
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val renameCommit = t.Commit(5, Seq.empty, Seq.empty, None, Map.empty,
      op = "RENAME_COLUMN(v->value)", colMapSet = Some((pre - "v") + ("value" -> pre("v"))))
    assert(t.mergeConflicts(Seq(renameCommit), Seq.empty, Seq("k"), Map.empty, schema,
      feedHasNullKeys = false, pre, pre, stagedCols))
    assert(!t.mergeConflicts(Seq(renameCommit), Seq.empty, Seq("k"), Map.empty, schema,
      feedHasNullKeys = false, pre, pre, Seq("k")))
  }
}
