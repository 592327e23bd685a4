package graft

import graft.core._
import graft.sources._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

class FileFormatsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  implicit lazy val ctx: ActionPipelineContext =
    ActionPipelineContext(spark, new InstanceRegistry)

  def tmpDir(): String = java.nio.file.Files.createTempDirectory("graft_ff").toString

  test("xml data object round-trips rows via builtin xml source") {
    import spark.implicits._
    val dir = tmpDir()
    val xml = XmlFileDataObject("x1", dir, rowTag = "item")
    val df = Seq((1, "alpha"), (2, "beta")).toDF("id", "name")
    xml.writeDataFrame(df, Seq.empty, Some(SdlSaveMode.Overwrite))
    val back = xml.getDataFrame()
    // persisted schema keeps the written types (id stays Int, not inferred Long)
    assert(back.select("id", "name").collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "alpha"), (2, "beta")))
  }

  test("relaxed csv reconciles drifting schemas across files") {
    val dir = tmpDir()
    // two files with different headers (column drift)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "a.csv"),
      "id,name,age\n1,ann,30\n2,bob,40\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "b.csv"),
      "id,name,city\n3,carl,berlin\n")
    val rel = RelaxedCsvFileDataObject("r1", dir,
      schema = Some(StructType.fromDDL("id INT, name STRING, age INT, city STRING")))
    val got = rel.getDataFrame().orderBy("id").collect()
    assert(got.length == 3)
    assert(got(0).getAs[Int]("age") == 30 && got(0).getAs[String]("city") == null)
    assert(got(2).getAs[Any]("age") == null && got(2).getAs[String]("city") == "berlin")
  }

  test("relaxed csv without fixed schema unions by name") {
    val dir = tmpDir()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "a.csv"), "id,v\n1,x\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "b.csv"), "id,w\n2,y\n")
    val rel = RelaxedCsvFileDataObject("r2", dir)
    val got = rel.getDataFrame()
    assert(got.columns.toSet == Set("id", "v", "w") && got.count() == 2)
  }

  test("tick-tock table swaps sides atomically and supports read-then-rewrite") {
    import spark.implicits._
    val dir = tmpDir()
    val tt = TickTockHiveTableDataObject("tt1", Table(None, "tt_test"), dir,
      registerInCatalog = false)
    assert(!tt.isTableExisting)
    tt.writeDataFrame(Seq((1, "a")).toDF("id", "v"), Seq.empty, None)
    assert(tt.activeSide == "tock") // first write lands on the inactive side of default "tick"
    val first = tt.getDataFrame()
    assert(first.count() == 1)
    // read-modify-write: derive new state from current table, write back
    val next = first.union(Seq((2, "b")).toDF("id", "v"))
    tt.writeDataFrame(next, Seq.empty, None)
    assert(tt.activeSide == "tick")
    assert(tt.getDataFrame().count() == 2)
    // both sides exist on disk; reader only sees the active one
    assert(new java.io.File(dir, "tick").exists() && new java.io.File(dir, "tock").exists())
  }

  test("orc round-trip and append-evolution (union schema persisted)") {
    import spark.implicits._
    val orc = OrcFileDataObject("orc1", tmpDir() + "/t")
    orc.writeDataFrame(Seq((1, "a", 1.0)).toDF("id", "name", "score"), Seq.empty, None)
    assert(orc.getDataFrame().count() == 1)
    orc.writeDataFrame(Seq((2, "b", "en")).toDF("id", "name", "lang"), Seq.empty,
      Some(graft.core.SdlSaveMode.Append))
    val got = orc.getDataFrame().select("id", "name", "score", "lang")
      .collect().map(r => (r.getInt(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), Option(r.getString(3)))).toSet
    assert(got == Set((1, "a", Some(1.0), None), (2, "b", None, Some("en"))))
  }

  test("tick-tock append unions existing rows; merge is rejected loudly") {
    import spark.implicits._
    val tt = TickTockHiveTableDataObject("tt3", Table(None, "tt_append"), tmpDir(),
      registerInCatalog = false)
    tt.writeDataFrame(Seq((1, "a")).toDF("id", "v"), Seq.empty, None)
    // append must carry the active side forward, not silently overwrite it
    tt.writeDataFrame(Seq((2, "b")).toDF("id", "v"), Seq.empty,
      Some(graft.core.SdlSaveMode.Append))
    assert(tt.getDataFrame().orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "b")))
    val e = intercept[IllegalArgumentException] {
      tt.writeDataFrame(Seq((3, "c")).toDF("id", "v"), Seq.empty,
        Some(graft.core.SdlSaveMode.Merge))
    }
    assert(e.getMessage.contains("tick-tock"))
  }

  test("relaxed csv with many files takes the distributed header-read path") {
    import spark.implicits._
    val dir = tmpDir()
    // 70 files (> the 64-file driver-side threshold), two header groups
    (1 to 70).foreach { i =>
      val (hdr, row) = if (i % 2 == 0) ("a,b", s"$i,x$i") else ("a,c", s"$i,y$i")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/f$i.csv"), s"$hdr\n$row\n")
    }
    val relaxed = RelaxedCsvFileDataObject("many", dir)
    val df = relaxed.getDataFrame()
    assert(df.count() == 70)
    assert(df.columns.toSet == Set("a", "b", "c"))
    // each row carries its own header's column; the other group's is null
    assert(df.where(col("b").isNotNull).count() == 35)
    assert(df.where(col("c").isNotNull).count() == 35)
  }

  test("zip codec: reads .zip-packed csv transparently and writes zip via compression option") {
    graft.sources.GraftZipCodec.register(ctx)
    // hand-pack a csv into a zip, as an external producer would
    val dir = tmpDir()
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$dir/drop.zip"))
    zos.putNextEntry(new java.util.zip.ZipEntry("export.csv"))
    zos.write("id,v\n1,a\n2,b\n".getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    val got = CsvFileDataObject("z1", dir).getDataFrame()
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq((1, "a"), (2, "b")))
    // write side: compression option produces a real zip archive
    import spark.implicits._
    val out = tmpDir()
    CsvFileDataObject("z2", out,
      csvOptions = Map("compression" -> classOf[graft.sources.GraftZipCodec].getName))
      .writeDataFrame(Seq((3, "c")).toDF("id", "v"), Seq.empty, Some(graft.core.SdlSaveMode.Overwrite))
    val zipFile = new java.io.File(out).listFiles().find(_.getName.endsWith(".zip"))
    assert(zipFile.isDefined)
    val zin = new java.util.zip.ZipInputStream(new java.io.FileInputStream(zipFile.get))
    assert(zin.getNextEntry.getName == "data.csv")
    val content = new String(zin.readAllBytes(), "UTF-8")
    assert(content.contains("3,c"))
  }

  test("tick-tock registers catalog table at active location") {
    import spark.implicits._
    val dir = tmpDir()
    val tt = TickTockHiveTableDataObject("tt2", Table(None, "tt_cat"), dir)
    tt.writeDataFrame(Seq((7, "z")).toDF("id", "v"), Seq.empty, None)
    assert(spark.table("tt_cat").count() == 1)
    spark.sql("DROP TABLE IF EXISTS tt_cat")
  }

  test("excel (.xlsx) round-trip via JDK-only codec: header, types, sheet selection") {
    import spark.implicits._
    val dir = tmpDir()
    val xl = ExcelFileDataObject("xl1", dir)
    xl.writeDataFrame(
      Seq((1, "alpha & <beta>", 2.5, true), (2, "gamma", 3.5, false))
        .toDF("id", "name", "score", "flag"),
      Seq.empty, Some(graft.core.SdlSaveMode.Overwrite))
    assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".xlsx")))
    // header-driven schema; numeric columns inferred from xlsx cell types
    val back = ExcelFileDataObject("xl2", dir).getDataFrame()
    assert(back.columns.toSeq == Seq("id", "name", "score", "flag"))
    assert(back.schema("id").dataType == org.apache.spark.sql.types.DoubleType) // xlsx numbers are doubles
    assert(back.schema("name").dataType == org.apache.spark.sql.types.StringType)
    val got = back.orderBy("id").collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1.0, "alpha & <beta>", 2.5), (2.0, "gamma", 3.5)))
    // declared schema wins over inference
    val typed = ExcelFileDataObject("xl3", dir,
      schema = Some(org.apache.spark.sql.types.StructType.fromDDL(
        "id INT, name STRING, score DOUBLE, flag BOOLEAN")))
      .getDataFrame().orderBy("id").collect()
    assert(typed.head.getInt(0) == 1 && typed.head.getBoolean(3))
    // unknown sheet → clear error
    val e = intercept[Exception](
      ExcelFileDataObject("xl4", dir, sheetName = Some("nope")).getDataFrame().collect())
    assert(e.getMessage.contains("not found"))
  }

  test("excel save modes: append adds a part file, errorIfExists/ignore honored, schema skips subdirs") {
    import spark.implicits._
    val dir = tmpDir()
    val xl = ExcelFileDataObject("xlm", dir)
    def files() = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".xlsx")).map(_.getName).sorted.toSeq
    xl.writeDataFrame(Seq((1, "a")).toDF("id", "v"), Seq.empty, Some(SdlSaveMode.Overwrite))
    assert(files() == Seq("part-0000.xlsx"))
    // Append must NOT clobber the existing workbook
    xl.writeDataFrame(Seq((2, "b")).toDF("id", "v"), Seq.empty, Some(SdlSaveMode.Append))
    assert(files() == Seq("part-0000.xlsx", "part-0001.xlsx"))
    val all = xl.getDataFrame().orderBy("id").collect().map(r => (r.getDouble(0), r.getString(1))).toSeq
    assert(all == Seq((1.0, "a"), (2.0, "b")))
    // ErrorIfExists refuses a non-empty dir; Ignore is a no-op
    intercept[IllegalArgumentException](
      xl.writeDataFrame(Seq((3, "c")).toDF("id", "v"), Seq.empty, Some(SdlSaveMode.ErrorIfExists)))
    xl.writeDataFrame(Seq((3, "c")).toDF("id", "v"), Seq.empty, Some(SdlSaveMode.Ignore))
    assert(files().size == 2)
    // overwrite replaces all prior parts
    xl.writeDataFrame(Seq((9, "z")).toDF("id", "v"), Seq.empty, Some(SdlSaveMode.Overwrite))
    assert(files() == Seq("part-0000.xlsx") && xl.getDataFrame().count() == 1)
    // a workbook inside a subdirectory is invisible to the (non-recursive)
    // binaryFile read, so it must not contribute schema either
    val sub = new java.io.File(dir, "nested"); sub.mkdirs()
    val extraDf = Seq(("x", "y", "zz")).toDF("other", "cols", "entirely")
    ExcelFileDataObject("xls", sub.toString).writeDataFrame(extraDf, Seq.empty, None)
    val back = ExcelFileDataObject("xlm2", dir).getDataFrame()
    assert(back.columns.toSeq == Seq("id", "v") && back.count() == 1)
  }

  test("xlsx codec: rich-text inline strings concatenate runs; gap cells stay null") {
    // hand-build a workbook with a rich-text cell (<is> with two <r><t> runs)
    // and a column gap, as Excel itself produces
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def part(name: String, content: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name)); z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    part("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/></Relationships>""".stripMargin)
    part("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row><c r="A1" t="inlineStr"><is><r><t>Hello </t></r><r><t>World</t></r></is></c><c r="C1"><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
    val rows = XlsxCodec.parse(bos.toByteArray)
    assert(rows.head(0).value == "Hello World") // runs concatenated, not last-wins
    assert(rows.head(1) == null)                // B1 gap stays null
    assert(rows.head(2).value == "7" && rows.head(2).numeric)
  }

  test("avro data object round-trips rows and partitions (builtin avro in Spark 4)") {
    import spark.implicits._
    val dir = tmpDir()
    val avro = AvroFileDataObject("av1", dir, partitions = Seq("dt"))
    avro.writeDataFrame(
      Seq((1, "a", "2024-01-01"), (2, "b", "2024-01-02")).toDF("id", "v", "dt"),
      Seq.empty, Some(graft.core.SdlSaveMode.Overwrite))
    val back = avro.getDataFrame().orderBy("id")
      .collect().map(r => (r.getAs[Int]("id"), r.getAs[String]("v"))).toSeq
    assert(back == Seq((1, "a"), (2, "b")))
    assert(avro.listPartitions.map(_.elements("dt")).sorted == Seq("2024-01-01", "2024-01-02"))
    // avro files actually on disk
    val files = new java.io.File(dir, "dt=2024-01-01").listFiles()
    assert(files.exists(_.getName.endsWith(".avro")))
  }

  test("partitioned avro append with identical schema is NOT rejected as drift") {
    // regression: the strict append drift check compared the feed against the
    // READ-side schema, where partition columns come back appended last with
    // directory-inferred types (dt='2024-01-01' → date vs the feed's string)
    // — every identical-schema append on a partitioned avro object threw
    import spark.implicits._
    val dir = tmpDir()
    val avro = AvroFileDataObject("av2", dir, partitions = Seq("dt"))
    // partition column NOT trailing, value infers to date on read
    val load1 = Seq((1, "2024-01-01", "a"), (2, "2024-01-02", "b")).toDF("id", "dt", "v")
    avro.writeDataFrame(load1, Seq.empty, Some(graft.core.SdlSaveMode.Overwrite))
    val load2 = Seq((3, "2024-01-03", "c")).toDF("id", "dt", "v")
    avro.writeDataFrame(load2, Seq.empty, Some(graft.core.SdlSaveMode.Append))
    val back = avro.getDataFrame().select("id", "v").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(back == Seq((1, "a"), (2, "b"), (3, "c")))
    // genuinely drifted append must still be rejected loudly
    val drifted = Seq((4, "2024-01-04", 9.9)).toDF("id", "dt", "extra")
    val e = intercept[IllegalArgumentException] {
      avro.writeDataFrame(drifted, Seq.empty, Some(graft.core.SdlSaveMode.Append))
    }
    assert(e.getMessage.contains("drifted schema"))
  }

  test("tick-tock OverwriteOptimized rewrites only the feed's partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tt-dyn").toString
    val t = TickTockHiveTableDataObject("ttd", Table(Some("db"), "ttd"), dir,
      partitions = Seq("dt"), registerInCatalog = false)
    t.writeDataFrame(Seq((1, "d1"), (2, "d2")).toDF("v", "dt"))
    // dynamic overwrite carrying ONLY dt=d2: dt=d1 must survive
    t.writeDataFrame(Seq((20, "d2")).toDF("v", "dt"),
      saveMode = Some(graft.core.SdlSaveMode.OverwriteOptimized))
    val got = t.getDataFrame().select("v", "dt").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "d1"), (20, "d2")))
  }

  test("relaxed csv: corrupt record column materializes for malformed rows") {
    val dir = java.nio.file.Files.createTempDirectory("rc-corrupt").toString
    // row 2 carries an EXTRA token — malformed under the 2-column header
    java.nio.file.Files.writeString(java.nio.file.Path.of(dir, "a.csv"),
      "id,n\n1,10\n2,20,stray\n")
    val o = RelaxedCsvFileDataObject("rcc", dir, corruptRecordColumn = Some("_corrupt"))
    val rows = o.getDataFrame().collect()
    assert(rows.length == 2)
    val bad = rows.filter(!_.isNullAt(rows.head.fieldIndex("_corrupt")))
    assert(bad.length == 1 && bad.head.getAs[String]("_corrupt").contains("stray"))
  }

  test("zip codec skips leading directory entries") {
    graft.sources.GraftZipCodec.register(ctx)
    val dir = java.nio.file.Files.createTempDirectory("zipdir").toString
    // `zip -r`-style archive: the ROOT DIRECTORY is the first entry —
    // stopping there would read the archive as zero bytes
    val zout = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$dir/drop.zip"))
    zout.putNextEntry(new java.util.zip.ZipEntry("exports/"))
    zout.closeEntry()
    zout.putNextEntry(new java.util.zip.ZipEntry("exports/data.csv"))
    zout.write("x,y\n1,2\n".getBytes("UTF-8"))
    zout.closeEntry(); zout.close()
    val df = CsvFileDataObject("zdir", dir).getDataFrame()
    assert(df.count() == 1 && df.columns.toSeq == Seq("x", "y"))
  }

  test("excel append numbering survives gaps without overwriting live parts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("xlsx-gap").toString
    val o = ExcelFileDataObject("xg", dir)
    o.writeDataFrame(Seq((1, "a")).toDF("k", "v"))                               // part-0000
    o.writeDataFrame(Seq((2, "b")).toDF("k", "v"), saveMode = Some(graft.core.SdlSaveMode.Append)) // part-0001
    o.writeDataFrame(Seq((3, "c")).toDF("k", "v"), saveMode = Some(graft.core.SdlSaveMode.Append)) // part-0002
    // delete the middle part → count() would target part-0002 and clobber
    java.nio.file.Files.delete(java.nio.file.Path.of(dir, "part-0001.xlsx"))
    o.writeDataFrame(Seq((4, "d")).toDF("k", "v"), saveMode = Some(graft.core.SdlSaveMode.Append)) // part-0003
    val ks = o.getDataFrame().select("k").collect().map(_.getDouble(0).toInt).toSet
    assert(ks == Set(1, 3, 4))
  }
}
