package graft.sources

import graft.core._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Minimal XLSX codec on JDK-only parts (java.util.zip + StAX): an .xlsx
  * file is a zip of XML parts — workbook.xml (sheet registry),
  * sharedStrings.xml (string pool), worksheets/sheetN.xml (cells).
  * No POI / spark-excel dependency (not in the offline image); covers the
  * standard cell types: shared strings (t="s"), inline strings
  * (t="inlineStr"), plain numbers, booleans (t="b"), formula results.
  */
object XlsxCodec {

  case class Cell(value: String, numeric: Boolean)

  /** A1-style column letters → 0-based index */
  private def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += e.getName -> zin.readAllBytes()
      e = zin.getNextEntry
    }
    out.result()
  }

  private def xmlReader(bytes: Array[Byte]): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes), "UTF-8")
  }

  private def sharedStrings(parts: Map[String, Array[Byte]]): IndexedSeq[String] = {
    val bytes = parts.getOrElse("xl/sharedStrings.xml", return IndexedSeq.empty)
    val r = xmlReader(bytes)
    val out = IndexedSeq.newBuilder[String]
    var cur: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "t" if cur != null => inT = true
            case _ => ()
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT =>
          cur.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => out += cur.toString; cur = null
            case _ => ()
          }
        case _ => ()
      }
    }
    out.result()
  }

  /** worksheet part name for the requested sheet (workbook order; name
    * match via workbook.xml + its rels when a name is given) */
  private def sheetPart(parts: Map[String, Array[Byte]], sheetName: Option[String]): String = {
    val wb = parts.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException("not an xlsx: missing xl/workbook.xml"))
    // sheet name → r:id in workbook order
    val r = xmlReader(wb)
    val sheets = Seq.newBuilder[(String, String)] // (name, rid)
    while (r.hasNext) {
      if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
        var name = ""; var rid = ""
        for (i <- 0 until r.getAttributeCount) {
          r.getAttributeLocalName(i) match {
            case "name" => name = r.getAttributeValue(i)
            case "id" => rid = r.getAttributeValue(i) // r:id
            case _ => ()
          }
        }
        sheets += name -> rid
      }
    }
    val all = sheets.result()
    require(all.nonEmpty, "xlsx workbook has no sheets")
    val rid = sheetName match {
      case Some(n) => all.find(_._1 == n).map(_._2)
        .getOrElse(throw new IllegalArgumentException(s"xlsx sheet '$n' not found (has ${all.map(_._1).mkString(",")})"))
      case None => all.head._2
    }
    // rels: rid → target (e.g. worksheets/sheet1.xml). A MISSING rels part
    // must hit the sheet1.xml fallback below — an XML reader over empty
    // bytes throws "premature end of file" before the fallback is reached
    val rels = parts.getOrElse("xl/_rels/workbook.xml.rels", Array.emptyByteArray)
    var target: String = null
    val rr = if (rels.isEmpty) null else xmlReader(rels)
    while (rr != null && rr.hasNext && target == null) {
      if (rr.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT && rr.getLocalName == "Relationship") {
        var id = ""; var t = ""
        for (i <- 0 until rr.getAttributeCount) {
          rr.getAttributeLocalName(i) match {
            case "Id" => id = rr.getAttributeValue(i)
            case "Target" => t = rr.getAttributeValue(i)
            case _ => ()
          }
        }
        if (id == rid) target = t
      }
    }
    "xl/" + Option(target).getOrElse("worksheets/sheet1.xml").stripPrefix("/xl/").stripPrefix("xl/")
  }

  /** parse one sheet into dense rows (nulls for gaps) */
  def parse(bytes: Array[Byte], sheetName: Option[String] = None): Seq[IndexedSeq[Cell]] = {
    val parts = zipEntries(bytes)
    val strings = sharedStrings(parts)
    val sheet = parts.getOrElse(sheetPart(parts, sheetName),
      throw new IllegalArgumentException("xlsx sheet part missing"))
    val r = xmlReader(sheet)
    val rows = Seq.newBuilder[IndexedSeq[Cell]]
    var row: java.util.TreeMap[Integer, Cell] = null
    var cellRef = ""; var cellType = ""; var inCell = false
    var capture = false; var sawValue = false; var inIs = false
    // text accumulates across ALL <v>/<t> runs of one cell — rich-text
    // inline strings carry several <r><t>…</t></r> runs per cell
    var text = new StringBuilder
    var nextCol = 0
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = new java.util.TreeMap(); nextCol = 0
            case "c" =>
              inCell = true; sawValue = false; text = new StringBuilder
              cellRef = ""; cellType = "n"
              for (i <- 0 until r.getAttributeCount) {
                r.getAttributeLocalName(i) match {
                  case "r" => cellRef = r.getAttributeValue(i)
                  case "t" => cellType = r.getAttributeValue(i)
                  case _ => ()
                }
              }
            case "v" if inCell => capture = true; sawValue = true
            case "is" => inIs = true
            case "t" if inIs => capture = true; sawValue = true
            case _ => ()
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if capture =>
          text.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" => capture = false
            case "is" => inIs = false
            case "c" if inCell =>
              inCell = false
              if (sawValue && row != null) {
                val raw = text.toString
                val cell = cellType match {
                  case "s" => Cell(strings(raw.trim.toInt), numeric = false)
                  case "b" => Cell(if (raw.trim == "1") "true" else "false", numeric = false)
                  case "n" => Cell(raw, numeric = true)
                  case _ => Cell(raw, numeric = false) // str (formula result), inlineStr
                }
                val idx = if (cellRef.nonEmpty) colIndex(cellRef) else nextCol
                row.put(idx, cell); nextCol = idx + 1
              } else {
                // a valueless cell (<c/>, a null) still occupies its grid
                // position — without advancing the cursor, every later cell
                // of a ref-less row shifts one column left (caught by the
                // q75 oracle: null c_mktsegment pulled c_nationkey into it)
                val idx = if (cellRef.nonEmpty) colIndex(cellRef) else nextCol
                nextCol = idx + 1
              }
            case "row" =>
              val width = if (row.isEmpty) 0 else row.lastKey() + 1
              val dense = IndexedSeq.tabulate(width)(i => row.get(i))
              rows += dense
              row = null
            case _ => ()
          }
        case _ => ()
      }
    }
    rows.result()
  }

  private def xmlEscape(s: String): String =
    s.flatMap { case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
                case '"' => "&quot;"; case c => c.toString }

  /** write rows to a minimal single-sheet xlsx (inline strings, no shared
    * pool — write-side simplicity; readers incl. this codec accept it) */
  def write(header: Seq[String], rows: Iterator[Seq[Any]], sheetName: String = "Sheet1"): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos, java.nio.charset.StandardCharsets.UTF_8)
    def part(name: String, content: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    part("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
         |</workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    z.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    val w = new java.io.OutputStreamWriter(z, "UTF-8")
    w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def writeRow(cells: Seq[Any]): Unit = {
      w.write("<row>")
      cells.foreach {
        case null => w.write("<c/>")
        case n: Number => w.write(s"""<c t="n"><v>$n</v></c>""")
        case b: Boolean => w.write(s"""<c t="b"><v>${if (b) 1 else 0}</v></c>""")
        case other => w.write(s"""<c t="inlineStr"><is><t>${xmlEscape(other.toString)}</t></is></c>""")
      }
      w.write("</row>")
    }
    if (header.nonEmpty) writeRow(header)
    rows.foreach(writeRow)
    w.write("</sheetData></worksheet>")
    w.flush(); z.closeEntry(); z.close()
    bos.toByteArray
  }
}

/** Excel (.xlsx) DataObject without POI/spark-excel (neither in the offline
  * image): reference `ExcelFileDataObject.scala:41-73` delegates to
  * crealytics spark-excel; here the codec is [[XlsxCodec]] (JDK zip+StAX)
  * and the READ is distributed — a binaryFile scan feeds per-file parsing
  * inside `mapPartitions`, so a directory of workbooks parses in parallel.
  * Schema comes from the declared schema or the first file's header row
  * (numeric columns detected from cell types). Writes produce ONE workbook
  * (Excel's own format cap is 1,048,576 rows — it is an interchange format,
  * not a data lake format; the reference has the same semantics via
  * numberOfTasksPerPartition=1).
  */
case class ExcelFileDataObject(
    id: String, path: String,
    sheetName: Option[String] = None,
    useHeader: Boolean = true,
    schema: Option[StructType] = None)
  extends DataObject with CanCreateDataFrame with CanWriteDataFrame {

  private def hadoopPath = new org.apache.hadoop.fs.Path(path)
  private def fs(implicit ctx: ActionPipelineContext) =
    hadoopPath.getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)

  /** declared schema, or header+cell-type inference from the first file */
  private def resolveSchema(implicit ctx: ActionPipelineContext): StructType =
    schema.getOrElse {
      // non-recursive on purpose: getDataFrame's binaryFile scan does not
      // set recursiveFileLookup, so a workbook in a subdirectory must not
      // contribute schema either
      val it = fs.listFiles(hadoopPath, false)
      var first: org.apache.hadoop.fs.Path = null
      while (first == null && it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".xlsx") && !f.getName.startsWith("_") && !f.getName.startsWith(".")) first = f
      }
      require(first != null, s"DataObject $id: no .xlsx files under $path")
      val in = fs.open(first)
      val bytes = try in.readAllBytes() finally in.close()
      val rows = XlsxCodec.parse(bytes, sheetName)
      require(rows.nonEmpty, s"DataObject $id: ${first.getName} is empty")
      val width = rows.map(_.length).max
      val names =
        if (useHeader) (0 until width).map(i => rows.head.lift(i).flatMap(Option(_)).map(_.value).getOrElse(s"_c$i"))
        else (0 until width).map(i => s"_c$i")
      val body = if (useHeader) rows.tail else rows
      val fields = (0 until width).map { i =>
        val cells = body.flatMap(_.lift(i)).filter(_ != null)
        val numeric = cells.nonEmpty && cells.forall(_.numeric)
        StructField(names(i), if (numeric) DoubleType else StringType)
      }
      StructType(fields)
    }

  override def getDataFrame(partitionValues: Seq[PartitionValues] = Seq.empty)
                           (implicit ctx: ActionPipelineContext): DataFrame = {
    val s = resolveSchema
    val sheet = sheetName
    val skipHeader = useHeader
    val files = ctx.spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(path)
      .select(col("content"))
    val enc = org.apache.spark.sql.Encoders.row(StructType(
      s.fields.map(f => f.copy(dataType = StringType, nullable = true))))
    val asStrings = files.mapPartitions { rows =>
      rows.flatMap { r =>
        val parsed = XlsxCodec.parse(r.getAs[Array[Byte]](0), sheet)
        val body = if (skipHeader && parsed.nonEmpty) parsed.tail else parsed
        body.map { cells =>
          Row.fromSeq(s.fields.indices.map(i => cells.lift(i).flatMap(Option(_)).map(_.value).orNull))
        }
      }
    }(enc)
    // cast the raw strings into the resolved schema (Spark casts "3.0" → 3.0)
    asStrings.select(s.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
  }

  override def writeDataFrame(df: DataFrame, partitionValues: Seq[PartitionValues] = Seq.empty,
                              saveMode: Option[SdlSaveMode] = None)
                             (implicit ctx: ActionPipelineContext): ActionMetrics = {
    val t0 = System.currentTimeMillis()
    // take(cap+1), NOT collect(): the cap check must fire BEFORE an
    // oversized frame is pulled to the driver — take streams only the
    // needed rows, so a 100M-row mistake fails loudly instead of OOMing
    val rows = df.take(1048576)
    require(rows.length <= 1048575, s"DataObject $id: xlsx format caps at 1,048,575 data rows")
    val bytes = XlsxCodec.write(
      if (useHeader) df.columns.toSeq else Seq.empty,
      rows.iterator.map(_.toSeq), sheetName.getOrElse("Sheet1"))
    fs.mkdirs(hadoopPath)
    def parts(): Seq[org.apache.hadoop.fs.Path] = {
      val it = fs.listFiles(hadoopPath, false)
      val b = Seq.newBuilder[org.apache.hadoop.fs.Path]
      while (it.hasNext) { val f = it.next().getPath; if (f.getName.endsWith(".xlsx")) b += f }
      b.result()
    }
    val target = saveMode.getOrElse(SdlSaveMode.Overwrite) match {
      case SdlSaveMode.Overwrite =>
        parts().foreach(fs.delete(_, false))
        new org.apache.hadoop.fs.Path(hadoopPath, "part-0000.xlsx")
      case SdlSaveMode.Append => // a NEW part file per append, like any file sink
        // max existing index + 1, not count(): gapped numbering (a deleted
        // part) would make count collide with a live part and overwrite it
        val next = parts().flatMap(p =>
          "part-(\\d+)\\.xlsx".r.findFirstMatchIn(p.getName).map(_.group(1).toInt))
          .maxOption.map(_ + 1).getOrElse(0)
        new org.apache.hadoop.fs.Path(hadoopPath, f"part-$next%04d.xlsx")
      case SdlSaveMode.ErrorIfExists =>
        require(parts().isEmpty, s"DataObject $id: $path already holds workbooks")
        new org.apache.hadoop.fs.Path(hadoopPath, "part-0000.xlsx")
      case SdlSaveMode.Ignore =>
        if (parts().nonEmpty) return ActionMetrics(0L, System.currentTimeMillis() - t0)
        new org.apache.hadoop.fs.Path(hadoopPath, "part-0000.xlsx")
      case m => throw new IllegalArgumentException(
        s"DataObject $id: save mode $m is not supported for xlsx (single-workbook interchange format)")
    }
    val out = fs.create(target, true)
    try out.write(bytes) finally out.close()
    ActionMetrics(rows.length.toLong, System.currentTimeMillis() - t0)
  }
}
