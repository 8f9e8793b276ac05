package graft.io

import java.io.{ByteArrayOutputStream, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Single-object Excel I/O — `s3.read_excel` / `s3.to_excel`
  * (`s3/_read_excel.py:17`, `s3/_write_excel.py:17`). The reference
  * delegates to pandas+openpyxl; this environment has no spreadsheet
  * library, so a minimal self-contained OOXML implementation covers the
  * operator: one sheet, inline strings, header row — the shape the
  * reference's single-object Excel path produces/consumes.
  *
  * Deliberately driver-side (like the reference: a single small object,
  * not a dataset format). Values round-trip as strings; callers apply
  * dtype casts the same way the reference's `dtype` argument does.
  */
object ExcelIO {

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Write the DataFrame (collected — single-object semantics) as a
    * one-sheet .xlsx with an inline-string header row. */
  def toExcel(df: DataFrame, path: String, maxRows: Int = 1048575): Unit = {
    val rows = df.limit(maxRows).collect()
    val header = df.columns

    def rowXml(idx: Int, values: Seq[String]): String = {
      val cells = values.zipWithIndex.map { case (v, c) =>
        if (v == null) ""
        else s"""<c r="${colRef(c)}${idx}" t="inlineStr"><is><t>${xmlEscape(v)}</t></is></c>"""
      }.mkString
      s"""<row r="$idx">$cells</row>"""
    }

    val sheetRows = new StringBuilder
    sheetRows ++= rowXml(1, header.toIndexedSeq)
    rows.zipWithIndex.foreach { case (r, i) =>
      sheetRows ++= rowXml(i + 2,
        (0 until r.length).map(j => if (r.isNullAt(j)) null
          else String.valueOf(r.get(j))))
    }

    val sheet =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>${sheetRows.result()}</sheetData></worksheet>""".stripMargin
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
    val workbookRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin

    val zos = new ZipOutputStream(new FileOutputStream(path))
    try {
      def put(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", workbookRels)
      put("xl/worksheets/sheet1.xml", sheet)
    } finally zos.close()
  }

  /** Read a one-sheet .xlsx (inline or shared strings) into a string-typed
    * DataFrame with the first row as header. */
  def readExcel(spark: SparkSession, path: String): DataFrame = {
    var sheetXml: String = null
    var sharedXml: String = null
    val zis = new ZipInputStream(new FileInputStream(path))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        if (e.getName == "xl/worksheets/sheet1.xml") sheetXml = readAll(zis)
        else if (e.getName == "xl/sharedStrings.xml") sharedXml = readAll(zis)
        e = zis.getNextEntry
      }
    } finally zis.close()
    require(sheetXml != null, s"no sheet1 in $path")

    val shared: IndexedSeq[String] =
      if (sharedXml == null) IndexedSeq.empty
      else parseNodes(sharedXml, "si").map(si => textOf(si)).toIndexedSeq

    val parsed: Seq[Seq[String]] = parseNodes(sheetXml, "row").map { row =>
      val cells = parseNodes(row, "c")
      // place each cell at its column index (sparse rows have gaps)
      val out = ArrayBuffer.empty[String]
      cells.foreach { c =>
        val ref = attrOf(c, "r").getOrElse("")
        val colIdx = ref.takeWhile(_.isLetter)
          .foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1)) - 1
        val t = attrOf(c, "t")
        val value = t match {
          case Some("inlineStr") => textOf(c)
          case Some("s") => shared.lift(textOf(c).trim.toInt).orNull
          case _ => { val v = textOf(c); if (v.isEmpty) null else v }
        }
        while (out.length <= colIdx) out += null
        if (colIdx >= 0) out(colIdx) = value
      }
      out.toSeq
    }
    require(parsed.nonEmpty, "empty sheet")
    val header = parsed.head.map(h => if (h == null) "col" else h)
    val width = header.length
    val data = parsed.tail.map(r =>
      Row.fromSeq(r.padTo(width, null).take(width)))
    val schema = StructType(header.map(StructField(_, StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq), schema)
  }

  private def colRef(c: Int): String = {
    var n = c + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.result()
  }

  private def readAll(in: java.io.InputStream): String = {
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    bos.toString("UTF-8")
  }

  /** Extract top-level <tag …>…</tag> fragments (non-nested tags). */
  private def parseNodes(xml: String, tag: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val open = s"<$tag"
    var i = xml.indexOf(open)
    while (i >= 0) {
      val close = xml.indexOf(s"</$tag>", i)
      val selfEnd = xml.indexOf("/>", i)
      val tagEnd = xml.indexOf(">", i)
      if (selfEnd >= 0 && selfEnd < tagEnd.max(0) + 1 && (close < 0 || selfEnd < close) && xml.substring(i, selfEnd).indexOf('>') < 0) {
        out += xml.substring(i, selfEnd + 2)
        i = xml.indexOf(open, selfEnd + 2)
      } else if (close >= 0) {
        out += xml.substring(i, close + tag.length + 3)
        i = xml.indexOf(open, close + tag.length + 3)
      } else i = -1
    }
    out.toSeq
  }

  private def attrOf(node: String, attr: String): Option[String] = {
    val m = (attr + "=\"([^\"]*)\"").r.findFirstMatchIn(
      node.substring(0, node.indexOf('>') + 1))
    m.map(_.group(1))
  }

  /** Concatenated text of all <t> elements inside the node (or the body
    * of a value cell). */
  private def textOf(node: String): String = {
    val ts = "<t[^>]*>([\\s\\S]*?)</t>".r.findAllMatchIn(node)
      .map(_.group(1)).toSeq
    val raw =
      if (ts.nonEmpty) ts.mkString
      else "<v>([\\s\\S]*?)</v>".r.findFirstMatchIn(node)
        .map(_.group(1)).getOrElse {
          val s = node.indexOf('>') + 1
          val e = node.lastIndexOf('<')
          if (e > s) node.substring(s, e) else ""
        }
    raw.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&amp;", "&")
  }
}
