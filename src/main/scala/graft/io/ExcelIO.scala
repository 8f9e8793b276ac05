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
  * operator: inline strings, multiple named sheets, and the
  * pandas-kwargs call shapes the reference forwards — `sheet_name`,
  * `header`, `skiprows`.
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
  def toExcel(df: DataFrame, path: String, maxRows: Int = 1048575,
      sheetName: String = "Sheet1", header: Boolean = true): Unit =
    toExcelSheets(Seq(sheetName -> df), path, maxRows, header)

  /** Write several DataFrames as named sheets of one workbook — the
    * `sheet_name` call shape of `to_excel` generalized to the
    * `ExcelWriter` multi-sheet document pandas users produce. */
  def toExcelSheets(sheets: Seq[(String, DataFrame)], path: String,
      maxRows: Int = 1048575, header: Boolean = true): Unit = {
    require(sheets.nonEmpty, "at least one sheet")

    def rowXml(idx: Int, values: Seq[String]): String = {
      val cells = values.zipWithIndex.map { case (v, c) =>
        if (v == null) ""
        else s"""<c r="${colRef(c)}${idx}" t="inlineStr"><is><t>${xmlEscape(v)}</t></is></c>"""
      }.mkString
      s"""<row r="$idx">$cells</row>"""
    }

    def sheetXml(df: DataFrame): String = {
      val rows = df.limit(maxRows).collect()
      val sheetRows = new StringBuilder
      var next = 1
      if (header) { sheetRows ++= rowXml(next, df.columns.toIndexedSeq); next += 1 }
      rows.foreach { r =>
        sheetRows ++= rowXml(next,
          (0 until r.length).map(j => if (r.isNullAt(j)) null
            else String.valueOf(r.get(j))))
        next += 1
      }
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>${sheetRows.result()}</sheetData></worksheet>""".stripMargin
    }

    val sheetTags = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
         | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>$sheetTags</sheets></workbook>""".stripMargin
    val relTags = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString
    val workbookRels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |$relTags
         |</Relationships>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val overrides = sheets.indices.map { i =>
      s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
    }.mkString
    val contentTypes =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
         |<Default Extension="xml" ContentType="application/xml"/>
         |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
         |$overrides
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
      sheets.zipWithIndex.foreach { case ((_, df), i) =>
        put(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(df))
      }
    } finally zos.close()
  }

  /** Sheet names of a workbook, in workbook order. */
  def listSheets(path: String): Seq[String] = {
    val entries = readZip(path)
    val wb = entries.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException(s"no workbook in $path"))
    parseNodes(wb, "sheet").flatMap(attrOf(_, "name"))
  }

  /** Read an .xlsx sheet (inline or shared strings) into a string-typed
    * DataFrame. `sheetName` defaults to the workbook's first sheet;
    * `skipRows` drops leading rows BEFORE the header is taken (pandas
    * `skiprows`); `header=false` yields `_c0…_cN` column names with
    * every row as data (pandas `header=None`). */
  def readExcel(spark: SparkSession, path: String,
      sheetName: Option[String] = None, header: Boolean = true,
      skipRows: Int = 0): DataFrame = {
    val entries = readZip(path)
    val sheetXml = resolveSheet(entries, path, sheetName)
    val sharedXml = entries.get("xl/sharedStrings.xml").orNull

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
    }.drop(skipRows)
    require(parsed.nonEmpty, "empty sheet (after skiprows)")
    val (headerNames, dataRows) =
      if (header)
        (parsed.head.map(h => if (h == null) "col" else h), parsed.tail)
      else
        (parsed.map(_.length).max match {
          case w => (0 until w).map(i => s"_c$i")
        }, parsed)
    val width = headerNames.length
    val data = dataRows.map(r =>
      Row.fromSeq(r.padTo(width, null).take(width)))
    val schema = StructType(headerNames.map(StructField(_, StringType)).toSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq), schema)
  }

  /** All xml parts of the workbook zip, keyed by entry name. */
  private def readZip(path: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    val zis = new ZipInputStream(new FileInputStream(path))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        if (e.getName.endsWith(".xml") || e.getName.endsWith(".rels"))
          out += e.getName -> readAll(zis)
        e = zis.getNextEntry
      }
    } finally zis.close()
    out.result()
  }

  /** The worksheet xml for `sheetName` via workbook.xml (name → r:id) and
    * the workbook rels (r:id → target part). */
  private def resolveSheet(entries: Map[String, String], path: String,
      sheetName: Option[String]): String = {
    val wb = entries.get("xl/workbook.xml")
    val rels = entries.get("xl/_rels/workbook.xml.rels")
    val resolved: Option[String] = for {
      wbXml <- wb
      relsXml <- rels
      sheetTag <- sheetName match {
        case Some(n) => parseNodes(wbXml, "sheet")
          .find(attrOf(_, "name").contains(n))
        case None => parseNodes(wbXml, "sheet").headOption
      }
      rid <- attrOf(sheetTag, "r:id")
      rel <- parseNodes(relsXml, "Relationship")
        .find(attrOf(_, "Id").contains(rid))
      target <- attrOf(rel, "Target")
      xml <- entries.get(if (target.startsWith("/")) target.stripPrefix("/")
        else s"xl/$target")
    } yield xml
    resolved.orElse {
      // workbooks without resolvable rels: fall back to sheet1
      if (sheetName.isEmpty) entries.get("xl/worksheets/sheet1.xml") else None
    }.getOrElse(throw new IllegalArgumentException(
      s"sheet ${sheetName.getOrElse("<first>")} not found in $path " +
        s"(have: ${listSheets(path).mkString(", ")})"))
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

  /** Extract top-level <tag …>…</tag> fragments (non-nested tags). A
    * match must be followed by a delimiter so `sheet` never matches
    * `<sheets>`. */
  private def parseNodes(xml: String, tag: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val open = s"<$tag"
    def nextOpen(from: Int): Int = {
      var i = xml.indexOf(open, from)
      while (i >= 0 && i + open.length < xml.length && {
        val ch = xml.charAt(i + open.length)
        ch != ' ' && ch != '>' && ch != '/' && ch != '\t' &&
          ch != '\n' && ch != '\r'
      }) i = xml.indexOf(open, i + 1)
      i
    }
    var i = nextOpen(0)
    while (i >= 0) {
      val close = xml.indexOf(s"</$tag>", i)
      val selfEnd = xml.indexOf("/>", i)
      val tagEnd = xml.indexOf(">", i)
      if (selfEnd >= 0 && selfEnd < tagEnd.max(0) + 1 && (close < 0 || selfEnd < close) && xml.substring(i, selfEnd).indexOf('>') < 0) {
        out += xml.substring(i, selfEnd + 2)
        i = nextOpen(selfEnd + 2)
      } else if (close >= 0) {
        out += xml.substring(i, close + tag.length + 3)
        i = nextOpen(close + tag.length + 3)
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
