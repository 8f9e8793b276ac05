package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.ExcelIO

/** Excel single-object round-trip (reference `s3.to_excel`/`read_excel`
  * path) with the self-contained OOXML implementation, plus CTAS/UNLOAD
  * coverage. */
class ExcelSpec extends AnyFunSuite {
  import TestSpark._

  test("xlsx round-trip: header, values, nulls, escaping") {
    val spark0 = spark
    import spark0.implicits._
    val path = Files.createTempDirectory("graft-xl").toString + "/t.xlsx"
    val df = Seq(
      (1L, "alice & bob", Some(3.5)),
      (2L, "<tag>", None),
      (3L, "plain", Some(2.0)))
      .toDF("id", "name", "score")
    ExcelIO.toExcel(df, path)
    val back = ExcelIO.readExcel(spark, path)
    assert(back.columns.toSeq == Seq("id", "name", "score"))
    val rows = back.collect().map(r =>
      (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(rows == Set(
      ("1", "alice & bob", Some("3.5")),
      ("2", "<tag>", None),
      ("3", "plain", Some("2.0"))))
  }

  test("xlsx multi-sheet: sheet_name routing, list_sheets, missing sheet raises") {
    val spark0 = spark
    import spark0.implicits._
    val path = Files.createTempDirectory("graft-xl3").toString + "/t.xlsx"
    ExcelIO.toExcelSheets(Seq(
      "people" -> Seq((1L, "alice"), (2L, "bob")).toDF("id", "name"),
      "pets" -> Seq(("rex", "dog")).toDF("pet", "kind"),
      "empty-ish" -> Seq(("x")).toDF("only")), path)
    assert(ExcelIO.listSheets(path) == Seq("people", "pets", "empty-ish"))
    // default = first sheet
    assert(ExcelIO.readExcel(spark, path).columns.toSeq == Seq("id", "name"))
    val pets = ExcelIO.readExcel(spark, path, sheetName = Some("pets"))
    assert(pets.columns.toSeq == Seq("pet", "kind") && pets.count() == 1)
    assert(ExcelIO.readExcel(spark, path, sheetName = Some("empty-ish"))
      .collect().map(_.getString(0)).toSeq == Seq("x"))
    val ex = intercept[IllegalArgumentException] {
      ExcelIO.readExcel(spark, path, sheetName = Some("nope"))
    }
    assert(ex.getMessage.contains("people"))
  }

  test("xlsx header=false and skiprows behave like the pandas kwargs") {
    val spark0 = spark
    import spark0.implicits._
    val path = Files.createTempDirectory("graft-xl4").toString + "/t.xlsx"
    val df = Seq(("a", "1"), ("b", "2"), ("c", "3")).toDF("k", "v")
    ExcelIO.toExcel(df, path)
    // header=false: the header row comes back as DATA with _cN names
    val raw = ExcelIO.readExcel(spark, path, header = false)
    assert(raw.columns.toSeq == Seq("_c0", "_c1") && raw.count() == 4)
    assert(raw.collect().map(_.getString(0)).toSet == Set("k", "a", "b", "c"))
    // skiprows drops leading rows BEFORE the header is taken
    val skipped = ExcelIO.readExcel(spark, path, skipRows = 1)
    assert(skipped.columns.toSeq == Seq("a", "1") && skipped.count() == 2)
    // header=false write: no header row lands in the file
    val path2 = Files.createTempDirectory("graft-xl5").toString + "/t.xlsx"
    ExcelIO.toExcel(df, path2, header = false)
    assert(ExcelIO.readExcel(spark, path2, header = false).count() == 3)
  }

  test("ctas and unload execute through the engine") {
    Tables.registerAll(spark, sf)
    graft.sql.SqlEngine.createCtasTable(spark, "ctas_t",
      "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1")
    assert(spark.table("ctas_t").count() == 3)
    spark.sql("DROP TABLE ctas_t")

    val out = Files.createTempDirectory("graft-unload").toString + "/out"
    graft.sql.SqlEngine.unload(spark,
      "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1",
      out, partitionedBy = Seq("o_orderstatus"))
    val back = spark.read.option("basePath", out).parquet(out)
    assert(back.count() == 3)
    assert(new java.io.File(out).listFiles()
      .exists(_.getName.startsWith("o_orderstatus=")))
  }
}
