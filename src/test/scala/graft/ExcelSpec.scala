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
