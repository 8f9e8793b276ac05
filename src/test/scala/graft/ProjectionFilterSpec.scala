package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.{Catalog => GCatalog, PartitionProjection => PP}
import graft.io.DatasetWriter
import graft.ops.{DataQuality, MetadataFilter}

/** Specs for metadata-filter compilation, partition projection,
  * recommendation rulesets, and DDL generation. */
class ProjectionFilterSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-pf").toString

  test("mongo-style metadata filter compiles operator trees") {
    val cust = Tables.customer(spark, sf)
    val f = MetadataFilter.compile(Map(
      "$and" -> Seq(
        Map("c_mktsegment" -> Map("$in" -> Seq("BUILDING", "MACHINERY"))),
        Map("c_acctbal" -> Map("$gte" -> 0.0, "$lt" -> 5000.0)))))
    val got = cust.filter(f)
    val manual = cust.filter(
      col("c_mktsegment").isin("BUILDING", "MACHINERY") &&
        col("c_acctbal") >= 0.0 && col("c_acctbal") < 5000.0)
    assert(got.count() == manual.count() && got.count() > 0)

    // $or / $ne / $exists / literal-equality forms
    val f2 = MetadataFilter.compile(Map(
      "$or" -> Seq(
        Map("c_nationkey" -> 3),
        Map("c_name" -> Map("$exists" -> false)))))
    assert(cust.filter(f2).count() ==
      cust.filter(col("c_nationkey") === 3 || col("c_name").isNull).count())
    intercept[IllegalArgumentException](
      MetadataFilter.compile(Map("x" -> Map("$regex" -> "a"))))
  }

  test("partition projection reads computed paths without listing") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    val df = Seq((1L, "2024-01-01", "a"), (2L, "2024-01-02", "a"),
      (3L, "2024-01-03", "b")).toDF("id", "day", "tag")
    DatasetWriter.toParquet(df, dir, mode = DatasetWriter.Overwrite,
      partitionCols = Seq("day", "tag"))
    val got = PP.readProjected(spark, dir,
      projections = Seq(
        "day" -> PP.DateProjection("2024-01-01", "2024-01-05"),
        "tag" -> PP.EnumProjection(Seq("a", "b"))),
      prune = Map("day" -> (d => d <= "2024-01-02")))
    // day pruned to 01..02; missing projected dirs tolerated
    assert(got.select("id").as[Long].collect().toSet == Set(1L, 2L))
    // integer projection with digit padding
    assert(PP.IntegerProjection(1, 12, digits = 2).values.head == "01")
  }

  test("recommendation ruleset profiles and passes on its own table") {
    val li = Tables.lineitem(spark, sf)
    val rules = DataQuality.recommendRuleset(li)
    assert(rules.exists(_.name == "row_count"))
    assert(rules.exists(_.name.startsWith("completeness_")))
    assert(rules.exists(_.name.startsWith("min_")))
    // a recommended ruleset must hold on the table it was profiled from
    val res = DataQuality.evaluate(li, rules).collect()
    assert(res.nonEmpty && res.forall(_.getAs[Boolean]("passed")),
      res.filterNot(_.getAs[Boolean]("passed")).mkString(","))
  }

  test("generateCreateQuery renders DDL; showCreateTable round-trips") {
    val ddl = GCatalog.generateCreateQuery("db.t",
      columns = Seq("id" -> "bigint", "v" -> "array<double>"),
      partitionCols = Seq("day" -> "string"),
      location = "/data/t")
    assert(ddl.contains("`id` BIGINT"))
    assert(ddl.contains("`v` ARRAY<DOUBLE>"))
    assert(ddl.contains("PARTITIONED BY (`day`)"))
    assert(ddl.contains("LOCATION '/data/t'"))

    val dir = tmp()
    val spark0 = spark
    import spark0.implicits._
    DatasetWriter.toParquet(Seq((1L, "x")).toDF("id", "v"), dir,
      mode = DatasetWriter.Overwrite)
    GCatalog.createParquetTable(spark, "sct_t", dir,
      columns = Seq("id" -> "bigint", "v" -> "string"))
    assert(GCatalog.showCreateTable(spark, "sct_t")
      .toLowerCase.contains("create table"))
    GCatalog.deleteTable(spark, "sct_t")
  }
}
