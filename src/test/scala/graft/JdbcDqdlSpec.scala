package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.jdbc.JdbcOps
import graft.ops.DataQuality

/** JDBC surface against embedded Derby (the engine-agnostic stand-in for
  * the reference's postgres/mysql/redshift targets) + DQDL parsing. */
class JdbcDqdlSpec extends AnyFunSuite {
  import TestSpark._

  private val url =
    s"jdbc:derby:memory:graftdb;create=true"

  test("jdbc to_sql append + read_sql_query round-trip") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, "alice", 10.5), (2L, "bob", 20.0))
      .toDF("id", "name", "score")
    JdbcOps.toSql(df, url, "people", mode = "append")
    // Spark's JDBC writer creates quoted (case-sensitive) columns
    val back = JdbcOps.readSqlQuery(spark, url,
      """SELECT "id", "name", "score" FROM people WHERE "score" > 15""")
    val rows = back.collect()
    assert(rows.length == 1 && rows.head.getString(1) == "bob")
    // read_sql_table with range partitioning fans out over 2 queries
    val tbl = JdbcOps.readSqlTable(spark, url, "people",
      partitionColumn = Some("id"), lowerBound = Some(0L),
      upperBound = Some(3L), numPartitions = 2)
    assert(tbl.rdd.getNumPartitions == 2)
    assert(tbl.count() == 2)
  }

  test("jdbc to_sql upsert merges on keys via staged MERGE") {
    val spark0 = spark
    import spark0.implicits._
    JdbcOps.toSql(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), url, "kv")
    JdbcOps.toSql(Seq((2L, "B2"), (3L, "c")).toDF("k", "v"), url, "kv",
      mode = "upsert", upsertKeys = Seq("k"))
    val got = JdbcOps.readSqlQuery(spark, url,
      """SELECT "k", "v" FROM kv""")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "B2"), (3L, "c")))
  }

  test("DQDL document parses and evaluates") {
    val rules = DataQuality.parseRuleset(
      """Rules = [
        |  RowCount > 1000,
        |  Completeness "l_shipdate" >= 1.0,
        |  Uniqueness "l_orderkey" >= 0.05,
        |  ColumnValues "l_quantity" >= 1.0,
        |  ColumnValues "l_discount" <= 0.5
        |]""".stripMargin)
    assert(rules.length == 5)
    val res = DataQuality.evaluate(Tables.lineitem(spark, sf), rules)
      .collect()
    assert(res.length == 5 && res.forall(_.getAs[Boolean]("passed")))
    intercept[IllegalArgumentException](
      DataQuality.parseRuleset("Rules = [ Nonsense \"x\" > 1 ]"))
  }

  test("DQDL set, regex and IsComplete rules") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("F", "1-URGENT", "a"), ("O", "5-LOW", "b"),
      ("X", "9-BAD", null)).toDF("status", "prio", "v")
    val rules = DataQuality.parseRuleset(
      """Rules = [
        |  IsComplete "status",
        |  IsComplete "v",
        |  ColumnValues "status" in ["F", "O"],
        |  ColumnValues "prio" matches "^[1-5]-[A-Z]+"
        |]""".stripMargin)
    assert(rules.length == 4, "in-set commas must not split the rule list")
    val res = DataQuality.evaluate(df, rules)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2)))
      .toMap
    assert(res("is_complete_status") == ((1.0, true)))
    assert(res("is_complete_v")._2 == false)
    // 2 of 3 in set; 2 of 3 match the regex — metrics are fractions
    assert(math.abs(res("in_set_status")._1 - 2.0 / 3) < 1e-9 &&
      !res("in_set_status")._2)
    assert(math.abs(res("matches_prio")._1 - 2.0 / 3) < 1e-9 &&
      !res("matches_prio")._2)
    // all-conforming data passes
    val ok = DataQuality.evaluate(
      Seq(("F", "3-MEDIUM", "x")).toDF("status", "prio", "v"), rules).collect()
    assert(ok.forall(_.getAs[Boolean]("passed")))
  }

  test("DQDL round-12 rule types: Mean/StandardDeviation/Sum/ColumnLength/DistinctValuesCount") {
    val spark0 = spark
    import spark0.implicits._
    // values 2, 4, 6: mean 4, population stddev sqrt(8/3), sum 12
    val df = Seq((2.0, "aa"), (4.0, "bbb"), (6.0, "aa"))
      .toDF("x", "tag")
    val rules = DataQuality.parseRuleset(
      """Rules = [
        |  Mean "x" > 3.5,
        |  StandardDeviation "x" < 2,
        |  Sum "x" = 12,
        |  ColumnLength "tag" <= 3,
        |  DistinctValuesCount "tag" = 2
        |]""".stripMargin)
    assert(rules.length == 5)
    val res = DataQuality.evaluate(df, rules)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap
    assert(res("mean_x") == ((4.0, true)))
    val stddev = res("stddev_x")
    // the metric is rounded to 6 dp (cross-engine decimal→double, see
    // Rules.stddevRule)
    assert(math.abs(stddev._1 - math.sqrt(8.0 / 3)) < 1e-6 && stddev._2)
    assert(res("sum_x") == ((12.0, true)))
    assert(res("length_tag") == ((1.0, true)))
    assert(res("distinct_count_tag")._2)
    // comparator edges: = fails off the exact value; < is strict
    val strict = DataQuality.evaluate(df, DataQuality.parseRuleset(
      """Rules = [ Mean "x" = 4, Mean "x" < 4 ]""")
      .zipWithIndex.map { case (r, i) => r.copy(name = s"${r.name}_$i") })
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(strict("mean_x_0") && !strict("mean_x_1"))
    // ColumnLength = on mixed lengths is the conforming fraction
    val frac = DataQuality.evaluate(df, DataQuality.parseRuleset(
      """Rules = [ ColumnLength "tag" = 2 ]""")).collect().head
    assert(math.abs(frac.getDouble(1) - 2.0 / 3) < 1e-9 && !frac.getBoolean(2))
    // nulls fail ColumnLength (DQDL default NullBehavior)
    val withNull = DataQuality.evaluate(
      Seq(Some("aa"), None).map(Tuple1(_)).toDF("tag"),
      DataQuality.parseRuleset("""Rules = [ ColumnLength "tag" <= 3 ]"""))
      .collect()
    assert(withNull.head.getDouble(1) == 0.5 && !withNull.head.getBoolean(2))
  }
}
