package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.{SqlEngine, TrinoCompat}

/** The Trino-dialect shim, gated by a corpus of reference-shaped
  * statements: the parameter renderer's generated syntax
  * (`_sql_formatter.py:50-67` — `ARRAY [...]`,
  * `MAP(ARRAY [...], ARRAY [...])`, `DECIMAL '12.03'`, the
  * `test_sql_params_formatter.py:40-43` vectors) plus the Trino-only
  * functions an Athena user types (`approx_distinct`, string-unit
  * `date_diff`/`date_add`, `TRY`, `UNNEST … WITH ORDINALITY`,
  * subscripts). Every test compares against the equivalent native
  * Spark formulation or a hand-computed expectation. */
class TrinoCompatSpec extends AnyFunSuite {
  import TestSpark._

  private def one(sql: String): Row =
    SqlEngine.readSqlQuery(spark, sql).head()

  private def rows(sql: String): Seq[Row] =
    SqlEngine.readSqlQuery(spark, sql).collect().toSeq

  // ---- ARRAY constructor + subscripts -------------------------------------

  test("ARRAY [..] constructor (renderer shape, with the space)") {
    assert(one("SELECT ARRAY [1, 2, 3] AS a").getSeq[Int](0) == Seq(1, 2, 3))
    assert(one("SELECT ARRAY['a','b'] AS a").getSeq[String](0) == Seq("a", "b"))
  }

  test("nested ARRAY constructors") {
    val r = one("SELECT ARRAY [ARRAY [1], ARRAY [2, 3]] AS a")
    assert(r.getSeq[scala.collection.Seq[Int]](0).map(_.toSeq) ==
      Seq(Seq(1), Seq(2, 3)))
  }

  test("subscripts are 1-based (Trino), not 0-based (Spark)") {
    assert(one("SELECT ARRAY [10, 20, 30][1] AS x").getInt(0) == 10)
    assert(one("SELECT ARRAY [10, 20, 30][3] AS x").getInt(0) == 30)
    // subscript over a column, qualified base
    val r = rows(
      "SELECT t.arr[2] AS x FROM (SELECT ARRAY [5, 6, 7] AS arr) t")
    assert(r.map(_.getInt(0)) == Seq(6))
  }

  test("map subscript is key lookup") {
    assert(one(
      "SELECT MAP(ARRAY ['a', 'b'], ARRAY [1, 2])['b'] AS v").getInt(0) == 2)
  }

  // ---- MAP constructors ----------------------------------------------------

  test("MAP(ARRAY [..], ARRAY [..]) — the exact renderer shape") {
    val r = one(
      "SELECT MAP(ARRAY ['int', 'date'], ARRAY [4, 5]) AS m")
    assert(r.getMap[String, Int](0) == Map("int" -> 4, "date" -> 5))
  }

  test("MAP() empty constructor") {
    assert(one("SELECT MAP() AS m").getMap[String, String](0).isEmpty)
  }

  test("Spark's own map(k, v) is NOT rewritten") {
    assert(one("SELECT map('k', 7) AS m").getMap[String, Int](0) ==
      Map("k" -> 7))
  }

  // ---- DECIMAL literals ----------------------------------------------------

  test("DECIMAL 'x.yz' literal infers precision/scale from the text") {
    val df = SqlEngine.readSqlQuery(spark, "SELECT DECIMAL '12.03' AS d")
    assert(df.schema("d").dataType.simpleString == "decimal(4,2)")
    assert(df.head().getDecimal(0) == new java.math.BigDecimal("12.03"))
    assert(one("SELECT DECIMAL '33.33' + 1 AS d").getDecimal(0)
      == new java.math.BigDecimal("34.33"))
    // CAST(x AS DECIMAL(10,2)) must be untouched
    assert(one("SELECT CAST(5 AS DECIMAL(10,2)) AS d").getDecimal(0)
      == new java.math.BigDecimal("5.00"))
  }

  // ---- date_diff / date_add ------------------------------------------------

  test("date_diff: Trino string-unit argument order (from, to)") {
    assert(one("SELECT date_diff('day', DATE '2020-01-01', DATE '2020-03-01') AS d")
      .getLong(0) == 60L)
    assert(one(
      "SELECT date_diff('hour', TIMESTAMP '2023-01-01 00:00:00', TIMESTAMP '2023-01-02 06:30:00') AS d")
      .getLong(0) == 30L)
    // negative when from > to, exactly as Trino
    assert(one("SELECT date_diff('day', DATE '2020-03-01', DATE '2020-01-01') AS d")
      .getLong(0) == -60L)
  }

  test("date_diff: 2-arg call keeps Spark builtin semantics (end, start)") {
    assert(one("SELECT date_diff(DATE '2020-01-03', DATE '2020-01-01') AS d")
      .getInt(0) == 2)
  }

  test("date_add: Trino string-unit form and 2-arg Spark form") {
    assert(one("SELECT CAST(date_add('day', 3, DATE '2020-01-01') AS DATE) AS d")
      .getDate(0).toString == "2020-01-04")
    assert(one("SELECT date_add('month', -1, TIMESTAMP '2020-03-15 10:00:00') AS d")
      .getTimestamp(0).toString.startsWith("2020-02-15 10:00:00"))
    assert(one("SELECT date_add(DATE '2020-01-01', 3) AS d")
      .getDate(0).toString == "2020-01-04")
  }

  // ---- TRY -----------------------------------------------------------------

  test("TRY returns NULL on runtime error") {
    assert(one("SELECT TRY(1/0) AS v").isNullAt(0))
    assert(one("SELECT TRY(CAST('nope' AS INT)) AS v").isNullAt(0))
    assert(one("SELECT TRY(1 + 1) AS v").getInt(0) == 2)
  }

  // ---- approx_distinct -----------------------------------------------------

  test("approx_distinct tracks exact NDV within the error bound") {
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
    val approx = one("SELECT approx_distinct(l_orderkey) AS n FROM lineitem")
      .getLong(0)
    val exact = one("SELECT count(DISTINCT l_orderkey) AS n FROM lineitem")
      .getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx $approx vs exact $exact")
  }

  // ---- aliases -------------------------------------------------------------

  test("strpos / arbitrary / json_extract_scalar / bare VARCHAR") {
    assert(one("SELECT strpos('hello', 'll') AS p").getInt(0) == 3)
    assert(one("SELECT strpos('hello', 'zz') AS p").getInt(0) == 0)
    assert(one("SELECT arbitrary(x) AS v FROM (SELECT 9 AS x)").getInt(0) == 9)
    // non-null value preferred (Trino contract)
    assert(one(
      """SELECT arbitrary(x) AS v FROM
        |  (SELECT CAST(NULL AS INT) AS x, 1 AS o
        |   UNION ALL SELECT 5, 2 ORDER BY o)""".stripMargin).getInt(0) == 5)
    assert(one(
      """SELECT json_extract_scalar('{"a": {"b": 7}}', '$.a.b') AS v""")
      .getString(0) == "7")
    assert(one("SELECT CAST(5 AS VARCHAR) AS v").getString(0) == "5")
    // CAST to VARCHAR(n) truncates, Trino-exact (closed r12: the shim
    // rewrites it to an explicit substring — Spark's own varchar cast
    // keeps the full string)
    assert(one("SELECT CAST('abcdef' AS VARCHAR(3)) AS v")
      .getString(0) == "abc")
    assert(one("SELECT TRY_CAST('abcdef' AS VARCHAR(4)) AS v")
      .getString(0) == "abcd")
    assert(one("SELECT CAST('ab' AS VARCHAR(5)) AS v").getString(0) == "ab")
  }

  // ---- UNNEST --------------------------------------------------------------

  test("CROSS JOIN UNNEST of an array") {
    val r = rows(
      """SELECT x FROM (SELECT ARRAY [10, 20, 30] AS arr) t
        |CROSS JOIN UNNEST(t.arr) AS u (x)""".stripMargin)
    assert(r.map(_.getInt(0)) == Seq(10, 20, 30))
  }

  test("comma-join UNNEST of a map yields (key, value)") {
    val r = rows(
      """SELECT k, v FROM (SELECT MAP(ARRAY ['a','b'], ARRAY [1,2]) AS m) t,
        |UNNEST(t.m) AS u (k, v)""".stripMargin)
    assert(r.map(x => (x.getString(0), x.getInt(1))).sorted ==
      Seq(("a", 1), ("b", 2)))
  }

  test("UNNEST WITH ORDINALITY is 1-based with ordinality last") {
    val r = rows(
      """SELECT x, ord FROM (SELECT ARRAY ['p','q','r'] AS arr) t
        |CROSS JOIN UNNEST(t.arr) WITH ORDINALITY AS u (x, ord)""".stripMargin)
    assert(r.map(x => (x.getString(0), x.getInt(1))) ==
      Seq(("p", 1), ("q", 2), ("r", 3)))
  }

  test("UNNEST WITH ORDINALITY: empty array yields zero rows, null yields zero rows") {
    val empty = rows(
      """SELECT x, ord FROM (SELECT ARRAY [1][1] AS probe, array() AS arr) t
        |CROSS JOIN UNNEST(CAST(t.arr AS ARRAY<INT>)) WITH ORDINALITY AS u (x, ord)""".stripMargin)
    assert(empty.isEmpty)
    val nul = rows(
      """SELECT x, ord FROM (SELECT CAST(NULL AS ARRAY<INT>) AS arr) t
        |CROSS JOIN UNNEST(t.arr) WITH ORDINALITY AS u (x, ord)""".stripMargin)
    assert(nul.isEmpty)
  }

  test("multi-array UNNEST zips with null padding (Trino semantics)") {
    val r = rows(
      """SELECT x, y FROM (SELECT ARRAY [1, 2, 3] AS a, ARRAY ['u','v'] AS b) t
        |CROSS JOIN UNNEST(t.a, t.b) AS u (x, y)""".stripMargin)
    assert(r.map(x => (x.getInt(0), if (x.isNullAt(1)) null else x.getString(1)))
      == Seq((1, "u"), (2, "v"), (3, null)))
  }

  test("multi-array UNNEST WITH ORDINALITY") {
    val r = rows(
      """SELECT x, y, ord FROM (SELECT ARRAY [1] AS a, ARRAY ['u','v'] AS b) t
        |CROSS JOIN UNNEST(t.a, t.b) WITH ORDINALITY AS u (x, y, ord)""".stripMargin)
    assert(r.map(x => (if (x.isNullAt(0)) null else x.getInt(0),
      x.getString(1), x.getInt(2))) == Seq((1, "u", 1), (null, "v", 2)))
  }

  test("UNNEST without a column alias list raises loudly") {
    val e = intercept[IllegalArgumentException] {
      SqlEngine.readSqlQuery(spark,
        "SELECT 1 FROM (SELECT ARRAY [1] AS a) t CROSS JOIN UNNEST(t.a)")
    }
    assert(e.getMessage.contains("UNNEST"))
  }

  // ---- rewrite hygiene -----------------------------------------------------

  test("rewrite leaves string literals untouched") {
    assert(one("SELECT 'ARRAY [1]' AS s").getString(0) == "ARRAY [1]")
    assert(one("SELECT 'TRY(x)' AS s").getString(0) == "TRY(x)")
    assert(one("SELECT 'DECIMAL ''1.5''' AS s").getString(0) == "DECIMAL '1.5'")
  }

  test("rewrite is a no-op on plain Spark SQL") {
    val sql = """SELECT l_returnflag, sum(l_quantity) AS q
                |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
    assert(TrinoCompat.rewrite(sql) == sql)
  }

  // ---- ROW constructors and ROW-type casts (test_athena.py:1226,2127) -----

  test("CAST(ROW(..) AS ROW(..)) assigns the Trino field names") {
    val r = one(
      "SELECT CAST(ROW(1, 'foo') AS ROW(id BIGINT, value VARCHAR)) AS col0")
    val s = r.getStruct(0)
    assert(s.schema.fieldNames.toSeq == Seq("id", "value"))
    assert(s.getLong(0) == 1L && s.getString(1) == "foo")
  }

  test("nested ROW cast (the test_athena.py:2127 shape)") {
    val r = one(
      "SELECT CAST(" +
        "    ROW(1, ROW(2, ROW(3, '4'))) AS" +
        "    ROW(field0 BIGINT, field1 ROW(field2 BIGINT, field3 ROW(field4 BIGINT, field5 VARCHAR)))" +
        ") AS col0")
    val s = r.getStruct(0)
    assert(s.getLong(0) == 1L)
    val f1 = s.getStruct(1)
    assert(f1.getLong(0) == 2L)
    val f3 = f1.getStruct(1)
    assert(f3.getLong(0) == 3L && f3.getString(1) == "4")
  }

  test("row field access after a cast; ARRAY/MAP type targets") {
    assert(one(
      "SELECT CAST(ROW(7, 'x') AS ROW(k BIGINT, s VARCHAR)).k AS k").getLong(0) == 7L)
    assert(one("SELECT CAST(ARRAY[1, 2] AS ARRAY(BIGINT))[2] AS x").getLong(0) == 2L)
    assert(one(
      "SELECT CAST(MAP(ARRAY['a'], ARRAY[1]) AS MAP(VARCHAR, BIGINT))['a'] AS x")
      .getLong(0) == 1L)
  }

  // ---- CAST(.. AS JSON) (test_athena.py:1135-1152) ------------------------

  test("CAST AS JSON renders scalars and maps as JSON text") {
    // the exact expectations of test_athena_read_json
    val r = one(
      """WITH dataset AS (
        |SELECT
        |    CAST('HELLO ATHENA' AS JSON) AS some_str,
        |    CAST(12345 AS JSON) AS some_int,
        |    CAST(MAP(ARRAY['a', 'b'], ARRAY[1,2]) AS JSON) AS some_map
        |)
        |SELECT * FROM dataset""".stripMargin)
    assert(r.getString(0) == "\"HELLO ATHENA\"")
    assert(r.getString(1) == "12345")
    assert(r.getString(2) == """{"a":1,"b":2}""")
  }

  test("CAST AS JSON: escaping, null, TRY_CAST form") {
    assert(one("""SELECT CAST('say "hi"' AS JSON) AS j""").getString(0) ==
      """"say \"hi\""""")
    assert(one("SELECT CAST(CAST(NULL AS BIGINT) AS JSON) AS j").isNullAt(0))
    assert(one("SELECT TRY_CAST(ARRAY[1, 2] AS JSON) AS j").getString(0) ==
      "[1,2]")
    // json_format/json_parse compose as identities over the text model
    assert(one("""SELECT json_format(json_parse('{"a":1}')) AS j""")
      .getString(0) == """{"a":1}""")
  }

  // ---- numeric specials (test_athena.py:1122,1550) ------------------------

  test("nan()/infinity() and the is_* predicates") {
    val r = one(
      "SELECT nan() AS nan, infinity() AS inf, -infinity() AS inf_n, 1.2 AS regular")
    assert(r.getDouble(0).isNaN)
    assert(r.getDouble(1).isPosInfinity && r.getDouble(2).isNegInfinity)
    // Spark types the bare literal DECIMAL(2,1) where Athena v2 used
    // DOUBLE — value equality is what the reference asserts
    assert(r.getAs[Any](3).toString.toDouble == 1.2)
    val p = one(
      "SELECT is_nan(nan()) AS a, is_infinite(-infinity()) AS b, " +
        "is_finite(1.5) AS c, is_finite(infinity()) AS d, is_nan(1.0) AS e")
    assert(p.getBoolean(0) && p.getBoolean(1) && p.getBoolean(2))
    assert(!p.getBoolean(3) && !p.getBoolean(4))
  }

  test("random(n): integer in [0, n); non-positive bound fails the query") {
    val draws = rows("SELECT random(10) AS r FROM range(200)")
      .map(_.getLong(0))
    assert(draws.forall(d => d >= 0 && d < 10))
    assert(draws.distinct.size > 1)
    // test_athena.py:1122 runs SELECT random(-1) and expects QueryFailed
    val e = intercept[Exception](one("SELECT random(-1) AS r"))
    assert(e.getMessage != null)
  }

  // ---- date/time semantics ------------------------------------------------

  test("day_of_week is ISO (Monday=1); doy/week match Trino") {
    // 2026-08-10 is a Monday
    val r = one(
      "SELECT day_of_week(DATE '2026-08-10') AS dw1, " +
        "dow(DATE '2026-08-16') AS dw7, " +
        "day_of_year(DATE '2026-02-01') AS doy, " +
        "week(DATE '2026-01-08') AS wk")
    assert(r.getInt(0) == 1)
    assert(r.getInt(1) == 7)
    assert(r.getInt(2) == 32)
    assert(r.getInt(3) == 2)
  }

  test("to_unixtime is fractional; from_unixtime returns a timestamp") {
    val r = one(
      "SELECT to_unixtime(TIMESTAMP '1970-01-01 00:00:01.5') AS u, " +
        "CAST(from_unixtime(86400) AS STRING) AS t")
    assert(r.getDouble(0) == 1.5)
    assert(r.getString(1) == "1970-01-02 00:00:00")
  }

  test("date_parse / %-form date_format use MySQL specifiers") {
    val r = one(
      "SELECT CAST(date_parse('2026-08-14 13:24:11', '%Y-%m-%d %H:%i:%s') AS STRING) AS p, " +
        "date_format(TIMESTAMP '2026-08-14 13:24:11', '%Y/%m/%d %T') AS f, " +
        "date_format(TIMESTAMP '2026-08-14 13:24:11', 'yyyy-MM') AS spark_form")
    assert(r.getString(0) == "2026-08-14 13:24:11")
    assert(r.getString(1) == "2026/08/14 13:24:11")
    assert(r.getString(2) == "2026-08")
  }

  test("mysqlToJava quotes literal letters and keeps %%") {
    assert(TrinoCompat.mysqlToJava("%Y-%m-%dT%H:%i:%s") ==
      "yyyy-MM-dd'T'HH:mm:ss")
    assert(TrinoCompat.mysqlToJava("%d%%") == "dd'%'")
    intercept[IllegalArgumentException](TrinoCompat.mysqlToJava("%Q"))
  }

  // ---- strings / binary / URL ---------------------------------------------

  test("codepoint, levenshtein_distance, hex/base64, varbinary sha256") {
    val r = one(
      "SELECT codepoint('A') AS cp, " +
        "levenshtein_distance('kitten', 'sitting') AS lev, " +
        "to_hex(CAST('AB' AS VARBINARY)) AS hx, " +
        "CAST(from_hex('4142') AS STRING) AS unhx, " +
        "to_base64(CAST('hi' AS VARBINARY)) AS b64, " +
        "to_hex(sha256(CAST('' AS VARBINARY))) AS sha")
    assert(r.getInt(0) == 65)
    assert(r.getInt(1) == 3)
    assert(r.getString(2) == "4142" && r.getString(3) == "AB")
    assert(r.getString(4) == "aGk=")
    // SHA-256 of the empty string, the classic vector
    assert(r.getString(5) ==
      "E3B0C44298FC1C149AFBF4C8996FB92427AE41E4649B934CA495991B7852B855")
  }

  test("contains dispatches: Trino array form AND Spark string form") {
    val r = one(
      "SELECT contains(ARRAY[1, 2, 3], 2) AS arr_yes, " +
        "contains(ARRAY[1, 2, 3], 9) AS arr_no, " +
        "contains('hello', 'ell') AS str_yes")
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2))
  }

  test("url_extract_* family decomposes a URL") {
    val u = "'https://host.example.com:8042/over/there?name=ferret&x=1#nose'"
    val r = one(
      s"SELECT url_extract_protocol($u) AS proto, url_extract_host($u) AS host, " +
        s"url_extract_port($u) AS port, url_extract_path($u) AS path, " +
        s"url_extract_query($u) AS q, url_extract_fragment($u) AS frag, " +
        s"url_extract_parameter($u, 'name') AS p")
    assert(r.getString(0) == "https")
    assert(r.getString(1) == "host.example.com")
    assert(r.getLong(2) == 8042L)
    assert(r.getString(3) == "/over/there")
    assert(r.getString(4) == "name=ferret&x=1")
    assert(r.getString(5) == "nose")
    assert(r.getString(6) == "ferret")
  }

  test("TIME literal parses natively (test_athena.py:1283)") {
    // Spark 4.1 has TimeType — the Trino literal needs no rewrite (row
    // encoding of a raw TIME column is still gated, so surface it as
    // text, which is also what the reference's non-arrow path returns)
    val df = SqlEngine.readSqlQuery(spark, "SELECT time '13:24:11' as col")
    // exact TIME type, not the "time"-prefixed typeName of TIMESTAMP
    assert(df.schema.head.dataType.typeName.matches("time(\\(\\d+\\))?"),
      df.schema.head.dataType.typeName)
    assert(one("SELECT CAST(time '13:24:11' AS VARCHAR) AS col")
      .getString(0) == "13:24:11")
  }

  // ---- geospatial (test_athena_geospatial.py:11-17) -----------------------

  test("ST_ functions produce WKT (the geometry model of the catalog)") {
    val r = one(
      "SELECT ST_Point(-121.7602, 46.8527) AS point, " +
        "ST_LineFromText('LINESTRING(1 2, 3 4)') AS line, " +
        "ST_Polygon('POLYGON ((1 1, 1 4, 4 4, 4 1))') AS polygon, " +
        "ST_AsText(ST_GeometryFromText('POLYGON EMPTY')) AS polygon_empty")
    assert(r.getString(0) == "POINT (-121.7602 46.8527)")
    assert(r.getString(1) == "LINESTRING(1 2, 3 4)")
    assert(r.getString(2) == "POLYGON ((1 1, 1 4, 4 4, 4 1))")
    assert(r.getString(3) == "POLYGON EMPTY")
  }

  // ---- lexical robustness: comments, in-literal matches -------------------

  test("a comment containing an apostrophe does not derail the rewrite") {
    // the quote in "user's" sits in a comment; the 1-based subscript
    // AFTER it must still translate
    val r = one(
      "SELECT -- user's pick\n ARRAY[10, 20, 30][2] AS x")
    assert(r.getInt(0) == 20)
    val b = one(
      "SELECT /* isn't /* nested */ bad */ ARRAY[7, 8][1] AS x")
    assert(b.getInt(0) == 7)
    // comments inside string literals are DATA, untouched
    assert(one("SELECT '-- not a comment' AS s").getString(0) ==
      "-- not a comment")
  }

  test("an UNNEST inside a string literal does not mask a real UNNEST") {
    val r = rows(
      "SELECT 'cross join unnest(' AS note, u.x FROM (SELECT ARRAY[1, 2] AS a) t " +
        "CROSS JOIN UNNEST(t.a) AS u (x)")
    assert(r.map(_.getInt(1)) == Seq(1, 2))
  }

  test("multi-array UNNEST null-pads a NULL argument (Trino zip)") {
    val r = rows(
      "SELECT u.x, u.y FROM (SELECT CAST(NULL AS ARRAY(BIGINT)) AS a, " +
        "ARRAY[1, 2] AS b) t CROSS JOIN UNNEST(t.a, t.b) AS u (x, y)")
    assert(r.size == 2)
    assert(r.forall(_.isNullAt(0)))
    assert(r.map(_.getInt(1)) == Seq(1, 2))
    // ... and WITH ORDINALITY keeps 1-based positions over the pad
    val o = rows(
      "SELECT u.x, u.y, u.ord FROM (SELECT CAST(NULL AS ARRAY(BIGINT)) AS a, " +
        "ARRAY[5] AS b) t CROSS JOIN UNNEST(t.a, t.b) WITH ORDINALITY AS u (x, y, ord)")
    assert(o.size == 1 && o.head.isNullAt(0) && o.head.getInt(1) == 5)
    assert(o.head.getInt(2) == 1)
  }

  // ---- Athena CTAS / UNLOAD statements through the front door -------------

  test("Athena-shaped CTAS statement executes through executeSql") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ctas").toString
    spark.sql("DROP TABLE IF EXISTS ctas_front_t")
    val res = SqlEngine.executeSql(spark,
      s"""CREATE TABLE ctas_front_t
         |WITH(
         |    external_location = '$dir/ctas_front_t',
         |    partitioned_by = ARRAY['flag'],
         |    write_compression = 'SNAPPY',
         |    format = 'PARQUET'
         |)
         |AS SELECT id, CASE WHEN id % 2 = 0 THEN 'e' ELSE 'o' END AS flag
         |   FROM range(10)""".stripMargin)
    assert(res.head().getString(0) == "CTAS")
    assert(spark.table("ctas_front_t").count() == 10)
    assert(new java.io.File(s"$dir/ctas_front_t").listFiles()
      .exists(_.getName.startsWith("flag=")))
    spark.sql("DROP TABLE ctas_front_t")
  }

  test("CTAS WITH NO DATA registers the schema with zero rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ctas0").toString
    spark.sql("DROP TABLE IF EXISTS ctas_nodata_t")
    SqlEngine.executeSql(spark,
      s"""CREATE TABLE ctas_nodata_t
         |WITH(
         |    external_location = '$dir/t',
         |    format = 'PARQUET')
         |AS SELECT id, id * 2 AS dbl FROM range(7)
         |WITH NO DATA""".stripMargin)
    assert(spark.table("ctas_nodata_t").count() == 0)
    assert(spark.table("ctas_nodata_t").columns.toSeq == Seq("id", "dbl"))
    spark.sql("DROP TABLE ctas_nodata_t")
  }

  test("UNLOAD statement writes query results to files") {
    val base = java.nio.file.Files.createTempDirectory("graft-unl").toString
    val res = SqlEngine.executeSql(spark,
      s"UNLOAD (SELECT id, id * 2 AS dbl FROM range(5)) TO '$base/p' " +
        "WITH (  format='PARQUET')")
    assert(res.head().getString(0) == "UNLOAD")
    assert(spark.read.parquet(s"$base/p").count() == 5)
    // TEXTFILE with a field delimiter, partitioned — the exact property
    // rendering of `athena/_read.py:783-791`
    SqlEngine.executeSql(spark,
      s"UNLOAD (SELECT id, CAST(id % 2 AS STRING) AS par FROM range(6)) " +
        s"TO '$base/t' WITH (  format='TEXTFILE'  , field_delimiter='|'" +
        "  , partitioned_by=ARRAY['par'])")
    val back = spark.read.option("sep", "|").csv(s"$base/t")
    assert(back.count() == 6)
    assert(new java.io.File(s"$base/t").listFiles()
      .exists(_.getName.startsWith("par=")))
  }

  test("reference renderer vectors parse end-to-end (test_sql_params_formatter.py:40-43)") {
    // the exact shapes the reference's Presto engine renders for params
    val r = one(
      """SELECT ARRAY [DECIMAL '33.33', DECIMAL '1.00', NULL] AS l,
        |       MAP(ARRAY ['int', 'date'], ARRAY [CAST(4 AS VARCHAR),
        |           CAST(DATE '2022-08-22' AS VARCHAR)]) AS m""".stripMargin)
    assert(r.getSeq[java.math.BigDecimal](0).head
      == new java.math.BigDecimal("33.33"))
    assert(r.getMap[String, String](1)("date") == "2022-08-22")
  }

  // ---- round-11 second batch ------------------------------------------------

  test("any_match / all_match / none_match (Trino array predicates)") {
    val r = one(
      """SELECT any_match(ARRAY [1, 5, 9], x -> x > 7) AS a,
        |       all_match(ARRAY [1, 5, 9], x -> x > 0) AS b,
        |       none_match(ARRAY [1, 5, 9], x -> x > 100) AS c,
        |       any_match(ARRAY [1, 5, 9], x -> x > 100) AS d""".stripMargin)
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2)
      && !r.getBoolean(3))
  }

  test("split_part and reduce carry Trino semantics through the front door") {
    // both are Spark builtins with matching semantics — pinned here so a
    // regression (or a Spark rename) is caught at the shim's gate
    val r = one(
      """SELECT split_part('a/b/c', '/', 2) AS p,
        |       reduce(ARRAY [5, 20, 50], 0, (s, x) -> s + x, s -> s) AS t"""
        .stripMargin)
    assert(r.getString(0) == "b")
    assert(r.getInt(1) == 75)
  }

  test("map_agg builds a map across rows") {
    val m = one(
      """SELECT map_agg(k, v) AS m FROM (
        |  SELECT CAST(id AS VARCHAR) AS k, id * 10 AS v FROM range(4)) t"""
        .stripMargin).getMap[String, Long](0)
    assert(m == Map("0" -> 0L, "1" -> 10L, "2" -> 20L, "3" -> 30L))
  }

  test("map_agg ignores NULL keys and keeps one entry per duplicate key") {
    // Trino docs: null keys are ignored; of duplicate keys one entry is
    // retained (ours deterministically keeps the first collected)
    val m = one(
      """SELECT map_agg(k, v) AS m FROM (VALUES
        |  (CAST(NULL AS VARCHAR), 1), ('a', 2), ('a', 3), ('b', 4))
        |  AS t(k, v)""".stripMargin).getMap[String, Int](0)
    assert(m.keySet == Set("a", "b"))
    assert(m("b") == 4)
    assert(m("a") == 2 || m("a") == 3)
  }

  test("multimap_agg groups values per key, ignoring NULL keys") {
    val m = one(
      """SELECT multimap_agg(k, v) AS m FROM (VALUES
        |  ('a', 1), ('b', 2), ('a', 3), (CAST(NULL AS VARCHAR), 9))
        |  AS t(k, v)""".stripMargin)
      .getMap[String, scala.collection.Seq[Int]](0)
    assert(m.keySet == Set("a", "b"))
    assert(m("a").toSeq.sorted == Seq(1, 3))
    assert(m("b").toSeq == Seq(2))
  }

  test("ngrams slides n-long windows; short arrays yield one whole-array gram") {
    val r = one(
      """SELECT ngrams(ARRAY [1, 2, 3, 4], 2) AS a,
        |       ngrams(ARRAY ['x', 'y'], 3) AS b,
        |       ngrams(CAST(NULL AS ARRAY<INT>), 2) AS c""".stripMargin)
    assert(r.getSeq[scala.collection.Seq[Int]](0).map(_.toSeq) ==
      Seq(Seq(1, 2), Seq(2, 3), Seq(3, 4)))
    assert(r.getSeq[scala.collection.Seq[String]](1).map(_.toSeq) ==
      Seq(Seq("x", "y")))
    assert(r.isNullAt(2)) // Trino: NULL input -> NULL, never [NULL]
    // n <= 0 fails the query, as in Trino
    intercept[Exception] { rows("SELECT ngrams(ARRAY [1, 2], 0) AS x") }
  }

  test("checksum is order-insensitive; geometric_mean matches the closed form") {
    val a = one("SELECT checksum(x) AS c FROM (SELECT explode(array(1, 2, 3)) AS x) t")
    val b = one("SELECT checksum(x) AS c FROM (SELECT explode(array(3, 1, 2)) AS x) t")
    assert(a.getLong(0) == b.getLong(0))
    val g = one(
      "SELECT geometric_mean(x) AS g FROM (SELECT explode(array(2.0, 8.0)) AS x) t")
    assert(math.abs(g.getDouble(0) - 4.0) < 1e-9)
    // double-math edges carry Trino's values instead of silently
    // dropping rows: ln(0) = -Inf pulls the mean to 0; a negative
    // input poisons to NaN
    val z = one(
      "SELECT geometric_mean(x) AS g FROM (SELECT explode(array(0.0, 2.0, 8.0)) AS x) t")
    assert(z.getDouble(0) == 0.0)
    val n = one(
      "SELECT geometric_mean(x) AS g FROM (SELECT explode(array(-1.0, 2.0)) AS x) t")
    assert(n.getDouble(0).isNaN)
  }

  test("truncate preserves NaN, infinities, and beyond-long doubles") {
    val r = one(
      """SELECT truncate(nan()) AS a, truncate(infinity()) AS b,
        |       truncate(-infinity()) AS c, truncate(1e19) AS d""".stripMargin)
    assert(r.getDouble(0).isNaN)
    assert(r.getDouble(1).isPosInfinity)
    assert(r.getDouble(2).isNegInfinity)
    assert(r.getDouble(3) == 1e19)
  }

  test("ISO-8601 family: from_iso8601_timestamp/date, to_iso8601 by type") {
    val r = one(
      """SELECT from_iso8601_timestamp('2020-05-10T01:02:03') AS ts,
        |       from_iso8601_date('2020-05-10') AS d,
        |       to_iso8601(TIMESTAMP '2020-05-10 01:02:03.456') AS si,
        |       to_iso8601(DATE '2020-05-10') AS sd""".stripMargin)
    assert(r.getTimestamp(0).toString == "2020-05-10 01:02:03.0")
    assert(r.getDate(1).toString == "2020-05-10")
    assert(r.getString(2) == "2020-05-10T01:02:03.456")
    assert(r.getString(3) == "2020-05-10")
  }

  test("at_timezone rebases the UTC instant; millisecond/last_day_of_month") {
    val r = one(
      """SELECT at_timezone(TIMESTAMP '2020-01-01 12:00:00',
        |                   'America/Los_Angeles') AS t,
        |       millisecond(TIMESTAMP '2020-01-01 00:00:00.789') AS ms,
        |       last_day_of_month(DATE '2020-02-05') AS ld""".stripMargin)
    assert(r.getTimestamp(0).toString == "2020-01-01 04:00:00.0")
    assert(r.getInt(1) == 789)
    assert(r.getDate(2).toString == "2020-02-29")
  }

  test("strrpos finds the LAST occurrence, 0 when absent") {
    val r = one(
      """SELECT strrpos('ab_cd_ef', '_') AS a,
        |       strrpos('ab_cd_ef', 'cd') AS b,
        |       strrpos('ab_cd_ef', 'zz') AS c,
        |       strpos('ab_cd_ef', '_') AS d""".stripMargin)
    assert(r.getLong(0) == 6L)
    assert(r.getLong(1) == 4L)
    assert(r.getLong(2) == 0L)
    assert(r.getInt(3) == 3)
  }

  test("truncate rounds toward zero; bitwise trio") {
    val r = one(
      """SELECT truncate(17.8) AS a, truncate(-17.8) AS b,
        |       bitwise_and(12, 10) AS x, bitwise_or(12, 10) AS y,
        |       bitwise_xor(12, 10) AS z""".stripMargin)
    assert(r.getDouble(0) == 17.0 && r.getDouble(1) == -17.0)
    assert(r.getLong(2) == 8L && r.getLong(3) == 14L && r.getLong(4) == 6L)
  }

  test("2-arg regexp_replace deletes matches; 3-arg keeps builtin semantics") {
    val r = one(
      """SELECT regexp_replace('1a2b3c', '[a-z]') AS del,
        |       regexp_replace('1a2b3c', '[a-z]', '_') AS rep""".stripMargin)
    assert(r.getString(0) == "123")
    assert(r.getString(1) == "1_2_3_")
  }

  // ---- round-12: the r11 divergence list, closed --------------------------

  test("md5/sha1 return VARBINARY with Trino's bytes (classic vectors)") {
    val r = one(
      "SELECT to_hex(md5(to_utf8('abc'))) AS m, " +
        "to_hex(md5(to_utf8(''))) AS me, " +
        "to_hex(sha1(to_utf8('abc'))) AS s1, " +
        "CAST(from_utf8(to_utf8('round')) AS STRING) AS rt")
    assert(r.getString(0) == "900150983CD24FB0D6963F7D28E17F72")
    assert(r.getString(1) == "D41D8CD98F00B204E9800998ECF8427E")
    assert(r.getString(2) == "A9993E364706816ABA3E25717850C26C9CD0D89D")
    assert(r.getString(3) == "round")
    // the Athena-user shape: compare digests for equality
    assert(one(
      "SELECT md5(to_utf8('x')) = md5(to_utf8('x')) AS eq").getBoolean(0))
    // the rename is shim-only: native spark.sql keeps hex-string md5
    assert(spark.sql("SELECT md5('abc') AS m").head().getString(0) ==
      "900150983cd24fb0d6963f7d28e17f72")
  }

  test("json_extract keeps quotes on string scalars (Trino JSON text)") {
    val r = one(
      """SELECT json_extract('{"a": "x"}', '$.a') AS s,
        |       json_extract('{"a": {"b": 1}}', '$.a') AS o,
        |       json_extract('{"a": [1, 2]}', '$.a[1]') AS e,
        |       json_extract('{"a": "q\"z"}', '$.a') AS esc,
        |       json_extract('{"a": 7}', '$.missing') AS miss
        |""".stripMargin)
    assert(r.getString(0) == "\"x\"")       // quotes KEPT
    assert(r.getString(1) == "{\"b\":1}")   // container as JSON text
    assert(r.getString(2) == "2")           // JSON path subscripts 0-based
    assert(r.getString(3) == "\"q\\\"z\"")  // escaping intact
    assert(r.isNullAt(4))                   // missing path → NULL
  }

  test("json_extract_scalar is NULL on containers and JSON null") {
    val r = one(
      """SELECT json_extract_scalar('{"a": {"b": 7}}', '$.a') AS cont,
        |       json_extract_scalar('{"a": [1]}', '$.a') AS arr,
        |       json_extract_scalar('{"a": null}', '$.a') AS jn,
        |       json_extract_scalar('{"a": "x"}', '$.a') AS s,
        |       json_extract_scalar('{"a": true}', '$.a') AS b,
        |       json_extract_scalar('not json', '$.a') AS bad
        |""".stripMargin)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getString(3) == "x")   // string scalar UNQUOTED
    assert(r.getString(4) == "true")
    assert(r.isNullAt(5))           // malformed input → NULL (Athena)
    // bracket-quoted path steps
    assert(one(
      """SELECT json_extract_scalar('{"k v": 3}', '$["k v"]') AS v""")
      .getString(0) == "3")
  }

  // ---- round-12 tier 3: raw strings + probe-driven function batch ---------

  test("string literals are RAW: backslashes survive to the engine") {
    // Trino '\d' is backslash-d; without the rawStrings pass Spark's
    // parser eats the backslash and every regexp call silently degrades
    val r = one(
      """SELECT regexp_count('a1b2', '\d') AS c,
        |       regexp_like('x7', '\d') AS l,
        |       regexp_extract_all('1a 22b', '\d+') AS xs,
        |       length('\\') AS bs,
        |       regexp_replace('a1b2', '\d') AS del""".stripMargin)
    assert(r.getLong(0) == 2L)
    assert(r.getBoolean(1))
    assert(r.getSeq[String](2) == Seq("1", "22"))
    assert(r.getInt(3) == 2)        // two backslashes stay two characters
    assert(r.getString(4) == "ab")
  }

  test("regexp_extract defaults to group 0 (the full match), Trino-style") {
    val r = one(
      """SELECT regexp_extract('ab123', '([a-z]+)(\d+)') AS full,
        |       regexp_extract('ab123', '([a-z]+)(\d+)', 2) AS g2,
        |       regexp_position('a1b2', '\d') AS pos,
        |       regexp_position('abc', '\d') AS nopos,
        |       regexp_split('a1b2c', '\d') AS parts""".stripMargin)
    assert(r.getString(0) == "ab123")
    assert(r.getString(1) == "123")
    assert(r.getLong(2) == 2L)
    assert(r.getLong(3) == -1L)
    assert(r.getSeq[String](4) == Seq("a", "b", "c"))
    // Trino returns NULL when the pattern does not match (Spark: '')
    assert(one("SELECT regexp_extract('abc', '\\d+') AS v").isNullAt(0))
    // a genuine empty-string MATCH still returns ''
    assert(one("SELECT regexp_extract('abc', 'z*') AS v").getString(0) == "")
    // regexp_count returns BIGINT like Trino
    assert(one("SELECT regexp_count('aXbXc', 'X') AS v").getLong(0) == 2L)
  }

  test("typeof renders Trino type names (the reference's type probe)") {
    // tests/unit/test_athena.py: SELECT current_timestamp AS value,
    //                            typeof(current_timestamp) AS type
    val r = one(
      "SELECT typeof(current_timestamp) AS ts, typeof(1) AS i, " +
        "typeof(BIGINT '1') AS bi, typeof('x') AS s, " +
        "typeof(1.5e0) AS d, typeof(DECIMAL '1.5') AS dec, " +
        "typeof(ARRAY[1]) AS arr, " +
        "typeof(CAST(ROW(1, 'a') AS ROW(id BIGINT, v VARCHAR))) AS row_t, " +
        "typeof(MAP(ARRAY['k'], ARRAY[1])) AS m, typeof(DATE '2024-01-01') AS dt")
    assert(r.getString(0) == "timestamp(3) with time zone")
    assert(r.getString(1) == "integer")
    assert(r.getString(2) == "bigint")
    // a string LITERAL types with its exact length (Trino semantics,
    // round 13); non-literal strings below stay bare varchar
    assert(r.getString(3) == "varchar(1)")
    assert(r.getString(4) == "double")
    assert(r.getString(5) == "decimal(2,1)")
    assert(r.getString(6) == "array(integer)")
    assert(r.getString(7) == "row(id bigint, v varchar)")
    assert(r.getString(8) == "map(varchar, integer)")
    assert(r.getString(9) == "date")
  }

  // ---- round-13: the three approximation-free ex-absent functions ---------

  test("format_number renders K/M/B/T/Q unit suffixes (Trino docs vectors)") {
    val r = one(
      "SELECT format_number(123456) AS a, format_number(1000000) AS b, " +
        "format_number(123) AS c, format_number(12345) AS d, " +
        "format_number(1234567) AS e, format_number(-5700) AS f, " +
        "format_number(0) AS z, format_number(2.5e12) AS t")
    assert(r.getString(0) == "123K") // trino docs example
    assert(r.getString(1) == "1M")   // trino docs example
    assert(r.getString(2) == "123")
    assert(r.getString(3) == "12.3K")
    assert(r.getString(4) == "1.23M")
    assert(r.getString(5) == "-5.7K")
    assert(r.getString(6) == "0")
    assert(r.getString(7) == "2.5T")
    // native Spark format_number (comma grouping) is untouched — the
    // shim name is shadow-namespaced, not bare
    assert(spark.sql("SELECT format_number(1234567.891, 2) AS v")
      .head().getString(0) == "1,234,567.89")
  }

  test("human_readable_seconds composes pluralized units (docs vectors)") {
    val r = one(
      "SELECT human_readable_seconds(96) AS a, " +
        "human_readable_seconds(3762) AS b, " +
        "human_readable_seconds(56363463) AS c, " +
        "human_readable_seconds(0) AS z, " +
        "human_readable_seconds(-1) AS neg, " +
        "human_readable_seconds(61.499) AS rnd")
    assert(r.getString(0) == "1 minute, 36 seconds")          // docs
    assert(r.getString(1) == "1 hour, 2 minutes, 42 seconds") // docs
    assert(r.getString(2) ==
      "93 weeks, 1 day, 8 hours, 31 minutes, 3 seconds")      // docs
    assert(r.getString(3) == "0 seconds")
    assert(r.getString(4) == "1 second") // Trino takes |x|
    assert(r.getString(5) == "1 minute, 1 second") // rounds to nearest
    // NaN / Infinity fail the query loudly
    assertThrows[Exception](one(
      "SELECT human_readable_seconds(infinity()) AS v"))
  }

  test("combinations enumerates n-subsets lexicographically by index") {
    val r = rows(
      """SELECT c FROM (SELECT combinations(ARRAY ['foo', 'bar', 'baz'], 2)
        |  AS cs) t CROSS JOIN UNNEST(cs) AS u (c)""".stripMargin)
      .map(_.getSeq[String](0).toList)
    assert(r == Seq(List("foo", "bar"), List("foo", "baz"),
      List("bar", "baz"))) // trino docs example
    // n = 0 → [[]]; n > length → []
    val z = one("SELECT combinations(ARRAY[1, 2], 0) AS c")
      .getSeq[scala.collection.Seq[Int]](0)
    assert(z.size == 1 && z.head.isEmpty)
    assert(one("SELECT combinations(ARRAY[1, 2], 3) AS c")
      .getSeq[Any](0).isEmpty)
    // integer subsets, order check
    val n = one("SELECT combinations(ARRAY[1, 2, 3, 4], 3) AS c")
      .getSeq[scala.collection.Seq[Int]](0).map(_.toList)
    assert(n == Seq(List(1, 2, 3), List(1, 2, 4), List(1, 3, 4),
      List(2, 3, 4)))
    // guards fail the query: n > 5
    assertThrows[Exception](one(
      "SELECT combinations(ARRAY[1, 2, 3, 4, 5, 6], 6) AS c"))
  }

  test("approx_most_frequent: exact top-buckets by count, key tiebreak") {
    // docs-shaped: top 3 of a value stream; counts are exact and the
    // map is ordered count-desc (ties by ascending key)
    val m = one(
      "SELECT approx_most_frequent(3, x, 15) AS m FROM (VALUES " +
        "'A','B','A','C','A','B','D') t(x)").getMap[String, Long](0)
    assert(m == Map("A" -> 3L, "B" -> 2L, "C" -> 1L))
    // the count-desc, key-asc ordering is observable via map_keys
    val keys = one(
      "SELECT map_keys(approx_most_frequent(3, x, 15)) AS k FROM (VALUES " +
        "'A','B','A','C','A','B','D') t(x)").getSeq[String](0)
    assert(keys == Seq("A", "B", "C"))
    // buckets >= distinct: the whole exact histogram comes back
    val all = one(
      "SELECT approx_most_frequent(10, x, 100) AS m FROM (VALUES " +
        "1, 2, 2, 3) t(x)").getMap[Int, Long](0)
    assert(all == Map(1 -> 1L, 2 -> 2L, 3 -> 1L))
    // bigint values work (docs example shape)
    val top2 = one(
      "SELECT approx_most_frequent(2, x, 15) AS m FROM (VALUES " +
        "CAST(9 AS BIGINT), 9, 9, 7, 7, 5) t(x)").getMap[Long, Long](0)
    assert(top2 == Map(9L -> 3L, 7L -> 2L))
    // guards fail loudly: non-literal or non-positive buckets
    assertThrows[Exception](one(
      "SELECT approx_most_frequent(0, x, 15) AS m FROM (VALUES 1) t(x)"))
  }

  // ---- round-14: the absent list closes (bar, numeric_histogram) ----------

  test("bar renders 256-color cells, reset, and space padding") {
    val esc = "\u001b"
    val b = one("SELECT bar(0.75, 8) AS b").getString(0)
    // 6 filled cells (⌊0.75·8⌋), each escape-prefixed; first cell is
    // pure red = cube index 196; reset; padded to width with spaces
    assert(b.count(_ == '█') == 6, b)
    assert(b.startsWith(s"$esc[38;5;196m█"), b.replace(esc, "<ESC>"))
    assert(b.contains(s"$esc[0m"))
    assert(b.endsWith(s"$esc[0m  "), b.replace(esc, "<ESC>"))
    // clamping: x ≥ 1 fills everything, x ≤ 0 fills nothing
    val full = one("SELECT bar(1.5, 4) AS b").getString(0)
    assert(full.count(_ == '█') == 4 && full.endsWith(s"$esc[0m"))
    val empty = one("SELECT bar(-0.2, 4) AS b").getString(0)
    assert(empty.count(_ == '█') == 0 && empty.endsWith("    "))
    // the last filled cell of a full bar is pure green = cube index 46
    assert(full.contains(s"$esc[38;5;46m█"), full.replace(esc, "<ESC>"))
    // width guard fails the query loudly
    assertThrows[Exception](one("SELECT bar(0.5, 0) AS b"))
  }

  test("numeric_histogram: exact when distinct <= buckets, " +
    "deterministic closest-pair merges otherwise, weights preserved") {
    // exact case: identity map value → total weight
    val exact = one(
      "SELECT numeric_histogram(4, x) AS h FROM (VALUES " +
        "1.0e0, 1.0e0, 2.0e0, 3.0e0) t(x)").getMap[Double, Double](0)
    assert(exact == Map(1.0 -> 2.0, 2.0 -> 1.0, 3.0 -> 1.0))
    // merge case: (1, 2) is the closest pair → centroid 1.5 weight 2
    val merged = one(
      "SELECT numeric_histogram(2, x) AS h FROM (VALUES " +
        "1.0e0, 2.0e0, 10.0e0) t(x)").getMap[Double, Double](0)
    assert(merged == Map(1.5 -> 2.0, 10.0 -> 1.0))
    // deterministic tie-break: equal gaps merge the LEFTMOST pair
    val tied = one(
      "SELECT numeric_histogram(2, x) AS h FROM (VALUES " +
        "1.0e0, 2.0e0, 3.0e0) t(x)").getMap[Double, Double](0)
    assert(tied == Map(1.5 -> 2.0, 3.0 -> 1.0))
    // weighted form: centroid is the weighted mean, weight the sum
    val weighted = one(
      "SELECT numeric_histogram(1, x, w) AS h FROM (VALUES " +
        "(1.0e0, 3.0e0), (5.0e0, 1.0e0)) t(x, w)")
      .getMap[Double, Double](0)
    assert(weighted == Map(2.0 -> 4.0))
    // bin weights always sum to the exact row count
    val sums = one(
      "SELECT numeric_histogram(3, x) AS h FROM (VALUES " +
        "1.0e0, 2.0e0, 4.0e0, 8.0e0, 16.0e0, 17.0e0) t(x)")
      .getMap[Double, Double](0)
    assert(sums.values.sum == 6.0)
    assert(sums.size == 3)
    // buckets guard fails the query loudly
    assertThrows[Exception](one(
      "SELECT numeric_histogram(0, x) AS h FROM (VALUES 1.0e0) t(x)"))
  }

  test("histogram / cosine_similarity / Trino-exact kurtosis") {
    val h = one(
      "SELECT histogram(x) AS h FROM (VALUES 'a', 'b', 'a', 'a') t(x)")
      .getMap[String, Long](0)
    assert(h == Map("a" -> 3L, "b" -> 1L))
    val cs = one(
      "SELECT cosine_similarity(MAP(ARRAY['a','b'], ARRAY[1.0,2.0]), " +
        "MAP(ARRAY['a','b'], ARRAY[2.0,1.0])) AS v").getDouble(0)
    assert(math.abs(cs - 0.8) < 1e-12)
    // disjoint keys: dot 0
    assert(one(
      "SELECT cosine_similarity(MAP(ARRAY['a'], ARRAY[1.0]), " +
        "MAP(ARRAY['b'], ARRAY[1.0])) AS v").getDouble(0) == 0.0)
    // zero variance → NaN (Trino's 0/0; Spark 4's builtin returns NULL
    // there, which the shim re-maps — caught by round-13 review)
    assert(one(
      "SELECT kurtosis(x) AS v FROM (VALUES 5.0e0,5.0e0,5.0e0,5.0e0) t(x)")
      .getDouble(0).isNaN)
    // Trino's kurtosis is the SAMPLE excess estimator: 1,2,3,4 → -1.2
    // (Spark's population builtin says -1.36)
    val k = one(
      "SELECT kurtosis(x) AS v FROM (VALUES 1.0e0,2.0e0,3.0e0,4.0e0) t(x)")
      .getDouble(0)
    assert(math.abs(k - (-1.2)) < 1e-9)
    // n = 3: the (n-3) factor divides by zero → NULL, not a crash
    assert(one(
      "SELECT kurtosis(x) AS v FROM (VALUES 1.0e0,2.0e0,3.0e0) t(x)")
      .isNullAt(0))
  }

  test("truncate(decimal, n), from_base/to_base signs, zip field names") {
    val r = one(
      "SELECT truncate(3.789, 2) AS t2, truncate(-3.789, 2) AS tn, " +
        "from_base('ff', 16) AS fb, from_base('-ff', 16) AS fbn, " +
        "to_base(255, 16) AS tb, to_base(-255, 16) AS tbn")
    assert(r.getDecimal(0).compareTo(new java.math.BigDecimal("3.78")) == 0)
    assert(r.getDecimal(1).compareTo(new java.math.BigDecimal("-3.78")) == 0)
    assert(r.getLong(2) == 255L && r.getLong(3) == -255L)
    assert(r.getString(4) == "ff" && r.getString(5) == "-ff")
    val z = one("SELECT zip(ARRAY[1, 2], ARRAY['a', 'b']) AS z")
      .getSeq[org.apache.spark.sql.Row](0)
    assert(z.map(x => (x.getAs[Int]("field0"), x.getAs[String]("field1")))
      == Seq((1, "a"), (2, "b")))
  }

  test("json_array_get / json_size / is_json_scalar / json_array_contains") {
    val r = one(
      """SELECT json_array_get('["a", "b", "c"]', 1) AS g,
        |       json_array_get('["a", "b", "c"]', -1) AS gn,
        |       json_array_get('["a"]', 5) AS oob,
        |       json_size('{"a": {"b": 1, "c": 2}}', '$.a') AS so,
        |       json_size('{"a": [1, 2, 3]}', '$.a') AS sa,
        |       json_size('{"a": 7}', '$.a') AS ss,
        |       is_json_scalar('1') AS s1,
        |       is_json_scalar('[1, 2]') AS s2,
        |       json_array_contains('[1, 2, 3]', 2) AS c1,
        |       json_array_contains('["foo"]', 'foo') AS c2,
        |       json_array_contains('[true]', false) AS c3""".stripMargin)
    assert(r.getString(0) == "\"b\"")   // JSON text, quotes kept
    assert(r.getString(1) == "\"c\"")   // negative index from the end
    assert(r.isNullAt(2))
    assert(r.getLong(3) == 2L && r.getLong(4) == 3L && r.getLong(5) == 0L)
    assert(r.getBoolean(6) && !r.getBoolean(7))
    assert(r.getBoolean(8) && r.getBoolean(9) && !r.getBoolean(10))
  }

  test("hamming_distance / bit_count guards fail the query like Trino") {
    assert(one("SELECT hamming_distance('abcd', 'abcx') AS v")
      .getLong(0) == 1L)
    intercept[Exception] {
      one("SELECT hamming_distance('ab', 'abc') AS v")
    }
    assert(one("SELECT bit_count(7, 8) AS v").getLong(0) == 3L)
    assert(one("SELECT bit_count(-8, 8) AS v").getLong(0) == 5L)
    intercept[Exception] { one("SELECT bit_count(500, 8) AS v") }
    // registrations are session-wide: Spark's own 1-arg bit_count must
    // keep working for the engine's native SQL (simhash hamming uses it)
    assert(one("SELECT bit_count(7) AS v").getInt(0) == 3)
    assert(spark.sql("SELECT bit_count(7 ^ 1) AS v").head().getInt(0) == 2)
  }

  test("year_of_week / with_timezone / parse_datetime / format / misc") {
    // 2005-01-02 was a Sunday: ISO week 53 of 2004
    assert(one("SELECT year_of_week(DATE '2005-01-02') AS v")
      .getLong(0) == 2004L)
    assert(one("SELECT yow(DATE '2024-01-01') AS v").getLong(0) == 2024L)
    // with_timezone: 10:00 New York = 14:00 UTC (instant preserved)
    assert(one(
      "SELECT CAST(with_timezone(TIMESTAMP '2024-05-15 10:00:00', " +
        "'America/New_York') AS VARCHAR) AS v")
      .getString(0).startsWith("2024-05-15 14:00:00"))
    assert(one(
      "SELECT CAST(parse_datetime('2024/05/15', 'yyyy/MM/dd') AS DATE) AS v")
      .getDate(0).toString == "2024-05-15")
    assert(one("SELECT format('%s-%03d', 'a', 7) AS v")
      .getString(0) == "a-007")
    assert(one("SELECT current_timezone() AS v").getString(0) == "UTC")
    assert(one("SELECT starts_with('abc', 'ab') AS s, " +
      "ends_with('abc', 'bc') AS e").getBoolean(0))
    assert(one("SELECT bitwise_not(5) AS v").getInt(0) == -6)
    assert(one("SELECT bitwise_and_agg(x) AS a, bitwise_or_agg(x) AS o " +
      "FROM (VALUES 7, 3) t(x)").getInt(0) == 3)
    assert(one("SELECT normalize('á') AS v").getString(0) == "á")
  }
}
