package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Oracled end-to-end queries through the Trino-dialect front door:
  * the SQL text below is what an Athena user types
  * (`athena/_read.py:951-1308` executes it verbatim), and it reaches
  * Catalyst only through [[TrinoCompat.rewrite]] +
  * [[TrinoCompat.ensureRegistered]] inside [[SqlEngine.readSqlQuery]].
  * The DuckDB oracles express the same semantics in DuckDB's own
  * dialect — a genuine differential test of the shim, not an echo. */
object TrinoQueries {

  /** Trino-only surface in one query: `ARRAY [...]` constructor,
    * 1-based subscript, string-unit `date_diff` — over a join + agg so
    * the translated plan is a real distributed plan (broadcast-able
    * dims, partial aggregation), not a literal-select. */
  def readSql(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    SqlEngine.readSqlQuery(s,
      """SELECT l.l_returnflag AS flag,
        |       ARRAY ['low', 'high'][CASE WHEN l.l_quantity > 25 THEN 2 ELSE 1 END] AS qty_band,
        |       count(*) AS cnt,
        |       sum(date_diff('day', o.o_orderdate, l.l_shipdate)) AS lag_days
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1, 2""".stripMargin)
  }

  def readSqlOracle: String =
    """SELECT l_returnflag AS flag,
      |       (ARRAY['low','high'])[CASE WHEN l_quantity > 25 THEN 2 ELSE 1 END] AS qty_band,
      |       count(*) AS cnt,
      |       CAST(sum(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS lag_days
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2""".stripMargin

  /** `CROSS JOIN UNNEST(...) WITH ORDINALITY` — the rewrite emits a
    * LATERAL VIEW over `inline(arrays_zip(..., sequence(...)))`, a
    * per-row generator that stays inside the scan stage (no shuffle,
    * no driver loop — the shape that survives 100 TB of documents). */
  def unnestOrdinality(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir).createOrReplaceTempView("documents")
    SqlEngine.readSqlQuery(s,
      """SELECT d.doc_id, u.tok, CAST(u.ord AS BIGINT) AS ord
        |FROM documents d
        |CROSS JOIN UNNEST(split(d.text, ' ')) WITH ORDINALITY AS u (tok, ord)
        |WHERE d.doc_id < 50 AND u.ord <= 5""".stripMargin)
  }

  def unnestOrdinalityOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents WHERE doc_id < 50)
      |SELECT doc_id, s.tok AS tok, s.ord AS ord FROM (
      |  SELECT doc_id,
      |    unnest(list_transform(range(len(toks)),
      |      i -> {'tok': toks[i+1], 'ord': i+1})) AS s
      |  FROM t) z
      |WHERE s.ord <= 5""".stripMargin
}
