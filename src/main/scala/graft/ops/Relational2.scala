package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Second batch of the Athena/Trino SQL surface (SURVEY §2.3): CUBE,
  * analytic window functions, CTE shapes, regex/date/conditional scalar
  * functions, pivot-style conditional aggregation. Same oracle-exactness
  * conventions as [[Relational]].
  */
object Relational2 {

  /** CUBE grouping sets over two dimensions. */
  def q20Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(10,2)")).cast("double")
          .as("total"))

  def q20OracleSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  cast(sum(cast(o_totalprice as decimal(10,2))) as double) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** Analytic windows: ntile, percent_rank, cume_dist, first/last value
    * over a per-status price ordering. */
  def q21AnalyticWindows(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 100L)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        first(col("o_orderkey")).over(wf).as("cheapest_key"),
        last(col("o_orderkey")).over(wf).as("priciest_key"))
  }

  def q21OracleSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  first_value(o_orderkey) OVER wf AS cheapest_key,
      |  last_value(o_orderkey) OVER wf AS priciest_key
      |FROM orders
      |WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_orderstatus
      |             ORDER BY o_totalprice, o_orderkey),
      |       wf AS (PARTITION BY o_orderstatus
      |              ORDER BY o_totalprice, o_orderkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin

  /** Chained CTEs: revenue per supplier → quartile bucket → bucket stats
    * (the multi-stage analyst query shape).
    *
    * The quartile is a GLOBAL ntile, which a naive `Window.orderBy`
    * computes by sorting the whole input in ONE task — fine at supplier
    * cardinality, fatal at 100 TB key counts. The distributed
    * formulation: range-exchange on the sort key (every task holds one
    * contiguous rank range), local row_number per range, per-range
    * counts (≤ shuffle-partition-count rows, collected driver-side) →
    * rank offsets broadcast back as a map literal, then the exact
    * ntile arithmetic as a map-side expression. Bit-identical to
    * `ntile(4) OVER (ORDER BY rev, l_suppkey)` — the sort key is
    * unique, so ranks are exact — with the biggest single task bounded
    * by one range partition instead of the table. */
  def q22CteChain(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val rev = li.groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(10,2)"))
        .cast("double").as("rev"))
    // pinned once: the counts job and the rank job share the exchange
    val parts = rev.repartitionByRange(col("rev"), col("l_suppkey"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val cnt = parts.groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getAs[Int]("pid") -> r.getAs[Long]("c"))
      .sortBy(_._1)
    val n = cnt.map(_._2).sum
    val offsets: Map[Int, Long] =
      cnt.map(_._1).zip(cnt.map(_._2).scanLeft(0L)(_ + _)).toMap
    val nb = 4L
    val base = n / nb
    val rem = n % nb
    val lw = Window.partitionBy(col("pid"))
      .orderBy(col("rev"), col("l_suppkey"))
    val bucketed = parts
      .withColumn("r", row_number().over(lw).cast("long") +
        element_at(typedLit(offsets), col("pid")))
      .withColumn("q",
        when(lit(rem) > 0 && col("r") <= lit(rem * (base + 1)),
          expr(s"(r - 1) div ${base + 1} + 1"))
          .otherwise(expr(s"$rem + (r - 1 - ${rem * (base + 1)}) div $base + 1"))
          .cast("int"))
    bucketed.groupBy(col("q"))
      .agg(count(lit(1)).as("n_supps"),
        min(col("rev")).as("min_rev"), max(col("rev")).as("max_rev"))
  }

  def q22OracleSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    cast(sum(cast(l_extendedprice as decimal(10,2))) as double) AS rev
      |  FROM lineitem GROUP BY l_suppkey),
      |bucketed AS (
      |  SELECT l_suppkey, rev, ntile(4) OVER (ORDER BY rev, l_suppkey) AS q
      |  FROM rev)
      |SELECT q, count(*) AS n_supps, min(rev) AS min_rev, max(rev) AS max_rev
      |FROM bucketed GROUP BY q""".stripMargin

  /** Pivot-style conditional aggregation: order counts per month × status
    * as columns (the reshape the reference does client-side in pandas). */
  def q23Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("yr", year(col("o_orderdate")))
      .groupBy(col("yr"))
      .agg(
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_filled"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_pending"))

  def q23OracleSql: String =
    """SELECT cast(year(o_orderdate) as int) AS yr,
      |  cast(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) as bigint) AS n_open,
      |  cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) as bigint) AS n_filled,
      |  cast(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) as bigint) AS n_pending
      |FROM orders GROUP BY 1""".stripMargin

  /** Regex + string function library: extract the numeric suffix of the
    * source tag, split-part, padding, trim variants. */
  def q24RegexStrings(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        // registry-immune (see LogsInsights.parse): the shim shadows
        // regexp_extract session-wide with NULL-on-no-match semantics
        org.apache.spark.sql.GraftBridge.column(
          org.apache.spark.sql.catalyst.expressions.RegExpExtract(
            org.apache.spark.sql.GraftBridge.expr(col("source")),
            org.apache.spark.sql.catalyst.expressions.Literal("src([0-9]+)"),
            org.apache.spark.sql.catalyst.expressions.Literal(1)))
          .cast("int").as("src_num"),
        substring_index(col("text"), " ", 3).as("first3"),
        lpad(col("lang"), 4, "_").as("lang_pad"),
        reverse(col("lang")).as("lang_rev"),
        translate(col("lang"), "aeiou", "AEIOU").as("lang_tr"),
        instr(col("text"), "spark").as("spark_pos"))

  def q24OracleSql: String =
    """SELECT doc_id,
      |  cast(regexp_extract(source, 'src([0-9]+)', 1) as int) AS src_num,
      |  array_to_string((string_split(text, ' '))[1:3], ' ') AS first3,
      |  lpad(lang, 4, '_') AS lang_pad,
      |  reverse(lang) AS lang_rev,
      |  translate(lang, 'aeiou', 'AEIOU') AS lang_tr,
      |  cast(coalesce(nullif(position('spark' IN text), NULL), 0) as int) AS spark_pos
      |FROM documents""".stripMargin

  /** Date/time function library over orders: truncation, extraction,
    * intervals, day arithmetic. */
  def q25DateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") < 500L)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        date_format(date_trunc("quarter", col("o_orderdate")), "yyyy-MM-dd")
          .as("q_start"),
        datediff(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")).as("days_to_2002"),
        date_format(date_add(col("o_orderdate").cast("date"), 90),
          "yyyy-MM-dd").as("plus90"))

  def q25OracleSql: String =
    """SELECT o_orderkey,
      |  cast(year(o_orderdate) as int) AS y,
      |  cast(month(o_orderdate) as int) AS m,
      |  cast(day(o_orderdate) as int) AS d,
      |  cast(quarter(o_orderdate) as int) AS q,
      |  strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS q_start,
      |  cast(date_diff('day', cast(o_orderdate as date), DATE '2002-01-01') as int) AS days_to_2002,
      |  strftime(cast(o_orderdate as date) + INTERVAL 90 DAY, '%Y-%m-%d') AS plus90
      |FROM orders WHERE o_orderkey < 500""".stripMargin

  /** Correlated EXISTS with an aggregate guard: suppliers whose every
    * large shipment was discounted (universal quantification via
    * NOT EXISTS counter-example). */
  def q26Universal(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val counterExample = li
      .filter(col("l_quantity") >= 45 && col("l_discount") === 0.0)
      .select(col("l_suppkey")).distinct()
    val hasLarge = li.filter(col("l_quantity") >= 45)
      .select(col("l_suppkey")).distinct()
    hasLarge.join(counterExample, Seq("l_suppkey"), "left_anti")
      .orderBy(col("l_suppkey"))
  }

  def q26OracleSql: String =
    """SELECT DISTINCT l_suppkey FROM lineitem li
      |WHERE l_quantity >= 45
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem x
      |    WHERE x.l_suppkey = li.l_suppkey
      |      AND x.l_quantity >= 45 AND x.l_discount = 0.0)
      |ORDER BY l_suppkey""".stripMargin

  /** Null-handling functions: coalesce / nullif / null-safe compare over
    * a derived nullable column. */
  def q27NullHandling(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .withColumn("maybe",
        when(col("c_acctbal") < 0, lit(null).cast("double"))
          .otherwise(col("c_acctbal")))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(col("maybe")).as("n_nonnull"),
        sum(when(col("maybe").isNull, 1L).otherwise(0L)).as("n_null"),
        sum(coalesce(col("maybe"), lit(0.0)).cast("decimal(10,2)"))
          .cast("double").as("total_pos"),
        count(when(col("maybe") <=> lit(null).cast("double"), 1)).as("nsafe_null"))

  def q27OracleSql: String =
    """SELECT c_mktsegment,
      |  cast(count(maybe) as bigint) AS n_nonnull,
      |  cast(sum(CASE WHEN maybe IS NULL THEN 1 ELSE 0 END) as bigint) AS n_null,
      |  cast(sum(cast(coalesce(maybe, 0.0) as decimal(10,2))) as double) AS total_pos,
      |  cast(count(CASE WHEN maybe IS NOT DISTINCT FROM NULL THEN 1 END) as bigint) AS nsafe_null
      |FROM (SELECT c_mktsegment,
      |        CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS maybe
      |      FROM customer) t
      |GROUP BY c_mktsegment""".stripMargin

  /** UNION ALL + dedup-on-top: the multi-source ingestion shape. */
  def q28UnionAll(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("k"), lit("open").as("src"))
    val b = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey").as("k"), lit("big").as("src"))
    a.unionAll(b)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), countDistinct(col("src")).as("n_src"))
      .filter(col("n_src") === 2)
  }

  def q28OracleSql: String =
    """SELECT k, count(*) AS n, cast(count(DISTINCT src) as bigint) AS n_src
      |FROM (
      |  SELECT o_custkey AS k, 'open' AS src FROM orders WHERE o_orderstatus = 'O'
      |  UNION ALL
      |  SELECT o_custkey AS k, 'big' AS src FROM orders WHERE o_totalprice > 400000.0) t
      |GROUP BY k HAVING cast(count(DISTINCT src) as bigint) = 2""".stripMargin

  /** Ordered string aggregation (listagg/string_agg shape): deterministic
    * via sort-before-join (collect_set order is undefined — sorting is
    * what makes the operator distributable AND reproducible). */
  def q29StringAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        array_join(array_sort(collect_set(col("l_linestatus"))), ",")
          .as("statuses"),
        countDistinct(col("l_linestatus")).as("n_statuses"))

  def q29OracleSql: String =
    """SELECT l_returnflag,
      |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
      |  cast(count(DISTINCT l_linestatus) as bigint) AS n_statuses
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Continuous percentiles (median / p90) per group. Both engines use
    * linear interpolation at rank p*(n-1) over the same input doubles. */
  def q30Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("median_price"),
        expr("percentile(o_totalprice, 0.9)").as("p90_price"),
        count(lit(1)).as("n"))

  def q30OracleSql: String =
    """SELECT o_orderstatus,
      |  quantile_cont(o_totalprice, 0.5) AS median_price,
      |  quantile_cont(o_totalprice, 0.9) AS p90_price,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** RANGE window frame: for each order, revenue of all same-status
    * orders within ±5000 of its price (value-based frame, not row
    * count). */
  def q33RangeFrame(s: SparkSession, dir: String): DataFrame = {
    // double-valued RANGE offsets need the SQL form (the Scala
    // rangeBetween API is long-only); same Catalyst plan either way
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  count(*) OVER w AS n_nearby,
        |  cast(sum(cast(o_totalprice as decimal(10,2))) OVER w as double) AS nearby_total
        |FROM orders
        |WHERE o_orderkey < 2000
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
        |             RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING)""".stripMargin)
  }

  def q33OracleSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice,
      |  count(*) OVER w AS n_nearby,
      |  cast(sum(cast(o_totalprice as decimal(10,2))) OVER w as double) AS nearby_total
      |FROM orders
      |WHERE o_orderkey < 2000
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
      |             RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING)""".stripMargin

  /** Array/map constructor + function library (the `_sql_formatter.py`
    * ARRAY/MAP surface): construction, sort, slice, membership, position,
    * map extraction — array-valued intermediates rendered to scalars so
    * the differential compare stays value-typed. */
  def q31ArrayMapFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        array_join(slice(array_sort(array_distinct(col("toks"))), 1, 3), ",")
          .as("first3_sorted"),
        array_contains(col("toks"), "spark").as("has_spark"),
        coalesce(array_position(col("toks"), "table"),
          lit(0L)).as("table_pos"),
        element_at(
          map_from_arrays(array(lit("lang"), lit("source")),
            array(col("lang"), col("source"))), "lang").as("lang_via_map"),
        size(col("toks")).as("n_toks"))

  def q31OracleSql: String =
    """SELECT doc_id,
      |  array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_sorted,
      |  list_contains(toks, 'spark') AS has_spark,
      |  cast(coalesce(list_position(toks, 'table'), 0) as bigint) AS table_pos,
      |  MAP(['lang','source'], [lang, source])['lang'][1] AS lang_via_map,
      |  cast(len(toks) as int) AS n_toks
      |FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS toks
      |      FROM documents) t""".stripMargin
}

/** Third batch of SQL-surface queries (round 2): grouping sets, lateral
  * explode, interval/date arithmetic — Athena dialect shapes the first
  * two batches did not cover. */
object Relational3 {
  import graft.Tables

  /** GROUPING SETS with grouping() disambiguation — finer control than
    * q9's ROLLUP / q20's CUBE. */
  def q34GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  cast(grouping(l_returnflag) as int) AS g_flag,
        |  cast(grouping(l_linestatus) as int) AS g_status,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(cast(l_quantity as decimal(10,2))) as double) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), (l_linestatus))""".stripMargin)
  }

  def q34OracleSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  cast(grouping(l_returnflag) as int) AS g_flag,
      |  cast(grouping(l_linestatus) as int) AS g_status,
      |  cast(count(*) as bigint) AS n,
      |  cast(sum(cast(l_quantity as decimal(10,2))) as double) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |                        (l_returnflag), (l_linestatus))""".stripMargin

  /** LATERAL VIEW / UNNEST over a computed array — per-token rows from
    * the documents table with positional ordinality. */
  def q35Lateral(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.documents(s, dir)
      .filter(col("doc_id") < 20L)
      .select(col("doc_id"),
        posexplode(slice(split(col("text"), " "), 1, 5)))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("ord"),
        col("col").as("tok"))
  }

  def q35OracleSql: String =
    """SELECT doc_id, cast(ord as int) AS ord, tok
      |FROM (
      |  SELECT doc_id,
      |    unnest(list_slice(string_split(text, ' '), 1, 5)) AS tok,
      |    generate_subscripts(list_slice(string_split(text, ' '), 1, 5), 1)
      |      AS ord
      |  FROM documents WHERE doc_id < 20)""".stripMargin

  /** Interval and date arithmetic: shifts, truncation, component
    * extraction, day differences — the `date_add`/`date_trunc` family. */
  def q36Intervals(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderkey,
        |  date_format(o_orderdate + INTERVAL '30' DAY, 'yyyy-MM-dd')
        |    AS due_date,
        |  date_format(o_orderdate - INTERVAL '1' MONTH, 'yyyy-MM-dd')
        |    AS prior_month,
        |  date_format(date_trunc('quarter', o_orderdate), 'yyyy-MM-dd')
        |    AS quarter_start,
        |  cast(datediff(to_date('1998-12-01'), o_orderdate) as bigint)
        |    AS days_to_cutoff,
        |  cast(dayofweek(o_orderdate) as int) AS dow
        |FROM orders
        |WHERE o_orderkey < 500""".stripMargin)
  }

  def q36OracleSql: String =
    """SELECT o_orderkey,
      |  strftime(cast(o_orderdate as date) + INTERVAL 30 DAY, '%Y-%m-%d')
      |    AS due_date,
      |  strftime(cast(o_orderdate as date) - INTERVAL 1 MONTH, '%Y-%m-%d')
      |    AS prior_month,
      |  strftime(date_trunc('quarter', cast(o_orderdate as date)), '%Y-%m-%d')
      |    AS quarter_start,
      |  cast(date_diff('day', cast(o_orderdate as date), DATE '1998-12-01')
      |    as bigint) AS days_to_cutoff,
      |  cast(dayofweek(cast(o_orderdate as date)) as int) + 1 AS dow
      |FROM orders
      |WHERE o_orderkey < 500""".stripMargin
}
