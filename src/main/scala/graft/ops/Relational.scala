package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The relational query surface of the reference — the Trino-SQL
  * capabilities awswrangler ships to Athena (`athena/_read.py:951-1308`,
  * surface inventoried in SURVEY §2.3) — expressed as Catalyst plans via
  * the DataFrame API. Scans push filters/projections into the parquet
  * reader; joins/aggregations shuffle on their keys with partial (map-side)
  * aggregation; small dimension tables are broadcast explicitly.
  *
  * Oracle-exactness convention: any floating-point SUM is computed over
  * values cast to decimal (exact, order-independent) and the final result
  * cast back to double, so results hash-match DuckDB bit-for-bit regardless
  * of partial-aggregation order. Averages divide two exact quantities in
  * IEEE double. Top-k queries always carry a unique tiebreak key in the
  * ORDER BY.
  */
object Relational {

  /** Exact order-independent sum of a 2-decimal currency column. */
  private def dsum2(c: Column): Column =
    sum(c.cast("decimal(10,2)")).cast("double")

  /** l_extendedprice * (1 - l_discount) in exact decimal arithmetic. */
  private def discPrice: Column =
    col("l_extendedprice").cast("decimal(10,2)") *
      (lit(1) - col("l_discount").cast("decimal(3,2)"))

  private def charge: Column =
    discPrice * (lit(1) + col("l_tax").cast("decimal(3,2)"))

  /** TPC-H Q1-style pricing summary: scan + hash aggregate.
    * At scale: single shuffle on the 6-value grouping key with map-side
    * partial aggregation; the shipdate filter is pushed to parquet
    * row-group stats.
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum2(col("l_quantity")).as("sum_qty"),
        dsum2(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        (sum(col("l_quantity").cast("decimal(10,2)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"),
        (sum(col("l_extendedprice").cast("decimal(10,2)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_price"),
        (sum(col("l_discount").cast("decimal(3,2)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  def q1OracleSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  cast(sum(cast(l_quantity as decimal(10,2))) as double) AS sum_qty,
      |  cast(sum(cast(l_extendedprice as decimal(10,2))) as double) AS sum_base_price,
      |  cast(sum(cast(l_extendedprice as decimal(10,2)) * (1 - cast(l_discount as decimal(3,2)))) as double) AS sum_disc_price,
      |  cast(sum(cast(l_extendedprice as decimal(10,2)) * (1 - cast(l_discount as decimal(3,2))) * (1 + cast(l_tax as decimal(3,2)))) as double) AS sum_charge,
      |  cast(sum(cast(l_quantity as decimal(10,2))) as double) / cast(count(*) as double) AS avg_qty,
      |  cast(sum(cast(l_extendedprice as decimal(10,2))) as double) / cast(count(*) as double) AS avg_price,
      |  cast(sum(cast(l_discount as decimal(3,2))) as double) / cast(count(*) as double) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Selective filter + projection: both pushed into the parquet scan
    * (PushedFilters + ReadSchema in the formatted plan). */
  def q2FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_totalprice") > 450000.0 && col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))

  def q2OracleSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      |FROM orders WHERE o_totalprice > 450000.0 AND o_orderstatus = 'O'""".stripMargin

  /** TPC-H Q3-style shipping priority: 3-way join, aggregate, top-10.
    * customer is small relative to lineitem → broadcast; orders⋈lineitem
    * shuffles on orderkey; Spark plans the final top-k as
    * TakeOrderedAndProject (no full sort).
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  def q3OracleSql: String =
    """SELECT l_orderkey, o_orderdate,
      |  cast(sum(cast(l_extendedprice as decimal(10,2)) * (1 - cast(l_discount as decimal(3,2)))) as double) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Semi-join (EXISTS): orders having at least one returned lineitem,
    * counted by priority. Left-semi avoids materializing the join. */
  def q4SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val returned = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    Tables.orders(s, dir)
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  def q4OracleSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority""".stripMargin

  /** TPC-H Q5-style: 5-way join down the region→nation→customer→orders→
    * lineitem→supplier chain, revenue per nation. region/nation/supplier
    * are broadcast dims; the only large shuffle is orders⋈lineitem.
    */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(s, dir).filter(col("r_name") === "EUROPE")
    val nation = Tables.nation(s, dir)
    val cust = Tables.customer(s, dir)
    val sup = Tables.supplier(s, dir)
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(s, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(sup),
        li("l_suppkey") === sup("s_suppkey") &&
          cust("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(nation), sup("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPrice).cast("double").as("revenue"))
  }

  def q5OracleSql: String =
    """SELECT n_name,
      |  cast(sum(cast(l_extendedprice as decimal(10,2)) * (1 - cast(l_discount as decimal(3,2)))) as double) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin

  /** TPC-H Q6-style forecasting revenue: pure scan-aggregate, all three
    * predicates pushed to parquet; no shuffle beyond the final 1-row agg. */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
      .agg(
        sum(col("l_extendedprice").cast("decimal(10,2)") *
          col("l_discount").cast("decimal(3,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  def q6OracleSql: String =
    """SELECT
      |  cast(sum(cast(l_extendedprice as decimal(10,2)) * cast(l_discount as decimal(3,2))) as double) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Ranking window: top-3 lineitems per supplier by price; the window
    * shuffles once on l_suppkey and sorts within partitions.
    */
  def q7WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
    Tables.lineitem(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("rn"))
  }

  def q7OracleSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
      |FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_suppkey
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem) t
      |WHERE rn <= 3""".stripMargin

  /** Running total (analytic window with cumulative frame). The windowed
    * SUM runs over exact decimals so partial-order differences cannot
    * change the double output. */
  def q8RunningTotal(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"),
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(col("o_totalprice").cast("decimal(10,2)")).as("mtotal"),
        count(lit(1)).as("n_orders"))
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("running_total", sum(col("mtotal")).over(w).cast("double"))
      .withColumn("month", date_format(col("month"), "yyyy-MM-dd"))
      .select(col("o_orderstatus"), col("month"), col("n_orders"),
        col("running_total"))
  }

  def q8OracleSql: String =
    """SELECT o_orderstatus, strftime(month, '%Y-%m-%d') AS month, n_orders,
      |  cast(sum(mtotal) OVER (PARTITION BY o_orderstatus ORDER BY month
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS running_total
      |FROM (
      |  SELECT o_orderstatus, date_trunc('month', o_orderdate) AS month,
      |    sum(cast(o_totalprice as decimal(10,2))) AS mtotal,
      |    count(*) AS n_orders
      |  FROM orders GROUP BY 1, 2) t""".stripMargin

  /** ROLLUP aggregate (grouping sets). */
  def q9Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), dsum2(col("l_quantity")).as("sum_qty"))

  def q9OracleSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
      |  cast(sum(cast(l_quantity as decimal(10,2))) as double) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** Exact distinct aggregation (expand + two-phase aggregate). */
  def q10Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))

  def q10OracleSql: String =
    """SELECT l_returnflag,
      |  cast(count(DISTINCT l_partkey) as bigint) AS n_parts,
      |  cast(count(DISTINCT l_suppkey) as bigint) AS n_supps,
      |  cast(count(DISTINCT l_orderkey) as bigint) AS n_orders
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Set operations: customers with orders (INTERSECT), minus high-balance
    * ones (EXCEPT), plus suppliers' nation keys (UNION) — one result. */
  def q11SetOps(s: SparkSession, dir: String): DataFrame = {
    val withOrders = Tables.orders(s, dir)
      .select(col("o_custkey").as("k")).distinct()
    val custKeys = Tables.customer(s, dir).select(col("c_custkey").as("k"))
    val rich = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 9000.0).select(col("c_custkey").as("k"))
    val nations = Tables.supplier(s, dir)
      .select(col("s_nationkey").cast("bigint").as("k"))
    withOrders.intersect(custKeys).except(rich).union(nations).distinct()
  }

  def q11OracleSql: String =
    """SELECT DISTINCT k FROM (
      |  SELECT k FROM (
      |    SELECT o_custkey AS k FROM orders
      |    INTERSECT
      |    SELECT c_custkey AS k FROM customer) a
      |  EXCEPT
      |  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000.0
      |  UNION
      |  SELECT cast(s_nationkey as bigint) AS k FROM supplier) t""".stripMargin

  /** Conditional aggregation (CASE inside SUM), TPC-H Q12 shape. */
  def q12CaseAgg(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))
  }

  def q12OracleSql: String =
    """SELECT l_returnflag,
      |  cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) as bigint) AS high_line_count,
      |  cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) as bigint) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_returnflag""".stripMargin

  /** TPC-H Q13 shape: LEFT OUTER join + two-level aggregate — customer
    * order-count distribution including zero-order customers. */
  def q13OrderCountDist(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir)
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  def q13OracleSql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, cast(count(o_orderkey) as bigint) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey) t
      |GROUP BY c_count""".stripMargin

  /** Scalar function library over part: string + numeric + conditional
    * functions, all codegen'd builtins (no UDFs). */
  def q14ScalarFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_size") >= 40)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        length(col("p_type")).as("type_len"),
        substring(col("p_name"), 1, 5).as("name5"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        abs(col("p_retailprice") - 1000.0).as("price_dist"),
        (col("p_size") % 7).as("size_mod"),
        when(col("p_retailprice") > 1500.0, "premium")
          .otherwise("standard").as("tier"))

  def q14OracleSql: String =
    """SELECT p_partkey, upper(p_name) AS uname, lower(p_brand) AS lbrand,
      |  cast(length(p_type) as int) AS type_len,
      |  substring(p_name, 1, 5) AS name5,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  abs(p_retailprice - 1000.0) AS price_dist,
      |  cast(p_size % 7 as int) AS size_mod,
      |  CASE WHEN p_retailprice > 1500.0 THEN 'premium' ELSE 'standard' END AS tier
      |FROM part WHERE p_size >= 40""".stripMargin

  /** HAVING over aggregate + scalar subquery threshold (exact decimal
    * compare so the cut is identical in both engines). */
  def q15HavingSubquery(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val perSupp = li.groupBy(col("l_suppkey"))
      .agg(sum(discPrice).as("rev"))
    val avgRev = perSupp.agg(avg(col("rev").cast("double")).as("a"))
    perSupp.crossJoin(broadcast(avgRev))
      .filter(col("rev").cast("double") > col("a") * 1.05)
      .select(col("l_suppkey"), col("rev").cast("double").as("revenue"))
  }

  def q15OracleSql: String =
    """WITH per_supp AS (
      |  SELECT l_suppkey,
      |    sum(cast(l_extendedprice as decimal(10,2)) * (1 - cast(l_discount as decimal(3,2)))) AS rev
      |  FROM lineitem GROUP BY l_suppkey)
      |SELECT l_suppkey, cast(rev as double) AS revenue
      |FROM per_supp
      |WHERE cast(rev as double) >
      |  (SELECT avg(cast(rev as double)) FROM per_supp) * 1.05""".stripMargin

  /** Equi + theta join: suppliers richer than customers of the same
    * nation; aggregated to per-nation counts. */
  def q16ThetaJoin(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir)
    val cust = Tables.customer(s, dir)
    sup.join(cust,
        sup("s_nationkey") === cust("c_nationkey") &&
          sup("s_acctbal") > cust("c_acctbal"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("s_suppkey")).as("n_supps"))
  }

  def q16OracleSql: String =
    """SELECT s_nationkey, count(*) AS n_pairs,
      |  cast(count(DISTINCT s_suppkey) as bigint) AS n_supps
      |FROM supplier JOIN customer
      |  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
      |GROUP BY s_nationkey""".stripMargin

  /** NOT EXISTS (anti-join): customers with no order in 2001, restricted
    * by an IN-list predicate on market segment. */
  def q17InNotExists(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY", "FURNITURE"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    cust
      .join(recent, cust("c_custkey") === recent("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  def q17OracleSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_mktsegment IN ('BUILDING','MACHINERY','FURNITURE')
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')""".stripMargin

  /** LAG/LEAD analytic functions over the events stream: inter-event gap
    * per user in microseconds (exact integer arithmetic). */
  def q18LagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("prev_type"), col("gap_us"))
  }

  def q18OracleSql: String =
    """SELECT user_id, event_id, event_type,
      |  lag(event_type, 1) OVER w AS prev_type,
      |  epoch_us(cast(ts as timestamp)) - lag(epoch_us(cast(ts as timestamp)), 1) OVER w AS gap_us
      |FROM events
      |WHERE user_id < 10
      |WINDOW w AS (PARTITION BY user_id ORDER BY cast(ts as timestamp), event_id)""".stripMargin

  /** ORDER BY + LIMIT top-k with unique tiebreak (TakeOrderedAndProject —
    * per-partition top-k then merge on the driver; no global sort). */
  def q19TopK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_day"))

  def q19OracleSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_day
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin
}
