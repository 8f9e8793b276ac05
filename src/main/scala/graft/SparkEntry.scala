package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry pairs a Spark-side operator (`queries`) with the ANSI SQL the
  * driver runs in DuckDB on the same parquet tables (`oracleSql`). Column
  * names and value bit-patterns must match; see `graft.ops.Relational` for
  * the decimal-exact float conventions that make that hold.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"  -> (Relational.q1PricingSummary _),
    "q2_filter_project"   -> (Relational.q2FilterProject _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q4_semi_join"        -> (Relational.q4SemiJoin _),
    "q5_local_supplier"   -> (Relational.q5LocalSupplier _),
    "q6_forecast_revenue" -> (Relational.q6ForecastRevenue _),
    "q7_window_rank"      -> (Relational.q7WindowRank _),
    "q8_running_total"    -> (Relational.q8RunningTotal _),
    "q9_rollup"           -> (Relational.q9Rollup _),
    "q10_distinct"        -> (Relational.q10Distinct _),
    "q11_set_ops"         -> (Relational.q11SetOps _),
    "q12_case_agg"        -> (Relational.q12CaseAgg _),
    "q13_order_count_dist" -> (Relational.q13OrderCountDist _),
    "q14_scalar_funcs"    -> (Relational.q14ScalarFuncs _),
    "q15_having_subquery" -> (Relational.q15HavingSubquery _),
    "q16_theta_join"      -> (Relational.q16ThetaJoin _),
    "q17_in_not_exists"   -> (Relational.q17InNotExists _),
    "q18_lag_lead"        -> (Relational.q18LagLead _),
    "q19_top_k"           -> (Relational.q19TopK _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary"  -> Relational.q1OracleSql,
    "q2_filter_project"   -> Relational.q2OracleSql,
    "q3_shipping_priority" -> Relational.q3OracleSql,
    "q4_semi_join"        -> Relational.q4OracleSql,
    "q5_local_supplier"   -> Relational.q5OracleSql,
    "q6_forecast_revenue" -> Relational.q6OracleSql,
    "q7_window_rank"      -> Relational.q7OracleSql,
    "q8_running_total"    -> Relational.q8OracleSql,
    "q9_rollup"           -> Relational.q9OracleSql,
    "q10_distinct"        -> Relational.q10OracleSql,
    "q11_set_ops"         -> Relational.q11OracleSql,
    "q12_case_agg"        -> Relational.q12OracleSql,
    "q13_order_count_dist" -> Relational.q13OracleSql,
    "q14_scalar_funcs"    -> Relational.q14OracleSql,
    "q15_having_subquery" -> Relational.q15OracleSql,
    "q16_theta_join"      -> Relational.q16OracleSql,
    "q17_in_not_exists"   -> Relational.q17OracleSql,
    "q18_lag_lead"        -> Relational.q18OracleSql,
    "q19_top_k"           -> Relational.q19OracleSql,
  )
}
