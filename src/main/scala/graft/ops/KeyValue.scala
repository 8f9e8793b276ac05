package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Key-value access patterns — the DynamoDB-shaped surface of the
  * reference (`dynamodb/_read.py:459-770`): point get, key-condition range
  * query, filtered parallel scan with projection. On Spark these are
  * filters over a keyed table; partition/file pruning plays the role of
  * the key index (at scale the table is bucketed or Z-ordered on the key,
  * and the reference's "parallel scan segments" are simply input splits).
  */
object KeyValue {

  /** Point lookup by primary key + projection (`get_item` with
    * `columns=`). Pushes an equality predicate into the scan. */
  def pointLookup(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_custkey") === 42L)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"))

  def pointLookupOracle: String =
    """SELECT c_custkey, c_name, c_acctbal, c_mktsegment
      |FROM customer WHERE c_custkey = 42""".stripMargin

  /** Key-condition range query (`query` with KeyConditionExpression):
    * partition key equality + sort-key range + FilterExpression +
    * projection — all pushed predicates. */
  def rangeQuery(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("user_id") === 7L &&
        col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-20 00:00:00").cast("timestamp") &&
        col("event_type").isin("click", "view", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"))

  def rangeQueryOracle: String =
    """SELECT event_id, user_id, event_type,
      |  epoch_us(cast(ts as timestamp)) AS ts_us, value
      |FROM events
      |WHERE user_id = 7
      |  AND cast(ts as timestamp) >= TIMESTAMP '2024-01-10 00:00:00'
      |  AND cast(ts as timestamp) < TIMESTAMP '2024-01-20 00:00:00'
      |  AND event_type IN ('click','view','purchase')""".stripMargin

  /** Batch get (`batch_get_item`): IN-list of keys, semi-join shaped.
    * At scale an IN-list of thousands becomes a broadcast semi-join. */
  def batchGet(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_custkey").isin(1L, 5L, 9L, 13L, 21L, 34L, 55L, 89L))
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))

  def batchGetOracle: String =
    """SELECT c_custkey, c_name, c_nationkey FROM customer
      |WHERE c_custkey IN (1,5,9,13,21,34,55,89)""".stripMargin
}
