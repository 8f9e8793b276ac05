package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** As-of (temporal) join: for each left row, the most recent right row at
  * or before the left row's timestamp, per key — the lookup every
  * time-series store (the reference's Timestream surface) answers with
  * `ORDER BY time DESC LIMIT 1` subqueries.
  *
  * Composed from built-ins (survey preference (a)): an equi-join on the
  * key plus a range predicate, then a latest-wins window. For keys whose
  * row counts make the intermediate join too wide, [[asofJoinBucketed]]
  * blocks the join by coarse time bucket first (right rows replicated
  * into the buckets they can serve), bounding the join fan-out — the
  * plan that survives dense keys at scale.
  */
object AsOf {

  /** Inner as-of join. `left`/`right` must share `keyCols`; `leftTs` /
    * `rightTs` name the event-time columns. Right columns keep their
    * names; collisions must be resolved by the caller beforehand. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String): DataFrame = {
    require(leftTs != rightTs, "rename one of the time columns first")
    // ASOF semantics match EVERY left row — including fully duplicate
    // ones — so latest-wins partitions on a per-row id, not the left
    // columns (which would collapse duplicates into one output row).
    val lid = left.withColumn("__lid", monotonically_increasing_id())
    val joined = lid.join(right, keyCols ++ Nil, "inner")
      .filter(col(rightTs) <= col(leftTs))
    val w = Window.partitionBy(col("__lid")).orderBy(col(rightTs).desc)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__lid")
  }

  /** Time-bucketed variant: right rows land in every bucket from their
    * own up to `horizonBuckets` ahead, the join keys on (key, bucket),
    * and latest-wins resolves within the bounded candidate set. Matches
    * within `bucketSeconds * horizonBuckets` of look-back. */
  def asofJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      bucketSeconds: Long,
      horizonBuckets: Int): DataFrame = {
    val lb = left.withColumn("__lid", monotonically_increasing_id())
      .withColumn("__bucket",
        (unix_micros(col(leftTs)) / (bucketSeconds * 1000000L)).cast("long"))
    val rb = right.withColumn("__rbucket",
      (unix_micros(col(rightTs)) / (bucketSeconds * 1000000L)).cast("long"))
      .withColumn("__bucket",
        explode(expr(s"sequence(__rbucket, __rbucket + $horizonBuckets)")))
      .drop("__rbucket")
    val joined = lb.join(rb, keyCols :+ "__bucket")
      .filter(col(rightTs) <= col(leftTs))
    // per-row id for the same duplicate-left reason as [[asofJoin]]; a
    // row matched in several buckets also resolves to one winner here
    val w = Window.partitionBy(col("__lid")).orderBy(col(rightTs).desc)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__bucket", "__lid")
  }

  /** Oracle-gated query: for each click, the latest prior purchase by the
    * same user (ids only — see the oracle's native ASOF JOIN). */
  def clickToPurchase(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    asofJoin(clicks, purchases, Seq("user_id"), "click_ts", "purchase_ts")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("purchase_ts")))
          .as("lag_us"))
  }

  def clickToPurchaseOracle: String =
    """WITH clicks AS (
      |  SELECT user_id, event_id AS click_id, cast(ts as timestamp) AS click_ts
      |  FROM events WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT user_id, event_id AS purchase_id, cast(ts as timestamp) AS purchase_ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT c.user_id, c.click_id, p.purchase_id,
      |  epoch_us(c.click_ts) - epoch_us(p.purchase_ts) AS lag_us
      |FROM clicks c
      |ASOF JOIN purchases p
      |  ON c.user_id = p.user_id AND c.click_ts >= p.purchase_ts""".stripMargin
}
