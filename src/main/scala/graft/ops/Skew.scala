package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the hot-key joins and aggregations a
  * 100 TB pipeline inevitably hits (a handful of users/documents carrying
  * orders of magnitude more rows than the median key).
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) is the first
  * line of defense and is enabled by this library's sessions; explicit
  * salting remains necessary for skewed AGGREGATIONS with expensive
  * per-group state and for joins whose skew AQE cannot see (e.g. after a
  * non-shuffle stage). These helpers make the two-phase pattern
  * declarative and deterministic.
  */
object Skew {

  /** Salted large⋈small equi-join: the large (skewed) side gets a
    * deterministic salt in [0, buckets); the small side is replicated
    * `buckets` times. The join key becomes (key, salt), spreading each
    * hot key over `buckets` reducers. Row-level results are identical to
    * the unsalted join.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 1, "salting needs >1 bucket")
    // deterministic salt: stable hash of the whole large-side row spread
    // across buckets (monotonically_increasing_id would break retry
    // determinism)
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(buckets.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase salted aggregation: partial aggregate on (keys, salt),
    * final combine on keys. Use for aggregates whose partial state is
    * cheap to merge (sum/count/min/max — exactly the map-side-combinable
    * family). `partials` maps output column -> (partialAgg, finalAgg).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      buckets: Int,
      partials: Map[String, (Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(buckets.toLong)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2._1.as(partials.head._1),
        partials.tail.map { case (n, (p, _)) => p.as(n) }.toSeq: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(partials.head._2._2(col(partials.head._1)).as(partials.head._1),
        partials.tail.map { case (n, (_, f)) => f(col(n)).as(n) }.toSeq: _*)
  }
}
