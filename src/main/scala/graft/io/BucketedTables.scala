package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Shuffle-free co-located joins through Spark's bucketed catalog
  * tables — the engine-side counterpart of the Athena-layout bucketing
  * in [[DatasetWriter]] (which exists for cross-engine file parity; THIS
  * path exists to eliminate the shuffle). Two tables bucketed by the
  * same columns into the same bucket count join with zero Exchange on
  * either side: Spark trusts the on-disk hash partitioning and zips
  * buckets directly — at 100 TB that deletes the single most expensive
  * stage of a fact-fact join. The reference anchors the concept at
  * `s3/_write_dataset.py:170-197` (bucketed dataset writes) and
  * `athena/_read.py` bucketed-table reads; a catalog bucketed table is
  * how a Spark cluster gets the actual benefit.
  *
  * Plan guard: `PlanShapeSpec`/`Round2Spec` assert the bucketed-join
  * plan contains no shuffle below the join.
  */
object BucketedTables {

  /** Persist `df` as a catalog-managed bucketed table (Spark bucket
    * layout — `spark.sql.sources.bucketing.enabled` reads it back with
    * the hash partitioning attached). */
  def saveBucketedTable(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "bucketing requires columns")
    val w0 = df.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val w = if (sortCols.nonEmpty)
      w0.sortBy(sortCols.head, sortCols.tail: _*) else w0
    w.saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket columns — planned
    * without a shuffle on either side. */
  def bucketedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      on: Seq[String],
      joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), on, joinType)
}
