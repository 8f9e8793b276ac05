package graft.table

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.DatasetWriter

/** Table-format DML — the MERGE/DELETE/upsert surface of the reference
  * (`athena/_write_iceberg.py:297-393` MERGE INTO generation,
  * `715-868` delete-from, `redshift/_write.py:544-769` upsert with
  * `precombine_key`, `timestream/_write.py` version upsert) implemented
  * as copy-on-write over parquet datasets (no Delta/Iceberg jars in this
  * environment — the op semantics, not the log format, are the surface).
  *
  * Scale design: with partition columns declared, only partitions that
  * contain matched keys are rewritten (dynamic partition overwrite) —
  * the same copy-on-write granularity Iceberg/Delta use for
  * non-deletion-vector tables. The key match is a shuffle join on the
  * merge keys; the source side is broadcast when small.
  */
object MergeOps {

  /** MERGE … WHEN MATCHED THEN UPDATE (replace row) WHEN NOT MATCHED
    * THEN INSERT — the `athena.to_iceberg(merge_cols=…)` semantic.
    * Returns the merged row count.
    */
  def upsert(
      spark: SparkSession,
      targetPath: String,
      source: DataFrame,
      keys: Seq[String],
      partitionCols: Seq[String] = Nil): Long = {
    require(keys.nonEmpty, "merge requires key columns")
    val target = spark.read.option("basePath", targetPath).parquet(targetPath)

    if (partitionCols.isEmpty) {
      val kept = target.join(source.select(keys.map(col): _*).distinct(),
        keys, "left_anti")
      // localCheckpoint truncates the file-source lineage so the target
      // path can be overwritten (a log-based format swaps metadata instead)
      val merged = kept.unionByName(source.select(target.columns.map(col): _*))
        .localCheckpoint(true)
      val n = merged.count()
      DatasetWriter.toParquet(merged, targetPath,
        mode = DatasetWriter.Overwrite)
      n
    } else {
      // rewrite only partitions containing matched keys + the source rows
      val affected = source.select(partitionCols.map(col): _*).distinct()
      val targetAffected = target.join(broadcast(affected), partitionCols)
      val kept = targetAffected.join(
        source.select(keys.map(col): _*).distinct(), keys, "left_anti")
      val merged = kept.unionByName(source.select(target.columns.map(col): _*))
        .localCheckpoint(true)
      val n = merged.count()
      DatasetWriter.toParquet(merged, targetPath,
        mode = DatasetWriter.OverwritePartitions,
        partitionCols = partitionCols)
      n
    }
  }

  /** DELETE FROM target WHERE key IN (source keys) — the
    * `athena.delete_from_iceberg_table` semantic. */
  def deleteMatched(
      spark: SparkSession,
      targetPath: String,
      keys: DataFrame,
      keyCols: Seq[String]): Long = {
    val target = spark.read.parquet(targetPath)
    val remaining = target
      .join(broadcast(keys.select(keyCols.map(col): _*).distinct()),
        keyCols, "left_anti")
      .localCheckpoint(true)
    val n = remaining.count()
    DatasetWriter.toParquet(remaining, targetPath,
      mode = DatasetWriter.Overwrite)
    n
  }

  /** Upsert with a precombine column (`redshift.copy(mode="upsert",
    * precombine_key=…)` / Timestream `version`): on key collision the row
    * with the greatest precombine value wins — including collisions
    * within the source batch itself.
    */
  def versionedUpsert(
      spark: SparkSession,
      targetPath: String,
      source: DataFrame,
      keys: Seq[String],
      precombine: String): Long = {
    val target = spark.read.parquet(targetPath)
    val all = target.unionByName(source.select(target.columns.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(precombine).desc)
    val deduped = all
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .localCheckpoint(true)
    val n = deduped.count()
    DatasetWriter.toParquet(deduped, targetPath,
      mode = DatasetWriter.Overwrite)
    n
  }
}
