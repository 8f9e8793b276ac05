package graft.io

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Dataset-to-dataset transfer — `s3.merge_datasets` / `s3.copy_objects`
  * (`s3/_copy.py:75-283`) and `s3.delete_objects` (`s3/_delete.py`).
  * Merging goes through a read→write pipeline so format/partitioning can
  * change in flight; raw copy preserves files byte-for-byte.
  */
object DatasetCopy {

  /** Merge a source dataset into a target with the standard mode matrix
    * (append / overwrite / overwrite_partitions). */
  def mergeDatasets(
      spark: SparkSession,
      sourcePath: String,
      targetPath: String,
      mode: DatasetWriter.WriteMode = DatasetWriter.Append,
      partitionCols: Seq[String] = Nil): Unit = {
    val src = spark.read.option("basePath", sourcePath).parquet(sourcePath)
    DatasetWriter.toParquet(src, targetPath, mode = mode,
      partitionCols = partitionCols)
  }

  /** Byte-for-byte object copy (server-side copy analogue). */
  def copyObjects(spark: SparkSession, sourcePath: String,
      targetPath: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(sourcePath)
    val dst = new Path(targetPath)
    val fs = src.getFileSystem(conf)
    FileUtil.copy(fs, src, dst.getFileSystem(conf), dst,
      /* deleteSource = */ false, /* overwrite = */ true, conf)
  }

  /** Recursive prefix delete (`s3.delete_objects`). */
  def deleteObjects(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
