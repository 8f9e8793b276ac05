package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S3 Tables bucket/namespace/table management — the reference's
  * `s3.create_table_bucket` / `create_namespace` / `create_table` /
  * `delete_*` surface over its Iceberg-backed table buckets
  * (`s3/_s3_tables_iceberg.py`; bucket mgmt in the same module family).
  * A table BUCKET is a root directory with a marker file, a NAMESPACE a
  * child directory, and a TABLE a real Iceberg table ([[IcebergWriter]]
  * metadata — `create_table` declares an empty table whose first append
  * commits against the declared schema). All metadata is driver-side
  * (one small file per object, the catalog cost every engine pays);
  * table data stays fully distributed.
  */
object S3Tables {

  private val BucketMarker = "_table_bucket.json"

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def createTableBucket(spark: SparkSession, bucketPath: String): Unit = {
    val (fs, p) = fsFor(spark, bucketPath)
    fs.mkdirs(p)
    val out = fs.create(new Path(p, BucketMarker), true)
    try out.write(
      s"""{"createdMs":${System.currentTimeMillis()}}""".getBytes("UTF-8"))
    finally out.close()
  }

  def isTableBucket(spark: SparkSession, bucketPath: String): Boolean = {
    val (fs, p) = fsFor(spark, bucketPath)
    fs.exists(new Path(p, BucketMarker))
  }

  def deleteTableBucket(spark: SparkSession, bucketPath: String): Unit = {
    require(listNamespaces(spark, bucketPath).isEmpty,
      s"table bucket $bucketPath still holds namespaces")
    val (fs, p) = fsFor(spark, bucketPath)
    fs.delete(p, true)
  }

  def createNamespace(spark: SparkSession, bucketPath: String,
      namespace: String): Unit = {
    require(isTableBucket(spark, bucketPath),
      s"$bucketPath is not a table bucket (create_table_bucket first)")
    val (fs, p) = fsFor(spark, bucketPath)
    fs.mkdirs(new Path(p, namespace))
  }

  def listNamespaces(spark: SparkSession, bucketPath: String): Seq[String] = {
    val (fs, p) = fsFor(spark, bucketPath)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .toSeq.sorted
  }

  def deleteNamespace(spark: SparkSession, bucketPath: String,
      namespace: String): Unit = {
    require(listTables(spark, bucketPath, namespace).isEmpty,
      s"namespace $namespace still holds tables")
    val (fs, p) = fsFor(spark, bucketPath)
    fs.delete(new Path(p, namespace), true)
  }

  private def tablePath(bucketPath: String, namespace: String,
      table: String): String = s"$bucketPath/$namespace/$table"

  /** `create_table`: declare an empty Iceberg table under the
    * namespace; its first append commits against the declared schema. */
  def createTable(spark: SparkSession, bucketPath: String,
      namespace: String, table: String, schema: StructType,
      partitionBy: Seq[String] = Nil): Unit = {
    require(listNamespaces(spark, bucketPath).contains(namespace),
      s"no namespace $namespace in $bucketPath")
    IcebergWriter.createEmpty(spark,
      tablePath(bucketPath, namespace, table), schema, partitionBy)
  }

  def listTables(spark: SparkSession, bucketPath: String,
      namespace: String): Seq[String] = {
    val (fs, p) = fsFor(spark, s"$bucketPath/$namespace")
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
      .filter(d => IcebergReader.isIcebergTable(spark, d.toString))
      .map(_.getName).toSeq.sorted
  }

  def deleteTable(spark: SparkSession, bucketPath: String,
      namespace: String, table: String): Unit = {
    val (fs, _) = fsFor(spark, bucketPath)
    fs.delete(new Path(tablePath(bucketPath, namespace, table)), true)
  }

  /** `s3.to_iceberg(table_bucket_arn=…, namespace=…, table=…)` shape. */
  def toIceberg(df: DataFrame, bucketPath: String, namespace: String,
      table: String, mode: String = "append",
      mergeCols: Seq[String] = Nil): Unit =
    TableFormats.toIceberg(df, tablePath(bucketPath, namespace, table),
      mode, mergeCols)

  /** `s3.from_iceberg(table_bucket_arn=…, …)` shape. */
  def fromIceberg(spark: SparkSession, bucketPath: String,
      namespace: String, table: String,
      snapshotId: Option[Long] = None): DataFrame =
    IcebergReader.read(spark, tablePath(bucketPath, namespace, table),
      snapshotId)
}
