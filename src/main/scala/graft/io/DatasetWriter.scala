package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.expr.AthenaBucketHash
import graft.types.AthenaTypes

/** Dataset write semantics of the reference (`s3.to_parquet` with
  * `dataset=True` — `s3/_write_parquet.py:340-752`, `_to_dataset`
  * `s3/_write_dataset.py:199-266`) on the DataFrameWriter:
  *
  *  - modes: append / overwrite (delete prefix) / overwrite_partitions
  *    (replace only matched partitions — dynamic partition overwrite)
  *  - hive partitioning (`partitionBy`), `max_rows_by_file`
  *    (`maxRecordsPerFile`), compression
  *  - Athena/Hive-compatible bucketing via [[graft.expr.AthenaBucketHash]]
  *    with one file per bucket named `…_bucket-NNNNN` (layout parity with
  *    `s3/_write_dataset.py:170-197`); Spark `bucketBy` (Murmur3) would
  *    not be readable as an Athena bucketed table
  *  - optional schema-evolution gate: appends may add columns, never
  *    change types (`s3/_write.py:352-354` check_schema_changes)
  *
  * Scale: the partition fan-out is the standard shuffle-free dynamic
  * write (each task writes the partitions it holds); bucketing
  * repartitions on the bucket id so every bucket is produced by exactly
  * one task — the same data movement Hive's bucketed-table writer does.
  */
object DatasetWriter {

  sealed trait WriteMode
  case object Append extends WriteMode
  case object Overwrite extends WriteMode
  case object OverwritePartitions extends WriteMode

  final case class BucketingInfo(cols: Seq[String], numBuckets: Int)

  /** Iceberg-style partition transforms (`athena/_write_iceberg.py:269-281`
    * `_extract_column_from_partition_transform`): derive a partition
    * column from an expression — `day(ts)`, `month(ts)`, `year(ts)`,
    * `bucket(n, col)` (Athena hash), `truncate(w, col)`. Returns the
    * DataFrame with the derived column appended; pass its name to
    * `partitionCols`.
    */
  def withPartitionTransform(df: DataFrame, transform: String): DataFrame = {
    val Pattern = "([a-z]+)\\(([^)]*)\\)".r
    transform.trim match {
      case Pattern("day", c) =>
        df.withColumn(s"${c.trim}_day",
          date_format(col(c.trim), "yyyy-MM-dd"))
      case Pattern("month", c) =>
        df.withColumn(s"${c.trim}_month", date_format(col(c.trim), "yyyy-MM"))
      case Pattern("year", c) =>
        df.withColumn(s"${c.trim}_year", year(col(c.trim)))
      case Pattern("hour", c) =>
        df.withColumn(s"${c.trim}_hour",
          date_format(col(c.trim), "yyyy-MM-dd-HH"))
      case Pattern("bucket", args) =>
        val Array(n, c) = args.split(",").map(_.trim)
        AthenaBucketHash.register(df.sparkSession)
        df.withColumn(s"${c}_bucket",
          pmod(call_function("athena_bucket_hash", col(c)), lit(n.toLong))
            .cast("int"))
      case Pattern("truncate", args) =>
        val Array(w, c) = args.split(",").map(_.trim)
        df.withColumn(s"${c}_trunc", substring(col(c), 1, w.toInt))
      case other =>
        throw new IllegalArgumentException(s"unknown partition transform: $other")
    }
  }

  def toParquet(
      df: DataFrame,
      path: String,
      mode: WriteMode = Append,
      partitionCols: Seq[String] = Nil,
      bucketing: Option[BucketingInfo] = None,
      maxRowsByFile: Option[Long] = None,
      compression: String = "snappy",
      schemaEvolution: Boolean = true,
      sanitizeColumns: Boolean = false): Unit =
    write(df, path, "parquet", mode, partitionCols, bucketing, maxRowsByFile,
      Map("compression" -> compression), schemaEvolution, sanitizeColumns)

  def toCsv(df: DataFrame, path: String, mode: WriteMode = Append,
      partitionCols: Seq[String] = Nil, header: Boolean = true,
      options: Map[String, String] = Map.empty): Unit =
    write(df, path, "csv", mode, partitionCols, None, None,
      options + ("header" -> header.toString), schemaEvolution = true,
      sanitize = false)

  def toJson(df: DataFrame, path: String, mode: WriteMode = Append,
      partitionCols: Seq[String] = Nil,
      options: Map[String, String] = Map.empty): Unit =
    write(df, path, "json", mode, partitionCols, None, None, options,
      schemaEvolution = true, sanitize = false)

  def toOrc(df: DataFrame, path: String, mode: WriteMode = Append,
      partitionCols: Seq[String] = Nil,
      compression: String = "snappy"): Unit =
    write(df, path, "orc", mode, partitionCols, None, None,
      Map("compression" -> compression), schemaEvolution = true,
      sanitize = false)

  private def write(
      df0: DataFrame,
      path: String,
      format: String,
      mode: WriteMode,
      partitionCols: Seq[String],
      bucketing: Option[BucketingInfo],
      maxRowsByFile: Option[Long],
      options: Map[String, String],
      schemaEvolution: Boolean,
      sanitize: Boolean): Unit = {
    val spark = df0.sparkSession
    val df = if (sanitize) AthenaTypes.sanitizeColumns(df0) else df0

    if (mode == Append && !schemaEvolution && format == "parquet")
      checkSchemaChanges(df, path)

    // any dataset mutation stops cached query results from being served
    try graft.sql.SqlEngine.noteDatasetWrite(spark) catch { case _: Throwable => }

    bucketing match {
      case Some(b) => writeBucketed(df, path, format, mode, partitionCols, b,
        options)
      case None =>
        val writer0 = df.write.format(format).options(options)
        val writer = maxRowsByFile
          .map(n => writer0.option("maxRecordsPerFile", n.toString))
          .getOrElse(writer0)
        val parted =
          if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
          else writer
        mode match {
          case Append => parted.mode(SaveMode.Append).save(path)
          case Overwrite => parted.mode(SaveMode.Overwrite).save(path)
          case OverwritePartitions =>
            require(partitionCols.nonEmpty,
              "overwrite_partitions requires partition columns " +
                "(s3/_write_dataset.py:215-222 mode validation)")
            withConf(spark, "spark.sql.sources.partitionOverwriteMode",
              "dynamic") {
              parted.mode(SaveMode.Overwrite).save(path)
            }
        }
    }
  }

  /** Bucketed write: assign `__bucket = pmod(athena_hash(cols), n)`,
    * repartition on it (one task per bucket), write partitioned by
    * (partitionCols…, __bucket), then normalize the `__bucket=K/part-…`
    * files to the reference's `…_bucket-NNNNN.ext` flat naming. The
    * rename pass is one filesystem op per written file.
    */
  private def writeBucketed(
      df: DataFrame,
      path: String,
      format: String,
      mode: WriteMode,
      partitionCols: Seq[String],
      b: BucketingInfo,
      options: Map[String, String]): Unit = {
    val spark = df.sparkSession
    AthenaBucketHash.register(spark)
    val bucketCol = pmod(
      call_function("athena_bucket_hash", b.cols.map(col): _*),
      lit(b.numBuckets.toLong)).cast("int")
    val withBucket = df.withColumn("__bucket", bucketCol)
      .repartition(b.numBuckets, col("__bucket"))
    val writer = withBucket.write.format(format).options(options)
      .partitionBy((partitionCols :+ "__bucket"): _*)
    val saveMode = mode match {
      case Append => SaveMode.Append
      case _ => SaveMode.Overwrite
    }
    mode match {
      case OverwritePartitions if partitionCols.isEmpty =>
        // no partition columns to scope the overwrite: the reference
        // treats this as a full-prefix delete (s3/_write_dataset.py:92-93)
        writer.mode(SaveMode.Overwrite).save(path)
      case OverwritePartitions =>
        // The previous bucketed write flattened files to
        // `part=X/*_bucket-K.ext`, so dynamic overwrite (which replaces
        // only the new `part=X/__bucket=K` leaf dirs) would leave them
        // behind as duplicates. Delete the rewritten partitions' prior
        // bucket files first (s3/_write_dataset.py:219-220 deletes the
        // matched partition prefix before writing).
        deletePriorBucketFiles(df, path, partitionCols)
        withConf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic") {
          writer.mode(saveMode).save(path)
        }
      case _ => writer.mode(saveMode).save(path)
    }
    normalizeBucketFiles(spark, path, format)
  }

  private def deletePriorBucketFiles(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val spark = df.sparkSession
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) return
    val parts = df.select(partitionCols.map(col): _*).distinct().collect()
    parts.foreach { r =>
      val rel = partitionCols.map { c =>
        val v = r.getAs[Any](c)
        ExternalCatalogUtils.getPartitionPathString(c,
          if (v == null) null else v.toString)
      }.mkString("/")
      val dir = new Path(path, rel)
      if (fs.exists(dir))
        fs.listStatus(dir)
          .filter(f => f.isFile && f.getPath.getName.contains("_bucket-"))
          .foreach(f => fs.delete(f.getPath, false))
    }
  }

  /** Move `…/__bucket=K/<file>` to `…/<file>_bucket-0000K.<ext>`. */
  private def normalizeBucketFiles(
      spark: org.apache.spark.sql.SparkSession, path: String,
      format: String): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def walk(dir: Path): Unit =
      fs.listStatus(dir).foreach { st =>
        if (st.isDirectory) {
          val name = st.getPath.getName
          if (name.startsWith("__bucket=")) {
            val k = name.stripPrefix("__bucket=").toInt
            fs.listStatus(st.getPath).filterNot(_.getPath.getName.startsWith("_"))
              .foreach { f =>
                val base = f.getPath.getName.takeWhile(_ != '.')
                // drop Spark's ".c000" sequence marker from the extension
                val ext = f.getPath.getName.dropWhile(_ != '.')
                  .replaceAll("^\\.c\\d+", "")
                fs.rename(f.getPath,
                  new Path(dir, f"${base}_bucket-$k%05d$ext"))
              }
            fs.delete(st.getPath, true)
          } else walk(st.getPath)
        }
      }
    walk(root)
  }

  /** Append-mode schema gate: existing dataset columns must keep their
    * types; brand-new columns are the (allowed) evolution case. */
  private def checkSchemaChanges(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) return
    val existing =
      try spark.read.parquet(path).schema
      catch { case _: Throwable => return }
    val current = df.schema
    existing.fields.foreach { f =>
      current.fields.find(_.name == f.name).foreach { g =>
        require(g.dataType == f.dataType,
          s"schema change on '${f.name}': ${f.dataType.simpleString} -> " +
            s"${g.dataType.simpleString} (schema_evolution=False)")
      }
    }
  }

  private def withConf[T](spark: org.apache.spark.sql.SparkSession,
      key: String, value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
