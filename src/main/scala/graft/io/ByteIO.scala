package graft.io

import java.io.{InputStream, OutputStream}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Object byte-stream API — `s3.download` / `s3.upload`
  * (`s3/_download.py:15`, `s3/_upload.py:15`): whole-object and range
  * reads, bytes and local-file forms, plus raw stream handles. Everything
  * rides the session's Hadoop filesystem, so the same calls address
  * `file://`, HDFS, or any object store the session is configured for.
  *
  * These are driver-side object operations by design (the reference's
  * are too) — dataset-scale moves belong to [[DatasetCopy]] and the
  * distributed readers/writers.
  */
object ByteIO {

  /** Whole object as bytes. */
  def download(spark: SparkSession, path: String): Array[Byte] = {
    val (fs, p) = resolve(spark, path)
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"object too large for a byte array: $len")
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](len.toInt)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }

  /** Byte-range read (`version_id`-less form of the reference's ranged
    * GET): `length < 0` means "to end of object". */
  def downloadRange(spark: SparkSession, path: String, start: Long,
      length: Long = -1L): Array[Byte] = {
    val (fs, p) = resolve(spark, path)
    val total = fs.getFileStatus(p).getLen
    require(start >= 0 && start <= total, s"range start $start of $total")
    val n = if (length < 0) total - start else math.min(length, total - start)
    require(n <= Int.MaxValue, s"range too large for a byte array: $n")
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](n.toInt)
      in.readFully(start, buf)
      buf
    } finally in.close()
  }

  /** Download to a local file; returns bytes copied. */
  def downloadToFile(spark: SparkSession, path: String,
      localPath: String): Long = {
    val (fs, p) = resolve(spark, path)
    val local = new java.io.File(localPath)
    Option(local.getParentFile).foreach(_.mkdirs())
    val in = fs.open(p)
    try java.nio.file.Files.copy(in, local.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
  }

  /** Upload bytes, overwriting any existing object. */
  def upload(spark: SparkSession, bytes: Array[Byte], path: String): Unit = {
    val (fs, p) = resolve(spark, path)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Upload a local file; returns bytes copied. */
  def uploadFromFile(spark: SparkSession, localPath: String,
      path: String): Long = {
    val (fs, p) = resolve(spark, path)
    val out = fs.create(p, true)
    try java.nio.file.Files.copy(new java.io.File(localPath).toPath, out)
    finally out.close()
  }

  /** Raw read stream (the reference's file-like `open_s3_object`). */
  def openRead(spark: SparkSession, path: String): InputStream = {
    val (fs, p) = resolve(spark, path)
    fs.open(p)
  }

  /** Raw write stream; object becomes visible on close. */
  def openWrite(spark: SparkSession, path: String): OutputStream = {
    val (fs, p) = resolve(spark, path)
    fs.create(p, true)
  }

  private def resolve(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }
}
