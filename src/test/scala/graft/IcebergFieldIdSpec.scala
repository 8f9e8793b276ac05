package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{IcebergReader, IcebergWriter}

/** Field-id interop (round 6): graft-written Iceberg data files embed
  * parquet field-ids (the spec requires them of native writers), and the
  * reader resolves columns BY id when files carry them — so a column
  * renamed in the table schema still reads its old-named files correctly,
  * where name matching silently nulls the column. */
class IcebergFieldIdSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-fid").toString

  private def df(rows: (Long, String, String)*): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("id", "v", "p")
  }

  private def parquetFieldIds(path: String): Map[String, Int] = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new Path(path), spark.sparkContext.hadoopConfiguration)
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try rdr.getFileMetaData.getSchema.getFields.asScala
      .filter(_.getId != null).map(f => f.getName -> f.getId.intValue).toMap
    finally rdr.close()
  }

  test("written data files carry the metadata's positional field-ids") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x"), (2L, "b", "y")), dir,
      mode = "error")
    val snap = IcebergReader.snapshot(spark, dir)
    assert(snap.files.nonEmpty)
    val ids = parquetFieldIds(snap.files.head.path)
    // positional assignment: id=1, v=2, p=3 — matching fieldIdToName
    assert(ids == Map("id" -> 1, "v" -> 2, "p" -> 3))
    assert(snap.fieldIdToName == Map(1 -> "id", 2 -> "v", 3 -> "p"))
  }

  test("renamed column resolves by field-id from old-named files") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x"), (2L, "b", "y")), dir,
      mode = "error")
    // rename v -> v_renamed in the CURRENT metadata only (files keep the
    // old name) — what an external engine's ALTER TABLE RENAME does
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(dir, "metadata")
    val latest = fs.listStatus(metaDir).map(_.getPath)
      .filter(_.getName.endsWith(".metadata.json"))
      .maxBy(_.getName)
    val txt = new String(
      org.apache.commons.io.IOUtils.toByteArray(fs.open(latest)), "UTF-8")
    assert(txt.contains("\"v\""))
    val renamed = txt.replace("\"name\" : \"v\"", "\"name\" : \"v_renamed\"")
    val out = fs.create(latest, true)
    out.write(renamed.getBytes("UTF-8")); out.close()

    val got = IcebergReader.read(spark, dir)
    assert(got.columns.toSeq == Seq("id", "v_renamed", "p"))
    val vals = got.select("id", "v_renamed").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // name matching would yield nulls here; id matching must not
    assert(vals == Map(1L -> "a", 2L -> "b"))
  }

  test("rename survives the delete-application read path") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "x")),
      dir, mode = "error")
    IcebergWriter.deleteWhere(spark, dir, col("id") === 2L)
    // rename AFTER the position-delete commit
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(dir, "metadata")
    val latest = fs.listStatus(metaDir).map(_.getPath)
      .filter(_.getName.endsWith(".metadata.json"))
      .maxBy(_.getName)
    val txt = new String(
      org.apache.commons.io.IOUtils.toByteArray(fs.open(latest)), "UTF-8")
    val out = fs.create(latest, true)
    out.write(txt.replace("\"name\" : \"v\"", "\"name\" : \"v_renamed\"")
      .getBytes("UTF-8")); out.close()

    val got = IcebergReader.read(spark, dir)
      .select("id", "v_renamed").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 3L -> "c"))
  }

  test("position-delete files carry the spec's reserved field-ids") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x"), (2L, "b", "y")), dir,
      mode = "error")
    IcebergWriter.deleteWhere(spark, dir, col("id") === 1L)
    val snap = IcebergReader.snapshot(spark, dir)
    assert(snap.deleteFiles.nonEmpty)
    val ids = parquetFieldIds(snap.deleteFiles.head.path)
    assert(ids == Map("file_path" -> 2147483546, "pos" -> 2147483545))
  }

  test("caller session conf is untouched by an id-resolving read") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x")), dir, mode = "error")
    IcebergReader.read(spark, dir).collect()
    assert(spark.conf.get(
      "spark.sql.parquet.fieldId.read.enabled") == "false")
  }
}
