package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{IcebergReader, IcebergWriter, UnsupportedIcebergFeatureException}

/** Iceberg name-mapping (spec "Column Projection"): id-less files
  * imported with `add_files`-style registration resolve against the
  * id-carrying table schema through `schema.name-mapping.default` —
  * the reference's pyiceberg read path for imported tables. Covers the
  * mixed-file scan split, rename safety on BOTH file kinds, the
  * null-projection rule for unmapped columns, deletes over a mixed
  * scan, and the loud up-front raise when a mixed table has no
  * mapping. */
class IcebergNameMappingSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-nm").toString

  private def df(rows: (Long, String, String)*): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("id", "v", "p")
  }

  /** One id-less parquet file (plain Spark write carries no field-ids
    * unless the schema asks) holding `rows`; returns its path. */
  private def idlessFile(dir: String, rows: DataFrame): String = {
    val staging = s"$dir-staging"
    rows.coalesce(1).write.mode("overwrite").parquet(staging)
    val f = new java.io.File(staging).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    f.getAbsolutePath
  }

  private def asMap(d: DataFrame): Map[Long, String] =
    d.select("id", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("add_files: imported id-less files read next to native files") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x"), (2L, "b", "y")), dir, mode = "error")
    val imported = idlessFile(dir, df((3L, "c", "x"), (4L, "d", "y")))
    IcebergWriter.addFiles(spark, dir, Seq(imported))
    // the mapping was installed automatically
    val snap = IcebergReader.snapshot(spark, dir)
    assert(snap.properties.contains("schema.name-mapping.default"))
    assert(asMap(IcebergReader.read(spark, dir)) ==
      Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
  }

  test("rename: both native and imported files resolve the renamed column") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x")), dir, mode = "error")
    val imported = idlessFile(dir, df((2L, "b", "y")))
    IcebergWriter.addFiles(spark, dir, Seq(imported))
    IcebergWriter.renameColumn(spark, dir, "v", "val")
    // a post-rename native append writes files under the NEW name
    val spark0 = spark
    import spark0.implicits._
    IcebergWriter.write(Seq((3L, "c", "x")).toDF("id", "val", "p"),
      dir, mode = "append")
    val out = IcebergReader.read(spark, dir)
    assert(out.columns.toSeq == Seq("id", "val", "p"))
    val m = out.select("id", "val").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // native pre-rename file resolves by field-id, imported id-less file
    // through the mapping's historical name, post-rename file directly
    assert(m == Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("unmapped column projects null for imported rows") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x")), dir, mode = "error")
    val spark0 = spark
    import spark0.implicits._
    // imported file lacks the `p` column entirely
    val narrow = idlessFile(dir, Seq((2L, "b")).toDF("id", "v"))
    IcebergWriter.addFiles(spark, dir, Seq(narrow))
    val rows = IcebergReader.read(spark, dir)
      .select("id", "v", "p").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
    assert(rows == Set((1L, "a", Some("x")), (2L, "b", None)))
  }

  test("deleteWhere spans both file kinds through the mapped scan") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x"), (2L, "b", "y")), dir, mode = "error")
    val imported = idlessFile(dir, df((3L, "a", "x"), (4L, "d", "y")))
    IcebergWriter.addFiles(spark, dir, Seq(imported))
    // one predicate matches rows in the native AND the imported file —
    // the position-delete build runs over the name-mapped union scan
    IcebergWriter.deleteWhere(spark, dir, col("v") === "a")
    assert(asMap(IcebergReader.read(spark, dir)) ==
      Map(2L -> "b", 4L -> "d"))
    val snap = IcebergReader.snapshot(spark, dir)
    assert(snap.deleteFiles.nonEmpty, "zero-rewrite position deletes")
  }

  test("mixed table WITHOUT a mapping raises naming the property") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x")), dir, mode = "error")
    val imported = idlessFile(dir, df((2L, "b", "y")))
    IcebergWriter.addFiles(spark, dir, Seq(imported))
    // strip the mapping the way a foreign writer that never set one
    // would leave the table
    val metaDir = new java.io.File(s"$dir/metadata")
    val newest = metaDir.listFiles()
      .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .maxBy(_.getName.stripPrefix("v").stripSuffix(".metadata.json").toLong)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(newest)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.get("properties")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .remove("schema.name-mapping.default")
    val v = newest.getName.stripPrefix("v")
      .stripSuffix(".metadata.json").toLong + 1
    java.nio.file.Files.write(
      new java.io.File(metaDir, s"v$v.metadata.json").toPath,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    val ex = intercept[UnsupportedIcebergFeatureException] {
      IcebergReader.read(spark, dir).collect()
    }
    assert(ex.getMessage.contains("name-mapping"))
  }

  test("properties survive data commits") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x")), dir, mode = "error")
    IcebergWriter.setProperties(spark, dir, Map("graft.test" -> "keep"))
    IcebergWriter.write(df((2L, "b", "y")), dir, mode = "append")
    val snap = IcebergReader.snapshot(spark, dir)
    assert(snap.properties.get("graft.test").contains("keep"))
  }
}
