package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{IcebergReader, IcebergWriter, UnsupportedIcebergFeatureException}

/** Iceberg incremental append scan: added-row provenance from manifest
  * entries (status=ADDED + snapshot id, inside the snapshot's own
  * manifests), `replace` snapshots skipped, `delete`/`overwrite` in
  * range raising, schema evolution unioning by name, and
  * `parent-snapshot-id` lineage stamped on commits. */
class IcebergIncrementalSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-inc").toString

  private def ids(dir: String, from: Option[Long],
      to: Option[Long] = None): Set[Long] =
    IcebergReader.incrementalAppendScan(spark, dir, from, to)
      .select(col("id")).collect().map(_.getLong(0)).toSet

  test("appends report exactly their added rows; carried manifests never re-report") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    IcebergWriter.write(Seq((1L, "a"), (2L, "a")).toDF("id", "p"), dir,
      partitionBy = Seq("p"))
    val s1 = IcebergReader.snapshot(spark, dir).snapshotId
    IcebergWriter.write(Seq((3L, "b")).toDF("id", "p"), dir, mode = "append")
    val s2 = IcebergReader.snapshot(spark, dir).snapshotId
    IcebergWriter.write(Seq((4L, "a"), (5L, "c")).toDF("id", "p"), dir,
      mode = "append")
    // full history from table start
    assert(ids(dir, None) == Set(1L, 2L, 3L, 4L, 5L))
    // exclusive lower bound: appends AFTER s1
    assert(ids(dir, Some(s1)) == Set(3L, 4L, 5L))
    // inclusive upper bound: up to s2 only
    assert(ids(dir, Some(s1), Some(s2)) == Set(3L))
    // empty range
    assert(ids(dir, Some(s2), Some(s2)).isEmpty)
  }

  test("replace (compaction) snapshots are skipped without re-reporting") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "p"), dir,
      partitionBy = Seq("p"))
    val s1 = IcebergReader.snapshot(spark, dir).snapshotId
    IcebergWriter.write(Seq((2L, "a")).toDF("id", "p"), dir, mode = "append")
    IcebergWriter.rewriteDataFiles(spark, dir)
    IcebergWriter.write(Seq((3L, "b")).toDF("id", "p"), dir, mode = "append")
    assert(ids(dir, Some(s1)) == Set(2L, 3L))
  }

  test("a delete snapshot in range raises; after it reads fine") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    IcebergWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "p"), dir,
      partitionBy = Seq("p"))
    val s1 = IcebergReader.snapshot(spark, dir).snapshotId
    IcebergWriter.deleteWhere(spark, dir, col("p") === "a")
    val s2 = IcebergReader.snapshot(spark, dir).snapshotId
    IcebergWriter.write(Seq((3L, "c")).toDF("id", "p"), dir, mode = "append")
    val e = intercept[UnsupportedIcebergFeatureException] {
      ids(dir, Some(s1))
    }
    assert(e.getMessage.contains("'delete' snapshot"))
    assert(ids(dir, Some(s2)) == Set(3L))
  }

  test("schema evolution across the range unions by name") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    IcebergWriter.write(Seq((1L, 1.0)).toDF("id", "v"), dir)
    val s1 = IcebergReader.snapshot(spark, dir).snapshotId
    IcebergWriter.write(Seq((2L, 2.0)).toDF("id", "v"), dir, mode = "append")
    IcebergWriter.write(Seq((3L, 3.0, "x")).toDF("id", "v", "tag"), dir,
      mode = "append")
    val rows = IcebergReader.incrementalAppendScan(spark, dir, Some(s1))
      .select(col("id"), col("tag")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(rows == Set((2L, None), (3L, Some("x"))))
  }

  test("commits stamp parent-snapshot-id lineage") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    IcebergWriter.write(Seq((1L, 1.0)).toDF("id", "v"), dir)
    val s1 = IcebergReader.snapshot(spark, dir).snapshotId
    IcebergWriter.write(Seq((2L, 2.0)).toDF("id", "v"), dir, mode = "append")
    val snaps = IcebergReader.metadataTable(spark, dir, "snapshots")
      .select(col("snapshot_id")).collect().map(_.getLong(0))
    val metaFile = new java.io.File(s"$dir/metadata").listFiles()
      .filter(_.getName.endsWith(".metadata.json"))
      .maxBy(_.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt)
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(metaFile)
    val parents = (0 until meta.get("snapshots").size()).map { i =>
      Option(meta.get("snapshots").get(i).get("parent-snapshot-id"))
        .map(_.asLong)
    }
    assert(parents == Seq(None, Some(s1)))
    assert(snaps.length == 2)
    // spec summary metrics stamped on each snapshot: the append added
    // one file / one record, and totals count the carried seed file
    val sum2 = meta.get("snapshots").get(1).get("summary")
    assert(sum2.get("added-data-files").asText == "1")
    assert(sum2.get("added-records").asText == "1")
    assert(sum2.get("total-data-files").asText == "2")
  }
}
