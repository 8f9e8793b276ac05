package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{IcebergReader, IcebergWriter, TableFormats}

/** The Athena-style Iceberg metadata relations (`$files`, `$snapshots`,
  * `$history`, `$manifests`, `$partitions`, `$refs`) reconstructed from
  * the metadata json + manifest avros — inspection queries that never
  * scan data.
  */
class IcebergMetadataTablesSpec extends AnyFunSuite {
  import TestSpark._

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("graft-mdt").toString
    val spark0 = spark
    import spark0.implicits._
    val b1 = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
      .toDF("id", "grp", "v")
    IcebergWriter.write(b1, dir, partitionBy = Seq("grp"))
    IcebergWriter.write(Seq((4L, "c", 4.0)).toDF("id", "grp", "v"), dir)
    IcebergWriter.setRef(spark, dir, "stable")
    dir
  }

  test("$snapshots and $history track the commits; $refs the tag") {
    val dir = mkTable()
    val snaps = TableFormats.icebergMetadataTable(spark, dir, "$snapshots")
    assert(snaps.columns.toSeq == Seq("committed_at", "snapshot_id",
      "operation", "manifest_list"))
    assert(snaps.count() == 2)
    assert(snaps.where(col("operation") === "append").count() == 2)
    val hist = IcebergReader.metadataTable(spark, dir, "history")
    assert(hist.count() == 2)
    assert(hist.where(col("is_current")).count() == 1)
    val refs = IcebergReader.metadataTable(spark, dir, "refs")
    val stable = refs.where(col("name") === "stable").head
    assert(stable.getAs[String]("type") == "tag")
  }

  test("$files reports every live data file with its partition tuple") {
    val dir = mkTable()
    val files = IcebergReader.metadataTable(spark, dir, "files")
    assert(files.where(col("content") === 0).count() == 4) // one per (grp, commit)
    val grps = files.select(element_at(col("partition"), "grp"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(grps == Seq("a", "a", "b", "c"))
    assert(files.where(col("record_count") =!= 1L).isEmpty)
  }

  test("$partitions aggregates files per partition tuple and spec") {
    val dir = mkTable()
    val parts = IcebergReader.metadataTable(spark, dir, "partitions")
      .orderBy(element_at(col("partition"), "grp")).collect()
    assert(parts.map(r => (r.getAs[Map[String, String]]("partition")("grp"),
      r.getAs[Long]("record_count"), r.getAs[Long]("file_count"))).toSeq ==
      Seq(("a", 2L, 2L), ("b", 1L, 1L), ("c", 1L, 1L)))
  }

  test("$manifests lists the current snapshot's manifests with spec ids") {
    val dir = mkTable()
    val m = IcebergReader.metadataTable(spark, dir, "manifests")
    assert(m.count() >= 2) // the append carries the first commit's manifest
    assert(m.where(col("content") =!= 0).isEmpty) // no delete manifests
    assert(m.where(col("length") <= 0L).isEmpty)
    // after partition-spec evolution the NEW manifest carries the new id
    IcebergWriter.updatePartitionSpec(spark, dir, Seq("grp", "id"))
    val spark0 = spark
    import spark0.implicits._
    IcebergWriter.write(Seq((5L, "d", 5.0)).toDF("id", "grp", "v"), dir)
    val m2 = IcebergReader.metadataTable(spark, dir, "manifests")
    assert(m2.select("partition_spec_id").distinct().collect()
      .map(_.getInt(0)).toSet == Set(0, 1))
    val f2 = IcebergReader.metadataTable(spark, dir, "files")
    assert(f2.where(col("spec_id") === 1).count() == 1)
  }
}
