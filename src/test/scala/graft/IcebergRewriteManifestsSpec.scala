package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{IcebergReader, IcebergWriter}

/** rewrite_manifests: metadata compaction. Many-commit tables collapse
  * to ONE data manifest; content, delete ordering (explicit per-entry
  * sequence numbers), row lineage and DV references must all survive
  * the move, and the commit must touch no data files. */
class IcebergRewriteManifestsSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String =
    Files.createTempDirectory("graft-rwm").toString + "/t"

  test("many append commits collapse to one data manifest, rows identical") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    (0 until 5).foreach { b =>
      IcebergWriter.write(
        (1L to 10L).map(i => (b * 10L + i, s"r$b-$i")).toDF("id", "v"), dir)
    }
    val before = IcebergReader.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val filesBefore = IcebergReader.snapshotOpt(spark, dir).get
      .files.map(_.path).toSet
    val c = IcebergWriter.rewriteManifests(spark, dir)
    assert(c.numFiles == filesBefore.size) // every live file carried
    val snap = IcebergReader.snapshotOpt(spark, dir).get
    assert(snap.files.map(_.path).toSet == filesBefore) // zero data rewrite
    val after = IcebergReader.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before)
    // a second rewrite is a no-op (already one manifest)
    val c2 = IcebergWriter.rewriteManifests(spark, dir)
    assert(c2.numFiles == 0)
  }

  test("equality-delete sequence ordering survives the rewrite") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    // append k=1 at seq 1, then upsert k=1 at seq 2 (one commit: the
    // replacement row + an equality-delete file). The delete applies
    // only to files with a LOWER sequence — if the rewrite re-bound
    // entry sequence numbers to the new manifest's, the replacement
    // row would be wrongly deleted too (same seq as the delete no
    // longer distinguishable from lower).
    IcebergWriter.write(Seq((1L, "old"), (2L, "keep")).toDF("k", "v"), dir)
    IcebergWriter.upsertByKey(spark, dir,
      Seq((1L, "new")).toDF("k", "v"), keys = Seq("k"))
    val before = IcebergReader.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(before == Set((1L, "new"), (2L, "keep")))
    IcebergWriter.rewriteManifests(spark, dir)
    val after = IcebergReader.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before, "delete applicability changed across rewrite")
  }

  test("v3: DV references and row lineage survive; _row_id stable") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    val df = (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "v")
    IcebergWriter.createEmpty(spark, dir, df.schema, formatVersion = 3)
    IcebergWriter.write(df, dir)
    IcebergWriter.write(
      (21L to 30L).map(i => (i, i * 1.0)).toDF("id", "v"), dir)
    IcebergWriter.deleteWhere(spark, dir, col("id") <= 3L)
    val beforeIds = IcebergReader.readWithLineage(spark, dir)
      .select(col("id"), col("_row_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    IcebergWriter.rewriteManifests(spark, dir)
    val snap = IcebergReader.snapshotOpt(spark, dir).get
    assert(snap.dvFiles.nonEmpty, "DV references lost in rewrite")
    val afterIds = IcebergReader.readWithLineage(spark, dir)
      .select(col("id"), col("_row_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(afterIds == beforeIds, "row lineage changed across rewrite")
    assert(!afterIds.keySet.exists(_ <= 3L))
    // appends after the rewrite compose
    IcebergWriter.write(Seq((31L, 31.0)).toDF("id", "v"), dir)
    assert(IcebergReader.read(spark, dir).count() == 28)
  }

  test("time travel to the pre-rewrite snapshot still reads its manifests") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    IcebergWriter.write(Seq((2L, "b")).toDF("id", "v"), dir)
    val preSnap = IcebergReader.snapshotOpt(spark, dir).get.snapshotId
    IcebergWriter.rewriteManifests(spark, dir)
    IcebergWriter.deleteWhere(spark, dir, col("id") === 1L)
    val travelled = IcebergReader.read(spark, dir,
      asOfSnapshotId = Some(preSnap))
      .collect().map(_.getLong(0)).toSet
    assert(travelled == Set(1L, 2L))
  }
}
