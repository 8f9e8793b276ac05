package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{DeltaLogReader, DeltaLogWriter, IcebergReader, IcebergWriter}

/** Delta RESTORE (file-diff re-commit of an earlier version) and
  * Iceberg rollback_to_snapshot (metadata-only pointer move): state
  * returns, history is preserved, and both compose with the features
  * that complicate them (DVs, CDF, refs, incremental scans). */
class RestoreRollbackSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-rst").toString

  test("delta restore returns the old state without rewriting history") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), dir) // v0
    DeltaLogWriter.write(Seq((3L, 3.0)).toDF("id", "v"), dir)            // v1
    DeltaLogWriter.deleteWhere(spark, dir, col("id") === 1L)             // v2
    DeltaLogWriter.restore(spark, dir, 0L)                               // v3
    val ids = DeltaLogReader.read(spark, dir)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L)) // the v1 append gone, the v2 delete undone
    assert(DeltaLogReader.latestVersion(spark, dir) == 3L)
    // intermediate history still time-travels
    val atV2 = DeltaLogReader.read(spark, dir, asOfVersion = Some(2L))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(atV2 == Set(2L, 3L))
    // restore is idempotent at the same state
    assert(DeltaLogWriter.restore(spark, dir, 3L).numFiles == 0)
  }

  test("delta restore resurrects DV-deleted rows of a kept file") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write((1L to 100L).toDF("id"), dir)      // v0, one file
    DeltaLogWriter.deleteWhere(spark, dir, col("id") <= 50L) // v1: DV
    DeltaLogWriter.restore(spark, dir, 0L)                   // v2: re-add, no DV
    assert(DeltaLogReader.read(spark, dir).count() == 100L)
  }

  test("iceberg rollback moves the pointer and keeps history") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "p"), dir,
      partitionBy = Seq("p"))
    val s1 = IcebergReader.snapshot(spark, dir).snapshotId
    IcebergWriter.write(Seq((2L, "b")).toDF("id", "p"), dir, mode = "append")
    val s2 = IcebergReader.snapshot(spark, dir).snapshotId
    IcebergWriter.write(Seq((3L, "c")).toDF("id", "p"), dir, mode = "append")
    IcebergWriter.rollbackTo(spark, dir, s2)
    val ids = IcebergReader.read(spark, dir)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L))
    // appends after the rollback fork from s2; incremental scan from the
    // rollback point sees only them
    IcebergWriter.write(Seq((4L, "d")).toDF("id", "p"), dir, mode = "append")
    val inc = IcebergReader.incrementalAppendScan(spark, dir, Some(s2))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(inc == Set(4L))
    // the rolled-past snapshot still time-travels until expiry
    val full = IcebergReader.read(spark, dir, asOfSnapshotId = Some(s1))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(full == Set(1L))
  }
}
