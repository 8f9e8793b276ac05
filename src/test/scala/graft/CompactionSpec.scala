package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{DeltaLogReader, DeltaLogWriter, IcebergReader, IcebergWriter}

/** Compaction (round 6): Delta OPTIMIZE and Iceberg rewrite_data_files —
  * small files bin-packed, deletion vectors / delete files MATERIALIZED,
  * untouched files untouched, results identical before and after. */
class CompactionSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-opt").toString

  private def df(rows: (Long, String, String)*): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("id", "v", "p")
  }

  private def asMap(d: DataFrame): Map[Long, String] =
    d.select("id", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("delta optimize: DVs materialized, small files folded, rows identical") {
    val dir = tmp()
    DeltaLogWriter.write(df((1L, "a", "x"), (2L, "b", "x")).coalesce(1), dir)
    DeltaLogWriter.write(df((3L, "c", "x")), dir, mode = "append")
    DeltaLogWriter.write(df((4L, "d", "x")), dir, mode = "append")
    DeltaLogWriter.deleteWhere(spark, dir, col("id") === 2L)
    val before = asMap(DeltaLogReader.read(spark, dir))
    assert(before == Map(1L -> "a", 3L -> "c", 4L -> "d"))
    assert(DeltaLogReader.snapshot(spark, dir).files
      .exists(_.deletionVector.isDefined))

    val c = DeltaLogWriter.optimize(spark, dir)
    assert(c.version > 0)
    val snap = DeltaLogReader.snapshot(spark, dir)
    // every DV is gone and the file count dropped
    assert(snap.files.forall(_.deletionVector.isEmpty))
    assert(snap.files.size < 3)
    assert(asMap(DeltaLogReader.read(spark, dir)) == before)
    // the commit is marked dataChange=false (spec: no new data)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val log = new org.apache.hadoop.fs.Path(dir,
      f"_delta_log/${c.version}%020d.json")
    val txt = new String(org.apache.commons.io.IOUtils.toByteArray(
      fs.open(log)), "UTF-8")
    assert(txt.contains("\"dataChange\":false"))
    assert(!txt.contains("\"dataChange\":true"))
  }

  test("delta optimize: untouched big files stay; no-op when nothing to do") {
    val dir = tmp()
    DeltaLogWriter.write(df((1L, "a", "x")), dir)
    // single file, no DVs: no-op
    val v0 = DeltaLogReader.latestVersion(spark, dir)
    val c = DeltaLogWriter.optimize(spark, dir)
    assert(c.version == v0 && c.numFiles == 0)
    // two small + one "big" (targetSize tiny): big survives by path
    DeltaLogWriter.write(df((2L, "b", "x")), dir, mode = "append")
    val bigPath = DeltaLogReader.snapshot(spark, dir).files
      .maxBy(_.size).path
    DeltaLogWriter.write(df((3L, "c", "x")), dir, mode = "append")
    val big = DeltaLogReader.snapshot(spark, dir).files.maxBy(_.size)
    DeltaLogWriter.optimize(spark, dir, targetSize = big.size)
    val after = DeltaLogReader.snapshot(spark, dir).files.map(_.path)
    assert(after.contains(big.path))
    assert(asMap(DeltaLogReader.read(spark, dir)) ==
      Map(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(bigPath != null)
  }

  test("iceberg rewrite: position deletes materialized, kept files carried") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "x")),
      dir, mode = "error")
    IcebergWriter.deleteWhere(spark, dir, col("id") === 1L)
    assert(IcebergReader.snapshot(spark, dir).deleteFiles.nonEmpty)
    val c = IcebergWriter.rewriteDataFiles(spark, dir)
    assert(c.version > 0)
    val snap = IcebergReader.snapshot(spark, dir)
    assert(snap.deleteFiles.isEmpty && snap.equalityDeleteFiles.isEmpty)
    assert(asMap(IcebergReader.read(spark, dir)) ==
      Map(2L -> "b", 3L -> "c"))
  }

  test("iceberg rewrite: equality deletes materialized, merge unblocked") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x"), (2L, "b", "y")), dir,
      mode = "error")
    IcebergWriter.upsertByKey(spark, dir, df((1L, "a2", "x")), Seq("id"))
    IcebergWriter.upsertByKey(spark, dir, df((3L, "c", "y")), Seq("id"))
    assert(IcebergReader.snapshot(spark, dir).equalityDeleteFiles.nonEmpty)
    IcebergWriter.rewriteDataFiles(spark, dir)
    val snap = IcebergReader.snapshot(spark, dir)
    assert(snap.equalityDeleteFiles.isEmpty && snap.deleteFiles.isEmpty)
    assert(asMap(IcebergReader.read(spark, dir)) ==
      Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    // the rewrite gates are lifted: merge works again
    IcebergWriter.merge(spark, dir, df((2L, "b2", "y")), keys = Seq("id"))
    assert(asMap(IcebergReader.read(spark, dir)) ==
      Map(1L -> "a2", 2L -> "b2", 3L -> "c"))
  }

  test("delta optimize sortBy: clustered rewrite makes stats prune files") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    // ids scattered across many small files: every file's (min,max) id
    // range spans the whole domain, so stats prune NOTHING
    val scattered = (0L until 400L).map(i => ((i * 37) % 400, s"v$i"))
      .toDF("id", "v")
    DeltaLogWriter.write(scattered.repartition(8), dir)
    val before = DeltaLogReader.read(spark, dir,
      filters = Seq(graft.io.ScanFilter("id", "<", 50L)))
    val beforeFiles = before
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().count()
    assert(beforeFiles == 8, "unsorted layout cannot prune")
    // cluster on id during compaction (4 output files, ~100 ids each)
    val sz = DeltaLogReader.snapshot(spark, dir).files.map(_.size).sum / 4
    DeltaLogWriter.optimize(spark, dir, targetSize = sz,
      sortBy = Seq("id"))
    val after = DeltaLogReader.read(spark, dir,
      filters = Seq(graft.io.ScanFilter("id", "<", 50L)))
    val afterFiles = after
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().count()
    assert(afterFiles <= 2,
      s"clustered stats must prune to the low-id file(s), got $afterFiles")
    assert(after.count() == 50 && before.count() == 50)
  }

  test("iceberg rewrite sortBy: manifest bounds prune after clustering") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    val scattered = (0L until 400L).map(i => ((i * 37) % 400, s"v$i", "x"))
      .toDF("id", "v", "p")
    IcebergWriter.write(scattered.repartition(8), dir, mode = "error")
    val sz = IcebergReader.snapshot(spark, dir).files.map(_.sizeBytes).sum / 4
    IcebergWriter.rewriteDataFiles(spark, dir,
      targetFileSizeBytes = sz, sortBy = Seq("id"))
    val snap = IcebergReader.snapshot(spark, dir)
    assert(snap.files.size >= 3, "clustered rewrite should emit ~4 files")
    val pruned = IcebergReader.read(spark, dir,
      filters = Seq(graft.io.ScanFilter("id", "<", 50L)))
    val prunedFiles = pruned
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().count()
    assert(prunedFiles <= 2,
      s"manifest bounds must prune the high-id files, got $prunedFiles")
    assert(pruned.count() == 50)
  }

  test("iceberg rewrite: no-op on a compact table") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x")), dir, mode = "error")
    val snap0 = IcebergReader.snapshot(spark, dir)
    val c = IcebergWriter.rewriteDataFiles(spark, dir,
      targetFileSizeBytes = 1L) // nothing under target, no deletes
    assert(c.snapshotId == snap0.snapshotId && c.numFiles == 0)
  }
}
