package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{DeltaLogReader, DeltaLogWriter, IcebergReader, IcebergWriter, TableMigration}

/** Zero-rewrite format migration: content equality both directions,
  * post-conversion writes compose (mixed registered + native files),
  * and the merge-on-read preconditions raise loudly. */
class TableMigrationSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-mig").toString

  test("delta -> iceberg: content carried, appends compose after") {
    val spark0 = spark
    import spark0.implicits._
    val (d, i) = (tmp() + "/d", tmp() + "/i")
    val rows = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
    DeltaLogWriter.write(rows.toDF("id", "g", "v").coalesce(1), d,
      partitionBy = Seq("g"))
    TableMigration.convertDeltaToIceberg(spark, d, i)
    val got = IcebergReader.read(spark, i)
      .select(col("id"), col("g"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == rows.toSet)
    // partition pruning works off the registered tuples
    assert(IcebergReader.readWhere(spark, i, col("g") === "a")
      .count() == 2L)
    // a NATIVE append lands beside the registered files and both read
    IcebergWriter.write(Seq((4L, "c", 4.0)).toDF("id", "g", "v"), i,
      mode = "append")
    assert(IcebergReader.read(spark, i).count() == 4L)
    // DV'd tables refuse until compacted
    DeltaLogWriter.deleteWhere(spark, d, col("id") === 1L)
    val e = intercept[IllegalArgumentException] {
      TableMigration.convertDeltaToIceberg(spark, d, tmp() + "/i2")
    }
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("iceberg -> delta: content carried, deletes compose after") {
    val spark0 = spark
    import spark0.implicits._
    val (i, d) = (tmp() + "/i", tmp() + "/d")
    val rows = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
    IcebergWriter.write(rows.toDF("id", "g", "v"), i,
      partitionBy = Seq("g"))
    TableMigration.convertIcebergToDelta(spark, i, d)
    val got = DeltaLogReader.read(spark, d)
      .select(col("id"), col("g"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == rows.toSet)
    // a DV delete on the REGISTERED (absolute-path) files works
    DeltaLogWriter.deleteWhere(spark, d, col("id") === 3L)
    assert(DeltaLogReader.read(spark, d)
      .select(col("id")).collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // a native Delta append composes
    DeltaLogWriter.write(Seq((5L, "c", 5.0)).toDF("id", "g", "v"), d)
    assert(DeltaLogReader.read(spark, d).count() == 3L)
    // pos-delete-bearing Iceberg tables refuse until compacted
    IcebergWriter.deleteWhere(spark, i, col("id") === 1L)
    val e = intercept[IllegalArgumentException] {
      TableMigration.convertIcebergToDelta(spark, i, tmp() + "/d2")
    }
    assert(e.getMessage.contains("position/equality deletes"))
  }

  test("date partition tuples render as ISO dates for delta") {
    val spark0 = spark
    import spark0.implicits._
    val (i, d) = (tmp() + "/i", tmp() + "/d")
    val df = Seq((1L, "2024-03-01"), (2L, "2024-03-02"))
      .toDF("id", "ds")
      .withColumn("dt", col("ds").cast("date")).drop("ds")
    IcebergWriter.write(df, i, partitionBy = Seq("dt"))
    TableMigration.convertIcebergToDelta(spark, i, d)
    val got = DeltaLogReader.read(spark, d)
      .select(col("id"), col("dt").cast("string")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "2024-03-01"), (2L, "2024-03-02")))
  }

  test("uniform mirror: Delta keeps writing, the Iceberg mirror refreshes") {
    val spark0 = spark
    import spark0.implicits._
    val (d, m) = (tmp() + "/d", tmp() + "/mirror")
    DeltaLogWriter.write(
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "g", "v").coalesce(1),
      d, partitionBy = Seq("g"))
    // first refresh = conversion
    TableMigration.refreshUniform(spark, d, m)
    assert(IcebergReader.read(spark, m).count() == 2)
    // Delta evolves: an append and a MERGE (file rewrite, no DVs)
    DeltaLogWriter.write(
      Seq((3L, "a", 3.0)).toDF("id", "g", "v").coalesce(1), d)
    DeltaLogWriter.merge(spark, d,
      Seq((2L, "b", 22.0)).toDF("id", "g", "v"), Seq("id"))
    // the mirror is stale until refreshed, then exactly matches
    assert(IcebergReader.read(spark, m).count() == 2)
    TableMigration.refreshUniform(spark, d, m)
    val got = IcebergReader.read(spark, m)
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 1.0, 2L -> 22.0, 3L -> 3.0))
    // mirror history: each refresh is one Iceberg snapshot, and the
    // data files are the DELTA files (no copies under the mirror)
    assert(IcebergReader.history(spark, m).size == 2)
    val fs = new org.apache.hadoop.fs.Path(m).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val snap = IcebergReader.snapshotOpt(spark, m).get
    snap.files.foreach(f => assert(f.path.contains("/d/"),
      s"mirror must reference the Delta tree, got ${f.path}"))
    // DV'd Delta tables refuse the refresh (honest precondition):
    // a PARTIAL-file delete leaves a deletion vector behind
    DeltaLogWriter.write(
      Seq((10L, "a", 10.0), (11L, "a", 11.0), (12L, "a", 12.0))
        .toDF("id", "g", "v").coalesce(1), d)
    DeltaLogWriter.deleteWhere(spark, d, col("id") === 10L)
    assert(DeltaLogReader.snapshot(spark, d)
      .files.exists(_.deletionVector.isDefined))
    val e = intercept[IllegalArgumentException] {
      TableMigration.refreshUniform(spark, d, m)
    }
    assert(e.getMessage.contains("deletion vectors"))
    // compactFirst folds the DVs away (OPTIMIZE scoped to DV carriers)
    // and the refresh proceeds — the integrated path the error points at
    val cleanBefore = DeltaLogReader.snapshot(spark, d)
      .files.filter(_.deletionVector.isEmpty).map(_.path).toSet
    TableMigration.refreshUniform(spark, d, m, compactFirst = true)
    val after = DeltaLogReader.snapshot(spark, d)
    assert(after.files.forall(_.deletionVector.isEmpty))
    // DV-free files were NOT rewritten by the scoped compaction
    assert(cleanBefore.subsetOf(after.files.map(_.path).toSet))
    val mirrored = IcebergReader.read(spark, m)
      .select("id").collect().map(_.getLong(0)).toSet
    val direct = DeltaLogReader.read(spark, d)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(mirrored == direct && !mirrored.contains(10L))
  }
}
