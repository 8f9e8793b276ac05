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
}
