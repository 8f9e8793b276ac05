package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{DeltaLogReader, DeltaLogWriter, IcebergReader, IcebergWriter}
import graft.sql.TableDml

/** Athena-style table-format DML — `DELETE FROM` / `UPDATE … SET` /
  * `MERGE INTO … UPDATE SET * / INSERT *` — compiled onto the
  * zero-rewrite writer paths, on BOTH real formats, plus the
  * single-commit UPDATE itself (old positions flagged and replacement
  * rows added in ONE snapshot). */
class SqlDmlSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-dml").toString

  private def seedIceberg(dir: String): Unit = {
    val spark0 = spark
    import spark0.implicits._
    IcebergWriter.write(
      (1L to 30L).map(i => (i, s"n$i", i * 10.0)).toDF("id", "name", "amt"),
      dir)
  }

  test("UPDATE on Iceberg: one commit, zero data-file rewrite of untouched files") {
    val dir = tmp() + "/t"
    seedIceberg(dir)
    val before = IcebergReader.snapshotOpt(spark, dir).get
    TableDml.execute(spark, "UPDATE t SET amt = amt + 1000 WHERE id <= 5",
      Map("t" -> dir))
    val snap = IcebergReader.snapshotOpt(spark, dir).get
    // one new snapshot; prior data files all still present (flagged by
    // position deletes), plus the replacement file(s)
    assert(before.files.map(_.path).toSet.subsetOf(
      snap.files.map(_.path).toSet))
    assert(snap.deleteFiles.nonEmpty)
    val got = IcebergReader.read(spark, dir)
      .select("id", "amt").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 30)
    (1L to 5L).foreach(i => assert(got(i) == i * 10.0 + 1000))
    (6L to 30L).foreach(i => assert(got(i) == i * 10.0))
  }

  test("DELETE and MERGE INTO route through the format writers") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp() + "/t"
    seedIceberg(dir)
    TableDml.execute(spark, "DELETE FROM t WHERE id % 10 = 0",
      Map("t" -> dir))
    assert(IcebergReader.read(spark, dir).count() == 27)
    Seq((2L, "UPDATED", 999.0), (31L, "NEW", 1.0))
      .toDF("id", "name", "amt").createOrReplaceTempView("dml_src")
    TableDml.execute(spark,
      """MERGE INTO t USING (SELECT * FROM dml_src) s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      Map("t" -> dir))
    val got = IcebergReader.read(spark, dir)
      .select("id", "name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(2L) == "UPDATED" && got(31L) == "NEW" && got.size == 28)
    // INSERT INTO: VALUES aligns by position, SELECT by name
    TableDml.execute(spark,
      "INSERT INTO t VALUES (40, 'forty', 400.0), (41, 'fortyone', 410.0)",
      Map("t" -> dir))
    TableDml.execute(spark,
      "INSERT INTO t SELECT 420.0 AS amt, 42 AS id, 'fortytwo' AS name",
      Map("t" -> dir))
    val afterIns = IcebergReader.read(spark, dir)
      .select("id", "name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(afterIns(40L) == "forty" && afterIns(42L) == "fortytwo" &&
      afterIns.size == 31)
    // unsupported shapes raise loudly
    intercept[IllegalArgumentException] {
      TableDml.execute(spark, "TRUNCATE TABLE t", Map("t" -> dir))
    }
    intercept[IllegalArgumentException] {
      TableDml.execute(spark, "DELETE FROM unknown WHERE 1=1",
        Map("t" -> dir))
    }
  }

  test("UPDATE on Delta: DV-flagged single commit; CDF records pre/post images") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp() + "/t"
    DeltaLogWriter.write(
      (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "v"), dir)
    DeltaLogWriter.enableChangeDataFeed(spark, dir)
    val vBefore = DeltaLogReader.latestVersion(spark, dir)
    TableDml.execute(spark, "UPDATE t SET v = v * 2 WHERE id <= 3",
      Map("t" -> dir))
    assert(DeltaLogReader.latestVersion(spark, dir) == vBefore + 1)
    val got = DeltaLogReader.read(spark, dir)
      .select("id", "v").collect().map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(got(1L) == 2.0 && got(3L) == 6.0 && got(4L) == 4.0 &&
      got.size == 20)
    // the change feed shows pre/post images for the update commit
    val feed = DeltaLogReader.changes(spark, dir,
      startVersion = vBefore + 1)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(feed.count(_._2 == "update_preimage") == 3)
    assert(feed.count(_._2 == "update_postimage") == 3)
    // DV state: old files carried with deletion vectors, not rewritten
    val snap = DeltaLogReader.snapshot(spark, dir)
    assert(snap.files.exists(_.deletionVector.isDefined))
  }

  test("v3 Iceberg UPDATE goes through deletion vectors") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp() + "/t"
    val df = (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "v")
    IcebergWriter.createEmpty(spark, dir, df.schema, formatVersion = 3)
    IcebergWriter.write(df, dir)
    TableDml.execute(spark, "UPDATE t SET v = 0.5 WHERE id > 18",
      Map("t" -> dir))
    val snap = IcebergReader.snapshotOpt(spark, dir).get
    assert(snap.dvFiles.nonEmpty && snap.deleteFiles.isEmpty)
    val got = IcebergReader.read(spark, dir)
      .select("id", "v").collect().map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(got(19L) == 0.5 && got(20L) == 0.5 && got(1L) == 1.0 &&
      got.size == 20)
  }
}
