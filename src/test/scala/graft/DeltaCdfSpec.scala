package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{DeltaLogReader, DeltaLogWriter, UnsupportedDeltaFeatureException}

/** Delta Change Data Feed (PROTOCOL.md "Change Data Files"): enablement
  * upgrades the protocol and sets `delta.enableChangeDataFeed`; MERGE /
  * DELETE / overwrite write `_change_data/` parquet committed via `cdc`
  * actions; [[DeltaLogReader.changes]] serves the feed back with
  * `_change_type` / `_commit_version` / `_commit_timestamp`, deriving
  * pure-append and pure-remove commits from their actions and raising
  * on underivable pre-enablement commits. */
class DeltaCdfSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-cdf").toString

  private def changeSet(dir: String, from: Long = 0L,
      to: Option[Long] = None): Set[(Long, String, Long, Double)] =
    DeltaLogReader.changes(spark, dir, from, to)
      .select(col("_commit_version"), col("_change_type"), col("id"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("enable sets the property and merges the writer feature") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write(Seq((1L, 1.0)).toDF("id", "v"), dir)
    DeltaLogWriter.enableChangeDataFeed(spark, dir)
    val snap = DeltaLogReader.snapshot(spark, dir)
    assert(snap.configuration("delta.enableChangeDataFeed") == "true")
    assert(snap.protocol.minWriterVersion == 4)
    // idempotent: a second enable commits nothing new
    val v = DeltaLogReader.latestVersion(spark, dir)
    DeltaLogWriter.enableChangeDataFeed(spark, dir)
    assert(DeltaLogReader.latestVersion(spark, dir) == v)
  }

  test("appends derive inserts; merge writes pre/post/insert cdc") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    // v0 CTAS, v1 enable, v2 merge (update id=2, insert id=3)
    DeltaLogWriter.write(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), dir)
    DeltaLogWriter.enableChangeDataFeed(spark, dir)
    DeltaLogWriter.merge(spark, dir,
      Seq((2L, 20.0), (3L, 30.0)).toDF("id", "v"), keys = Seq("id"))
    // the merge commit carries cdc actions and real _change_data files
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(dir, "_change_data")))
    assert(changeSet(dir) == Set(
      (0L, "insert", 1L, 1.0), (0L, "insert", 2L, 2.0),
      (2L, "update_preimage", 2L, 2.0), (2L, "update_postimage", 2L, 20.0),
      (2L, "insert", 3L, 30.0)))
    // range filtering: only the merge commit
    assert(changeSet(dir, from = 2L) == Set(
      (2L, "update_preimage", 2L, 2.0), (2L, "update_postimage", 2L, 20.0),
      (2L, "insert", 3L, 30.0)))
    // final state unaffected by the change files
    assert(DeltaLogReader.read(spark, dir).select(sum(col("v")))
      .head.getDouble(0) == 51.0)
  }

  test("DV delete and full-file delete write delete changes") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write(
      Seq((1L, 1.0, "a"), (2L, 2.0, "a"), (3L, 3.0, "b")).toDF("id", "v", "p"),
      dir, partitionBy = Seq("p"))
    DeltaLogWriter.enableChangeDataFeed(spark, dir)
    // partial delete in partition a → DV; the cdc rows carry partitions
    DeltaLogWriter.deleteWhere(spark, dir, col("id") === 1L)
    val del = DeltaLogReader.changes(spark, dir, 2L)
      .select(col("_change_type"), col("id"), col("p")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(del == Set(("delete", 1L, "a")))
    // deleting the REST of partition a (full-file via DV union) must not
    // replay the already-deleted row as a change
    DeltaLogWriter.deleteWhere(spark, dir, col("p") === "a")
    val del2 = DeltaLogReader.changes(spark, dir, 3L)
      .select(col("_change_type"), col("id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(del2 == Set(("delete", 2L)))
  }

  test("overwrite records deletes of prior rows plus inserts") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write(Seq((1L, 1.0)).toDF("id", "v"), dir)
    DeltaLogWriter.enableChangeDataFeed(spark, dir)
    DeltaLogWriter.write(Seq((9L, 9.0)).toDF("id", "v"), dir,
      mode = "overwrite")
    assert(changeSet(dir, from = 2L) == Set(
      (2L, "delete", 1L, 1.0), (2L, "insert", 9L, 9.0)))
  }

  test("pre-enablement mixed commit raises; optimize yields no changes") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write(Seq((1L, 1.0)).toDF("id", "v"), dir)
    DeltaLogWriter.merge(spark, dir, Seq((1L, 2.0)).toDF("id", "v"),
      keys = Seq("id")) // v1: add+remove, no cdc
    val e = intercept[UnsupportedDeltaFeatureException] {
      DeltaLogReader.changes(spark, dir, 0L).collect()
    }
    assert(e.getMessage.contains("without cdc actions"))
    // a range past the underivable commit still reads
    DeltaLogWriter.enableChangeDataFeed(spark, dir)
    DeltaLogWriter.write(Seq((5L, 5.0)).toDF("id", "v"), dir)
    DeltaLogWriter.optimize(spark, dir) // dataChange=false → no changes
    assert(changeSet(dir, from = 3L) == Set((3L, "insert", 5L, 5.0)))
  }

  test("cdf on a column-mapped table resolves physical names") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write(Seq((1L, 1.0)).toDF("id", "v"), dir)
    DeltaLogWriter.renameColumn(spark, dir, "v", "amount")
    DeltaLogWriter.enableChangeDataFeed(spark, dir)
    DeltaLogWriter.merge(spark, dir,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount"), keys = Seq("id"))
    val got = DeltaLogReader.changes(spark, dir, 3L)
      .select(col("_change_type"), col("id"), col("amount")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("update_preimage", 1L, 1.0),
      ("update_postimage", 1L, 10.0), ("insert", 2L, 20.0)))
  }

  test("schema evolution inside the range unions by name") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write(Seq((1L, 1.0)).toDF("id", "v"), dir)
    DeltaLogWriter.enableChangeDataFeed(spark, dir)
    DeltaLogWriter.write(Seq((2L, 2.0, "x")).toDF("id", "v", "tag"), dir)
    val rows = DeltaLogReader.changes(spark, dir, 0L)
      .select(col("_commit_version"), col("id"), col("tag")).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(rows == Set((0L, 1L, None), (2L, 2L, Some("x"))))
  }
}
