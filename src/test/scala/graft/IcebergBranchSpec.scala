package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{IcebergReader, IcebergWriter}

/** Iceberg branch writes + write-audit-publish: staged appends are
  * invisible to main until fast-forward, auditable via the ref,
  * chain-published into the snapshot log, and fenced when main
  * diverges. */
class IcebergBranchSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-wap").toString

  private def mainIds(dir: String): Set[Long] =
    IcebergReader.read(spark, dir).select(col("id")).collect()
      .map(_.getLong(0)).toSet

  test("staged branch appends stay invisible until publish") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "p"), dir,
      partitionBy = Seq("p"))
    IcebergWriter.write(Seq((2L, "b")).toDF("id", "p"), dir,
      toBranch = Some("audit"))
    IcebergWriter.write(Seq((3L, "c")).toDF("id", "p"), dir,
      toBranch = Some("audit"))
    // main unchanged; the branch head carries the full staged state
    assert(mainIds(dir) == Set(1L))
    val staged = IcebergReader.read(spark, dir, asOfRef = Some("audit"))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(staged == Set(1L, 2L, 3L))
    // publish: one metadata commit moves main to the branch head
    val published = IcebergWriter.fastForward(spark, dir, "audit")
    assert(mainIds(dir) == Set(1L, 2L, 3L))
    assert(IcebergReader.snapshot(spark, dir).snapshotId == published)
    // the full published chain landed in the snapshot log
    val log = IcebergReader.metadataTable(spark, dir, "history")
    assert(log.count() >= 3) // seed + two published branch snapshots
  }

  test("incremental scan over a published range sees every staged append") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "p"), dir,
      partitionBy = Seq("p"))
    val fork = IcebergReader.snapshot(spark, dir).snapshotId
    IcebergWriter.write(Seq((2L, "b")).toDF("id", "p"), dir,
      toBranch = Some("wap"))
    IcebergWriter.write(Seq((3L, "c")).toDF("id", "p"), dir,
      toBranch = Some("wap"))
    IcebergWriter.fastForward(spark, dir, "wap")
    val inc = IcebergReader.incrementalAppendScan(spark, dir, Some(fork))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(inc == Set(2L, 3L)) // BOTH staged commits, not just the head
  }

  test("publish is fenced when main diverged; second write forks the branch once") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "p"), dir,
      partitionBy = Seq("p"))
    IcebergWriter.write(Seq((2L, "b")).toDF("id", "p"), dir,
      toBranch = Some("stage"))
    // main advances independently → the branch no longer fast-forwards
    IcebergWriter.write(Seq((9L, "z")).toDF("id", "p"), dir, mode = "append")
    val e = intercept[IllegalArgumentException] {
      IcebergWriter.fastForward(spark, dir, "stage")
    }
    assert(e.getMessage.contains("not an ancestor"))
    assert(mainIds(dir) == Set(1L, 9L))
  }

  test("dropRef unpins a staged branch; expiry sweeps its snapshots") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "p"), dir,
      partitionBy = Seq("p"))
    IcebergWriter.write(Seq((2L, "b")).toDF("id", "p"), dir,
      toBranch = Some("abandoned"))
    val staged = IcebergReader.read(spark, dir, asOfRef = Some("abandoned"))
      .count()
    assert(staged == 2L)
    IcebergWriter.dropRef(spark, dir, "abandoned")
    intercept[IllegalArgumentException] {
      IcebergReader.read(spark, dir, asOfRef = Some("abandoned")).count()
    }
    // unpinned: retention 0 expires the staged snapshot
    IcebergWriter.expireSnapshots(spark, dir, retentionMs = 0L)
    assert(IcebergReader.history(spark, dir).length == 1)
    assert(mainIds(dir) == Set(1L))
    intercept[IllegalArgumentException] {
      IcebergWriter.dropRef(spark, dir, "main")
    }
  }

  test("iceberg zorder rewrite prunes manifest bounds on BOTH dimensions") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    val n = 1 << 16
    val base = spark.range(n.toLong).select(
      (col("id") % 128L).as("x"),
      expr("id div 128").as("y"),
      col("id").as("payload"))
    IcebergWriter.write(base.repartition(32), dir)
    IcebergWriter.rewriteDataFiles(spark, dir,
      targetFileSizeBytes = 40_000L, zorderBy = Seq("x", "y"))
    val total = IcebergReader.snapshot(spark, dir).files.size
    assert(total >= 6, s"need a multi-file layout: $total")
    def opened(pred: org.apache.spark.sql.Column): Long =
      IcebergReader.readWhere(spark, dir, pred)
        .select(input_file_name()).distinct().count()
    assert(opened(col("x") === 7L) <= total / 2)
    assert(opened(col("y") === 7L) <= total / 2)
    assert(IcebergReader.read(spark, dir).count() == n.toLong)
  }

  test("$entries exposes provenance; describeDeltaDetail summarizes") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "p"), dir,
      partitionBy = Seq("p"))
    val s1 = IcebergReader.snapshot(spark, dir).snapshotId
    IcebergWriter.write(Seq((2L, "b")).toDF("id", "p"), dir, mode = "append")
    val s2 = IcebergReader.snapshot(spark, dir).snapshotId
    val entries = IcebergReader.metadataTable(spark, dir, "entries")
      .select(col("status"), col("snapshot_id"), col("record_count"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // carried manifest keeps the seed file ADDED under s1; the append
    // adds its file under s2
    assert(entries == Set((1, s1, 1L), (1, s2, 1L)))

    val ddir = tmp()
    graft.io.DeltaLogWriter.write(
      Seq((1L, "x", 1.0), (3L, "x", 3.0), (2L, "y", 2.0))
        .toDF("id", "g", "v").coalesce(1), ddir, partitionBy = Seq("g"))
    graft.io.DeltaLogWriter.deleteWhere(spark, ddir,
      col("id") === 1L && col("v") < 10.0)
    val det = graft.io.TableFormats.describeDeltaDetail(spark, ddir).head
    assert(det.getAs[String]("format") == "delta")
    assert(det.getAs[Long]("version") == 1L)
    assert(det.getAs[scala.collection.Seq[String]]("partition_columns")
      .toSeq == Seq("g"))
    assert(det.getAs[Long]("num_files") == 2L)
    assert(det.getAs[Long]("num_files_with_dvs") == 1L)
    assert(det.getAs[scala.collection.Seq[String]]("table_features")
      .contains("deletionVectors"))
  }

  test("branch writes refuse schema evolution into the shared metadata") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    IcebergWriter.write(Seq((1L, 1.0)).toDF("id", "v"), dir)
    intercept[IllegalArgumentException] {
      IcebergWriter.write(Seq((2L, 2.0, "x")).toDF("id", "v", "extra"),
        dir, toBranch = Some("b"))
    }
  }
}
