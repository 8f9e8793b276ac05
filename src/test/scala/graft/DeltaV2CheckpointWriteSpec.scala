package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{DeltaLogReader, DeltaLogWriter}

/** V2 checkpoint WRITING (PROTOCOL.md "V2 Spec Checkpoints"): protocol
  * upgrade, sharded sidecars, manifest actions, and replay through the
  * engine's own reader once the commit tail is retention-swept. */
class DeltaV2CheckpointWriteSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-v2c").toString

  test("v2 checkpoint becomes the sole replay source after cleanup") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write((1L to 40L).toDF("id")
      .withColumn("g", (col("id") % 4).cast("string")), dir,
      partitionBy = Seq("g"))
    DeltaLogWriter.write(Seq((41L, "x")).toDF("id", "g"), dir)
    DeltaLogWriter.deleteWhere(spark, dir, col("id") % 10L === 0L)
    val v = DeltaLogWriter.checkpointV2(spark, dir, sidecarMaxActions = 2)
    // the upgrade commit bumped the version; checkpoint is at latest
    assert(v == DeltaLogReader.latestVersion(spark, dir))
    val snap = DeltaLogReader.snapshot(spark, dir)
    assert(snap.protocol.readerFeatures.contains("v2Checkpoint"))
    assert(snap.protocol.writerFeatures.contains("v2Checkpoint"))
    val logDir = new Path(dir, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // multiple sidecars were forced
    assert(fs.listStatus(new Path(logDir, "_sidecars")).length >= 2)
    // sweep the pre-checkpoint tail: replay now goes THROUGH the v2 form
    DeltaLogWriter.cleanupMetadata(spark, dir, retentionMs = 0L)
    assert(!fs.exists(new Path(logDir, f"${0L}%020d.json")))
    val ids = DeltaLogReader.read(spark, dir)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids == ((1L to 41L).toSet -- Set(10L, 20L, 30L, 40L)))
    // appends after the checkpoint replay as tail on top of it
    DeltaLogWriter.write(Seq((99L, "x")).toDF("id", "g"), dir)
    assert(DeltaLogReader.read(spark, dir).count() == 38L)
  }

  test("checkpointPolicy=v2 makes the periodic checkpoint sharded") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write(Seq((0L, "s")).toDF("id", "g"), dir)
    DeltaLogWriter.setCheckpointPolicyV2(spark, dir)
    val before = DeltaLogReader.latestVersion(spark, dir)
    // commit forward across the next multiple-of-10 version
    val target = ((before / 10) + 1) * 10
    (before until target).foreach { i =>
      DeltaLogWriter.write(Seq((i + 100L, "x")).toDF("id", "g"), dir)
    }
    val logDir = new Path(dir, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v2Name = raw"0*$target\.checkpoint\.[0-9a-f-]{36}\.parquet".r
    val names = fs.listStatus(logDir).map(_.getPath.getName)
    assert(names.exists(n => v2Name.matches(n)),
      s"expected a v2 checkpoint at $target in ${names.mkString(",")}")
    assert(!names.contains(f"$target%020d.checkpoint.parquet"),
      "the classic form must not be written under the v2 policy")
    assert(DeltaLogReader.read(spark, dir).count() ==
      (target - before + 1).toLong)
  }

  test("a second checkpointV2 on an already-upgraded table adds no commit") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write(Seq((1L, 1.0)).toDF("id", "v"), dir)
    DeltaLogWriter.checkpointV2(spark, dir)
    val v1 = DeltaLogReader.latestVersion(spark, dir)
    val v2 = DeltaLogWriter.checkpointV2(spark, dir)
    assert(v2 == v1) // no new protocol commit, checkpoint re-written
    assert(DeltaLogReader.read(spark, dir).count() == 1L)
  }
}
