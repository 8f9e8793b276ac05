package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{DeltaLogReader, DeltaLogWriter}

/** SetTransaction (PROTOCOL.md "Transaction Identifiers"): per-appId
  * version watermarks make retried writes idempotent, and the
  * watermark must survive checkpoint compaction of the log. */
class DeltaTxnSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String =
    Files.createTempDirectory("graft-txn").toString + "/t"

  test("same (appId, version) commits once; higher versions land") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    def batch(n: Long) = Seq((n, s"b$n")).toDF("id", "v")
    DeltaLogWriter.write(batch(1), dir, txn = Some(("job-a", 1L)))
    val v1 = DeltaLogReader.latestVersion(spark, dir)
    // the retried micro-batch: same appId+version → skipped entirely
    val c = DeltaLogWriter.write(batch(1), dir, txn = Some(("job-a", 1L)))
    assert(c.numFiles == 0)
    assert(DeltaLogReader.latestVersion(spark, dir) == v1)
    assert(DeltaLogReader.read(spark, dir).count() == 1)
    // a LOWER version (stale replay) also skips
    DeltaLogWriter.write(batch(99), dir, txn = Some(("job-a", 0L)))
    assert(DeltaLogReader.read(spark, dir).count() == 1)
    // the next version lands; an unrelated appId is independent
    DeltaLogWriter.write(batch(2), dir, txn = Some(("job-a", 2L)))
    DeltaLogWriter.write(batch(3), dir, txn = Some(("job-b", 1L)))
    assert(DeltaLogReader.read(spark, dir).count() == 3)
    assert(DeltaLogWriter.lastTransactionVersion(spark, dir, "job-a")
      .contains(2L))
    assert(DeltaLogWriter.lastTransactionVersion(spark, dir, "job-b")
      .contains(1L))
    assert(DeltaLogWriter.lastTransactionVersion(spark, dir, "absent").isEmpty)
  }

  test("watermarks survive a classic checkpoint + log cleanup") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    // 12 commits cross the automatic checkpoint interval
    (1L to 12L).foreach { v =>
      DeltaLogWriter.write(Seq((v, s"r$v")).toDF("id", "v"), dir,
        txn = Some(("stream-1", v)))
    }
    DeltaLogWriter.cleanupMetadata(spark, dir, retentionMs = 0L)
    // the pre-checkpoint JSON commits carrying the txn actions are
    // gone — the checkpoint's txn rows are the replay source
    assert(DeltaLogWriter.lastTransactionVersion(spark, dir, "stream-1")
      .contains(12L))
    // idempotency still holds off the checkpointed watermark
    DeltaLogWriter.write(Seq((99L, "dup")).toDF("id", "v"), dir,
      txn = Some(("stream-1", 5L)))
    assert(DeltaLogReader.read(spark, dir).count() == 12)
  }

  test("streaming sink: a replayed micro-batch run does not duplicate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp()
    val ckpt1 = Files.createTempDirectory("graft-txn-ck1").toString
    val ms = MemoryStream[(Long, String)]
    ms.addData((1L, "a"), (2L, "b"))
    val q1 = graft.streaming.EventStream.runToDeltaExactlyOnce(
      ms.toDF.toDF("id", "v"), dir, ckpt1, appId = "stream-q")
    q1.awaitTermination()
    assert(DeltaLogReader.read(spark, dir).count() == 2)
    // checkpoint LOST: the same source replays from batch 0 under a
    // fresh checkpoint — the txn watermark must absorb the replay
    val ckpt2 = Files.createTempDirectory("graft-txn-ck2").toString
    val ms2 = MemoryStream[(Long, String)]
    ms2.addData((1L, "a"), (2L, "b"))
    val q2 = graft.streaming.EventStream.runToDeltaExactlyOnce(
      ms2.toDF.toDF("id", "v"), dir, ckpt2, appId = "stream-q")
    q2.awaitTermination()
    assert(DeltaLogReader.read(spark, dir).count() == 2,
      "replayed batch 0 duplicated its rows")
    // a genuinely NEW batch (higher batchId under the original
    // checkpoint) still lands
    ms.addData((3L, "c"))
    val q3 = graft.streaming.EventStream.runToDeltaExactlyOnce(
      ms.toDF.toDF("id", "v"), dir, ckpt1, appId = "stream-q")
    q3.awaitTermination()
    assert(DeltaLogReader.read(spark, dir).count() == 3)
  }

  test("watermarks survive a V2 checkpoint") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write(Seq((1L, "a")).toDF("id", "v"), dir,
      txn = Some(("s2", 7L)))
    DeltaLogWriter.checkpointV2(spark, dir)
    DeltaLogWriter.cleanupMetadata(spark, dir, retentionMs = 0L)
    assert(DeltaLogWriter.lastTransactionVersion(spark, dir, "s2")
      .contains(7L))
  }
}
