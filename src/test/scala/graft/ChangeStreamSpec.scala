package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{DeltaLogWriter, IcebergWriter}
import graft.streaming.ChangeStreams

/** Incremental change consumption with durable offsets: each poll
  * delivers exactly the delta since the last committed offset,
  * caught-up polls deliver nothing, and a crash BEFORE the offset
  * advance re-delivers the batch (at-least-once). */
class ChangeStreamSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-cs").toString

  test("delta change feed polls deliver disjoint version ranges") {
    val spark0 = spark
    import spark0.implicits._
    val (dir, ckpt) = (tmp(), tmp())
    DeltaLogWriter.write(Seq((1L, 1.0)).toDF("id", "v"), dir)
    DeltaLogWriter.enableChangeDataFeed(spark, dir)
    var got = Set.empty[(Long, String)]
    def drain() = ChangeStreams.processDeltaChanges(spark, dir, ckpt) {
      df => got = df.select(col("id"), col("_change_type")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    }
    assert(drain() == Some((0L, 1L)))
    assert(got == Set((1L, "insert")))
    // caught up: nothing delivered
    got = Set.empty
    assert(drain().isEmpty && got.isEmpty)
    // new merge delivers only its own changes
    DeltaLogWriter.merge(spark, dir, Seq((1L, 9.0)).toDF("id", "v"),
      keys = Seq("id"))
    assert(drain() == Some((2L, 2L)))
    assert(got == Set((1L, "update_preimage"), (1L, "update_postimage")))
  }

  test("a crash before the offset advance re-delivers the batch") {
    val spark0 = spark
    import spark0.implicits._
    val (dir, ckpt) = (tmp(), tmp())
    DeltaLogWriter.write(Seq((1L, 1.0)).toDF("id", "v"), dir)
    intercept[RuntimeException] {
      ChangeStreams.processDeltaChanges(spark, dir, ckpt) { _ =>
        throw new RuntimeException("sink down")
      }
    }
    var n = 0L
    ChangeStreams.processDeltaChanges(spark, dir, ckpt)(df => n = df.count())
    assert(n == 1L) // re-delivered, then committed
    assert(ChangeStreams.processDeltaChanges(spark, dir, ckpt)(_ => ())
      .isEmpty)
  }

  test("iceberg append polls deliver only new snapshots' rows") {
    val spark0 = spark
    import spark0.implicits._
    val (dir, ckpt) = (tmp(), tmp())
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "p"), dir,
      partitionBy = Seq("p"))
    var got = Set.empty[Long]
    def drain() = ChangeStreams.processIcebergAppends(spark, dir, ckpt) {
      df => got = df.select(col("id")).collect().map(_.getLong(0)).toSet
    }
    assert(drain().isDefined && got == Set(1L))
    got = Set.empty
    assert(drain().isEmpty && got.isEmpty)
    IcebergWriter.write(Seq((2L, "b")).toDF("id", "p"), dir, mode = "append")
    IcebergWriter.write(Seq((3L, "c")).toDF("id", "p"), dir, mode = "append")
    assert(drain().isDefined && got == Set(2L, 3L))
  }
}
