package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{IcebergReader, IcebergWriter}

/** Streaming CDC ingestion into a REAL Iceberg table: each micro-batch
  * lands as one zero-rewrite [[IcebergWriter.upsertByKey]] commit (new
  * rows + an equality-delete of their keys) — the Flink-CDC shape,
  * driven from Structured Streaming's foreachBatch. Later batches win
  * by sequence number; a compaction pass afterwards folds the deletes
  * away. */
class IcebergStreamSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-istr").toString

  private def asMap(d: DataFrame): Map[Long, String] =
    d.select("id", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("foreachBatch CDC upsert: batches land as sequence-ordered commits") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    IcebergWriter.write(
      Seq((1L, "a", "x"), (2L, "b", "x")).toDF("id", "v", "p"), dir,
      mode = "error")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, String)]
    val q = ms.toDF().toDF("id", "v", "p").writeStream
      .outputMode("append")
      .option("checkpointLocation", tmp())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          IcebergWriter.upsertByKey(spark0, dir, batch, Seq("id"))
        ()
      }
      .start()
    try {
      ms.addData((1L, "a2", "x"), (3L, "c", "y"))
      q.processAllAvailable()
      assert(asMap(IcebergReader.read(spark, dir)) ==
        Map(1L -> "a2", 2L -> "b", 3L -> "c"))
      // a later batch re-upserts key 1: the newer sequence wins
      ms.addData((1L, "a3", "x"), (4L, "d", "y"))
      q.processAllAvailable()
      assert(asMap(IcebergReader.read(spark, dir)) ==
        Map(1L -> "a3", 2L -> "b", 3L -> "c", 4L -> "d"))
    } finally q.stop()
    // two stacked equality-delete files, zero rewrites — then compaction
    // folds them away and the state is unchanged
    val snap = IcebergReader.snapshot(spark, dir)
    assert(snap.equalityDeleteFiles.size == 2)
    IcebergWriter.rewriteDataFiles(spark, dir)
    val after = IcebergReader.snapshot(spark, dir)
    assert(after.equalityDeleteFiles.isEmpty)
    assert(asMap(IcebergReader.read(spark, dir)) ==
      Map(1L -> "a3", 2L -> "b", 3L -> "c", 4L -> "d"))
  }
}
