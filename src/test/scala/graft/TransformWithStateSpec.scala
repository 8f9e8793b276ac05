package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** `transformWithState` (Spark 4's arbitrary-stateful API, SPARK-46815):
  * the per-user running-total processor accumulates across micro-batches
  * through a typed ValueState cell backed by the RocksDB state store,
  * emits one updated record per (user, batch) it appears in, and keys
  * never interfere. */
class TransformWithStateSpec extends AnyFunSuite {
  import TestSpark._

  test("dropDuplicatesWithinWatermark: re-delivered keys emit once") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val deduped = EventStream.dedupWithinWatermark(
      events.toDF().toDF("event_id", "ts", "value"))
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      events.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0), (1L, ts(2), 1.0))
      q.processAllAvailable()
      // a later batch re-delivers key 1 inside the watermark window
      events.addData((1L, ts(3), 1.0), (3L, ts(4), 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out")
        .select("event_id").collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L),
        s"each key must emit exactly once: $ids")
    } finally q.stop()
  }

  test("streaming curation ingest: gate + in-watermark dedup + exactly-once Delta") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-scur").toString
    val table = s"$base/t"; val ckpt = s"$base/ck"
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val good = ("the a " + Seq.fill(58)("clean").mkString(" "))
    val junk = "too short"
    val docs = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    def ingest() = graft.streaming.EventStream.curationIngest(
      docs.toDF().toDF("doc_id", "lang", "text", "ts"),
      table, ckpt, appId = "scur-test",
      stopWords = graft.ops.Curation.CorpusStopWords)
    // RUN 1: one passing doc, one junk doc (AvailableNow drains it)
    docs.addData((1L, "en", good, ts(0)), (2L, "en", junk, ts(1)))
    ingest().awaitTermination()
    // RUN 2, SAME checkpoint + appId: re-delivers doc 1 inside the
    // watermark (dedup state must survive the restart) plus a new doc
    // — this crosses a real micro-batch/run boundary, not one batch
    docs.addData((1L, "en", good, ts(2)), (3L, "en", good, ts(3)))
    ingest().awaitTermination()
    val got = graft.io.DeltaLogReader.read(spark, table)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    // junk gated out; the re-delivered doc 1 deduped ACROSS runs via
    // restored state; 1 and 3 land exactly once
    assert(got == Seq(1L, 3L), s"curated table rows: $got")
  }

  test("running totals accumulate per key across micro-batches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prior = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val events = MemoryStream[(Long, Double)]
    val totals = EventStream.runningTotals(
      events.toDF().toDF("user_id", "value"))
    val q = totals.writeStream.format("memory")
      .queryName("tws_out").outputMode("append").start()
    try {
      events.addData((1L, 10.0), (1L, 5.0), (2L, 7.0))
      q.processAllAvailable()
      events.addData((1L, 1.0), (3L, 2.0))
      q.processAllAvailable()
      val rows = spark.table("tws_out")
        .select("user_id", "total", "n")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .toSet
      // batch 1 emits the totals as of batch 1; batch 2 the updated ones
      assert(rows == Set(
        (1L, 15.0, 2L), (2L, 7.0, 1L),   // after batch 1
        (1L, 16.0, 3L), (3L, 2.0, 1L)),  // after batch 2 (user 2 silent)
        s"unexpected: $rows")
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
