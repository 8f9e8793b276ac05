package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming watermark semantics (SURVEY §7.5.6: no reference semantics
  * to copy — Spark's are adopted and documented here): an event older
  * than the watermark is DROPPED, and an append-mode window is emitted
  * exactly once, after the watermark passes its end.
  */
class LateDataSpec extends AnyFunSuite {
  import TestSpark._

  test("late events beyond the watermark are dropped from window counts") {
    val spark0 = spark
    import spark0.implicits._
    val in = Files.createTempDirectory("graft-late-in").toString
    val chk = Files.createTempDirectory("graft-late-chk").toString

    def writeBatch(times: Seq[String], tag: String): Unit =
      times.map(t => Tuple1(java.sql.Timestamp.valueOf(t))).toDF("ts")
        .coalesce(1).write.mode("append").parquet(in)

    // batch 1: three events in [10:00,10:05), two in [10:05,10:10), one
    // at 10:20 that will push the watermark to 10:10
    writeBatch(Seq(
      "2024-01-01 10:00:30", "2024-01-01 10:01:00", "2024-01-01 10:04:00",
      "2024-01-01 10:06:00", "2024-01-01 10:07:00",
      "2024-01-01 10:20:00"), "b1")

    val agg = spark.readStream
      .schema("ts timestamp")
      .parquet(in)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "HH:mm").as("w"), col("n"))

    val q = agg.writeStream.outputMode("append")
      .option("checkpointLocation", chk)
      .format("memory").queryName("late_test")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      q.processAllAvailable()
      // batch 2: one LATE event at 10:02 (watermark is 10:10 — must be
      // dropped) plus a fresh event advancing the watermark further
      writeBatch(Seq("2024-01-01 10:02:00", "2024-01-01 10:40:00"), "b2")
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("late_test").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the 10:00 window must hold the ORIGINAL 3 events — the late 10:02
    // event arrived after the watermark passed and was dropped
    assert(rows.get("10:00").contains(3L),
      s"late event leaked into a closed window: $rows")
    assert(rows.get("10:05").contains(2L), rows.toString)
    // and append mode emitted each closed window exactly once
    assert(spark.table("late_test").groupBy("w").count()
      .filter(col("count") > 1).count() == 0)
  }
}
