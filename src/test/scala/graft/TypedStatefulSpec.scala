package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TypedOps
import graft.streaming.EventStream

/** Typed Dataset/Aggregator surface + flatMapGroupsWithState. */
class TypedStatefulSpec extends AnyFunSuite {
  import TestSpark._

  test("typed Aggregator equals the untyped plan") {
    val typed = TypedOps.revenuePerSupplier(spark, sf)
      .collect().map(r => r.supp -> (math.round(r.revenue * 100), r.lines))
      .toMap
    val untyped = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") =!= "R")
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rev"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getLong(0) -> (math.round(r.getDouble(1) * 100), r.getLong(2)))
      .toMap
    assert(typed == untyped)
    assert(typed.nonEmpty)
  }

  test("flatMapGroupsWithState emits sessions at the event cap") {
    val agg = EventStream.statefulSessions(
      EventStream.readEvents(spark, s"$sf"), maxEvents = 10)
      .toDF()
    val chk = Files.createTempDirectory("graft-state-chk").toString
    val q = agg.writeStream.outputMode("append")
      .option("checkpointLocation", chk)
      .format("memory").queryName("stateful_sessions")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("stateful_sessions").collect()
    assert(rows.nonEmpty, "expected capped sessions for active users")
    // capped sessions hold exactly maxEvents; timeout-flushed residual
    // sessions hold fewer — never more
    assert(rows.forall(r => r.getAs[Long]("n_events") <= 10L &&
      r.getAs[Long]("n_events") >= 1L))
    assert(rows.exists(_.getAs[Long]("n_events") == 10L),
      "expected at least one capped session")
    // no user exceeds total event count
    val perUser = spark.table("stateful_sessions")
      .groupBy("user_id").agg(sum("n_events").as("emitted"))
    val totals = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("total"))
    val joined = perUser.join(totals, "user_id")
      .filter(col("emitted") > col("total"))
    assert(joined.count() == 0)
  }
}
