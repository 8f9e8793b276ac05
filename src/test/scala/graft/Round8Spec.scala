package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 hardening: schema-adaptive events timestamp decoding (the
  * round-7 regression — testdata regenerated `events.ts` from INT64
  * nanos to native TIMESTAMP(MICROS, NTZ) and the adapter baked in the
  * nanos decode), additive schema evolution on real-format appends, and
  * null-safe MERGE keys.
  */
class Round8Spec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-r8").toString

  // ---- Tables.events: every physical encoding of ts ----------------------

  /** One canonical instant, expressed in all three physical encodings the
    * testdata generator has shipped. 2026-01-02T03:04:05.123456 UTC. */
  private val micros = 1767323045123456L

  test("normalizeTs: int64-nanos encoding decodes to truncated micros") {
    val dir = tmp() + "/ev_nanos"
    val spark0 = spark
    import spark0.implicits._
    // plain INT64 column holding nanos (what nanosAsLong gives for
    // parquet TIMESTAMP(NANOS)); 789 extra nanos must floor away
    Seq(micros * 1000L + 789L).toDF("ts").write.parquet(dir)
    val out = Tables.normalizeTs(spark.read.parquet(dir), "ts")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("normalizeTs: TIMESTAMP_NTZ encoding casts losslessly (UTC session)") {
    val dir = tmp() + "/ev_ntz"
    val spark0 = spark
    import spark0.implicits._
    Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.parquet(dir)
    val raw = spark.read.parquet(dir)
    assert(raw.schema("ts").dataType == TimestampNTZType)
    val out = Tables.normalizeTs(raw, "ts")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("normalizeTs: native TIMESTAMP passes through unchanged") {
    val dir = tmp() + "/ev_utc"
    val spark0 = spark
    import spark0.implicits._
    Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).as("ts")).write.parquet(dir)
    val out = Tables.normalizeTs(spark.read.parquet(dir), "ts")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("normalizeTs: unsupported physical type raises, not silently wrong") {
    val spark0 = spark
    import spark0.implicits._
    val bad = Seq("2026-01-02").toDF("ts")
    val e = intercept[IllegalArgumentException](Tables.normalizeTs(bad, "ts"))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("Tables.events reads the current testdata and ts is TimestampType") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() > 0)
    // a real query over ts must analyze (the exact round-7 failure mode)
    val windows = ev.groupBy(window(col("ts"), "1 hour")).count()
    assert(windows.count() > 0)
  }
}
