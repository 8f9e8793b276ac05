package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{DeltaLogReader, DeltaLogWriter, IcebergReader, IcebergWriter, TableFormats}

/** Round-6 time travel: Delta `TIMESTAMP AS OF` (monotonized commit
  * clocks), Iceberg `FOR TIMESTAMP AS OF` (snapshot-log) and named
  * snapshot refs (spec v2 branches/tags) — including refs written into
  * the metadata by hand, the way an external engine's `ALTER TABLE
  * CREATE TAG` lands. */
class TimeTravelSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-tt").toString

  private def df(rows: (Long, String, String)*): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("id", "v", "p")
  }

  private def ids(d: DataFrame): Set[Long] =
    d.select("id").collect().map(_.getLong(0)).toSet

  test("delta: timestamp as of resolves between commits, raises before v0") {
    val dir = tmp()
    DeltaLogWriter.write(df((1L, "a", "x")), dir)
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    DeltaLogWriter.write(df((2L, "b", "x")), dir, mode = "append")
    assert(ids(TableFormats.readDeltalakeAtTimestamp(spark, dir, between))
      == Set(1L))
    assert(ids(DeltaLogReader.read(spark, dir,
      asOfTimestamp = Some(System.currentTimeMillis()))) == Set(1L, 2L))
    intercept[IllegalArgumentException] {
      DeltaLogReader.versionAtTimestamp(spark, dir, 1L)
    }
  }

  test("delta: regressed commit clocks are monotonized") {
    val dir = tmp()
    DeltaLogWriter.write(df((1L, "a", "x")), dir)
    DeltaLogWriter.write(df((2L, "b", "x")), dir, mode = "append")
    // rewrite v1's commitInfo timestamp to BEFORE v0's (clock regression
    // across writers) — running-max must keep v1 at/after v0
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val v1 = new Path(dir, f"_delta_log/${1L}%020d.json")
    val txt = new String(
      org.apache.commons.io.IOUtils.toByteArray(fs.open(v1)), "UTF-8")
    val regressed = txt.replaceAll(
      "\"timestamp\":\\d+", "\"timestamp\":1000")
    val out = fs.create(v1, true)
    out.write(regressed.getBytes("UTF-8")); out.close()
    // v0's timestamp dominates: travel to "now" still sees both commits,
    // and the v1 commit never resolves EARLIER than v0
    val now = System.currentTimeMillis()
    assert(DeltaLogReader.versionAtTimestamp(spark, dir, now) == 1L)
    val v0ts = DeltaLogReader.versionAtTimestamp(spark, dir, now)
    assert(v0ts == 1L)
    intercept[IllegalArgumentException] {
      DeltaLogReader.versionAtTimestamp(spark, dir, 999L)
    }
  }

  test("iceberg: timestamp as of via snapshot-log; refs by tag") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x")), dir, mode = "error")
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    IcebergWriter.write(df((2L, "b", "x")), dir, mode = "append")
    assert(ids(TableFormats.fromIcebergAtTimestamp(spark, dir, between))
      == Set(1L))
    // tag the FIRST snapshot and read by ref after more commits
    val firstId = IcebergReader.snapshotIdAtTimestamp(spark, dir, between)
    val tagged = IcebergWriter.setRef(spark, dir, "v1-release",
      Some(firstId))
    assert(tagged == firstId)
    IcebergWriter.write(df((3L, "c", "x")), dir, mode = "append")
    assert(ids(TableFormats.fromIcebergRef(spark, dir, "v1-release"))
      == Set(1L))
    assert(ids(IcebergReader.read(spark, dir)) == Set(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      IcebergReader.refSnapshotId(spark, dir, "nope")
    }
    intercept[IllegalArgumentException] {
      IcebergReader.snapshotIdAtTimestamp(spark, dir, 1L)
    }
  }

  test("iceberg: externally-written refs resolve; expiry honors tags") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x")), dir, mode = "error")
    val first = IcebergReader.snapshot(spark, dir).snapshotId
    IcebergWriter.write(df((2L, "b", "x")), dir, mode = "append")
    // splice a refs entry into the latest metadata BY HAND — the shape
    // an external engine's CREATE TAG writes
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(dir, "metadata")
    val latest = fs.listStatus(metaDir).map(_.getPath)
      .filter(_.getName.endsWith(".metadata.json"))
      .maxBy(_.getName.stripPrefix("v").takeWhile(_.isDigit).toLong)
    val txt = new String(
      org.apache.commons.io.IOUtils.toByteArray(fs.open(latest)), "UTF-8")
    val spliced = txt.replaceFirst("\\{",
      s"""{"refs":{"ext-tag":{"snapshot-id":$first,"type":"tag"}},""")
    val out = fs.create(latest, true)
    out.write(spliced.getBytes("UTF-8")); out.close()
    assert(ids(IcebergReader.read(spark, dir, asOfRef = Some("ext-tag")))
      == Set(1L))
    // expire with zero retention: the tagged snapshot must survive
    IcebergWriter.expireSnapshots(spark, dir, retentionMs = 0L,
      retainLast = 1)
    assert(ids(IcebergReader.read(spark, dir, asOfRef = Some("ext-tag")))
      == Set(1L))
  }
}
