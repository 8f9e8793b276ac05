package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real-format Iceberg writes: every table [[graft.io.IcebergWriter]]
  * commits must read back through the jar-free spec reader
  * [[graft.io.IcebergReader]] (the same reader that opens tables other
  * engines committed) — append/overwrite/merge matrix, snapshot time
  * travel by id, manifest stats, and partition-granular merge (untouched
  * files carried as EXISTING manifest entries, zero data rewrite). */
class IcebergWriteSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String =
    Files.createTempDirectory("graft-icebergw").toString + "/tbl"

  private def asSet(df: DataFrame): Set[(Long, String, String)] = {
    val spark0 = spark
    import spark0.implicits._
    df.select("id", "v", "p").as[(Long, String, String)].collect().toSet
  }

  private def df(rows: (Long, String, String)*): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("id", "v", "p")
  }

  test("iceberg write: create/append/overwrite round-trip through the spec reader") {
    val dir = tmp()
    val c0 = io.IcebergWriter.write(df((1L, "a1", "x")), dir, mode = "error")
    assert(c0.version == 1)
    assert(io.IcebergReader.isIcebergTable(spark, dir))
    val c1 = io.IcebergWriter.write(df((2L, "b1", "y")), dir)
    assert(c1.version == 2)
    assert(asSet(io.IcebergReader.read(spark, dir)) ==
      Set((1L, "a1", "x"), (2L, "b1", "y")))
    // snapshot time travel: the first snapshot id still reads v1's rows
    assert(asSet(io.IcebergReader.read(spark, dir, Some(c0.snapshotId))) ==
      Set((1L, "a1", "x")))
    val c2 = io.IcebergWriter.write(df((9L, "z", "w")), dir, mode = "overwrite")
    assert(asSet(io.IcebergReader.read(spark, dir)) == Set((9L, "z", "w")))
    assert(asSet(io.IcebergReader.read(spark, dir, Some(c1.snapshotId))) ==
      Set((1L, "a1", "x"), (2L, "b1", "y")))
    // history: three snapshots, newest first, operations recorded
    val hist = io.IcebergReader.history(spark, dir)
    assert(hist.map(_._1) == Seq(c2.snapshotId, c1.snapshotId, c0.snapshotId))
    assert(hist.map(_._3) == Seq("overwrite", "append", "append"))
    // create-exclusive claim: "error" mode on an existing table raises
    intercept[IllegalArgumentException] {
      io.IcebergWriter.write(df((0L, "n", "n")), dir, mode = "error")
    }
  }

  test("iceberg write: metadata layout is the spec's (vN json + avro manifests + hint)") {
    val dir = tmp()
    io.IcebergWriter.write(df((1L, "a", "x"), (2L, "b", "y")), dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = fs.listStatus(new Path(dir, "metadata")).map(_.getPath.getName)
    assert(meta.count(_.matches("v\\d+\\.metadata\\.json")) == 1)
    assert(meta.count(_.startsWith("snap-")) == 1, "one manifest list per snapshot")
    assert(meta.count(_.endsWith("-m0.avro")) == 1, "one manifest per commit")
    assert(meta.contains("version-hint.text"))
    // manifest stats: record counts from the real footers, file sizes real
    val snap = io.IcebergReader.snapshot(spark, dir)
    assert(snap.files.map(_.recordCount).sum == 2L)
    assert(snap.files.forall(_.sizeBytes > 0L))
  }

  test("iceberg write: partitioned merge rewrites only touched partitions") {
    val dir = tmp()
    io.IcebergWriter.write(
      df((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z")), dir,
      partitionBy = Seq("p"))
    val before = io.IcebergReader.snapshot(spark, dir)
    assert(before.partitionColumns == Seq("p"))
    assert(before.files.forall(_.path.contains("/data/p=")))
    // upsert id=2 (partition y) + insert id=4 (partition y): x and z untouched
    val c = io.IcebergWriter.merge(spark, dir,
      df((2L, "B", "y"), (4L, "d", "y")), keys = Seq("id"))
    assert(asSet(io.IcebergReader.read(spark, dir)) ==
      Set((1L, "a", "x"), (2L, "B", "y"), (3L, "c", "z"), (4L, "d", "y")))
    val after = io.IcebergReader.snapshot(spark, dir)
    val keptBefore = before.files.filterNot(_.path.contains("p=y"))
      .map(_.path).toSet
    val keptAfter = after.files.filterNot(_.path.contains("p=y"))
      .map(_.path).toSet
    assert(keptBefore == keptAfter,
      "untouched partitions must carry the SAME data files (EXISTING entries)")
    assert(after.files.filter(_.path.contains("p=y"))
      .forall(f => !before.files.map(_.path).contains(f.path)),
      "touched partition files are rewritten")
    // carried entries keep their manifest stats
    assert(after.files.filterNot(_.path.contains("p=y"))
      .forall(_.recordCount == 1L))
    assert(c.snapshotId == after.snapshotId)
  }

  test("iceberg write: append schema drift raises; types survive the round-trip") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    val typed = Seq((1L, 1.5, java.sql.Date.valueOf("2024-01-02"),
        BigDecimal("12.34"), Seq(1, 2), Map("k" -> 2L)))
      .toDF("id", "d", "dt", "dec", "arr", "m")
      .select(col("id"), col("d"), col("dt"),
        col("dec").cast("decimal(10,2)").as("dec"), col("arr"), col("m"))
    io.IcebergWriter.write(typed, dir)
    val back = io.IcebergReader.read(spark, dir)
    assert(back.schema("dec").dataType ==
      org.apache.spark.sql.types.DecimalType(10, 2))
    assert(back.select("id", "d").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 1.5)))
    assert(back.select(element_at(col("m"), "k")).as[Long].head() == 2L)
    intercept[IllegalArgumentException] { // new column with evolution off
      io.IcebergWriter.write(typed.withColumn("extra", lit(1)), dir,
        schemaEvolution = false)
    }
    intercept[IllegalArgumentException] { // retyped column on append
      io.IcebergWriter.write(typed.withColumn("d", lit("s")), dir)
    }
  }

  test("iceberg write: concurrent appends all land (manifests carried at claim time)") {
    val dir = tmp()
    io.IcebergWriter.write(df((0L, "base", "p")), dir)
    import scala.concurrent._
    import scala.concurrent.duration._
    import ExecutionContext.Implicits.global
    val fs = (1 to 4).map { i =>
      Future(io.IcebergWriter.write(df((i.toLong, s"w$i", "p")), dir))
    }
    val versions = Await.result(Future.sequence(fs), 120.seconds).map(_.version)
    assert(versions.toSet.size == 4, s"each writer its own version: $versions")
    // NO lost update: every concurrent writer's rows are in the final
    // snapshot (a stale carried file list would drop the race winners)
    assert(asSet(io.IcebergReader.read(spark, dir)) ==
      Set((0L, "base", "p"), (1L, "w1", "p"), (2L, "w2", "p"),
        (3L, "w3", "p"), (4L, "w4", "p")))
  }

  test("to_iceberg wrapper: real format for fresh dirs, merge path engaged") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    io.TableFormats.toIceberg(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    assert(io.IcebergReader.isIcebergTable(spark, dir))
    io.TableFormats.toIceberg(Seq((2L, "B"), (3L, "c")).toDF("id", "v"), dir,
      mergeCols = Seq("id"))
    val now = io.TableFormats.fromIceberg(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(now == Set((1L, "a"), (2L, "B"), (3L, "c")))
    // VERSION AS OF via snapshot id still sees the pre-merge state
    val first = io.IcebergReader.history(spark, dir).last._1
    assert(io.TableFormats.fromIcebergSnapshot(spark, dir, first)
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }
}
