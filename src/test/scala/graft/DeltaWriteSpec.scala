package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real-format Delta writes: every table [[graft.io.DeltaLogWriter]]
  * produces must read back through the jar-free protocol reader
  * [[graft.io.DeltaLogReader]] (the same reader that opens tables other
  * engines wrote) — append/overwrite/merge matrix, version time travel,
  * checkpoint compaction at v10, and the single-scan plan shape over
  * many partitions. */
class DeltaWriteSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String =
    Files.createTempDirectory("graft-deltaw").toString + "/tbl"

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

  test("delta write: create/append/overwrite round-trip through the protocol reader") {
    val dir = tmp()
    val c0 = io.DeltaLogWriter.write(df((1L, "a1", "x")), dir)
    assert(c0.version == 0)
    val c1 = io.DeltaLogWriter.write(df((2L, "b1", "y")), dir, mode = "append")
    assert(c1.version == 1)
    assert(asSet(io.DeltaLogReader.read(spark, dir)) ==
      Set((1L, "a1", "x"), (2L, "b1", "y")))
    // time travel to the pre-append version
    assert(asSet(io.DeltaLogReader.read(spark, dir, Some(0))) ==
      Set((1L, "a1", "x")))
    val c2 = io.DeltaLogWriter.write(df((9L, "z", "w")), dir, mode = "overwrite")
    assert(c2.version == 2)
    assert(asSet(io.DeltaLogReader.read(spark, dir)) == Set((9L, "z", "w")))
    // overwritten versions stay readable (remove actions, not deletes)
    assert(asSet(io.DeltaLogReader.read(spark, dir, Some(1))) ==
      Set((1L, "a1", "x"), (2L, "b1", "y")))
    val hist = io.DeltaLogReader.history(spark, dir)
    assert(hist.map(_.version) == Seq(2L, 1L, 0L))
    intercept[IllegalArgumentException] {
      io.DeltaLogWriter.write(df((0L, "q", "q")), dir, mode = "error")
    }
    // append with an incompatibly retyped column is rejected (a
    // NARROWER int id would up-cast losslessly — see Round8Spec)
    val spark0 = spark
    import spark0.implicits._
    intercept[IllegalArgumentException] {
      io.DeltaLogWriter.write(
        Seq(("s", "a", "x")).toDF("id", "v", "p"), dir, mode = "append")
    }
  }

  test("delta write: partitioned table, partitionValues in the log, merge is partition-granular") {
    val dir = tmp()
    io.TableFormats.toDeltalake(
      df((1L, "a1", "x"), (2L, "b1", "y"), (3L, "c1", "z")), dir,
      partitionBy = Seq("p"))
    val snap0 = io.DeltaLogReader.snapshot(spark, dir)
    assert(snap0.partitionColumns == Seq("p"))
    assert(snap0.files.forall(_.partitionValues.keySet == Set("p")))
    val untouched0 = snap0.files.filter(
      _.partitionValues.get("p").flatten.contains("z")).map(_.path).toSet
    assert(untouched0.nonEmpty)
    // merge: update id=1 (partition x), insert id=4 into partition y
    io.TableFormats.toDeltalake(
      df((1L, "A2", "x"), (4L, "d1", "y")), dir, mergeKeys = Seq("id"))
    assert(asSet(io.TableFormats.readDeltalake(spark, dir)) ==
      Set((1L, "A2", "x"), (2L, "b1", "y"), (3L, "c1", "z"), (4L, "d1", "y")))
    // partition z was never touched: its files survive by identity
    val snap1 = io.DeltaLogReader.snapshot(spark, dir)
    val untouched1 = snap1.files.filter(
      _.partitionValues.get("p").flatten.contains("z")).map(_.path).toSet
    assert(untouched1 == untouched0,
      "merge must not rewrite partitions with no matched keys or incoming rows")
  }

  test("delta write: checkpoint parquet lands at v10 and replay uses it") {
    val dir = tmp()
    (0 to 10).foreach { i =>
      io.DeltaLogWriter.write(df((i.toLong, s"v$i", "p0")), dir)
    }
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ckpt = new Path(s"$dir/_delta_log", f"${10L}%020d.checkpoint.parquet")
    assert(fs.exists(ckpt) && fs.getFileStatus(ckpt).isFile,
      "checkpoint must be a single parquet FILE")
    assert(fs.exists(new Path(s"$dir/_delta_log", "_last_checkpoint")))
    // delete the compacted json tail; replay must come from the checkpoint
    (0 to 9).foreach { v =>
      fs.delete(new Path(s"$dir/_delta_log", f"$v%020d.json"), false)
    }
    val all = io.DeltaLogReader.read(spark, dir)
    assert(all.count() == 11)
    assert(asSet(all).map(_._1) == (0L to 10L).toSet)
  }

  test("delta read: many partitions still plan ONE parquet scan node") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    val wide = (0 until 100).map(i => (i.toLong, s"v$i", s"p$i"))
      .toDF("id", "v", "p")
    io.DeltaLogWriter.write(wide, dir, partitionBy = Seq("p"))
    val read = io.DeltaLogReader.read(spark, dir)
    assert(read.count() == 100)
    assert(read.select("p").distinct().count() == 100)
    val lp = read.queryExecution.optimizedPlan
    val scans = lp.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    val unions = lp.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }
    assert(scans.length == 1 && unions.isEmpty,
      s"expected a single parquet relation over 100 partitions, " +
        s"got ${scans.length} scans / ${unions.length} unions")
  }

  test("delta write: concurrent writers both land (optimistic version claim)") {
    val dir = tmp()
    io.DeltaLogWriter.write(df((0L, "base", "p")), dir)
    import scala.concurrent._
    import scala.concurrent.duration._
    import ExecutionContext.Implicits.global
    val fs = (1 to 4).map { i =>
      Future(io.DeltaLogWriter.write(df((i.toLong, s"w$i", "p")), dir,
        mode = "append"))
    }
    val versions = Await.result(Future.sequence(fs), 120.seconds).map(_.version)
    assert(versions.toSet.size == 4, s"each writer its own version: $versions")
    assert(io.DeltaLogReader.read(spark, dir).count() == 5)
  }

  test("delta streaming: all micro-batches land as ONE commit on the real log") {
    val dir = tmp()
    val events = streaming.EventStream.readEvents(spark, sf)
    val agg = streaming.EventStream.tumblingAgg(events)
    val c = io.DeltaLogWriter.writeStreaming(agg, dir,
      java.nio.file.Files.createTempDirectory("graft-deltastream").toString)
    assert(c.version == 0L, "the whole run is one table version")
    assert(io.DeltaLogReader.latestVersion(spark, dir) == 0L)
    val n = io.DeltaLogReader.read(spark, dir).count()
    assert(n > 0)
    // tracks the batch computation (watermark may drop a few late buckets)
    val batch = ops.TimeSeries.tumbling(spark, sf).count()
    assert(n <= batch && n >= batch - 10, s"streamed $n vs batch $batch")
    // a second streaming run appends as the NEXT single version
    val c2 = io.DeltaLogWriter.writeStreaming(agg, dir,
      java.nio.file.Files.createTempDirectory("graft-deltastream2").toString)
    assert(c2.version == 1L)
    assert(io.DeltaLogReader.read(spark, dir).count() == 2 * n)
  }

  test("delta streaming: staged batches persisted with the checkpoint survive a restart") {
    val dir = tmp()
    val events = streaming.EventStream.readEvents(spark, sf)
    val agg = streaming.EventStream.tumblingAgg(events)
    io.DeltaLogWriter.writeStreaming(agg, dir,
      java.nio.file.Files.createTempDirectory("graft-deltastream3").toString)
    val n = io.DeltaLogReader.read(spark, dir).count()
    // craft a crashed run's state: a batch whose data files landed in
    // the table tree and whose staged manifest persisted next to the
    // checkpoint, but which the checkpoint will skip on restart
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stg = java.nio.file.Files.createTempDirectory("graft-orphan").toString
    io.DeltaLogReader.read(spark, dir).limit(3).coalesce(1)
      .write.mode("overwrite").parquet(stg)
    val part = fs.listStatus(new Path(stg))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    assert(fs.rename(part, new Path(dir, "recovered-0.parquet")))
    val chk2 = java.nio.file.Files.createTempDirectory("graft-deltastream4")
    val stagedDir = new java.io.File(s"$chk2/graft-staged-adds")
    stagedDir.mkdirs()
    // batch id 999: a batch this run will NOT execute — the manifest
    // survives untouched, exactly like a checkpoint-committed batch of
    // the crashed run (a manifest for a batch that DOES re-run is
    // overwritten and must not resurrect — covered by the next test)
    java.nio.file.Files.writeString(
      new java.io.File(stagedDir, "batch-999.json").toPath,
      """{"path":"recovered-0.parquet","partitionValues":{},"size":1,"modificationTime":1}""" + "\n")
    // the fresh checkpoint reprocesses the full stream (n rows) AND must
    // recover the crashed batch's 3 rows into the same single commit
    io.DeltaLogWriter.writeStreaming(agg, dir, chk2.toString)
    assert(io.DeltaLogReader.read(spark, dir).count() == 2 * n + 3)
    assert(!stagedDir.exists(), "staged manifests are cleaned after commit")
  }

  test("delta streaming: a re-run batch's superseded manifest does not double-commit") {
    val dir = tmp()
    val events = streaming.EventStream.readEvents(spark, sf)
    val agg = streaming.EventStream.tumblingAgg(events)
    // craft the crash window the round-5 advice flagged: batch 0
    // persisted its manifest but the Spark checkpoint never marked it
    // done, so the (fresh-checkpoint) restart RE-RUNS batch 0 with new
    // file names — the old manifest's paths are superseded and must not
    // be committed alongside the re-run's
    val chk = java.nio.file.Files.createTempDirectory("graft-deltastream5")
    val stagedDir = new java.io.File(s"$chk/graft-staged-adds")
    stagedDir.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(stagedDir, "batch-0.json").toPath,
      """{"path":"superseded-0.parquet","partitionValues":{},"size":1,"modificationTime":1}""" + "\n")
    io.DeltaLogWriter.writeStreaming(agg, dir, chk.toString)
    val snap = io.DeltaLogReader.snapshot(spark, dir)
    assert(!snap.files.exists(_.path == "superseded-0.parquet"),
      "re-run batch's old manifest paths must not resurrect")
    val batch = ops.TimeSeries.tumbling(spark, sf).count()
    val n = io.DeltaLogReader.read(spark, dir).count()
    assert(n <= batch && n >= batch - 10,
      s"rows must match ONE run of the stream, got $n vs batch $batch")
  }
}
