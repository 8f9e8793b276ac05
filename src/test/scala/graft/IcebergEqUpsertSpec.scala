package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{IcebergReader, IcebergWriter, UnsupportedIcebergFeatureException}

/** Zero-rewrite Iceberg upsert via v2 equality-delete files (round 6):
  * one commit appends the new rows plus an equality-delete file for
  * their keys; old-file rows vanish by the reader's sequence rule while
  * the same commit's own rows survive. Nothing is rewritten. */
class IcebergEqUpsertSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-equp").toString

  private def df(rows: (Long, String, String)*): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("id", "v", "p")
  }

  private def asMap(d: DataFrame): Map[Long, String] =
    d.select("id", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("upsert: updated keys replaced, new keys added, nothing rewritten") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "x")),
      dir, mode = "error")
    val before = IcebergReader.snapshot(spark, dir).files.map(_.path).toSet
    IcebergWriter.upsertByKey(spark, dir,
      df((2L, "b2", "y"), (4L, "d", "x")), keys = Seq("id"))
    assert(asMap(IcebergReader.read(spark, dir)) ==
      Map(1L -> "a", 2L -> "b2", 3L -> "c", 4L -> "d"))
    val snap = IcebergReader.snapshot(spark, dir)
    // zero rewrite: every pre-upsert data file is still live
    assert(before.subsetOf(snap.files.map(_.path).toSet))
    // and the delete took the equality form with the key's field-id
    assert(snap.equalityDeleteFiles.nonEmpty)
    assert(snap.equalityDeleteFiles.forall(_.equalityIds == Seq(1)))
    assert(snap.deleteFiles.isEmpty)
  }

  test("repeated upsert of one key: the latest batch wins") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x")), dir, mode = "error")
    IcebergWriter.upsertByKey(spark, dir, df((1L, "a2", "x")), Seq("id"))
    IcebergWriter.upsertByKey(spark, dir, df((1L, "a3", "x")), Seq("id"))
    assert(asMap(IcebergReader.read(spark, dir)) == Map(1L -> "a3"))
    // three data files live (nothing rewritten), two delete files stacked
    val snap = IcebergReader.snapshot(spark, dir)
    assert(snap.files.size == 3)
    assert(snap.equalityDeleteFiles.size == 2)
  }

  test("rewrite paths raise on live equality deletes instead of resurrecting") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x"), (2L, "b", "y")), dir,
      mode = "error")
    IcebergWriter.upsertByKey(spark, dir, df((1L, "a2", "x")), Seq("id"))
    intercept[UnsupportedIcebergFeatureException] {
      IcebergWriter.merge(spark, dir, df((2L, "b2", "y")), keys = Seq("id"))
    }
    intercept[UnsupportedIcebergFeatureException] {
      IcebergWriter.deleteWhere(spark, dir, col("id") === 2L)
    }
  }

  test("concurrent upserts of disjoint keys both land") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x")), dir, mode = "error")
    import java.util.concurrent.{CountDownLatch, Executors}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val fails = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = Seq(
      df((2L, "b", "x"), (1L, "a2", "x")),
      df((3L, "c", "y"))).map { src =>
      pool.submit(new Runnable {
        def run(): Unit = {
          gate.await()
          try IcebergWriter.upsertByKey(spark, dir, src, Seq("id"))
          catch { case _: Throwable => fails.incrementAndGet(); () }
        }
      })
    }
    gate.countDown()
    tasks.foreach(_.get())
    pool.shutdown()
    assert(fails.get() == 0)
    // both commits visible: the claim loop retries the loser and carries
    // the winner's manifests
    assert(asMap(IcebergReader.read(spark, dir)) ==
      Map(1L -> "a2", 2L -> "b", 3L -> "c"))
  }

  test("upsert into an empty table is a plain append") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x")), dir, mode = "error")
    IcebergWriter.deleteWhere(spark, dir, col("id") === 1L)
    // table still has a data file (delete is positional) — now drain it
    // differently: a fresh table with no snapshot
    val dir2 = tmp()
    IcebergWriter.write(df((5L, "e", "x")), dir2, mode = "error")
    val c = IcebergWriter.upsertByKey(spark, dir2, df((6L, "f", "y")),
      Seq("id"))
    assert(c.version > 0)
    assert(asMap(IcebergReader.read(spark, dir2)) ==
      Map(5L -> "e", 6L -> "f"))
  }
}
