package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** The composed daily dedup loop (round-12 verdict #2/#3): batch →
  * [[Dedup.dedupBatch]] (within-batch exact) → [[Dedup.incrementalProbe]]
  * → admit novel → [[Dedup.updateDedupIndex]]. The central claim under
  * test: the APPENDED index is row-identical to a full rebuild over
  * corpus ∪ admitted, so day-2 probes through the update are
  * indistinguishable from a daily full re-index — at batch cost
  * instead of corpus cost. */
class DailyDedupLoopSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = Tables.documents(spark, sf)

  private def asSet(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("update after probe equals a fresh full rebuild (both sub-tables)") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val held = docs.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id"), col("text"))

    val updated = graft.session.Scratch.dir("ddl-upd") + "/idx"
    Dedup.buildDedupIndex(corpus, updated)
    val b1 = Dedup.dedupBatch(held)
    val out1 = Dedup.incrementalProbe(spark, b1, updated).localCheckpoint()
    val admitted = b1.join(
      out1.filter(col("verdict") === "novel").select(col("doc_id")),
      Seq("doc_id")).localCheckpoint()
    assert(admitted.count() > 0, "need novel docs for the update to bite")
    Dedup.updateDedupIndex(admitted, updated)

    val rebuilt = graft.session.Scratch.dir("ddl-rb") + "/idx"
    Dedup.buildDedupIndex(corpus.select(col("doc_id"), col("text"))
      .unionAll(admitted), rebuilt)

    val (uh, ub) = Dedup.readDedupIndex(spark, updated)
    val (rh, rb) = Dedup.readDedupIndex(spark, rebuilt)
    for ((t, u0, r0) <- Seq(("hashes", uh, rh), ("bands", ub, rb))) {
      val u = asSet(u0.select(r0.columns.map(col): _*))
      val r = asSet(r0)
      assert(u == r, s"$t diverge: updated-only=${(u -- r).take(3)} " +
        s"rebuilt-only=${(r -- u).take(3)}")
    }

    // and the next day's probe cannot tell them apart
    val b2 = Dedup.dedupBatch(
      docs.filter(col("doc_id") % 10 === 4)
        .select(col("doc_id"), col("text"))
        .unionAll(admitted.select((col("doc_id") + 5000000L).as("doc_id"),
          col("text"))))
    assert(asSet(Dedup.incrementalProbe(spark, b2, updated)) ==
      asSet(Dedup.incrementalProbe(spark, b2, rebuilt)))
  }

  test("day-2 replay of day-1 admitted docs comes back exact") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val idx = graft.session.Scratch.dir("ddl-replay") + "/idx"
    Dedup.buildDedupIndex(corpus, idx)
    val b1 = Dedup.dedupBatch(
      docs.filter(col("doc_id") % 10 === 7).select(col("doc_id"), col("text")))
    val out1 = Dedup.incrementalProbe(spark, b1, idx).localCheckpoint()
    val admitted = b1.join(
      out1.filter(col("verdict") === "novel").select(col("doc_id")),
      Seq("doc_id")).localCheckpoint()
    Dedup.updateDedupIndex(admitted, idx)
    val replay = admitted
      .select((col("doc_id") + 7000000L).as("doc_id"), col("text"))
    val out2 = Dedup.incrementalProbe(spark, replay, idx)
      .withColumn("orig", col("doc_id") - 7000000L)
    assert(out2.filter(col("verdict") =!= "exact").count() == 0)
    // each replay matches its own day-1 admission (admitted hashes are
    // unique post-dedupBatch and disjoint from the corpus)
    assert(out2.filter(col("match_doc_id") =!= col("orig")).count() == 0)
  }

  test("dedupBatch collapses identical texts to the min doc_id row") {
    import spark.implicits._
    val batch = Seq(
      (10L, "alpha beta"), (3L, "alpha beta"), (7L, "gamma"))
      .toDF("doc_id", "text")
    val got = Dedup.dedupBatch(batch).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((3L, "alpha beta"), (7L, "gamma")))
  }

  test("compactDedupIndex: fewer files, identical content and probes") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val idx = graft.session.Scratch.dir("ddl-compact") + "/idx"
    Dedup.buildDedupIndex(corpus, idx)
    // three daily appends of guaranteed-novel synthetic batches
    // (disjoint salted vocab per day), each through the real loop
    for (day <- 1 to 3) {
      val batch = Dedup.dedupBatch(
        docs.filter(col("doc_id") % 10 === 7)
          .select((col("doc_id") + day * 10000000L).as("doc_id"),
            concat_ws(" ", expr(
              s"transform(split(text, ' '), t -> concat(t, '_d$day'))"))
              .as("text")))
      val admitted = batch.join(
        Dedup.incrementalProbe(spark, batch, idx)
          .filter(col("verdict") === "novel").select(col("doc_id")),
        Seq("doc_id"))
      Dedup.updateDedupIndex(admitted, idx)
    }
    def partFiles(sub: String): Int = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$idx/$sub"))
        .iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
    }
    def snap(sub: String): Set[String] = {
      val (h, b) = Dedup.readDedupIndex(spark, idx)
      (if (sub == "hashes") h else b).collect().map(_.toString).toSet
    }
    val probeBatch = docs.filter(col("doc_id") % 20 === 7)
      .select(col("doc_id"), col("text"))
    val beforeFiles = (partFiles("hashes"), partFiles("bands"))
    val beforeContent = (snap("hashes"), snap("bands"))
    val beforeProbe = asSet(Dedup.incrementalProbe(spark, probeBatch, idx))
    Dedup.compactDedupIndex(spark, idx)
    assert(snap("hashes") == beforeContent._1)
    assert(snap("bands") == beforeContent._2)
    assert(asSet(Dedup.incrementalProbe(spark, probeBatch, idx))
      == beforeProbe)
    // the compacted layout becomes the LIVE file count once vacuum
    // reclaims the superseded snapshots (the snapshot model keeps the
    // old files for in-flight probes until then)
    Dedup.vacuumDedupIndex(spark, idx, keepVersions = 1)
    assert(partFiles("hashes") < beforeFiles._1,
      s"hashes files ${partFiles("hashes")} !< ${beforeFiles._1}")
    assert(partFiles("bands") < beforeFiles._2,
      s"bands files ${partFiles("bands")} !< ${beforeFiles._2}")
    assert(snap("hashes") == beforeContent._1)
    assert(asSet(Dedup.incrementalProbe(spark, probeBatch, idx))
      == beforeProbe)
  }
}
