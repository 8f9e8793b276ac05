package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental postings/BM25 maintenance (round 15): per-batch layer
  * append + periodic fold, published through the TxnLog snapshot layer
  * — the dedup index's daily-loop contract applied to the search
  * index. The invariants under test:
  *
  *  - an appended layer answers IDENTICALLY to a one-shot rebuild of
  *    the grown corpus (df counts across the layer union, corpus stats
  *    merged as exact integer sums);
  *  - fold consolidates the layers without changing any answer and
  *    advances the foldedUpto replay watermark;
  *  - a probe pinned before a fold keeps reading its own generation;
  *  - replayed batch appends (crash recovery) are skipped both before
  *    and after the layer was folded;
  *  - a batch landing DURING a fold conflicts the optimistic publish
  *    and survives the retry — never dropped.
  */
class IncrementalPostingsSpec extends AnyFunSuite {
  import TestSpark._

  private def docsDf(rows: Seq[(Long, String)]) = {
    val spark0 = spark
    import spark0.implicits._
    rows.map { case (id, t) => (id, t, "en") }.toDF("doc_id", "text", "lang")
  }

  private val day0 = Seq(
    1L -> "spark shuffles join trees",
    2L -> "stream processing with spark",
    3L -> "the quick brown fox",
    4L -> "join the stream join the stream")
  private val day1 = Seq(
    5L -> "spark spark spark everywhere",
    6L -> "a fresh stream of documents",
    7L -> "nothing relevant here")
  private val day2 = Seq(
    8L -> "join yesterday's spark stream",
    9L -> "completely unrelated text")

  private val terms = Seq("spark", "join", "stream")

  private def bm25(idx: String) =
    ops.Postings.bm25Query(spark, idx, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getAs[Int]("tf_spark"),
        r.getAs[Int]("tf_join"), r.getAs[Int]("tf_stream"),
        r.getAs[Double]("score"))).toSeq

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-incrpost").toString + "/idx"

  test("appended layers answer identically to a one-shot rebuild; " +
    "fold consolidates without changing answers") {
    val idx = tmp()
    ops.Postings.build(docsDf(day0), idx, nBuckets = 4)
    assert(ops.Postings.appendBatch(docsDf(day1), idx, batchId = 1L))
    assert(ops.Postings.appendBatch(docsDf(day2), idx, batchId = 2L))

    val oneShot = tmp()
    ops.Postings.build(docsDf(day0 ++ day1 ++ day2), oneShot, nBuckets = 4)
    assert(bm25(idx) == bm25(oneShot),
      "layered index must answer bit-identically to a full rebuild")
    // matchQuery goes through the same layer union
    val m = ops.Postings.matchQuery(spark, idx,
      Seq("spark" -> 2, "stream" -> 1)).collect().map(_.getLong(0)).toSeq
    val m2 = ops.Postings.matchQuery(spark, oneShot,
      Seq("spark" -> 2, "stream" -> 1)).collect().map(_.getLong(0)).toSeq
    assert(m == m2)

    val before = bm25(idx)
    assert(ops.Postings.fold(spark, idx) == 3, "three layers folded")
    assert(graft.table.SnapshotTree.roots(spark, idx).size == 1)
    assert(bm25(idx) == before, "fold must not change any answer")
    // merged corpus stats are the exact integer sums
    val meta = ops.Postings.readMeta(spark,
      graft.table.SnapshotTree.roots(spark, idx).head)
    assert(meta.nDocs == (day0 ++ day1 ++ day2).size)
    assert(meta.foldedUpto == 3L, "watermark passes every folded batch id")
    assert(ops.Postings.fold(spark, idx) == 0, "single layer: fold no-ops")
  }

  test("a probe pinned before a fold keeps its own generation") {
    val idx = tmp()
    ops.Postings.build(docsDf(day0), idx, nBuckets = 4)
    ops.Postings.appendBatch(docsDf(day1), idx, batchId = 1L)
    val expected = bm25(idx)
    // pin: resolution happens at DataFrame CONSTRUCTION (layerInfo)
    val pinned = ops.Postings.bm25Query(spark, idx, terms, k = 20)
    assert(ops.Postings.fold(spark, idx, keepVersions = 2) == 2)
    // the pinned plan still reads its pre-fold layer dirs (vacuum kept
    // the superseded generation)
    val got = pinned.collect().map(r => (r.getLong(0),
      r.getAs[Int]("tf_spark"), r.getAs[Int]("tf_join"),
      r.getAs[Int]("tf_stream"), r.getAs[Double]("score"))).toSeq
    assert(got == expected)
  }

  test("replayed batch appends are skipped, before and after a fold") {
    val idx = tmp()
    ops.Postings.build(docsDf(day0), idx, nBuckets = 4)
    assert(ops.Postings.appendBatch(docsDf(day1), idx, batchId = 1L))
    val once = bm25(idx)
    // crash-replay of the published batch: manifest membership skips it
    assert(!ops.Postings.appendBatch(docsDf(day1), idx, batchId = 1L))
    assert(bm25(idx) == once, "replay must not double-count postings")
    ops.Postings.fold(spark, idx)
    // late replay of a FOLDED batch: the foldedUpto watermark skips it
    assert(!ops.Postings.appendBatch(docsDf(day1), idx, batchId = 1L))
    assert(bm25(idx) == once)
    // the next real batch goes through
    assert(ops.Postings.appendBatch(docsDf(day2), idx, batchId = 2L))
  }

  test("vacuum keeps a staged-but-unpublished batch dir within the " +
    "grace window (the fold-vs-append race), reclaims it once stale") {
    val idx = tmp()
    ops.Postings.build(docsDf(day0), idx, nBuckets = 4)
    ops.Postings.appendBatch(docsDf(day1), idx, batchId = 1L)
    // simulate a concurrent append mid-flight: its tree is written but
    // its manifest has NOT published yet (the window the ADVICE race
    // hit — fold's post-commit vacuum must not delete it)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val staged = new org.apache.hadoop.fs.Path(idx, "files/batch-9")
    fs.mkdirs(staged)
    assert(ops.Postings.fold(spark, idx) == 2)
    assert(fs.exists(staged),
      "fold's vacuum deleted a concurrent append's staged data dir")
    // the in-flight append now publishes against intact data
    graft.table.TxnLog.commitStagedDirs(spark, idx, Seq("files/batch-9"),
      op = "batch-append")
    assert(graft.table.SnapshotTree.roots(spark, idx).exists(
      _.endsWith("batch-9")))
    // a dir never published and OLDER than the grace is a dead
    // leftover — reclaimed
    val dead = new org.apache.hadoop.fs.Path(idx, "files/fold-dead")
    fs.mkdirs(dead)
    val saved = graft.table.TxnLog.stagedGraceMs
    graft.table.TxnLog.stagedGraceMs = 0L
    try graft.table.TxnLog.vacuum(spark, idx, keepVersions = 2)
    finally graft.table.TxnLog.stagedGraceMs = saved
    assert(!fs.exists(dead), "stale never-referenced dirs must reclaim")
  }

  test("assertDisjoint rejects a batch re-ingesting indexed doc ids") {
    val idx = tmp()
    ops.Postings.build(docsDf(day0), idx, nBuckets = 4)
    assert(ops.Postings.appendBatch(docsDf(day1), idx, batchId = 1L,
      assertDisjoint = true))
    // doc 2 is already in the base layer: df would double-count
    val overlapping = docsDf(Seq(2L -> "spark again", 8L -> "fresh"))
    val e = intercept[IllegalArgumentException] {
      ops.Postings.appendBatch(overlapping, idx, batchId = 2L,
        assertDisjoint = true)
    }
    assert(e.getMessage.contains("re-ingests"))
    // disjoint batch passes the check
    assert(ops.Postings.appendBatch(docsDf(day2), idx, batchId = 2L,
      assertDisjoint = true))
  }

  test("a batch landing DURING a fold conflicts the publish and " +
    "survives the retry") {
    val idx = tmp()
    ops.Postings.build(docsDf(day0), idx, nBuckets = 4)
    ops.Postings.appendBatch(docsDf(day1), idx, batchId = 1L)
    var fired = false
    ops.Postings.foldBarrier = () => {
      if (!fired) {
        fired = true
        assert(ops.Postings.appendBatch(docsDf(day2), idx, batchId = 2L))
      }
    }
    try {
      // first attempt stages a merge of {base, batch-1}, the barrier
      // lands batch-2, the expectedVersion publish conflicts, the
      // retry folds all three
      assert(ops.Postings.fold(spark, idx) == 3)
    } finally ops.Postings.foldBarrier = () => ()
    assert(fired, "barrier must have fired")
    assert(graft.table.SnapshotTree.roots(spark, idx).size == 1)
    val oneShot = tmp()
    ops.Postings.build(docsDf(day0 ++ day1 ++ day2), oneShot, nBuckets = 4)
    assert(bm25(idx) == bm25(oneShot),
      "the mid-fold batch must survive into the folded index")
  }
}
