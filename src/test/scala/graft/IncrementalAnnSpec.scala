package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.VectorIndex

/** Incremental ANN index maintenance (round 16): per-batch layer
  * append + periodic fold for the IVF / IVF-PQ trees — the
  * postings/dedup daily-loop contract applied to the last index
  * family without it. The invariants under test:
  *
  *  - a batch appended under the FROZEN geometry (existing centroids
  *    + codebook) answers IDENTICALLY to a full rebuild under that
  *    same geometry — the layered union inside probed cells loses and
  *    invents nothing;
  *  - fold consolidates layers without changing any answer, carries
  *    the geometry unchanged, merges counts exactly, and advances the
  *    foldedUpto replay watermark;
  *  - replayed batch appends are skipped before and after a fold;
  *  - a batch landing DURING a fold conflicts the optimistic publish
  *    and survives the retry;
  *  - a probe pinned pre-fold keeps reading its own generation;
  *  - the retrain trigger fires LOUDLY (returns a diagnostic) when
  *    the corpus outgrows the trained geometry or a cell skews.
  */
class IncrementalAnnSpec extends AnyFunSuite {
  import TestSpark._

  private val Dim = 16

  /** Deterministic spread vectors: hash-derived components, stable
    * across runs, no randomness source. */
  private def vec(i: Long): Seq[Float] =
    (0 until Dim).map { j =>
      val h = (i * 1315423911L + j * 2654435761L) & 0xffffL
      (h.toDouble / 32768.0 - 1.0).toFloat
    }

  private def embDf(ids: Seq[Long]) = {
    val spark0 = spark
    import spark0.implicits._
    ids.map(i => (i, vec(i), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
  }

  private val baseIds = (0L until 60L)
  private val day1Ids = (60L until 75L)
  private val day2Ids = (75L until 90L)
  private val query: Array[Float] = vec(0L).toArray

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-incrann").toString + "/idx"

  /** ADC-ranked rows (no rerank): (vec_id, label, cell, adist). */
  private def adcRows(idx: String, k: Int = 12): Seq[(Long, Int, Int, Double)] =
    VectorIndex.searchIvfPq(spark, idx, query, k = k, nprobe = 2,
      rerank = 0).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .toSeq

  /** Build the incremental index and its geometry-matched rebuild. */
  private def buildPair(): (String, String) = {
    val idx = tmp()
    VectorIndex.putIvfPq(embDf(baseIds), idx, kCells = 4, m = 8)
    assert(VectorIndex.appendBatchIvfPq(embDf(day1Ids), idx, batchId = 1L))
    assert(VectorIndex.appendBatchIvfPq(embDf(day2Ids), idx, batchId = 2L))
    // the rebuild twin under the SAME frozen geometry: coarse +
    // codebook read back from the base index
    val head = graft.table.SnapshotTree.roots(spark, idx).head
    val cents = spark.read.parquet(s"$head/centroids").collect()
      .map(r => r.getAs[Int]("cell") ->
        r.getAs[scala.collection.Seq[Float]]("centroid").toArray).toSeq
    val cb = spark.read.parquet(s"$head/pq_meta").head
      .getAs[scala.collection.Seq[Float]]("cents").toArray
    val rebuilt = tmp()
    VectorIndex.putIvfPq(embDf(baseIds ++ day1Ids ++ day2Ids), rebuilt,
      m = 8, codebook = Some(cb), coarse = Some(cents))
    (idx, rebuilt)
  }

  test("appended IVF-PQ layers answer identically to a rebuild under " +
    "the same geometry; fold preserves every answer") {
    val (idx, rebuilt) = buildPair()
    assert(adcRows(idx) == adcRows(rebuilt),
      "layered ADC ranking must equal the geometry-matched rebuild")
    // reranked path too (exact cosine over the union's candidates)
    val emb = embDf(baseIds ++ day1Ids ++ day2Ids)
    def reranked(p: String) = VectorIndex.searchIvfPq(spark, p, query,
      k = 10, nprobe = 2, rerank = 30, emb = Some(emb))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(reranked(idx) == reranked(rebuilt))

    val before = adcRows(idx)
    assert(VectorIndex.foldIvfPq(spark, idx) == 3, "three layers folded")
    assert(graft.table.SnapshotTree.roots(spark, idx).size == 1)
    assert(adcRows(idx) == before, "fold must not change any answer")
    val meta = VectorIndex.readAnnMeta(spark,
      graft.table.SnapshotTree.roots(spark, idx).head)
    assert(meta.nVectors == (baseIds ++ day1Ids ++ day2Ids).size)
    assert(meta.builtN == baseIds.size,
      "fold must carry the geometry's training size, not reset it")
    assert(meta.foldedUpto == 3L)
    assert(meta.cellCounts.values.sum == meta.nVectors)
    assert(VectorIndex.foldIvfPq(spark, idx) == 0, "single tree: no-op")
  }

  test("IVF layers: append + layered probe equals the rebuild") {
    val idx = tmp()
    VectorIndex.putIvf(embDf(baseIds), idx, k = 4)
    assert(VectorIndex.appendBatchIvf(embDf(day1Ids), idx, batchId = 1L))
    val head = graft.table.SnapshotTree.roots(spark, idx).head
    val cents = spark.read.parquet(s"$head/centroids")
    def rows(p: String) = VectorIndex.searchIvf(spark, p, query,
      k = 10, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val layered = rows(idx)
    assert(VectorIndex.foldIvf(spark, idx) == 2)
    assert(rows(idx) == layered, "IVF fold must not change answers")
    assert(layered.nonEmpty)
  }

  test("replayed batch appends are skipped, before and after a fold") {
    val idx = tmp()
    VectorIndex.putIvfPq(embDf(baseIds), idx, kCells = 4, m = 8)
    assert(VectorIndex.appendBatchIvfPq(embDf(day1Ids), idx, batchId = 1L))
    val once = adcRows(idx)
    assert(!VectorIndex.appendBatchIvfPq(embDf(day1Ids), idx, batchId = 1L))
    assert(adcRows(idx) == once, "replay must not duplicate vectors")
    VectorIndex.foldIvfPq(spark, idx)
    assert(!VectorIndex.appendBatchIvfPq(embDf(day1Ids), idx, batchId = 1L),
      "a folded batch id must be skipped via the watermark")
    assert(adcRows(idx) == once)
    assert(VectorIndex.appendBatchIvfPq(embDf(day2Ids), idx, batchId = 2L))
  }

  test("a batch landing DURING a fold conflicts the publish and " +
    "survives the retry") {
    val idx = tmp()
    VectorIndex.putIvfPq(embDf(baseIds), idx, kCells = 4, m = 8)
    VectorIndex.appendBatchIvfPq(embDf(day1Ids), idx, batchId = 1L)
    var fired = false
    VectorIndex.annFoldBarrier = () => {
      if (!fired) {
        fired = true
        assert(VectorIndex.appendBatchIvfPq(embDf(day2Ids), idx,
          batchId = 2L))
      }
    }
    try assert(VectorIndex.foldIvfPq(spark, idx) == 3)
    finally VectorIndex.annFoldBarrier = () => ()
    assert(fired)
    assert(graft.table.SnapshotTree.roots(spark, idx).size == 1)
    val meta = VectorIndex.readAnnMeta(spark,
      graft.table.SnapshotTree.roots(spark, idx).head)
    assert(meta.nVectors == (baseIds ++ day1Ids ++ day2Ids).size,
      "the mid-fold batch must survive into the folded tree")
  }

  test("a probe pinned before a fold keeps its own generation") {
    val idx = tmp()
    VectorIndex.putIvfPq(embDf(baseIds), idx, kCells = 4, m = 8)
    VectorIndex.appendBatchIvfPq(embDf(day1Ids), idx, batchId = 1L)
    val expected = adcRows(idx)
    // resolution happens at DataFrame construction
    val pinned = VectorIndex.searchIvfPq(spark, idx, query, k = 12,
      nprobe = 2, rerank = 0)
    assert(VectorIndex.foldIvfPq(spark, idx, keepVersions = 2) == 2)
    val got = pinned.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
  }

  test("the retrain trigger fires on growth past the trained size " +
    "and on cell skew; quiet otherwise") {
    val idx = tmp()
    VectorIndex.putIvfPq(embDf(baseIds), idx, kCells = 4, m = 8)
    assert(VectorIndex.retrainDue(spark, idx).isEmpty,
      "fresh index must not demand a retrain")
    // grow the corpus 4x past the geometry's training size
    VectorIndex.appendBatchIvfPq(embDf(90L until 290L), idx, batchId = 1L)
    val due = VectorIndex.retrainDue(spark, idx)
    assert(due.exists(_.contains("geometry was trained")),
      s"growth trigger must fire, got $due")
    // skew: a batch of near-identical vectors piles into one cell
    val idx2 = tmp()
    VectorIndex.putIvfPq(embDf(baseIds), idx2, kCells = 4, m = 8)
    val spark0 = spark
    import spark0.implicits._
    val clones = (300L until 420L)
      .map(i => (i, vec(7L), 0)).toDF("vec_id", "embedding", "label")
    VectorIndex.appendBatchIvfPq(clones, idx2, batchId = 1L,
      growthFactor = 100.0)
    // 120 clones + ~15 resident in one cell of 180 total: max/mean = 3
    val skew = VectorIndex.retrainDue(spark, idx2, growthFactor = 100.0,
      skewFactor = 2.5)
    assert(skew.exists(_.contains("drifted")),
      s"skew trigger must fire, got $skew")
  }

  test("auto geometry: cells scale with sqrt(n), probes hold the " +
    "fraction, rerank scales with the corpus") {
    assert(VectorIndex.autoCells(100L) == 10)
    assert(VectorIndex.autoCells(1L) == 8, "floor")
    assert(VectorIndex.autoCells(100000000L) == 4096, "ceiling")
    assert(VectorIndex.autoNprobe(8) == 4, "floor")
    assert(VectorIndex.autoNprobe(64) == 22, "1/3 fraction held")
    assert(VectorIndex.autoNprobe(447) == 149)
    assert(VectorIndex.autoRerankScaled(10, 100L) == 50, "floor")
    assert(VectorIndex.autoRerankScaled(10, 2000L) == 500,
      "window = probed/4")
    assert(VectorIndex.autoRerankScaled(10, 10000000L) == 2000, "cap")
    // kCells = 0 derives the geometry (90 vectors -> sqrt = 10 cells)
    val idx = tmp()
    VectorIndex.putIvfPq(embDf(baseIds ++ day1Ids ++ day2Ids), idx, m = 8)
    val head = graft.table.SnapshotTree.roots(spark, idx).head
    assert(spark.read.parquet(s"$head/centroids").count() == 10)
  }
}
