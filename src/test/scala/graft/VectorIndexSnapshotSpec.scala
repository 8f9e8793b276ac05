package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.VectorIndex
import graft.table.TxnLog

/** Round-14: the ANN index families are whole-tree TxnLog snapshots.
  * The sharpest contract is PQ's: `codes` are only meaningful under the
  * `pq_meta` codebook that produced them, and the old in-place
  * overwrite let a search running concurrently with a rebuild read the
  * NEW codebook against the OLD codes — silently wrong distances. Now a
  * rebuild publishes one manifest naming one self-contained tree, a
  * search resolves that manifest once, and vacuum reclaims superseded
  * trees with explicit retention. */
class VectorIndexSnapshotSpec extends AnyFunSuite {
  import TestSpark._

  private def emb = Tables.embeddings(spark, sf)

  private def queryVec: Array[Float] = emb.filter(col("vec_id") === 0L)
    .head().getAs[scala.collection.Seq[Float]]("embedding").toArray

  private def treeDirs(idx: String): Int = {
    val d = new java.io.File(s"$idx/files")
    if (!d.exists()) 0 else d.listFiles().count(_.isDirectory)
  }

  test("PQ: a search pinned before a rebuild keeps its own " +
    "codebook+codes; a new-geometry rebuild swaps atomically; vacuum " +
    "reclaims the old tree") {
    val idx = graft.session.Scratch.dir("vis-pq") + "/idx"
    VectorIndex.putPq(emb, idx, m = 16)
    val q = queryVec
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val baseline = rows(VectorIndex.searchPq(spark, idx, q, k = 5))
    // pin: the tree (meta AND codes) resolves at call time
    val pinned = VectorIndex.searchPq(spark, idx, q, k = 5)
    // rebuild with a DIFFERENT geometry — under the old in-place
    // overwrite the pinned plan would score old codes against the new
    // codebook (or crash on vanished files)
    VectorIndex.putPq(emb, idx, m = 8)
    assert(treeDirs(idx) == 2, "both trees live until vacuum")
    assert(rows(pinned) == baseline,
      "pinned search must keep reading its snapshot across the rebuild")
    // a fresh search resolves the new tree and works under m=8
    val fresh = VectorIndex.searchPq(spark, idx, q, k = 5)
    assert(fresh.count() == 5)
    // vacuum with retention 1 drops the superseded tree; search survives
    assert(VectorIndex.vacuumIndex(spark, idx, keepVersions = 1) == 1)
    assert(treeDirs(idx) == 1)
    assert(VectorIndex.searchPq(spark, idx, q, k = 5).count() == 5)
  }

  test("IVF: centroids and assignments stay one consistent unit " +
    "across a rebuild; LSH meta rides the tree") {
    val idx = graft.session.Scratch.dir("vis-ivf") + "/idx"
    VectorIndex.putIvf(emb, idx, k = 4, iters = 2)
    val q = queryVec
    val baseline = VectorIndex.searchIvf(spark, idx, q, k = 5)
      .collect().map(_.getLong(0)).toSeq
    val pinned = VectorIndex.searchIvf(spark, idx, q, k = 5)
    VectorIndex.putIvf(emb, idx, k = 8, iters = 2)
    assert(pinned.collect().map(_.getLong(0)).toSeq == baseline)
    assert(VectorIndex.searchIvf(spark, idx, q, k = 5).count() == 5)

    val lsh = graft.session.Scratch.dir("vis-lsh") + "/idx"
    VectorIndex.putLsh(emb, lsh)
    val pinnedLsh = VectorIndex.searchLsh(spark, lsh, q, k = 5)
    val baseLsh = VectorIndex.searchLsh(spark, lsh, q, k = 5)
      .collect().map(_.getLong(0)).toSeq
    // rebuild with different geometry: a pinned search must keep the
    // OLD meta and OLD buckets (mixing them probes the wrong dirs)
    VectorIndex.putLsh(emb, lsh, nBits = 12, nBands = 2)
    assert(pinnedLsh.collect().map(_.getLong(0)).toSeq == baseLsh)
    assert(VectorIndex.readMeta(spark, lsh).nBits == 12)
    assert(VectorIndex.searchLsh(spark, lsh, q, k = 5).count() > 0)
    // the rebuild history is observable like any table's
    assert(TxnLog.history(spark, lsh).map(_.op) ==
      Seq("rebuild", "rebuild"))
  }
}
