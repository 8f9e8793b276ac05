package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.VectorIndex

/** Round-14: the ANN recall observable becomes a GATE. Round 13
  * measured recall@10 on the needle-in-a-growing-haystack protocol
  * (tools/ann_recall.scala, BASELINE.md) — IVF nprobe=6 at 0.935 on
  * the fixed sf0.1 corpus, PQ 16-byte + rerank at 0.675 — but nothing
  * failed if an assignment change regressed them. This spec pins the
  * protocol's 1× point deterministically: same corpus, same 20
  * queries, truth by exact brute-force cosine (computed driver-side —
  * the corpus is 5k vectors), asserting the floors the at-scale claims
  * rest on. A k-means or codebook change that drops IVF below 0.9 or
  * reranked PQ-16B below 0.6 goes red here. */
class AnnRecallSpec extends AnyFunSuite {
  import TestSpark._

  private val K = 10

  test("recall@10 gate: IVF nprobe=6 >= 0.9, PQ 16B + rerank >= 0.6 " +
    "on the fixed sf0.1 corpus") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id"), col("embedding"), col("label"))
      .persist()
    try {
      val all = emb.select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) ->
          r.getAs[scala.collection.Seq[Float]](1).toArray)
      val queries = all.filter(_._1 < 20).sortBy(_._1).toSeq
      assert(queries.size == 20, s"expected 20 fixed queries, got " +
        s"${queries.size}")

      def cos(a: Array[Float], b: Array[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < a.length) {
          dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
          nb += b(i).toDouble * b(i); i += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      // exact truth, ties to the smaller vec_id (the index contract)
      val truth: Map[Long, Set[Long]] = queries.map { case (qid, q) =>
        qid -> all.filter(_._1 != qid)
          .map { case (id, v) => (id, cos(q, v)) }
          .sortBy { case (id, c) => (-c, id) }
          .take(K).map(_._1).toSet
      }.toMap

      val root = graft.session.Scratch.dir("ann-gate")
      VectorIndex.putIvf(emb, s"$root/ivf")
      VectorIndex.putPq(emb, s"$root/pq16", m = 16)

      def recall(search: Array[Float] => org.apache.spark.sql.DataFrame)
          : Double = {
        var hit = 0
        for ((qid, q) <- queries) {
          val got = search(q).select("vec_id").collect()
            .map(_.getLong(0)).filter(_ != qid).take(K).toSet
          hit += got.intersect(truth(qid)).size
        }
        hit.toDouble / (queries.size * K)
      }

      val ivf = recall(q =>
        VectorIndex.searchIvf(spark, s"$root/ivf", q, k = K + 2,
          nprobe = 6))
      assert(ivf >= 0.9,
        f"IVF nprobe=6 recall@10 regressed: $ivf%.3f < 0.9 " +
          "(measured 0.935 at round 13 — check kmeans/assignment)")

      val pq = recall(q =>
        VectorIndex.searchPq(spark, s"$root/pq16", q, k = K + 2,
          rerank = 50, emb = Some(emb)))
      assert(pq >= 0.6,
        f"PQ 16B + rerank-50 recall@10 regressed: $pq%.3f < 0.6 " +
          "(measured 0.675 at round 13 — check codebook training)")

      // r15/r16: the composed IVF-PQ under the FULL auto geometry —
      // kCells = 0 derives sqrt-n cells (45 on this corpus), m = 0 the
      // 16-subspace codebook, nprobe = 0 the 1/3 probed fraction,
      // rerank = -1 the probed/4 window (tools/ivfpq_autotune.scala
      // measured the fraction/window surface; this row pins the picked
      // point). A caller who read nothing gets a geometry that holds
      // the plain-PQ floor while scanning a third of a 32x-compressed
      // codes table.
      VectorIndex.putIvfPq(emb, s"$root/ivfpq")
      val meta = spark.read.parquet(
        s"${VectorIndex.indexRoot(spark, s"$root/ivfpq")}/pq_meta").head
      assert(meta.getAs[Int]("m") == 16,
        s"auto code budget picked m=${meta.getAs[Int]("m")} for dim 64 " +
          "(expected 16 — the measured recall floor geometry)")
      val ivfpq = recall(q =>
        VectorIndex.searchIvfPq(spark, s"$root/ivfpq", q, k = K + 2,
          emb = Some(emb)))
      assert(ivfpq >= 0.6,
        f"IVF-PQ full-auto recall@10: $ivfpq%.3f < 0.6 " +
          "(auto geometry must hold the plain-PQ floor)")
    } finally emb.unpersist()
  }
}
