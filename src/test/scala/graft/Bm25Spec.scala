package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 over the postings index: monotonicity properties a correct
  * implementation must satisfy (rarity boosts, length normalization
  * penalizes), rank sanity against the linear-tf match, and doc-length
  * norms restricted to the build-time sidecar (never a corpus rescan).
  * Bit-exact values are gated by the `search_bm25` DuckDB oracle. */
class Bm25Spec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.01"

  test("bm25 ranks, boosts rare terms, and normalizes by length") {
    val spark0 = spark
    import spark0.implicits._
    val idx = ops.Postings.indexFor(spark, dir)
    val out = ops.Postings.bm25Query(spark, idx,
      Seq("spark", "join", "stream"), k = 20).collect()
    assert(out.length == 20)
    // descending score, doc_id tiebreak
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.head > 0.0)
    // every returned doc matches at least one term
    assert(out.forall(r => r.getAs[Int]("tf_spark") +
      r.getAs[Int]("tf_join") + r.getAs[Int]("tf_stream") > 0))
    // IDF monotonicity: a term present in EVERY doc scores lower per
    // occurrence than one in few docs — query them separately and
    // compare the top scores on a synthetic two-term corpus
    val docs = Seq(
      (1L, "common common rare", "en"),
      (2L, "common common common", "en"),
      (3L, "common filler filler", "en"),
      (4L, "common pad pad pad pad pad pad pad pad", "en"))
      .toDF("doc_id", "text", "lang")
    val idx2 = java.nio.file.Files
      .createTempDirectory("graft-bm25").toString + "/idx"
    ops.Postings.build(docs, idx2, nBuckets = 4)
    val rare = ops.Postings.bm25Query(spark, idx2, Seq("rare"), k = 1)
      .select(col("score")).head.getDouble(0)
    val common = ops.Postings.bm25Query(spark, idx2, Seq("common"), k = 4)
      .select(col("score")).collect().map(_.getDouble(0))
    assert(rare > common.max,
      s"one rare occurrence ($rare) must outscore common hits (${common.max})")
    // length normalization: same tf, longer doc scores lower — docs 1
    // and 4 both have one distinctive hit; doc 4 is 3x longer
    val q = ops.Postings.bm25Query(spark, idx2, Seq("common"), k = 4)
      .select(col("doc_id"), col("score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(3L) > q(4L),
      "equal-tf hit in the longer document must score lower")
  }
}
