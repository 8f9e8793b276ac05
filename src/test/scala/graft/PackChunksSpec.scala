package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing invariants (values themselves are oracle-gated by
  * `curate_pack_chunks`): spans conserve every token, every sequence
  * except a shard's last is filled exactly to capacity, and in-sequence
  * spans tile without overlap. */
class PackChunksSpec extends AnyFunSuite {
  import TestSpark._

  test("packing conserves tokens and fills sequences to capacity") {
    val dir = "/root/testdata/sf0.01"
    val cap = ops.Curation.packCapacity
    val out = ops.Curation.packChunks(spark, dir).cache()
    try {
      val totalSpan = out.agg(sum(col("n_in_seq"))).head.getLong(0)
      val totalTok = Tables.documents(spark, dir)
        .agg(sum(size(split(col("text"), " ")).cast("bigint")))
        .head.getLong(0)
      assert(totalSpan == totalTok, "every token lands in exactly one span")
      // per (shard, seq): full capacity except the shard's last sequence
      val perSeq = out.groupBy(col("shard"), col("seq_id"))
        .agg(sum(col("n_in_seq")).as("filled"))
      val lastSeq = perSeq.groupBy(col("shard"))
        .agg(max(col("seq_id")).as("last"))
      val short = perSeq.join(lastSeq, Seq("shard"))
        .filter(col("seq_id") < col("last") && col("filled") =!= cap)
      assert(short.count() == 0, "only a shard's last sequence may be short")
      // spans within a doc tile contiguously from 0
      val perDoc = out.groupBy(col("doc_id"))
        .agg(min(col("doc_start")).as("first"),
          sum(col("n_in_seq")).as("spanned"))
      assert(perDoc.filter(col("first") =!= 0L).count() == 0)
    } finally out.unpersist()
  }
}
