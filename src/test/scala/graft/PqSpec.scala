package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.VectorIndex

/** Product quantization: exact codec behavior on a constructed corpus
  * (subvectors AT the codebook points round-trip losslessly) and
  * recall against exact cosine on the real embeddings table. */
class PqSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.01"

  test("codes round-trip exactly when vectors sit on codebook points") {
    val spark0 = spark
    import spark0.implicits._
    // dim=8, m=2, dsub=4, two obvious clusters per subspace
    def v(a: Float, b: Float): (Long, Seq[Float], String) =
      (0L, Seq.fill(4)(a) ++ Seq.fill(4)(b), "x")
    val rows = Seq(
      v(0f, 0f), v(0f, 10f), v(10f, 0f), v(10f, 10f),
      v(0f, 0f), v(0f, 10f), v(10f, 0f), v(10f, 10f))
      .zipWithIndex.map { case ((_, e, l), i) => (i.toLong, e, l) }
    val emb = rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val idx = Files.createTempDirectory("graft-pq").toString
    VectorIndex.putPq(emb, idx, m = 2, ksub = 2, iters = 4, sampleN = 8)
    // ADC distance of each vector to ITS OWN point as query must be 0
    val self = VectorIndex.searchPq(spark, idx,
      Array.fill(4)(0f) ++ Array.fill(4)(10f), k = 2)
    val top = self.collect()
    assert(top.head.getAs[Double]("adist") == 0.0)
    // the two zero-distance vectors are exactly the (0,10) pattern ids
    val zeroIds = top.filter(_.getAs[Double]("adist") == 0.0)
      .map(_.getAs[Long]("vec_id")).toSet
    assert(zeroIds == Set(1L, 5L))
  }

  test("ADC+rerank recovers most of the exact top-10 at 32x compression") {
    val emb = Tables.embeddings(spark, dir)
    val query = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head.getAs[Seq[Float]](0).toArray
    val idx = Files.createTempDirectory("graft-pq2").toString
    VectorIndex.putPq(emb, idx, m = 8)
    // codes table carries NO embeddings — 8 bytes of code per vector
    // (read under the round-14 snapshot tree root)
    val codes = spark.read.parquet(
      s"${VectorIndex.indexRoot(spark, idx)}/codes")
    assert(!codes.columns.contains("embedding"))
    graft.expr.CosineSimilarity.register(spark)
    val exact = emb
      .withColumn("cosine", call_function("cosine_sim",
        col("embedding"), typedLit(query.toSeq)))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10).select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val approx = VectorIndex.searchPq(spark, idx, query, k = 10,
      rerank = 50, emb = Some(emb))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size / 10.0
    assert(recall >= 0.6, s"recall@10 = $recall (expected >= 0.6)")
  }

  test("exact-decimal codebook (the oracled path) holds the recall bar") {
    val emb = Tables.embeddings(spark, dir)
    val query = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head.getAs[Seq[Float]](0).toArray
    val idx = Files.createTempDirectory("graft-pq3").toString
    VectorIndex.putPq(emb, idx, m = 8,
      codebook = Some(VectorIndex.trainPqExact(emb)))
    graft.expr.CosineSimilarity.register(spark)
    val exact = emb.filter(col("vec_id") =!= 0L)
      .withColumn("cosine", call_function("cosine_sim",
        col("embedding"), typedLit(query.toSeq)))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10).select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val approx = VectorIndex.searchPq(spark, idx, query, k = 10,
      rerank = 50, emb = Some(emb), excludeId = Some(0L))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size / 10.0
    assert(recall >= 0.6, s"recall@10 = $recall (expected >= 0.6)")
  }
}
