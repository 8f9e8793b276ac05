package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native `minhash_sigs` expression must be BIT-IDENTICAL to the
  * higher-order `transform(sequence(0,k-1), i -> array_min(transform(
  * toks, t -> xxhash64(i, t))))` it replaces — same hash chain, same
  * minima — on the real corpus and on edge shapes. */
class MinHashSigsSpec extends AnyFunSuite {
  import TestSpark._

  test("native signature equals the HOF xxhash64 formulation bit-for-bit") {
    graft.expr.MinHashSigs.register(spark)
    val k = 32
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("__toks", array_distinct(split(col("text"), " ")))
    val both = docs.select(
      col("doc_id"),
      call_function("minhash_sigs", col("__toks"), lit(k)).as("native"),
      expr(
        s"""transform(sequence(0, ${k - 1}),
           |  i -> array_min(transform(__toks,
           |                 t -> xxhash64(i, t))))""".stripMargin).as("hof"))
    assert(both.filter(not(col("native") <=> col("hof"))).count() == 0)
    // edge: empty token array -> k nulls, matching array_min of empty;
    // NULL token array -> k nulls too (r17 advice fix: the HOF's outer
    // transform still maps every seed over array_min(transform(null)))
    val edge = spark.sql(
      s"SELECT minhash_sigs(cast(array() as array<string>), $k) AS n, " +
        s"transform(sequence(0, ${k - 1}), i -> array_min(transform(" +
        s"cast(array() as array<string>), t -> xxhash64(i, t)))) AS h, " +
        s"minhash_sigs(cast(null as array<string>), $k) AS n2, " +
        s"transform(sequence(0, ${k - 1}), i -> array_min(transform(" +
        s"cast(null as array<string>), t -> xxhash64(i, t)))) AS h2")
    assert(edge.filter(not(col("n") <=> col("h")) ||
      not(col("n2") <=> col("h2"))).count() == 0)
  }

  test("native md5 signature equals the HOF md5 formulation bit-for-bit") {
    graft.expr.MinHashSigsMd5.register(spark)
    val k = 12
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("__toks", array_distinct(split(col("text"), " ")))
    val both = docs.select(
      col("doc_id"),
      call_function("minhash_sigs_md5", col("__toks"), lit(k)).as("native"),
      expr(
        s"""transform(sequence(0, ${k - 1}),
           |  i -> array_min(transform(__toks,
           |    t -> md5(concat(cast(i as string), ':', t)))))"""
          .stripMargin).as("hof"))
    assert(both.filter(not(col("native") <=> col("hof"))).count() == 0)
    // edges: empty token array -> k nulls; null tokens skipped like
    // array_min skips the null hashes they map to
    val edge = spark.sql(
      s"SELECT minhash_sigs_md5(cast(array() as array<string>), $k) AS n, " +
        s"transform(sequence(0, ${k - 1}), i -> array_min(transform(" +
        s"cast(array() as array<string>), " +
        s"t -> md5(concat(cast(i as string), ':', t))))) AS h, " +
        s"minhash_sigs_md5(array('a', cast(null as string), 'b'), $k) AS n2, " +
        s"transform(sequence(0, ${k - 1}), i -> array_min(transform(" +
        s"array('a', cast(null as string), 'b'), " +
        s"t -> md5(concat(cast(i as string), ':', t))))) AS h2, " +
        // NULL token array -> k nulls (r17 advice fix), matching the
        // HOF whose outer transform still maps every seed
        s"minhash_sigs_md5(cast(null as array<string>), $k) AS n3, " +
        s"transform(sequence(0, ${k - 1}), i -> array_min(transform(" +
        s"cast(null as array<string>), " +
        s"t -> md5(concat(cast(i as string), ':', t))))) AS h3")
    assert(edge.filter(not(col("n") <=> col("h")) ||
      not(col("n2") <=> col("h2")) ||
      not(col("n3") <=> col("h3"))).count() == 0)
  }

  test("native simhash64 equals the explode + 64-SUM aggregation form") {
    graft.expr.SimHash64.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // the aggregation formulation simhash() used before round 6
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val voteCols = (0 until 64).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L))).as(s"b$j"))
    val votes = toks.groupBy(col("doc_id"))
      .agg(voteCols.head, (voteCols.tail :+ count(lit(1)).as("cnt")): _*)
    val sigCol = (0 until 64).map(j =>
        when(col(s"b$j") * 2 > col("cnt"), shiftleft(lit(1L), j))
          .otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    val agg = votes.select(col("doc_id"), sigCol.as("agg_sig"))
    val native = docs.select(col("doc_id"),
      call_function("simhash64",
        array_distinct(split(col("text"), " "))).as("nat_sig"))
    val joined = agg.join(native, "doc_id")
    assert(joined.count() == docs.count())
    assert(joined.filter(not(col("agg_sig") <=> col("nat_sig"))).count() == 0)
    // the rewritten pipeline plans ZERO exchanges before banding
    val plan = native.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
