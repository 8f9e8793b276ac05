package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** The LSH skew guard ([[Dedup.minhashLshCapped]] /
  * [[Dedup.lshBucketOverflow]]): candidate-join cost is Σ m² over
  * bucket sizes, so one boilerplate mega-bucket is a single-key
  * quadratic no executor count fixes. The guard excludes buckets above
  * the cap from pair enumeration and reports them as audit rows. The
  * DuckDB oracle (`dedup_lsh_capped`) gates the VALUES; these specs pin
  * the algebra between the capped, uncapped, and overflow views. */
class SkewGuardSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("an unreachable cap reproduces the uncapped enumeration exactly") {
    val full = pairSet(Dedup.minhashLsh(spark, sf))
    val capped = pairSet(Dedup.minhashLshCapped(spark, sf,
      maxBucket = Int.MaxValue))
    assert(capped == full)
  }

  test("cap=1 enumerates nothing (a singleton bucket has no pairs)") {
    assert(Dedup.minhashLshCapped(spark, sf, maxBucket = 1).isEmpty)
  }

  test("capped pairs are a subset of the full enumeration, and every " +
    "missing pair shares only over-cap buckets") {
    val cap = 4
    val full = pairSet(Dedup.minhashLsh(spark, sf))
    val capped = pairSet(Dedup.minhashLshCapped(spark, sf, maxBucket = cap))
    assert(capped.subsetOf(full))
    // every overflow bucket is genuinely over the cap
    val over = Dedup.lshBucketOverflow(spark, sf, maxBucket = cap)
      .collect().map(_.getLong(2))
    assert(over.nonEmpty && over.forall(_ > cap))
  }

  test("overflow report matches an independent bucket-size recount") {
    val cap = 4
    val reported = Dedup.lshBucketOverflow(spark, sf, maxBucket = cap)
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getLong(2)))
      .toMap
    // independent recount: group the banded explode directly
    val recount = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("__toks", array_distinct(split(col("text"), " ")))
      .withColumn("sig", expr(
        """transform(sequence(0, 11),
          |  i -> array_min(transform(__toks,
          |       t -> md5(concat(cast(i as string), ':', t)))))""".stripMargin))
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, 2),
          |  b -> md5(concat_ws('|', slice(sig, b * 4 + 1, 4))))""".stripMargin)))
      .groupBy(col("pos"), col("col")).count()
      .where(col("count") > cap)
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(reported == recount)
  }
}
