package graft

import java.io.ByteArrayOutputStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopKPerKey

/** Native TopKPerKey operator: result-equal to the window idiom, plan
  * free of per-partition sorts. */
class TopKPerKeySpec extends AnyFunSuite {
  import TestSpark._

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
      r.getDouble(3))).toSet

  test("equals the window row_number idiom") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val native = TopKPerKey(li,
      keys = Seq("l_suppkey"),
      order = Seq(TopKPerKey.Ord.desc("l_extendedprice"),
        TopKPerKey.Ord("l_orderkey"), TopKPerKey.Ord("l_linenumber")),
      k = 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
    val windowed = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(asSet(native) == asSet(windowed))
    assert(native.count() > 0)
  }

  test("plan contains the custom exec and no sort operator") {
    val li = Tables.lineitem(spark, sf)
    val native = TopKPerKey(li,
      keys = Seq("l_suppkey"),
      order = Seq(TopKPerKey.Ord.desc("l_extendedprice"),
        TopKPerKey.Ord("l_orderkey"), TopKPerKey.Ord("l_linenumber")),
      k = 3)
    val out = new ByteArrayOutputStream()
    Console.withOut(out) { native.explain("formatted") }
    val p = out.toString
    assert(p.contains("TopKPerKey ("), p)
    assert(!p.contains("Sort ["), "custom operator must not plan a sort:\n" + p)
    assert(p.contains("Exchange"), "keys must be clustered (one shuffle)")
  }

  test("adaptive partial: high-cardinality partitions pass through " +
    "after the sample window, result identical to the window idiom") {
    // 100k rows per partition (> CheckAt) over ~190k near-distinct
    // keys: the partial pass's sample window sees retained ≈ processed
    // and switches to pass-through — the branch a blind map-side
    // combine lacks (it was measured SLOWER than one-phase here)
    val df = spark.range(0, 200000, 1, 2)
      .select((col("id") % 190000).as("k"),
        (col("id") * 7 % 1001).cast("double").as("v"))
    val native = TopKPerKey(df, Seq("k"),
      Seq(TopKPerKey.Ord.desc("v"), TopKPerKey.Ord("k")), 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("v").desc, col("k"))
    val windowed = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(pairs(native) == pairs(windowed))
  }

  test("keeps fewer than k rows for sparse keys and handles k=1") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v")
    val top1 = TopKPerKey(df, Seq("k"), Seq(TopKPerKey.Ord.desc("v")), 1)
      .as[(Long, Double)].collect().toSet
    assert(top1 == Set((1L, 20.0), (2L, 5.0)))
    val top5 = TopKPerKey(df, Seq("k"), Seq(TopKPerKey.Ord.desc("v")), 5)
    assert(top5.count() == 3)
  }
}
