package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{DeltaLogReader, DeltaLogWriter}

/** Z-order clustering: the Morton-key expression interleaves correctly
  * (codegen path), and OPTIMIZE ... zorderBy gives every output file a
  * narrow stats envelope in BOTH dimensions — a selective predicate on
  * EITHER column prunes most files, where single-column range
  * clustering only prunes on its leading column. */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-zo").toString

  test("morton key interleaves quantile buckets MSB-first") {
    val spark0 = spark
    import spark0.implicits._
    // cuts at 0.5/1.5/2.5 → buckets 0..3 for values 0..3 (2 bits)
    val cuts = Array(0.5, 1.5, 2.5)
    val df = Seq((0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0),
      (1.0, 2.0)).toDF("x", "y")
    val keys = df.withColumn("k",
        graft.expr.ZOrderKey.key(spark, Seq(col("x"), col("y")),
          Seq(cuts, cuts), bits = 2))
      .select(col("x"), col("y"), col("k")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2)).toMap
    // bits MSB-first, x highest: (x1 y1 x0 y0)
    assert(keys((0.0, 0.0)) == 0L)   // 00 00
    assert(keys((3.0, 0.0)) == 10L)  // x=11,y=00 -> 1010
    assert(keys((0.0, 3.0)) == 5L)   // 0101
    assert(keys((3.0, 3.0)) == 15L)  // 1111
    assert(keys((1.0, 2.0)) == 6L)   // x=01,y=10 -> 0110
    // null orders first
    val nk = Seq((Option.empty[Double], Some(3.0))).toDF("x", "y")
      .withColumn("k", graft.expr.ZOrderKey.key(spark,
        Seq(col("x"), col("y")), Seq(cuts, cuts), bits = 2))
      .select(col("k")).head.getLong(0)
    assert(nk == 5L) // x bucket 0, y bucket 3
  }

  test("optimize WHERE scopes the rewrite to matching partitions") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    // many small files per partition
    val df = spark.range(4000L).select(
      (col("id") % 4L).cast("string").as("p"), col("id").as("v"))
    DeltaLogWriter.write(df.repartition(16), dir, partitionBy = Seq("p"))
    val before = DeltaLogReader.snapshot(spark, dir).files
      .groupBy(_.partitionValues.get("p").flatten.getOrElse(""))
      .view.mapValues(_.size).toMap
    assert(before.values.forall(_ > 1))
    DeltaLogWriter.optimize(spark, dir, targetSize = 64L * 1024 * 1024,
      where = Some(col("p") === "2"))
    val after = DeltaLogReader.snapshot(spark, dir).files
      .groupBy(_.partitionValues.get("p").flatten.getOrElse(""))
      .view.mapValues(_.size).toMap
    // only partition 2 compacted; the rest untouched
    assert(after("2") == 1)
    assert(after.filter(_._1 != "2") == before.filter(_._1 != "2"))
    assert(DeltaLogReader.read(spark, dir).count() == 4000L)
    // non-partition column in the predicate fails resolution loudly
    intercept[org.apache.spark.sql.AnalysisException] {
      DeltaLogWriter.optimize(spark, dir, where = Some(col("v") > 10L))
    }
  }

  test("zorder optimize prunes selective reads on BOTH dimensions") {
    val spark0 = spark
    import spark0.implicits._
    val n = 1 << 16
    val base = spark.range(n.toLong).select(
      (col("id") % 128L).as("x"),
      expr("id div 128").as("y"),
      col("id").as("payload"))
    def opened(dir: String, pred: org.apache.spark.sql.Column): Long =
      DeltaLogReader.readWhere(spark, dir, pred)
        .select(input_file_name()).distinct().count()
    def files(dir: String): Int =
      DeltaLogReader.snapshot(spark, dir).files.size

    // x-sorted range clustering: prunes on x, NOT on y
    val linear = tmp()
    DeltaLogWriter.write(base.repartition(32), linear)
    DeltaLogWriter.optimize(spark, linear, targetSize = 40_000L,
      sortBy = Seq("x"))
    // z-ordered: prunes on both
    val zo = tmp()
    DeltaLogWriter.write(base.repartition(32), zo)
    DeltaLogWriter.optimize(spark, zo, targetSize = 40_000L,
      zorderBy = Seq("x", "y"))

    assert(files(linear) >= 6 && files(zo) >= 6,
      s"need a multi-file layout: ${files(linear)} / ${files(zo)}")
    val xPred = col("x") === 7L
    val yPred = col("y") === 7L
    // both layouts prune the x predicate
    assert(opened(linear, xPred) < files(linear) / 2)
    assert(opened(zo, xPred) < files(zo))
    // only the z-ordered layout prunes the y predicate
    assert(opened(linear, yPred) == files(linear),
      "x-sorted files all span the full y range")
    assert(opened(zo, yPred) <= files(zo) / 2,
      s"z-order must prune on y too: ${opened(zo, yPred)} of ${files(zo)}")
    // correctness: same rows either way
    assert(DeltaLogReader.read(spark, zo).count() == n.toLong)
    assert(DeltaLogReader.readWhere(spark, zo, yPred).count() ==
      base.filter(yPred).count())
  }
}
