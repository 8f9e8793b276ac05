package graft

import java.nio.file.Files
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{DeltaLogReader, DeltaLogWriter, IcebergReader, IcebergWriter, ScanFilter, ScanFilters}

/** `Column`-predicate pruning for the external-format readers: the
  * shape Spark users actually write (`read(path).filter(c)`) prunes
  * identically to the tuple API, with every unsupported conjunct kept
  * residual-only — including the null-sensitive shapes (`isNull`,
  * `NOT <=>`) whose naive translation would prune wrongly. */
class ColumnPredicateSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-colp").toString

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("p", StringType), StructField("d", DateType)))

  private def tr(c: Column): Seq[ScanFilter] =
    ScanFilters.fromColumn(spark, schema, c)

  test("fromColumn translates the supported conjunct shapes") {
    assert(tr(col("id") === 5L && col("v") > "b") ==
      Seq(ScanFilter("id", "=", 5L), ScanFilter("v", ">", "b")))
    // reversed comparison flips the operator
    assert(tr(lit(10L) < col("id")) == Seq(ScanFilter("id", ">", 10L)))
    assert(tr(lit(10L) >= col("id")) == Seq(ScanFilter("id", "<=", 10L)))
    // int literal against a long column arrives Cast-wrapped — folded
    assert(tr(col("id") === 5) == Seq(ScanFilter("id", "=", 5L)))
    assert(tr(col("id") =!= 5L) == Seq(ScanFilter("id", "!=", 5L)))
    assert(tr(col("p").isin("x", "y")) ==
      Seq(ScanFilter("p", "in", Seq("x", "y"))))
    assert(tr(!col("p").isin("x", "y")) ==
      Seq(ScanFilter("p", "not in", Seq("x", "y"))))
    // OR of point predicates on ONE column collapses to `in`
    assert(tr(col("p") === "x" || col("p") === "y") ==
      Seq(ScanFilter("p", "in", Seq("x", "y"))))
    assert(tr(col("p") === "x" || col("p").isin("y", "z")) ==
      Seq(ScanFilter("p", "in", Seq("x", "y", "z"))))
    // null-safe equality with a NON-null literal is plain equality for
    // pruning (nulls match neither)
    assert(tr(col("p") <=> "x") == Seq(ScanFilter("p", "=", "x")))
    // date literals come back in their external form
    val d = java.sql.Date.valueOf("2024-01-02")
    assert(tr(col("d") >= d) == Seq(ScanFilter("d", ">=", d)))
    // startsWith translates to the bounds-pruned prefix op
    assert(tr(col("v").startsWith("b")) ==
      Seq(ScanFilter("v", "prefix", "b")))
    // nullness shapes translate to the null-count-pruned ops
    assert(tr(col("v").isNull) == Seq(ScanFilter("v", "is null", null)))
    assert(tr(col("v").isNotNull) ==
      Seq(ScanFilter("v", "is not null", null)))
    assert(tr(col("p") <=> lit(null.asInstanceOf[String])) ==
      Seq(ScanFilter("p", "is null", null)))
  }

  test("fromColumn keeps unpruneable shapes residual-only") {
    // NOT(<=>) with a non-null literal means `isNull OR !=` — no single
    // conjunct expresses it, and a bare != would prune all-null files
    // whose rows MATCH
    assert(tr(!(col("p") <=> "x")).isEmpty)
    assert(tr(upper(col("v")) === "A").isEmpty)
    assert(tr(col("v") === col("p")).isEmpty)
    // OR spanning two columns cannot prune either alone
    assert(tr(col("p") === "x" || col("v") === "y").isEmpty)
    // a mixed AND yields every translatable conjunct
    assert(tr(col("id") > 3L && col("v").isNull) ==
      Seq(ScanFilter("id", ">", 3L), ScanFilter("v", "is null", null)))
    assert(tr(col("id") > 3L && (col("p") === "x" || col("v") === "y")) ==
      Seq(ScanFilter("id", ">", 3L)))
  }

  test("delta: Column predicate prunes identically to the tuple API") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/tbl"
    val wide = (0 until 50).map(i => (i.toLong, s"v$i", s"p${i % 5}"))
      .toDF("id", "v", "p")
    DeltaLogWriter.write(wide.repartition(2), dir, partitionBy = Seq("p"))
    val all = DeltaLogReader.read(spark, dir).inputFiles.toSet
    val byTuple = DeltaLogReader.read(spark, dir,
      filters = Seq(ScanFilter("p", "=", "p2")))
    val byCol = DeltaLogReader.readWhere(spark, dir, col("p") === "p2")
    assert(byCol.inputFiles.toSet == byTuple.inputFiles.toSet)
    assert(byCol.inputFiles.nonEmpty && byCol.inputFiles.toSet != all,
      "the Column path must actually prune the scan's file list")
    assert(byCol.select("id").as[Long].collect().toSet ==
      (0 until 50).filter(_ % 5 == 2).map(_.toLong).toSet)
    // stats-based range pruning through the Column path
    val dir2 = s"${tmp()}/tbl2"
    DeltaLogWriter.write(
      (0L until 100L).map(i => (i, s"a$i")).toDF("id", "v").coalesce(1), dir2)
    DeltaLogWriter.write(
      (100L until 200L).map(i => (i, s"b$i")).toDF("id", "v").coalesce(1),
      dir2, mode = "append")
    val r = DeltaLogReader.readWhere(spark, dir2, col("id") < 50L)
    assert(r.inputFiles.toSet == DeltaLogReader.read(spark, dir2,
      filters = Seq(ScanFilter("id", "<", 50L))).inputFiles.toSet)
    assert(r.inputFiles.length == 1 && r.count() == 50)
    // an unsatisfiable predicate never builds a scan, still answers
    assert(DeltaLogReader.readWhere(spark, dir2, col("id") > 10000L).count() == 0)
    // predicate + time travel compose
    assert(DeltaLogReader.readWhere(spark, dir2, col("id") >= 0L,
      asOfVersion = Some(0L)).count() == 100)
  }

  test("iceberg: Column predicate prunes manifests identically") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/tbl"
    IcebergWriter.write(
      (0L until 100L).map(i => (i, s"a$i")).toDF("id", "v").coalesce(1), dir)
    IcebergWriter.write(
      (100L until 200L).map(i => (i, s"b$i")).toDF("id", "v").coalesce(1),
      dir, mode = "append")
    val byTuple = IcebergReader.read(spark, dir,
      filters = Seq(ScanFilter("id", "<", 50L)))
    val byCol = IcebergReader.readWhere(spark, dir, col("id") < 50L)
    assert(byCol.inputFiles.toSet == byTuple.inputFiles.toSet)
    assert(byCol.inputFiles.length == 1 && byCol.count() == 50)
    // conjunct mix: the range conjunct prunes, the function conjunct
    // stays residual — results exact either way
    val mixed = IcebergReader.readWhere(spark, dir,
      col("id") < 50L && length(col("v")) > 2)
    assert(mixed.inputFiles.length == 1)
    assert(mixed.select("id").as[Long].collect().toSet ==
      (10L until 50L).toSet, "a2..a9 are length 2, a10.. are length 3")
    // predicate + snapshot time travel compose
    val firstSnap = IcebergReader.history(spark, dir).last._1
    assert(IcebergReader.readWhere(spark, dir, col("id") >= 0L,
      asOfSnapshotId = Some(firstSnap)).count() == 100)
  }

  test("delta: nullness predicates prune by stats nullCount, exactly") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/tbl"
    DeltaLogWriter.write(
      Seq((1L, "a"), (2L, "a")).toDF("id", "v").coalesce(1), dir)
    DeltaLogWriter.write(
      Seq((3L, null.asInstanceOf[String])).toDF("id", "v").coalesce(1),
      dir, mode = "append")
    // NOT(v <=> "a") matches the null row — a wrong `!=` translation
    // would prune the all-null file and lose it (stays residual)
    assert(DeltaLogReader.readWhere(spark, dir, !(col("v") <=> "a"))
      .select("id").as[Long].collect().toSet == Set(3L))
    // IS NULL scans ONLY the file whose stats admit nulls; IS NOT NULL
    // only the one with a non-null row — both from add-action stats
    val isNull = DeltaLogReader.readWhere(spark, dir, col("v").isNull)
    assert(isNull.inputFiles.length == 1)
    assert(isNull.select("id").as[Long].collect().toSet == Set(3L))
    val notNull = DeltaLogReader.readWhere(spark, dir, col("v").isNotNull)
    assert(notNull.inputFiles.length == 1)
    assert(notNull.select("id").as[Long].collect().toSet == Set(1L, 2L))
    // the tuple API prunes identically
    assert(DeltaLogReader.read(spark, dir,
        filters = Seq(ScanFilter("v", "is null", null)))
      .inputFiles.toSet == isNull.inputFiles.toSet)
    assert(DeltaLogReader.readWhere(spark, dir, col("v") =!= "a").count() == 0)
  }

  test("prefix predicates prune by string bounds on both formats") {
    val spark0 = spark
    import spark0.implicits._
    // two files with disjoint v prefixes (a* and b*) per format
    val dirD = s"${tmp()}/d"
    DeltaLogWriter.write(
      (0L until 50L).map(i => (i, s"a$i")).toDF("id", "v").coalesce(1), dirD)
    DeltaLogWriter.write(
      (50L until 100L).map(i => (i, s"b$i")).toDF("id", "v").coalesce(1),
      dirD, mode = "append")
    val d = DeltaLogReader.readWhere(spark, dirD, col("v").startsWith("b"))
    assert(d.inputFiles.length == 1)
    assert(d.count() == 50)
    // a prefix between the two files' ranges scans nothing
    assert(DeltaLogReader.readWhere(spark, dirD, col("v").startsWith("az"))
      .inputFiles.isEmpty)
    val dirI = s"${tmp()}/i"
    IcebergWriter.write(
      (0L until 50L).map(i => (i, s"a$i")).toDF("id", "v").coalesce(1), dirI)
    IcebergWriter.write(
      (50L until 100L).map(i => (i, s"b$i")).toDF("id", "v").coalesce(1),
      dirI, mode = "append")
    val ib = IcebergReader.readWhere(spark, dirI, col("v").startsWith("b"))
    assert(ib.inputFiles.length == 1)
    assert(ib.count() == 50)
    // a prefix that PREFIXES a file's min must keep that file: min "a0"
    // does not exclude prefix "a" even though "a" < "a0"
    assert(IcebergReader.readWhere(spark, dirI, col("v").startsWith("a"))
      .count() == 50)
  }

  test("iceberg: nullness predicates prune by manifest null_value_counts") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/tbl"
    IcebergWriter.write(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), dir)
    IcebergWriter.write(
      Seq((3L, null.asInstanceOf[String])).toDF("id", "v").coalesce(1),
      dir, mode = "append")
    // the writer put per-field null totals into the manifests
    val snap = IcebergReader.snapshot(spark, dir)
    assert(snap.files.forall(_.nullCounts.nonEmpty),
      "manifest entries must carry null_value_counts")
    val isNull = IcebergReader.readWhere(spark, dir, col("v").isNull)
    assert(isNull.inputFiles.length == 1)
    assert(isNull.select("id").as[Long].collect().toSet == Set(3L))
    val notNull = IcebergReader.readWhere(spark, dir, col("v").isNotNull)
    assert(notNull.inputFiles.length == 1)
    assert(notNull.select("id").as[Long].collect().toSet == Set(1L, 2L))
    // a rewrite carries the counts through EXISTING manifest entries
    IcebergWriter.write(Seq((4L, "c")).toDF("id", "v").coalesce(1),
      dir, mode = "append")
    assert(IcebergReader.readWhere(spark, dir, col("v").isNull)
      .select("id").as[Long].collect().toSet == Set(3L))
  }
}
