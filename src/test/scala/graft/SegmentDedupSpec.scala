package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Exact-segment (line-level) dedup on a constructed corpus: shared
  * segments are boilerplate and cut from every document, unique
  * segments survive in their original order, and a document made
  * entirely of boilerplate drops out. */
class SegmentDedupSpec extends AnyFunSuite {
  import TestSpark._

  test("shared segments cut everywhere, unique segments kept in order") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-segdd").toString
    def seg(w: String): String = Seq.fill(8)(w).mkString(" ")
    // doc 1: unique A, boiler B, unique C; doc 2: boiler B, unique D;
    // doc 3: ONLY boiler B (drops out); doc 4: a short tail segment
    val rows = Seq(
      (1L, s"${seg("a")} ${seg("b")} ${seg("c")}", "en", "s", 0L),
      (2L, s"${seg("b")} ${seg("d")}", "en", "s", 0L),
      (3L, seg("b"), "en", "s", 0L),
      (4L, s"${seg("e")} tail only", "en", "s", 0L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.exactSegmentDedup(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == s"${seg("a")} ${seg("c")}") // b cut, a-c order kept
    assert(got(2L) == seg("d"))
    assert(!got.contains(3L))                     // all-boilerplate doc gone
    assert(got(4L) == s"${seg("e")} tail only")   // short tail segment kept
    assert(got.size == 3)
  }

  test("exact doc dedup: identical texts collapse to min doc_id with counts") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-exdd").toString
    Seq(
      (5L, "same text here", "en", "s", 0L),
      (2L, "same text here", "en", "s", 0L),
      (9L, "same text here", "en", "s", 0L),
      (3L, "different text", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.exactDocDedup(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(2L -> 3L, 3L -> 1L)) // min id kept, copies counted
  }

  test("substr dedup: unaligned duplicated passage cut at any offset") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-subdd").toString
    val P = (1 to 10).map(i => s"p$i").mkString(" ") // 10-token passage
    // the passage sits at DIFFERENT offsets (3, 1, 0) — the grid-aligned
    // segment pass would miss it; the sliding-window pass must cut it
    val rows = Seq(
      (1L, s"a1 a2 a3 $P b1 b2", "en", "s", 0L),
      (2L, s"c1 $P d1 d2 d3", "en", "s", 0L),
      (3L, P, "en", "s", 0L),
      (4L, "short doc here", "en", "s", 0L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got =
      try Dedup.substrDedup(spark, dir)
        .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2))))
        .toMap
      finally Dedup.releaseCaches() // the persisted window table
    assert(got(1L) == (("a1 a2 a3 b1 b2", 10L))) // passage cut, rest in order
    assert(got(2L) == (("c1 d1 d2 d3", 10L)))
    assert(got(3L) == (("", 10L)))               // fully-duplicated doc empties
    assert(got(4L) == (("short doc here", 0L)))  // < k tokens: untouched
    assert(got.size == 4)                        // every doc present in output
  }
}
