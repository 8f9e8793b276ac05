package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Curation, Dedup}

/** Round-12 operators: incremental dedup against a persisted corpus
  * index, and the C4 heuristic cleaning rules. The DuckDB oracle gates
  * values end-to-end (`dedup_incremental`, `curate_c4_rules`); these
  * specs pin the properties the oracle can't see — verdict semantics on
  * hand-built documents, index layout, and the broadcast-probe plan
  * shape that makes the operator incremental at 100 TB. */
class IncrementalDedupSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("incremental probe: exact / near / novel verdicts on known docs") {
    import spark.implicits._
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "one two three four five six seven eight"),
      (12L, "cold path tokens nothing shared here at all")
    ).toDF("doc_id", "text")
    val idx = tmpDir("graft-incr-spec") + "/idx"
    Dedup.buildDedupIndex(corpus, idx)

    val batch = Seq(
      // identical text to 10 → exact, match 10
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      // one token changed from 11 → near (7/8 tokens shared)
      (101L, "one two three four five six seven NINE"),
      // disjoint tokens → novel
      (102L, "totally disjoint vocabulary with zero overlap rows qq")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalProbe(spark, batch, idx, minEst = 0.5)
      .collect().map(r => (r.getLong(0),
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(out(100L) == ("exact", 10L))
    assert(out(101L)._1 == "near" && out(101L)._2 == 11L)
    assert(out(102L)._1 == "novel" && out(102L)._2 == -1L)
  }

  test("exact verdict ties to the smallest corpus doc_id") {
    import spark.implicits._
    val corpus = Seq(
      (20L, "same same same text here padded out to eight"),
      (21L, "same same same text here padded out to eight")
    ).toDF("doc_id", "text")
    val idx = tmpDir("graft-incr-tie") + "/idx"
    Dedup.buildDedupIndex(corpus, idx)
    val out = Dedup.incrementalProbe(spark,
        Seq((200L, "same same same text here padded out to eight"))
          .toDF("doc_id", "text"), idx)
      .collect()
    assert(out.length == 1 && out.head.getString(1) == "exact" &&
      out.head.getLong(2) == 20L)
  }

  test("index layout: band dirs, sig-group reduction, no text column") {
    import spark.implicits._
    val idx = tmpDir("graft-incr-layout") + "/idx"
    // docs 1/2 are byte-identical; doc 4 shares doc 3's token SET
    // (identical signature, different text) — the bands table must
    // carry ONE row per signature group per band with the min doc_id
    Dedup.buildDedupIndex(
      Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "e f g h"),
          (4L, "h g f e")).toDF("doc_id", "text"), idx)
    // the bands sub-table is a TxnLog snapshot table partitioned by
    // band: the manifest names one partition-level dir per band
    val snap = graft.table.TxnLog
      .currentSnapshot(spark, s"$idx/bands").get
    assert(snap.partitionCols == Seq("band"))
    val bandDirs = snap.dataDirs.map(_.split("/").last).sorted
    assert(bandDirs == Seq("__pt_band=0", "__pt_band=1", "__pt_band=2"))
    val (hashesDf, bandsDf) = Dedup.readDedupIndex(spark, idx)
    assert(!bandsDf.columns.contains("text"))
    assert(bandsDf.columns.toSet == Set("doc_id", "sig", "bkey", "band"))
    // 2 signature groups ({1,2} and {3,4}) × 3 bands, min ids kept
    assert(bandsDf.count() == 6)
    assert(bandsDf.select("doc_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L))
    // hashes: one row per distinct content hash, min doc_id
    assert(hashesDf.columns.toSet == Set("h", "doc_id"))
    assert(hashesDf.count() == 3)
    assert(hashesDf.collect().map(_.getAs[Long]("doc_id")).toSet ==
      Set(1L, 3L, 4L))
  }

  test("probe plan: batch side broadcast on both joins, index streamed") {
    import spark.implicits._
    val idx = tmpDir("graft-incr-plan") + "/idx"
    Dedup.buildDedupIndex(
      Seq((1L, "a b c d e"), (2L, "f g h i j")).toDF("doc_id", "text"), idx)
    val out = Dedup.incrementalProbe(spark,
      Seq((9L, "a b c d e")).toDF("doc_id", "text"), idx)
    val plan = out.queryExecution.executedPlan.toString
    // both probe joins must broadcast (the batch side); a sort-merge or
    // shuffled-hash join here would shuffle the full index every run
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    val nBroadcast = "BroadcastExchange".r.findAllIn(plan).length
    assert(nBroadcast >= 2, s"expected >=2 broadcast exchanges:\n$plan")
  }

  test("c4 rules: each rule's verdict on hand-built line sets") {
    import spark.implicits._
    val docs = Seq(
      // 3 clean retained lines → keep
      (1L, Seq("one two three four five six.",
               "seven eight nine ten eleven twelve.",
               "a b c d e f g.")),
      // only 2 retained (third lacks terminal punct) → drop
      (2L, Seq("one two three four five six.",
               "seven eight nine ten eleven twelve.",
               "no terminal punctuation on this line")),
      // short line (<5 words) not retained → 2 retained → drop
      (3L, Seq("one two three four five six.",
               "seven eight nine ten eleven twelve.",
               "too short.")),
      // javascript line not retained; lorem ipsum anywhere drops the page
      (4L, Seq("enable javascript to view this page.",
               "lorem ipsum dolor sit amet consectetur.",
               "one two three four five six.")),
      // curly brace anywhere drops the page even with 3 clean lines
      (5L, Seq("one two three four five six.",
               "seven eight nine ten eleven twelve.",
               "a b c d e f g.",
               "function() { return 1; }")),
      // ! ? " all count as terminal punctuation
      (6L, Seq("one two three four five six!",
               "seven eight nine ten eleven twelve?",
               "he said a b c d \""))
    ).toDF("doc_id", "lines")
    val out = Curation.c4RulesOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(5))).toMap
    assert(out(1L) == ((3L, true)))
    assert(out(2L) == ((2L, false)))
    assert(out(3L) == ((2L, false)))
    assert(out(4L)._2 == false)
    assert(out(5L)._2 == false)
    assert(out(6L) == ((3L, true)))
  }

  test("c4 oracled entry: zero-shuffle plan, full corpus coverage") {
    val sf = "/root/testdata/sf0.001"
    val out = Curation.c4Rules(spark, sf)
    assert(out.count() == Tables.documents(spark, sf).count())
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }
}
