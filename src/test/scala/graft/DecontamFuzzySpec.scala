package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Decontaminate

/** Fuzzy (MinHash) test-set decontamination: the DuckDB oracle
  * (`curate_decontam_fuzzy`) gates the values end-to-end; these specs
  * pin the guaranteed-by-construction semantics (exact duplicates hit
  * at full agreement, disjoint vocabularies never hit — distinct md5
  * inputs give distinct hashes, so disjoint token sets cannot share a
  * component minimum) and the broadcast plan shape that keeps the
  * corpus un-shuffled at 100 TB. */
class DecontamFuzzySpec extends AnyFunSuite {
  import TestSpark._

  test("exact dup flags at full agreement; disjoint vocab never flags; " +
    "bench ties break to the smallest bench_id") {
    import spark.implicits._
    val evalText = "alpha beta gamma delta epsilon zeta eta theta"
    val benchmark = Seq(
      (7L, evalText),  // two identical bench docs: tie-break target
      (3L, evalText),
      (9L, "unrelated benchmark prompt about something else entirely")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (100L, evalText), // verbatim leak
      (101L, "totally disjoint vocabulary with zero overlap rows qq"),
      (102L, "unrelated benchmark prompt about something else entirely")
    ).toDF("doc_id", "text")
    val out = Decontaminate.checkFuzzy(spark, corpus, benchmark,
      minAgree = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // the verbatim leak: agreement 12/12 against BOTH identical bench
    // docs; bench_id reports the smallest (3, not 7)
    assert(out(100L) == ((2L, 12L, 3L)), s"got ${out.get(100L)}")
    // doc 102 duplicates bench doc 9 verbatim
    assert(out(102L) == ((1L, 12L, 9L)), s"got ${out.get(102L)}")
    // disjoint vocabulary cannot share any signature component
    assert(!out.contains(101L))
  }

  test("minAgree is validated against the signature width") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException](
      Decontaminate.checkFuzzy(spark, df, df, minAgree = 0))
    assertThrows[IllegalArgumentException](
      Decontaminate.checkFuzzy(spark, df, df, minAgree = 13))
  }

  test("the benchmark side reaches the corpus as a broadcast") {
    val plan = Decontaminate
      .contaminationFuzzy(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "banded benchmark signatures must broadcast, not shuffle-join")
    assert(!plan.contains("SortMergeJoin"),
      "the corpus must not shuffle for candidate generation")
  }
}
