package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.DeltaLogReader
import graft.ops.{Curation, Dedup}
import graft.streaming.EventStream

/** [[EventStream.curationIngestFull]] (round 15) — the FULL stateless
  * curation rule set composed into the streaming dedup loop: Gopher
  * word rules + C4 line/page rules + Gopher repetition thresholds run
  * as the loop's micro-batch gate, ahead of probe/admit.
  *
  * Gates under test: (1) batch==stream identity — the stream applies
  * [[Curation.fullStatelessGate]] literally, so the admitted set must
  * equal the batch gate's survivors minus dedup drops, with each rule
  * class exercised by a designed failure doc; (2) the composition
  * holds across a FOLD boundary (foldEvery = 1 folds the stream layer
  * mid-run); (3) the gate stays a pure per-batch function — no state,
  * so a doc gated out in one batch never affects another batch's
  * verdicts. */
class StreamCurationFullSpec extends AnyFunSuite {
  import TestSpark._

  // five 10-word '.'-terminated lines, ≥2 stopwords (alpha, beta),
  // per-doc-unique filler words: long enough that a UNIQUE n-gram's
  // character share stays under the Gopher top-gram thresholds (the
  // rule that empties short synthetic docs), distinct enough across
  // docs that no pair is a fuzzy dup
  private def passing(tag: String): String =
    (0 until 5).map { ln =>
      val filler = (0 until 7).map(i => s"$tag${ln}q$i").mkString(" ")
      s"alpha beta $filler done$tag$ln."
    }.mkString("\n")

  private val idxText   = passing("harbor")
  private val passText1 = passing("copper")
  private val passText2 = passing("falcon")
  private val passText3 = passing("garnet")
  // word-rule failure: mean word length < 3
  private val wordFail = "x1 y2 z3 a4 b5"
  // C4 failure: only two lines survive the line rule (n_kept < 3)
  private val c4TwoLines = passing("stone").split("\n").take(2).mkString("\n")
  // C4 page failures: a lorem-ipsum line / a brace line
  private val loremFail = passing("willow") +
    "\nalpha beta lorem ipsum filler wording lands here."
  private val braceFail = passing("ember") +
    "\nalpha beta bracket { spilled onto page here."
  // repetition failure: word rules pass, C4 passes, but one bigram
  // dominates the character mass (top_2gram_char_frac >> 0.20)
  private val repFail =
    (0 until 5).map(_ =>
      "alpha beta granite mosaic granite mosaic granite mosaic.")
      .mkString("\n")

  private val stop = Seq("alpha", "beta")

  test("full stateless gate: batch==stream identical across a fold " +
    "boundary; every rule class exercised") {
    import spark.implicits._
    val root = graft.session.Scratch.dir("scf")
    val (srcDir, table, ckpt, idx, sidx) =
      (s"$root/src", s"$root/t", s"$root/ck", s"$root/idx", s"$root/sidx")
    Dedup.buildDedupIndex(
      Seq((1L, idxText)).toDF("doc_id", "text"), idx)

    val file0 = Seq((10L, passText1), (11L, wordFail), (12L, c4TwoLines))
    val file1 = Seq((20L, passText2), (21L, loremFail),
      (22L, passText1)) // exact dup of 10, admitted one batch earlier
    val file2 = Seq((30L, repFail), (31L, braceFail),
      (32L, idxText), // exact dup of the pre-indexed corpus doc
      (33L, passText3))
    Seq(file0, file1, file2).zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/f$i")
    }
    val all = (file0 ++ file1 ++ file2).toDF("doc_id", "text")

    // the BATCH truth: the same gate function over the whole input.
    // Designed failures must actually fail their designed rule (a doc
    // slipping past the gate would silently weaken the stream test).
    val gateIds = Curation.fullStatelessGate(all, minWords = 3,
      stopWords = stop).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gateIds == Set(10L, 20L, 22L, 32L, 33L),
      s"batch gate verdicts moved: $gateIds")

    val schema = all.schema
    EventStream.curationIngestFull(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$srcDir/*"),
      table, ckpt, appId = "scf-spec", indexPath = idx,
      streamIndexPath = sidx, minWords = 3, stopWords = stop,
      foldEvery = 1)
      .awaitTermination()

    // stream admissions = gate survivors minus dedup drops: 22 is an
    // exact dup of 10 (admitted one batch earlier — the stream layer
    // is live across the fold), 32 duplicates the pre-built index
    val got = DeltaLogReader.read(spark, table)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(10L, 20L, 33L), s"stream admitted: $got")

    // the fold boundary actually ran: layers before the last batch
    // were folded into the base index
    val (bh, _) = Dedup.readDedupIndex(spark, idx)
    val baseDocs = bh.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(baseDocs.contains(10L),
      s"fold did not land batch-0 admissions in the base index: $baseDocs")
  }
}
