package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.DeltaLogReader
import graft.ops.{Curation, Dedup}
import graft.streaming.EventStream

/** [[EventStream.curationIngestV3]] (round 16) — the batch V3 recipe's
  * streaming form: full stateless gate → CCNet selection under a
  * PINNED model → incremental fuzzy dedup. The gates under test:
  *
  *  1. stream == batch-with-pinned-model identity: selection is a
  *     pure per-document function of (text, model version), so the
  *     admitted set equals the batch recomputation that applies the
  *     SAME model per phase — pre-fold batches under the initial pin,
  *     post-fold batches under the re-pinned model;
  *  2. the RE-PIN at the fold boundary takes effect atomically (the
  *     SnapshotTree swap): docs the old model selects are dropped by
  *     the new one, proving the boundary moved;
  *  3. the dedup stage still composes (an exact dup of an earlier
  *     admission is rejected by the probe, not re-admitted).
  *
  * Corpus design juggles three pressures that pull in different
  * directions: the bigram LM needs stream docs whose bigrams the
  * train pool COVERS (per-doc-unique filler — the
  * StreamCurationFullSpec trick — floors every scored doc at the
  * unseen-bigram backoff and the terciles drop them all); the minhash
  * probe hashes each doc's DISTINCT-TOKEN set, so a small shared
  * vocabulary makes every pair a fuzzy dup; and the Gopher
  * repetition rules forbid duplicated in-doc n-grams. Resolution: a
  * 150-word pool with scrambled per-doc rotation (token-set jaccard
  * between docs ~0.15, no repeated in-doc n-grams), and stream docs
  * that are TEXT CLONES of train docs picked AT RUNTIME from the
  * model's own head bucket — coverage and selection verdicts then
  * hold by construction, not by tuned constants. */
class StreamCurationV3Spec extends AnyFunSuite {
  import TestSpark._

  private val g = Seq(0, 17, 41, 9, 88, 123, 64)

  private def passing(d: Int, vocab: String = "pool"): String =
    (0 until 5).map { ln =>
      val ws = (0 until 7)
        .map(i => s"$vocab${(d * 31 + ln * 53 + g(i)) % 150}")
        .mkString(" ")
      s"alpha beta $ws fin$ln."
    }.mkString("\n")

  private val stop = Seq("alpha", "beta")

  private def docsDf(rows: Seq[(Long, String)]) = {
    val spark0 = spark
    import spark0.implicits._
    rows.map { case (id, t) => (id, "en", t) }
      .toDF("doc_id", "lang", "text")
  }

  test("stream == batch under the pinned model, re-pin lands at the " +
    "fold boundary, dedup still composes") {
    val root = graft.session.Scratch.dir("scv3")
    val (srcDir, table, ckpt, idx, sidx, model) =
      (s"$root/src", s"$root/t", s"$root/ck", s"$root/idx",
        s"$root/sidx", s"$root/model")

    val historicA = docsDf(
      (0 until 12).map(i => (100L + i) -> passing(i)))
    // historic corpus B: a disjoint vocabulary — under model B every
    // pool-vocab doc's bigrams are unseen (ln(1/V) backoff), below
    // B's own tail tercile, so the re-pinned selection drops them all
    val historicB = docsDf(
      (0 until 12).map(i => (200L + i) -> passing(i, vocab = "zulu")))

    Curation.trainPplModel(historicA.select("doc_id", "lang", "text"),
      model)
    // truth twins: the SAME deterministic training pinned at separate
    // paths, so the batch recomputation can score each phase under
    // that phase's model even after the live path was swapped
    Curation.trainPplModel(historicA.select("doc_id", "lang", "text"),
      s"$root/modelA")
    Curation.trainPplModel(historicB.select("doc_id", "lang", "text"),
      s"$root/modelB")

    // stream docs = clones of model A's own HEAD docs (picked at
    // runtime): their bigrams are train-covered and their bucket is
    // head BY CONSTRUCTION — no tuned score constants
    val heads = Curation.scorePplPinned(
        historicA.select("doc_id", "lang", "text"), s"$root/modelA")
      .filter(col("ppl_bucket") === "head")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(heads.length == 4, s"12 train docs split 4/4/4: $heads")
    val byId = historicA.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val Seq(h1, h2, h3, h4) = heads.toSeq

    Dedup.buildDedupIndex(docsDf(Seq(1L -> passing(22)))
      .select("doc_id", "text"), idx)

    val file0 = Seq(10L -> byId(h1), 11L -> "x1 y2 z3 a4 b5")
    val file1 = Seq(20L -> byId(h2),
      21L -> byId(h1)) // exact dup of 10: the dedup probe must drop it
    val file2 = Seq(30L -> byId(h3)) // post-re-pin: tail under model B
    val file3 = Seq(40L -> byId(h4))
    Seq(file0, file1, file2, file3).zipWithIndex.foreach {
      case (rows, i) => docsDf(rows).coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/f$i")
    }

    // batch truth per phase: gate + pinned selection (dedup drops
    // applied on top: 21 duplicates 10)
    def phase(rows: Seq[(Long, String)], modelPath: String): Set[Long] = {
      val gated = Curation.fullStatelessGate(docsDf(rows), minWords = 3,
        stopWords = stop)
      Curation.scorePplPinned(
          gated.select(col("doc_id"), col("lang"), col("text")), modelPath)
        .filter(col("ppl_bucket") =!= "tail")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val phaseA = phase(file0 ++ file1, s"$root/modelA")
    val phaseB = phase(file2 ++ file3, s"$root/modelB")
    assert(phaseA == Set(10L, 20L, 21L),
      s"head clones select, the word-rule failure does not: $phaseA")
    assert(phaseB.isEmpty,
      s"unseen-vocabulary docs must land in B's tail: $phaseB")
    // the re-pin CHANGES verdicts: under the old model the phase-2
    // docs (clones of A-heads) would have been selected
    val phaseBunderA = phase(file2 ++ file3, s"$root/modelA")
    assert(phaseBunderA == Set(30L, 40L),
      s"re-pin must flip the phase-2 verdicts: $phaseBunderA")

    val schema = docsDf(Nil).schema
    EventStream.curationIngestV3(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$srcDir/*"),
      table, ckpt, appId = "scv3-spec", indexPath = idx,
      streamIndexPath = sidx, pplModelPath = model,
      minWords = 3, stopWords = stop, foldEvery = 2,
      repin = (s, _) => Curation.trainPplModel(
        historicB.select("doc_id", "lang", "text"), model))
      .awaitTermination()

    val got = DeltaLogReader.read(spark, table)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // phase A admissions minus the dedup drop (21 dups 10), plus
    // phase B's (empty under the re-pinned model)
    assert(got == (phaseA - 21L) ++ phaseB, s"stream admitted: $got")
    assert(!got.contains(30L) && !got.contains(40L),
      "post-fold batches must select under the RE-PINNED model")
  }
}
