package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.Porter2
import graft.sql.SqlEngine

/** The Snowball English (Porter2) stemmer, gated three ways:
  *  1. the algorithm definition's OWN examples (every worked example
  *     and exception list on the published spec page),
  *  2. hand-derived traces through each step (R1/R2 marking, the
  *     gener-/commun-/arsen- prefix override, longest-match-no-retry
  *     `among` semantics, short-syllable checks),
  *  3. the SQL front door (`word_stem` through the Trino shim),
  *     including the loud non-English and unknown-language failures.
  */
class Porter2Spec extends AnyFunSuite {
  import TestSpark._

  private def s(w: String): String = Porter2.stem(w)

  // ---- 1. the spec page's own examples -----------------------------------

  test("exceptional forms (the spec's exception list)") {
    val ex = Map(
      "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
      "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl",
      "ugly" -> "ugli", "early" -> "earli", "only" -> "onli",
      "singly" -> "singl",
      "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
      "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")
    ex.foreach { case (w, e) => assert(s(w) == e, s"stem($w)") }
  }

  test("invariants after step 1a (inning...succeed), incl. via -s removal") {
    Seq("inning", "outing", "canning", "herring", "earring",
      "proceed", "exceed", "succeed").foreach { w =>
      assert(s(w) == w, s"stem($w)")
      // the plural reaches the invariant THROUGH step 1a
      assert(s(w + "s") == w, s"stem(${w}s)")
    }
  }

  test("words of one or two letters are left untouched") {
    Seq("a", "is", "as", "by", "am", "be").foreach(w => assert(s(w) == w))
  }

  test("step 1a examples: sses / ied / ies / s / us / ss") {
    assert(s("caresses") == "caress") // sses -> ss
    assert(s("ties") == "tie") // ies after one letter -> ie
    assert(s("dies") == "die")
    assert(s("cries") == "cri") // ies after >1 letter -> i
    assert(s("flies") == "fli")
    assert(s("gas") == "gas") // vowel immediately before s only
    assert(s("this") == "this")
    assert(s("gaps") == "gap")
    assert(s("kiwis") == "kiwi")
    assert(s("caress") == "caress") // ss is a no-op match
  }

  test("step 1b examples: eed in R1, ed/ing + fixups") {
    // eed in R1 -> ee (the spec's step-1b example), then step 5
    // deletes the final e (in R1, not preceded by a short syllable)
    assert(s("agreed") == "agre")
    assert(s("free") == "free") // R1 empty: step 5 can't fire
    assert(s("feed") == "feed") // eed NOT in R1
    assert(s("hopping") == "hop") // double pp -> remove one
    assert(s("hoping") == "hope") // short word -> add e
    assert(s("running") == "run")
    assert(s("feelings") == "feel") // 'feel' ends vv+c, not short
  }

  test("step 1c examples: consonant-y to i, never at position 1") {
    assert(s("cry") == "cri")
    assert(s("by") == "by") // would leave nothing before the y
    assert(s("say") == "say") // preceded by a vowel
    assert(s("quickly") == "quick") // y->i then li-deletion
    assert(s("happy") == "happi")
    assert(s("happily") == "happili") // 'li' not after a valid li-ending
  }

  // ---- 2. hand-derived full traces ---------------------------------------

  test("gener-/commun-/arsen- R1 override") {
    // R1 is forced past the prefix, so -ate survives step 5's e-rule
    // differently than the plain marking would give
    assert(s("generate") == "generat")
    assert(s("generates") == "generat")
    assert(s("generated") == "generat")
    assert(s("generating") == "generat")
    assert(s("general") == "general") // 'al' not in R2
    assert(s("generous") == "generous") // 'ous' not in R2
  }

  test("step 2/4 chain: -ency family") {
    // consistenci -> (step2 enci->ence) -> (step4 ence in R2 deleted)
    assert(s("consistency") == "consist")
    assert(s("consistent") == "consist")
    assert(s("consistently") == "consist")
    assert(s("consist") == "consist")
  }

  test("longest-match-without-retry: ational vs tional") {
    // 'national': longest match is 'ational' but it starts BEFORE R1,
    // so steps 2 and 3 fail outright (no retry with 'tional'); only
    // step 4's 'al' fires.
    assert(s("national") == "nation")
    assert(s("rational") == "ration")
    // 'conditional': 'tional' IS in R1 -> tion, then step 4 ion-after-t
    assert(s("conditional") == "condit")
    assert(s("condition") == "condit")
    // 'relational': 'ational' in R1 -> relate; 'ate' starts before R2
    // so step 4 keeps it, but step 5's e-deletion fires (e IS in R2)
    assert(s("relational") == "relat")
  }

  test("step 3 icate and step 2 ation compose") {
    assert(s("predication") == "predic") // ation->ate, icate->ic
    assert(s("predicate") == "predic")
  }

  test("step 4 requires R2: agreement stays, luxuriated loses ate") {
    assert(s("agreement") == "agreement") // 'ement' starts before R2
    assert(s("luxuriated") == "luxuri") // ed-> +e (ends 'at'), ate in R2
  }

  test("step 5: e kept after a short syllable, ll collapses in R2") {
    assert(s("hope") == "hope") // e after short syllable, R2 empty
    assert(s("ape") == "ape") // initial-vowel short syllable
    assert(s("controlling") == "control") // double ll after ing removal
    assert(s("controlled") == "control")
    assert(s("rolls") == "roll") // no step-4/5 trigger
  }

  test("prelude: consonant-y marking blocks vowel status") {
    // 'enjoying': the y after o is marked Y (consonant), so 'ing'
    // removal leaves 'enjoY' -> postlude 'enjoy'
    assert(s("enjoying") == "enjoy")
    assert(s("toying") == "toy")
    assert(s("toyed") == "toy")
    // word-initial y is a consonant: 'yellowing' keeps its y
    assert(s("yellowing") == "yellow")
  }

  test("possessive step 0") {
    assert(s("john's") == "john")
    assert(s("dogs'") == "dog")
    assert(s("children's") == "children")
  }

  test("null and pass-through behavior at the expression layer") {
    assert(Porter2.stem(null: org.apache.spark.unsafe.types.UTF8String)
      == null)
    // no case folding: uppercase letters are plain non-vowels, as in
    // Snowball/Trino (no silent lowering)
    assert(s("NEWS") == "NEWS")
  }

  // ---- 3. the SQL front door ----------------------------------------------

  test("word_stem through the Trino shim") {
    val df = SqlEngine.readSqlQuery(spark,
      """SELECT word_stem('running') AS a,
        |       word_stem('skies') AS b,
        |       word_stem('consistency', 'en') AS c,
        |       word_stem(CAST(NULL AS VARCHAR)) AS n""".stripMargin)
    val r = df.head()
    assert(r.getString(0) == "run")
    assert(r.getString(1) == "sky")
    assert(r.getString(2) == "consist")
    assert(r.isNullAt(3))
  }

  test("word_stem stays codegen-compatible over a column") {
    import spark.implicits._
    val words = Seq("hopping", "cries", "generated", "quickly", "news")
      .toDF("w")
    words.createOrReplaceTempView("p2words")
    val out = SqlEngine.readSqlQuery(spark,
      "SELECT word_stem(w) AS st FROM p2words ORDER BY st")
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("cri", "generat", "hop", "news", "quick"))
  }

  test("non-English and unknown languages fail loudly") {
    val e1 = intercept[Exception] {
      SqlEngine.readSqlQuery(spark, "SELECT word_stem('chats', 'fr')")
        .collect()
    }
    assert(e1.getMessage.contains("not implemented"))
    val e2 = intercept[Exception] {
      SqlEngine.readSqlQuery(spark, "SELECT word_stem('x', 'xx')").collect()
    }
    assert(e2.getMessage.contains("Unknown stemmer language"))
  }
}
