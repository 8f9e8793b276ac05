package graft.expr

import org.apache.spark.unsafe.types.UTF8String

/** The English (Porter2) stemming algorithm, implemented verbatim from
  * the published Snowball definition (snowballstem.org, "The English
  * stemming algorithm" / `english.sbl`). Trino's `word_stem` runs the
  * generated `org.tartarus.snowball.ext.EnglishStemmer` for the default
  * language, which is this exact algorithm — the reference ships
  * `word_stem` calls to Athena verbatim (`athena/_read.py:951`).
  *
  * Behavioral notes mirroring Snowball/Trino exactly:
  *  - NO case folding: the algorithm tests literal lowercase letters,
  *    so mixed-case input mostly passes through, as in Trino.
  *  - Vowels are a e i o u y; the prelude rewrites consonant-y (word
  *    initial or after a vowel) to Y, which is a non-vowel; the
  *    postlude folds Y back to y.
  *  - R1/R2 are marked once (with the gener-/commun-/arsen- prefix
  *    override) and never recomputed; suffix conditions compare the
  *    suffix start against those marks.
  *  - `among` semantics: the LONGEST matching suffix is found first and
  *    its condition tested; a failed condition fails the whole step (no
  *    retry with a shorter suffix).
  */
object Porter2 {

  /** Whole-word exceptional forms, checked on the raw input. */
  private val exception1: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    m.put("skis", "ski"); m.put("skies", "sky"); m.put("dying", "die")
    m.put("lying", "lie"); m.put("tying", "tie"); m.put("idly", "idl")
    m.put("gently", "gentl"); m.put("ugly", "ugli"); m.put("early", "earli")
    m.put("only", "onli"); m.put("singly", "singl")
    // invariants
    m.put("sky", "sky"); m.put("news", "news"); m.put("howe", "howe")
    m.put("atlas", "atlas"); m.put("cosmos", "cosmos"); m.put("bias", "bias")
    m.put("andes", "andes")
    m
  }

  /** Invariant after step 1a. */
  private val exception2: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    s.add("inning"); s.add("outing"); s.add("canning"); s.add("herring")
    s.add("earring"); s.add("proceed"); s.add("exceed"); s.add("succeed")
    s
  }

  @inline private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  @inline private def isDouble(a: Char, b: Char): Boolean =
    a == b && (a == 'b' || a == 'd' || a == 'f' || a == 'g' || a == 'm' ||
      a == 'n' || a == 'p' || a == 'r' || a == 't')

  @inline private def validLiEnding(c: Char): Boolean =
    c == 'c' || c == 'd' || c == 'e' || c == 'g' || c == 'h' || c == 'k' ||
      c == 'm' || c == 'n' || c == 'r' || c == 't'

  /** `gopast v; gopast non-v` from `from`; returns the region mark
    * (index after the first non-vowel that follows a vowel), or the
    * length when no such position exists. */
  private def markFrom(sb: StringBuilder, from: Int): Int = {
    val n = sb.length
    var i = from
    while (i < n && !isVowel(sb.charAt(i))) i += 1
    if (i >= n) return n
    i += 1 // past the vowel
    while (i < n && isVowel(sb.charAt(i))) i += 1
    if (i >= n) n else i + 1
  }

  /** True when sb[0, end) ends in a short syllable: either
    * (non-vowel, vowel, non-vowel other than w/x/Y) at the end, or the
    * whole prefix is exactly (vowel, non-vowel). */
  private def endsShortSyllable(sb: StringBuilder, end: Int): Boolean = {
    if (end == 2) {
      isVowel(sb.charAt(0)) && !isVowel(sb.charAt(1))
    } else if (end >= 3) {
      val c = sb.charAt(end - 1)
      c != 'w' && c != 'x' && c != 'Y' && !isVowel(c) &&
        isVowel(sb.charAt(end - 2)) && !isVowel(sb.charAt(end - 3))
    } else false
  }

  @inline private def endsWith(sb: StringBuilder, suf: String): Boolean = {
    val n = sb.length; val m = suf.length
    if (n < m) return false
    var i = 0
    while (i < m) {
      if (sb.charAt(n - m + i) != suf.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Vowel anywhere in sb[0, end)? */
  private def containsVowel(sb: StringBuilder, end: Int): Boolean = {
    var i = 0
    while (i < end) { if (isVowel(sb.charAt(i))) return true; i += 1 }
    false
  }

  def stem(word: UTF8String): UTF8String =
    if (word == null) null else UTF8String.fromString(stem(word.toString))

  def stem(raw: String): String = {
    val ex = exception1.get(raw)
    if (ex != null) return ex
    if (raw.length < 3) return raw

    // ---- prelude: strip one leading apostrophe; consonant-y -> Y ----
    val sb = new StringBuilder(
      if (raw.charAt(0) == '\'') raw.substring(1) else raw)
    if (sb.nonEmpty && sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isVowel(sb.charAt(i - 1)))
        sb.setCharAt(i, 'Y')
      i += 1
    }

    // ---- mark_regions (gener/commun/arsen prefix override) ----------
    val p1 =
      if (startsWith(sb, "gener")) 5
      else if (startsWith(sb, "commun")) 6
      else if (startsWith(sb, "arsen")) 5
      else markFrom(sb, 0)
    val p2 = markFrom(sb, p1)

    // ---- Step 0: longest of ' 's 's' -------------------------------
    if (endsWith(sb, "'s'")) sb.setLength(sb.length - 3)
    else if (endsWith(sb, "'s")) sb.setLength(sb.length - 2)
    else if (endsWith(sb, "'")) sb.setLength(sb.length - 1)

    // ---- Step 1a ----------------------------------------------------
    if (endsWith(sb, "sses")) sb.setLength(sb.length - 2) // -> ss
    else if (endsWith(sb, "ied") || endsWith(sb, "ies")) {
      if (sb.length - 3 >= 2) sb.setLength(sb.length - 2) // -> i
      else sb.setLength(sb.length - 1) // -> ie
    } else if (endsWith(sb, "us") || endsWith(sb, "ss")) {
      // no-op (but the suffix was consumed by the among)
    } else if (endsWith(sb, "s")) {
      // delete when a vowel exists before the char preceding the s
      var j = 0; var found = false
      while (j < sb.length - 2 && !found) {
        if (isVowel(sb.charAt(j))) found = true; j += 1
      }
      if (found) sb.setLength(sb.length - 1)
    }

    if (exception2.contains(sb.toString)) return postlude(sb)

    // ---- Step 1b ----------------------------------------------------
    {
      // longest among: eedly eed | ingly edly ing ed
      val suf =
        if (endsWith(sb, "eedly")) "eedly"
        else if (endsWith(sb, "ingly")) "ingly"
        else if (endsWith(sb, "edly")) "edly"
        else if (endsWith(sb, "eed")) "eed"
        else if (endsWith(sb, "ing")) "ing"
        else if (endsWith(sb, "ed")) "ed"
        else null
      if (suf != null) {
        val start = sb.length - suf.length
        if (suf == "eed" || suf == "eedly") {
          if (start >= p1) { sb.setLength(start); sb.append("ee") }
        } else if (containsVowel(sb, start)) {
          sb.setLength(start)
          if (endsWith(sb, "at") || endsWith(sb, "bl") || endsWith(sb, "iz"))
            sb.append('e')
          else if (sb.length >= 2 &&
            isDouble(sb.charAt(sb.length - 2), sb.charAt(sb.length - 1)))
            sb.setLength(sb.length - 1)
          else if (sb.length == p1 && endsShortSyllable(sb, sb.length))
            sb.append('e')
        }
      }
    }

    // ---- Step 1c: y/Y -> i after a non-initial non-vowel ------------
    if (sb.length >= 3) {
      val c = sb.charAt(sb.length - 1)
      if ((c == 'y' || c == 'Y') && !isVowel(sb.charAt(sb.length - 2)))
        sb.setCharAt(sb.length - 1, 'i')
    }

    // ---- Step 2 (suffix must start in R1) ----------------------------
    step2(sb, p1)

    // ---- Step 3 (R1; ative additionally R2) --------------------------
    step3(sb, p1, p2)

    // ---- Step 4 (R2) --------------------------------------------------
    step4(sb, p2)

    // ---- Step 5 --------------------------------------------------------
    if (sb.nonEmpty) {
      val last = sb.charAt(sb.length - 1)
      if (last == 'e') {
        val start = sb.length - 1
        if (start >= p2 ||
          (start >= p1 && !endsShortSyllable(sb, start)))
          sb.setLength(start)
      } else if (last == 'l') {
        val start = sb.length - 1
        if (start >= p2 && sb.length >= 2 && sb.charAt(sb.length - 2) == 'l')
          sb.setLength(start)
      }
    }

    postlude(sb)
  }

  @inline private def startsWith(sb: StringBuilder, p: String): Boolean = {
    if (sb.length < p.length) return false
    var i = 0
    while (i < p.length) {
      if (sb.charAt(i) != p.charAt(i)) return false
      i += 1
    }
    true
  }

  private def postlude(sb: StringBuilder): String = {
    var i = 0
    while (i < sb.length) {
      if (sb.charAt(i) == 'Y') sb.setCharAt(i, 'y')
      i += 1
    }
    sb.toString
  }

  // Longest-match tables, ordered longest-first so the first hit IS the
  // among's longest match; the guard failing fails the whole step.
  private val step2Sufs: Array[(String, String)] = Array(
    "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
    "ousness" -> "ous", "iveness" -> "ive",
    "tional" -> "tion", "biliti" -> "ble", "lessli" -> "less",
    "entli" -> "ent", "ation" -> "ate", "alism" -> "al",
    "aliti" -> "al", "ousli" -> "ous", "iviti" -> "ive",
    "fulli" -> "ful",
    "enci" -> "ence", "anci" -> "ance", "abli" -> "able",
    "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
    "ogi" -> "og", "bli" -> "ble",
    "li" -> "")

  private def step2(sb: StringBuilder, p1: Int): Unit = {
    var k = 0
    while (k < step2Sufs.length) {
      val (suf, rep) = step2Sufs(k)
      if (endsWith(sb, suf)) {
        val start = sb.length - suf.length
        if (start >= p1) {
          if (suf == "ogi") {
            if (start >= 1 && sb.charAt(start - 1) == 'l') {
              sb.setLength(start); sb.append(rep)
            }
          } else if (suf == "li") {
            if (start >= 1 && validLiEnding(sb.charAt(start - 1)))
              sb.setLength(start)
          } else {
            sb.setLength(start); sb.append(rep)
          }
        }
        return // longest match found: condition pass or fail, step ends
      }
      k += 1
    }
  }

  private val step3Sufs: Array[(String, String)] = Array(
    "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
    "icate" -> "ic", "iciti" -> "ic", "ative" -> "",
    "ical" -> "ic", "ness" -> "", "ful" -> "")

  private def step3(sb: StringBuilder, p1: Int, p2: Int): Unit = {
    var k = 0
    while (k < step3Sufs.length) {
      val (suf, rep) = step3Sufs(k)
      if (endsWith(sb, suf)) {
        val start = sb.length - suf.length
        if (start >= p1) {
          if (suf == "ative") {
            if (start >= p2) sb.setLength(start)
          } else {
            sb.setLength(start); sb.append(rep)
          }
        }
        return
      }
      k += 1
    }
  }

  private val step4Sufs: Array[String] = Array(
    "ement",
    "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
    "al", "er", "ic")

  private def step4(sb: StringBuilder, p2: Int): Unit = {
    var k = 0
    while (k < step4Sufs.length) {
      val suf = step4Sufs(k)
      if (endsWith(sb, suf)) {
        val start = sb.length - suf.length
        if (start >= p2) {
          if (suf == "ion") {
            if (start >= 1 &&
              (sb.charAt(start - 1) == 's' || sb.charAt(start - 1) == 't'))
              sb.setLength(start)
          } else sb.setLength(start)
        }
        return
      }
      k += 1
    }
  }
}
