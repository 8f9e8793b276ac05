package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for training-data pipelines over the
  * `documents` table: token statistics, quality scoring, corpus profiling,
  * and content fingerprinting. The reference has no local text engine —
  * this is the LLM-pipeline extension surface (builder brief; anchored on
  * the reference's document-index model, `opensearch/_write.py:432-488`).
  *
  * Everything here is built from codegen'd builtins (`split`, `filter`,
  * `md5`, higher-order array functions) — no UDFs — so the whole pipeline
  * stays inside WholeStageCodegen and scales linearly with input splits:
  * token stats are a pure map (no shuffle); profiles aggregate with
  * map-side partials.
  */
object Text {

  /** Whitespace tokens of the `text` column (single-space corpus). */
  private val tokens = split(col("text"), " ")

  /** Per-document token statistics: count, distinct count, type-token
    * ratio, average token length — single scan, no shuffle. */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(tokens).as("n_tokens"),
      size(array_distinct(tokens)).as("n_uniq"),
      (size(array_distinct(tokens)).cast("double") /
        size(tokens).cast("double")).as("ttr"),
      ((length(col("text")) - size(tokens) + lit(1)).cast("double") /
        size(tokens).cast("double")).as("avg_tok_len"))

  def tokenStatsOracle: String =
    """SELECT doc_id,
      |  cast(len(string_split(text,' ')) as int) AS n_tokens,
      |  cast(len(list_distinct(string_split(text,' '))) as int) AS n_uniq,
      |  cast(len(list_distinct(string_split(text,' '))) as double)
      |    / cast(len(string_split(text,' ')) as double) AS ttr,
      |  cast(length(text) - len(string_split(text,' ')) + 1 as double)
      |    / cast(len(string_split(text,' ')) as double) AS avg_tok_len
      |FROM documents""".stripMargin

  /** Subword-style token counting with a BPE-ish pre-tokenizer regex —
    * the GPT-2 pre-tokenization idea (letter runs | digit runs |
    * punctuation), restricted to an engine-portable character-class
    * pattern so the count differentially tests against DuckDB. Cost
    * model per document: `ceil(bpe_tokens * 1.3)` as the subword
    * estimate (the conventional words→tokens expansion prior). Pure
    * map, no shuffle. */
  def bpeTokenCount(s: SparkSession, dir: String): DataFrame = {
    val pattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(tokens).as("n_ws_tokens"),
      regexp_count(col("text"), lit(pattern)).cast("int").as("n_bpe_pieces"),
      ceil(regexp_count(col("text"), lit(pattern)) * lit(1.3))
        .cast("bigint").as("est_subwords"))
  }

  def bpeTokenCountOracle: String =
    """SELECT doc_id,
      |  cast(len(string_split(text, ' ')) as int) AS n_ws_tokens,
      |  cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
      |    as int) AS n_bpe_pieces,
      |  cast(ceil(len(regexp_extract_all(text,
      |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) * 1.3) as bigint)
      |    AS est_subwords
      |FROM documents""".stripMargin

  private[ops] val stopwords = Seq("the", "a", "of")

  /** The composite quality score of `text` as ONE Column expression —
    * the single definition shared by the quality-gated pipeline stages
    * ([[graft.ops.Curation.curatePipeline]]) and the dup-cluster
    * representative selection ([[graft.ops.Dedup.ccBestKeep]]); the
    * arithmetic is identical to [[qualityScore]]'s column form, so all
    * three differential oracles share one formula. */
  /** The DuckDB rendering of [[qualityCol]] — the one SQL text the
    * curation-pipeline and dup-representative oracles splice in. */
  private[ops] def qualitySql: String = {
    val stopList = stopwords.map(w => s"'$w'").mkString(",")
    s"""cast(len(list_distinct(string_split(text,' '))) as double)
       |        / cast(len(string_split(text,' ')) as double) * 0.5
       |    + (1.0 - cast(len(list_filter(string_split(text,' '),
       |          t -> t IN ($stopList))) as double)
       |        / cast(len(string_split(text,' ')) as double)) * 0.2
       |    + least(cast(len(string_split(text,' ')) as double) / 64.0,
       |            1.0) * 0.3""".stripMargin
  }

  private[ops] def qualityCol: org.apache.spark.sql.Column = {
    val stopList = stopwords.map(w => s"'$w'").mkString(",")
    val toks = split(col("text"), " ")
    (size(array_distinct(toks)).cast("double") /
      size(toks).cast("double")) * 0.5 +
    (lit(1.0) - expr(s"size(filter(split(text,' '), t -> t IN ($stopList)))")
      .cast("double") / size(toks).cast("double")) * 0.2 +
    least(size(toks).cast("double") / lit(64.0), lit(1.0)) * 0.3
  }

  /** Linear text-classifier scoring at corpus scale — the fastText-style
    * quality filter (Joulin et al. 2016, arXiv:1607.01759) that CCNet-
    * class pipelines apply between heuristics and training: hashed
    * bag-of-words features, a weight per hash bucket, document score =
    * mean token weight, keep/drop by sign. The MODEL-INFERENCE shape is
    * what matters here: weights ride as a broadcast table (a real
    * trained model swaps in as a (bucket, weight) parquet), the feature
    * hash and the scoring are codegen'd map-side work, and the only
    * shuffle is the per-document partial-aggregated sum — linear at any
    * corpus size.
    *
    * Determinism: buckets come from the md5-hex-prefix arithmetic both
    * engines render identically (the [[graft.ops.Vectors.knnLsh]]
    * precedent); the stand-in weights are exact INTEGERS in
    * [-1000, 1000] derived the same way, so the score is an exact
    * integer sum over an exact count — the whole op differentially
    * tests bit-for-bit. */
  def classifierScore(s: SparkSession, dir: String,
      nBuckets: Int = 512): DataFrame = {
    val weights: Seq[(Long, Long)] = (0 until nBuckets).map { b =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(b.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      b.toLong -> ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L)
    }
    val wdf = broadcast(s.createDataFrame(weights).toDF("bucket", "w"))
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens).as("tok"))
      .withColumn("bucket",
        expr("cast(conv(substring(md5(tok), 1, 6), 16, 10) as bigint)")
          % nBuckets)
      .join(wdf, "bucket")
      .groupBy(col("doc_id"))
      .agg(sum(col("w")).as("wsum"), count(lit(1)).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        (col("wsum").cast("double") /
          (col("n_tokens") * 1000L).cast("double")).as("score"))
      .withColumn("verdict",
        when(col("score") >= 0.0, "keep").otherwise("drop"))
  }

  def classifierScoreOracle: String =
    """WITH w AS (
      |  SELECT b,
      |    (('0x' || substr(md5(cast(b as varchar)), 1, 6))::BIGINT % 2001)
      |      - 1000 AS wt
      |  FROM range(512) t(b)),
      |tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |bt AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(tok), 1, 6))::BIGINT % 512 AS bucket
      |  FROM tok),
      |agg AS (
      |  SELECT doc_id, sum(wt) AS wsum, count(*) AS n_tokens
      |  FROM bt JOIN w ON bt.bucket = w.b
      |  GROUP BY doc_id)
      |SELECT doc_id, n_tokens,
      |  cast(wsum as double) / cast(n_tokens * 1000 as double) AS score,
      |  CASE WHEN cast(wsum as double) / cast(n_tokens * 1000 as double)
      |         >= 0.0
      |       THEN 'keep' ELSE 'drop' END AS verdict
      |FROM agg""".stripMargin

  /** Quality scoring: stopword ratio, lexical diversity, length prior —
    * the heuristics a pretraining filter applies per document. The score
    * is one fixed double expression evaluated identically everywhere. */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val stopList = stopwords.map(w => s"'$w'").mkString(",")
    Tables.documents(s, dir)
      .withColumn("n_tokens", size(tokens))
      .withColumn("n_stop",
        expr(s"size(filter(split(text,' '), t -> t IN ($stopList)))"))
      .withColumn("ttr",
        size(array_distinct(tokens)).cast("double") /
          col("n_tokens").cast("double"))
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / col("n_tokens").cast("double"))
      .withColumn("len_prior",
        least(col("n_tokens").cast("double") / lit(64.0), lit(1.0)))
      .select(col("doc_id"), col("n_tokens"), col("n_stop"), col("ttr"),
        col("stop_ratio"), col("len_prior"),
        // the SHARED formula (same arithmetic as the intermediate
        // columns compose to — one definition, three oracled users)
        qualityCol.as("quality"))
  }

  def qualityScoreOracle: String = {
    val stopList = stopwords.map(w => s"'$w'").mkString(",")
    s"""SELECT doc_id, n_tokens, n_stop, ttr, stop_ratio, len_prior,
       |  ttr * 0.5 + (1.0 - stop_ratio) * 0.2 + len_prior * 0.3 AS quality
       |FROM (
       |  SELECT doc_id,
       |    cast(len(string_split(text,' ')) as int) AS n_tokens,
       |    cast(len(list_filter(string_split(text,' '), t -> t IN ($stopList))) as int) AS n_stop,
       |    cast(len(list_distinct(string_split(text,' '))) as double)
       |      / cast(len(string_split(text,' ')) as double) AS ttr,
       |    cast(len(list_filter(string_split(text,' '), t -> t IN ($stopList))) as double)
       |      / cast(len(string_split(text,' ')) as double) AS stop_ratio,
       |    least(cast(len(string_split(text,' ')) as double) / 64.0, 1.0) AS len_prior
       |  FROM documents) t""".stripMargin
  }

  /** Corpus profile per (lang, source): doc counts, exact char sums,
    * vocabulary size (distinct tokens across the group via explode). */
  def corpusProfile(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), col("source"), col("n_chars"),
        explode(array_distinct(tokens)).as("tok"))
      .groupBy(col("lang"), col("source"))
      .agg(
        countDistinct(col("tok")).as("vocab"),
        count(lit(1)).as("n_tok_rows"))

  def corpusProfileOracle: String =
    """SELECT lang, source,
      |  cast(count(DISTINCT tok) as bigint) AS vocab,
      |  count(*) AS n_tok_rows
      |FROM (
      |  SELECT lang, source, unnest(list_distinct(string_split(text,' '))) AS tok
      |  FROM documents) t
      |GROUP BY lang, source""".stripMargin

  /** Document fingerprinting: md5 over normalized text → duplicate groups.
    * Deterministic exact dedup — at 100 TB this is one shuffle on the
    * 128-bit fingerprint with map-side pre-aggregation; the fingerprint
    * column doubles as a stable content-addressed id.
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("fp", md5(lower(trim(col("text")))))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_dups"))

  def fingerprintOracle: String =
    """SELECT md5(lower(trim(text))) AS fp,
      |  min(doc_id) AS keeper, count(*) AS n_dups
      |FROM documents GROUP BY 1""".stripMargin

  /** Heuristic language-ID: score each candidate language by marker-token
    * hits and take the argmax (deterministic tie-break by language code).
    * The marker lists stand in for real char-n-gram profiles; the operator
    * shape — per-language score → argmax — is the production structure.
    */
  def languageId(s: SparkSession, dir: String): DataFrame = {
    val markers = Map(
      "en" -> Seq("the", "a", "value"), "de" -> Seq("hash", "join"),
      "es" -> Seq("data", "stream"), "fr" -> Seq("window", "agg"),
      "zh" -> Seq("spark", "table"))
    val scored = markers.toSeq.sortBy(_._1).foldLeft(
      Tables.documents(s, dir).withColumn("toks", tokens)) {
      case (df, (code, words)) =>
        val list = words.map(w => s"'$w'").mkString(",")
        df.withColumn(s"score_$code",
          expr(s"size(filter(toks, t -> t IN ($list)))"))
    }
    // argmax in fixed code order, >= so the earlier code wins ties
    scored.withColumn("pred",
      expr("""CASE
        | WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
        | WHEN score_en >= score_es AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
        | WHEN score_es >= score_fr AND score_es >= score_zh THEN 'es'
        | WHEN score_fr >= score_zh THEN 'fr'
        | ELSE 'zh' END""".stripMargin))
      .select(col("doc_id"), col("lang"), col("pred"),
        (col("pred") === col("lang")).as("hit"))
  }

  def languageIdOracle: String =
    """SELECT doc_id, lang, pred, pred = lang AS hit FROM (
      |  SELECT doc_id, lang,
      |    CASE
      |      WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
      |      WHEN score_en >= score_es AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
      |      WHEN score_es >= score_fr AND score_es >= score_zh THEN 'es'
      |      WHEN score_fr >= score_zh THEN 'fr'
      |      ELSE 'zh' END AS pred
      |  FROM (
      |    SELECT doc_id, lang,
      |      len(list_filter(toks, t -> t IN ('hash','join'))) AS score_de,
      |      len(list_filter(toks, t -> t IN ('the','a','value'))) AS score_en,
      |      len(list_filter(toks, t -> t IN ('data','stream'))) AS score_es,
      |      len(list_filter(toks, t -> t IN ('window','agg'))) AS score_fr,
      |      len(list_filter(toks, t -> t IN ('spark','table'))) AS score_zh
      |    FROM (SELECT doc_id, lang, string_split(text,' ') AS toks
      |          FROM documents) d) sc) p""".stripMargin
}
