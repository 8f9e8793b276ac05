package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Document search — the OpenSearch-shaped surface of the reference
  * (`opensearch/_read.py:65-155` search, `search_by_sql`). Full-text
  * relevance over Spark: term-frequency scoring with builtins. This is
  * the scan path (one pass over the corpus per query); the corpus-scale
  * path is the persisted token-partitioned postings table in
  * [[Postings]], which answers the same match queries reading only the
  * query terms' buckets.
  */
object Search {

  /** Occurrences of `term` in `text` via length arithmetic (exact
    * integers, engine-portable). The term is a LITERAL: quoted with
    * \Q…\E so regex metacharacters in a search term count as
    * themselves instead of silently reshaping the pattern. */
  private def occurrences(textCol: String, term: String) = {
    val literal = java.util.regex.Pattern.quote(term)
    ((length(col(textCol)) -
      length(regexp_replace(col(textCol), lit(literal), lit("")))) /
      lit(term.length)).cast("int")
  }

  /** Multi-term match query with tf-weighted scoring and top-k ranking —
    * `search(index, query={"match": ...})`. Single scan, top-k via
    * TakeOrderedAndProject. */
  def matchQuery(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("spark", "join", "stream")
    val scored = terms.foldLeft(Tables.documents(s, dir)) { (df, t) =>
      df.withColumn(s"tf_$t", occurrences("text", t))
    }
    scored
      .withColumn("score",
        col("tf_spark") * 3 + col("tf_join") * 2 + col("tf_stream"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("lang"), col("tf_spark"), col("tf_join"),
        col("tf_stream"), col("score"))
  }

  /** OpenSearch query-DSL compiler (`opensearch/_read.py:65-155` accepts
    * `search_body={"query": {...}}` and passes ARBITRARY DSL through):
    * the match / match_phrase / term / range / exists / prefix /
    * wildcard / bool subset translated to Catalyst predicates. `match`
    * on a text field means "any of the analyzed terms occurs as a
    * token" (the minimal analyzer: whitespace tokens,
    * case-insensitive); `match_phrase` requires the analyzed terms
    * ADJACENT and in order. `prefix`/`wildcard`/`term` are
    * keyword-style (not analyzed, case-sensitive), as in OpenSearch.
    *
    * Query model: nested Maps — `Map("bool" -> Map("must" -> Seq(...),
    * "must_not" -> Seq(...), "should" -> Seq(...),
    * "minimum_should_match" -> n))`,
    * `Map("match" -> Map(field -> text))`,
    * `Map("match_phrase" -> Map(field -> text))`,
    * `Map("term" -> Map(field -> value))`,
    * `Map("range" -> Map(field -> Map("gte" -> v, "lt" -> v)))`,
    * `Map("exists" -> Map("field" -> name))`,
    * `Map("prefix" -> Map(field -> value))`,
    * `Map("wildcard" -> Map(field -> pattern))` (`*` any run, `?` any
    * one char, anchored both ends — the OpenSearch contract).
    */
  def compileQueryDsl(q: Map[String, Any]): Column = {
    require(q.size == 1, s"query node must have one key, got ${q.keys}")
    val (kind, body) = q.head
    kind match {
      case "match" =>
        // Column APIs, not expr() splicing: a quote/backtick in the
        // analyzed term is data, never SQL.
        val (field, text) = body.asInstanceOf[Map[String, String]].head
        text.toLowerCase.split("\\s+").toSeq.map { term =>
          array_contains(split(lower(col(field)), " "), lit(term))
        }.reduce(_ || _)
      case "match_phrase" =>
        // token ADJACENCY: re-join the analyzed tokens with single
        // spaces and look for the phrase at token boundaries — the
        // sentinel spaces make boundary checks exact at both ends.
        // Pure codegen'd string ops; no position arithmetic needed.
        val (field, text) = body.asInstanceOf[Map[String, String]].head
        val phrase = text.toLowerCase.split("\\s+").mkString(" ")
        concat(lit(" "),
          array_join(split(lower(col(field)), "\\s+"), " "), lit(" "))
          .contains(s" $phrase ")
      case "term" =>
        val (field, value) = body.asInstanceOf[Map[String, Any]].head
        col(field) === lit(value)
      case "range" =>
        val (field, bounds) = body.asInstanceOf[Map[String, Map[String, Any]]].head
        bounds.map {
          case ("gte", v) => col(field) >= lit(v)
          case ("gt", v) => col(field) > lit(v)
          case ("lte", v) => col(field) <= lit(v)
          case ("lt", v) => col(field) < lit(v)
          case (op, _) => throw new IllegalArgumentException(s"range op $op")
        }.reduce(_ && _)
      case "exists" =>
        val field = body.asInstanceOf[Map[String, String]]("field")
        col(field).isNotNull
      case "prefix" =>
        val (field, value) = body.asInstanceOf[Map[String, String]].head
        col(field).startsWith(value)
      case "wildcard" =>
        val (field, pattern) = body.asInstanceOf[Map[String, String]].head
        col(field).rlike(wildcardToRegex(pattern))
      case "bool" =>
        val clauses = body.asInstanceOf[Map[String, Any]]
        def seqOf(k: String): Seq[Map[String, Any]] =
          clauses.get(k).map(_.asInstanceOf[Seq[Map[String, Any]]])
            .getOrElse(Nil)
        val must = seqOf("must").map(compileQueryDsl)
        val mustNot = seqOf("must_not").map(compileQueryDsl)
        val should = seqOf("should").map(compileQueryDsl)
        // minimum_should_match: at least n of the should clauses hold
        // (integer form). OpenSearch's DEFAULT depends on context: with
        // no must/filter present it is 1 (the plain OR); when must or
        // filter IS present the default is 0 — should clauses only
        // affect scoring, never filtering — so they compile to no
        // predicate at all unless an explicit bound is given.
        val shouldPred =
          if (should.isEmpty) None
          else clauses.get("minimum_should_match") match {
            case Some(n: Int) =>
              Some(should.map(p => when(p, 1).otherwise(0))
                .reduce(_ + _) >= n)
            case Some(other) => throw new IllegalArgumentException(
              s"minimum_should_match must be an Int, got $other")
            case None if must.nonEmpty => None
            case None => Some(should.reduce(_ || _))
          }
        // must_not is "the clause does NOT match": a NULL evaluation
        // (missing field) is a non-match, so the document is KEPT —
        // `!pred` alone would propagate the NULL and drop it
        (must ++ mustNot.map(p => !coalesce(p, lit(false))) ++
          shouldPred.toSeq)
          .reduceOption(_ && _).getOrElse(lit(true))
      case other =>
        throw new IllegalArgumentException(s"unsupported query kind: $other")
    }
  }

  /** OpenSearch wildcard pattern → anchored Java regex: `*` matches any
    * run (including empty), `?` any single character, every other
    * character itself (regex metacharacters quoted). */
  private[ops] def wildcardToRegex(pattern: String): String = {
    val sb = new StringBuilder("^")
    pattern.foreach {
      case '*' => sb ++= ".*"
      case '?' => sb ++= "."
      case c => sb ++= java.util.regex.Pattern.quote(c.toString)
    }
    sb.append('$').toString
  }

  /** `opensearch.search(search_body=…)`: DSL → filtered DataFrame. */
  def search(docs: DataFrame, queryDsl: Map[String, Any]): DataFrame =
    docs.filter(compileQueryDsl(queryDsl))

  /** Oracled DSL query (round 12): a bool routing the widened compiler
    * — match_phrase adjacency in must, a term must_not, and a
    * prefix/wildcard/match should trio under minimum_should_match=2.
    * One scan, all predicates codegen'd into the filter. */
  def dslQuery(s: SparkSession, dir: String): DataFrame =
    search(Tables.documents(s, dir), Map("bool" -> Map(
      "must" -> Seq(Map("match_phrase" -> Map("text" -> "the data"))),
      "must_not" -> Seq(Map("term" -> Map("lang" -> "de"))),
      "should" -> Seq(
        Map("prefix" -> Map("text" -> "spark")),
        Map("wildcard" -> Map("lang" -> "e?")),
        Map("match" -> Map("text" -> "window"))),
      "minimum_should_match" -> 2)))
      .select(col("doc_id"), col("lang"))

  def dslQueryOracle: String =
    """SELECT doc_id, lang FROM documents
      |WHERE contains(' ' || regexp_replace(lower(text), '\s+', ' ', 'g')
      |        || ' ', ' the data ')
      |  AND NOT coalesce(lang = 'de', false)
      |  AND ((CASE WHEN text LIKE 'spark%' THEN 1 ELSE 0 END)
      |     + (CASE WHEN regexp_matches(lang, '^e.$') THEN 1 ELSE 0 END)
      |     + (CASE WHEN list_contains(string_split(lower(text), ' '),
      |              'window') THEN 1 ELSE 0 END)) >= 2""".stripMargin

  /** Bulk document indexing with id-key upsert — `opensearch.index_df`
    * (`opensearch/_write.py:432-488`, `id_keys` semantics): documents
    * land keyed by the id columns; re-indexing a document replaces it.
    */
  def indexDocuments(
      docs: DataFrame,
      indexPath: String,
      idKeys: Seq[String]): Long = {
    val spark = docs.sparkSession
    if (!graft.io.DatasetReader.datasetExists(spark, indexPath)) {
      graft.io.DatasetWriter.toParquet(docs, indexPath,
        mode = graft.io.DatasetWriter.Overwrite)
      docs.count()
    } else
      graft.table.MergeOps.upsert(spark, indexPath, docs, keys = idKeys)
  }

  /** `index_csv` / `index_json` (`opensearch/_write.py:258-430`):
    * file sources indexed through the same id-key upsert. */
  def indexCsv(spark: SparkSession, csvPath: String, indexPath: String,
      idKeys: Seq[String], options: Map[String, String] = Map.empty): Long =
    indexDocuments(
      graft.io.DatasetReader.readCsv(spark, csvPath, options = options),
      indexPath, idKeys)

  def indexJson(spark: SparkSession, jsonPath: String, indexPath: String,
      idKeys: Seq[String], lines: Boolean = true): Long =
    indexDocuments(graft.io.DatasetReader.readJson(spark, jsonPath, lines),
      indexPath, idKeys)

  def matchQueryOracle: String =
    """SELECT doc_id, lang, tf_spark, tf_join, tf_stream,
      |  tf_spark * 3 + tf_join * 2 + tf_stream AS score
      |FROM (
      |  SELECT doc_id, lang,
      |    cast((length(text) - length(replace(text, 'spark', ''))) / 5 as int) AS tf_spark,
      |    cast((length(text) - length(replace(text, 'join', ''))) / 4 as int) AS tf_join,
      |    cast((length(text) - length(replace(text, 'stream', ''))) / 6 as int) AS tf_stream
      |  FROM documents) t
      |WHERE tf_spark * 3 + tf_join * 2 + tf_stream > 0
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
}
