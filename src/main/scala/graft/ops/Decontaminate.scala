package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Test-set decontamination — the training-pipeline operator that flags
  * corpus documents overlapping an evaluation/benchmark set (the
  * standard n-gram-collision check run before any pretraining job; an
  * LLM-pipeline extension beyond the reference surface, anchored on its
  * document model, `opensearch/_write.py:432-488`).
  *
  * Method: token 8-grams (the de-facto contamination window), distinct
  * per document; a corpus document is contaminated if it shares any
  * 8-gram with any benchmark document.
  *
  * Scale: benchmark sets are eval suites — thousands of documents, not
  * billions — so the distinct benchmark-gram set is BROADCAST and the
  * check is one map-side hash-join over the corpus gram stream: no
  * shuffle of corpus data at all, linear in corpus size, embarrassingly
  * parallel at 100 TB. (If the benchmark ever outgrew broadcast range,
  * the same plan degrades gracefully to a shuffle equi-join on the
  * gram.)
  */
object Decontaminate {

  /** Distinct token `n`-grams per document. Empty for docs shorter than
    * n tokens (the CASE guard keeps Spark's `sequence` from running
    * backwards — `sequence(1,0)` is a DESCENDING range, not empty).
    * Tokenization hoisted to its own column: `split` inside the position
    * lambda would re-split the document once per gram. */
  private def grams(df: DataFrame, n: Int): DataFrame =
    df.withColumn("__toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN size(__toks) >= $n THEN
           |  array_distinct(transform(
           |    sequence(1, size(__toks) - ${n - 1}),
           |    i -> concat_ws(' ', slice(__toks, i, $n))))
           |ELSE array() END""".stripMargin)).as("g"))

  /** Contamination report against an explicit benchmark DataFrame
    * (both need `doc_id` and `text`): flagged corpus docs with their
    * shared-gram counts. Default window 8 (the usual pretraining
    * strictness); smaller windows flag more aggressively. */
  def check(corpus: DataFrame, benchmark: DataFrame, n: Int = 8): DataFrame =
    grams(corpus, n)
      .join(broadcast(grams(benchmark, n).select(col("g")).distinct()), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))

  /** Oracle-gated instance: `src0` documents stand in for the eval set,
    * the rest of the corpus is screened against them. Window 4 here —
    * the synthetic corpus shares few long spans across sources, and the
    * shorter window keeps the differential gate dense (49 flagged docs
    * at sf0.01 vs 2 with window 8). */
  val OracleN = 4

  def contamination(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    check(docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"), n = OracleN)
  }

  def contaminationOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
       |g AS (
       |  SELECT doc_id, source,
       |    unnest(list_distinct(list_transform(
       |      generate_series(1, greatest(len(t) - ${OracleN - 1}, 0)),
       |      i -> array_to_string(t[i:i+${OracleN - 1}], ' ')))) AS g
       |  FROM toks)
       |SELECT c.doc_id, count(*) AS n_shared_grams
       |FROM (SELECT doc_id, g FROM g WHERE source <> 'src0') c
       |JOIN (SELECT DISTINCT g FROM g WHERE source = 'src0') b USING (g)
       |GROUP BY 1""".stripMargin
}
