package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Document search — the OpenSearch-shaped surface of the reference
  * (`opensearch/_read.py:65-155` search, `search_by_sql`). Full-text
  * relevance over Spark: term-frequency scoring with builtins (a real
  * deployment adds an inverted-index table; the scoring pipeline is the
  * same dataframe plan).
  */
object Search {

  /** Occurrences of `term` in `text` via length arithmetic (exact
    * integers, engine-portable). */
  private def occurrences(textCol: String, term: String) =
    ((length(col(textCol)) - length(regexp_replace(col(textCol), term, ""))) /
      lit(term.length)).cast("int")

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
