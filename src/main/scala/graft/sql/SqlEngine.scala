package graft.sql

import java.sql.{Date, Timestamp}
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The `athena.read_sql_query` lifecycle (§3.1 of the survey,
  * `athena/_read.py:951-1308`) minus the remote engine: parameter
  * formatting, a normalized-SQL result cache, and Catalyst execution.
  */
object SqlEngine {

  /** Client-side `:name` parameter substitution with typed literal
    * rendering — the Presto-dialect path of `_sql_formatter.py:15-192`.
    * Strings escape single quotes by doubling; collections render as
    * ARRAY[…] / MAP(ARRAY[…], ARRAY[…]).
    */
  def formatSql(sql: String, params: Map[String, Any]): String =
    params.toSeq.sortBy(-_._1.length).foldLeft(sql) { case (acc, (k, v)) =>
      acc.replace(s":$k", renderLiteral(v))
    }

  def renderLiteral(v: Any): String = v match {
    case null | None => "NULL"
    case Some(x) => renderLiteral(x)
    case b: Boolean => b.toString.toUpperCase
    case s: String => "'" + s.replace("'", "''") + "'"
    case d: BigDecimal => s"DECIMAL '${d.toString}'"
    case d: java.math.BigDecimal => s"DECIMAL '${d.toString}'"
    case t: Timestamp => s"TIMESTAMP '${t.toString}'"
    case d: Date => s"DATE '${d.toString}'"
    case xs: Seq[_] => xs.map(renderLiteral).mkString("ARRAY[", ", ", "]")
    case m: Map[_, _] =>
      val (ks, vs) = m.toSeq.unzip
      s"MAP(${renderLiteral(ks)}, ${renderLiteral(vs)})"
    case n @ (_: Int | _: Long | _: Short | _: Byte | _: Float | _: Double) =>
      n.toString
    case other =>
      throw new IllegalArgumentException(
        s"unsupported SQL parameter type: ${other.getClass.getName}")
  }

  /** Normalized-SQL-text result cache (`athena/_cache.py:95-230`): a hit
    * returns the previously persisted DataFrame. Size-bounded LRU;
    * comparison ignores whitespace/case/trailing-semicolon differences
    * (`_compare_query_string`, `athena/_cache.py:114-129`).
    */
  final class QueryCache(maxEntries: Int = 100) {
    private val entries = TrieMap.empty[String, (DataFrame, Long)]

    def normalize(sql: String): String =
      sql.trim.stripSuffix(";").replaceAll("\\s+", " ").toLowerCase

    def get(sql: String): Option[DataFrame] =
      entries.get(normalize(sql)).map { case (df, _) => df }

    def put(sql: String, df: DataFrame): DataFrame = {
      val cached = df.persist()
      entries.put(normalize(sql), (cached, System.nanoTime()))
      if (entries.size > maxEntries)
        entries.toSeq.sortBy(_._2._2).take(entries.size - maxEntries)
          .foreach { case (k, (d, _)) => d.unpersist(); entries.remove(k) }
      cached
    }

    def clear(): Unit = {
      entries.values.foreach(_._1.unpersist())
      entries.clear()
    }

    def size: Int = entries.size
  }

  private val sessionCaches = TrieMap.empty[SparkSession, QueryCache]
  def cacheFor(spark: SparkSession): QueryCache =
    sessionCaches.getOrElseUpdate(spark, new QueryCache())

  /** `read_sql_query(sql, params=…, use_cache=…)` → Catalyst. */
  def readSqlQuery(
      spark: SparkSession,
      sql: String,
      params: Map[String, Any] = Map.empty,
      useCache: Boolean = false): DataFrame = {
    val formatted = formatSql(sql, params)
    if (!useCache) spark.sql(formatted)
    else {
      val cache = cacheFor(spark)
      cache.get(formatted).getOrElse(cache.put(formatted, spark.sql(formatted)))
    }
  }

  /** `athena.create_ctas_table` (`athena/_utils.py:686-931`): CREATE
    * TABLE … USING format [PARTITIONED BY …] AS SELECT. */
  def createCtasTable(
      spark: SparkSession,
      table: String,
      sql: String,
      format: String = "parquet",
      partitionedBy: Seq[String] = Nil,
      location: Option[String] = None): DataFrame = {
    val part =
      if (partitionedBy.nonEmpty)
        partitionedBy.mkString(" PARTITIONED BY (", ", ", ")")
      else ""
    val loc = location.map(l => s" LOCATION '$l'").getOrElse("")
    spark.sql(s"CREATE TABLE $table USING $format$part$loc AS $sql")
  }

  /** `athena.unload` (`athena/_read.py:1556-1659`): query → files. */
  def unload(
      spark: SparkSession,
      sql: String,
      path: String,
      format: String = "parquet",
      partitionedBy: Seq[String] = Nil,
      compression: String = "snappy"): Unit = {
    val w = spark.sql(sql).write.format(format)
      .option("compression", compression)
    val p = if (partitionedBy.nonEmpty) w.partitionBy(partitionedBy: _*) else w
    p.mode("overwrite").save(path)
  }
}
