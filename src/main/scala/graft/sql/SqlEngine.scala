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
    *
    * Matching follows the reference's `:(\w+)` + trailing-word-boundary
    * rule (`_sql_formatter.py:158`): `:date` must not rewrite the prefix
    * of `:dateTime` or `:date_2`, and an unbound `:param` left in the
    * query is an error, not a silent pass-through.
    */
  // lookbehind skips the `::type` cast syntax; trailing \w* stops at a
  // word boundary so :date never eats the prefix of :dateTime / :date_2
  private val ParamToken = "(?<!:):([A-Za-z_][A-Za-z0-9_]*)".r

  def formatSql(sql: String, params: Map[String, Any]): String =
    substitute(sql, params, strict = true)

  private def substitute(
      sql: String, params: Map[String, Any], strict: Boolean): String =
    if (params.isEmpty && !strict) sql
    else if (params.isEmpty) sql // nothing bound: nothing to validate
    else ParamToken.replaceAllIn(sql, m => {
      val name = m.group(1)
      params.get(name) match {
        case Some(v) =>
          scala.util.matching.Regex.quoteReplacement(renderLiteral(v))
        case None if strict =>
          throw new IllegalArgumentException(
            s"unbound SQL parameter :$name (bound: ${params.keys.mkString(", ")})")
        case None =>
          scala.util.matching.Regex.quoteReplacement(m.matched)
      }
    })

  def renderLiteral(v: Any): String = v match {
    case null | None => "NULL"
    case Some(x) => renderLiteral(x)
    case b: Boolean => b.toString.toUpperCase
    case s: String => "'" + s.replace("'", "''") + "'"
    // Spark-dialect literals (the substitution target is Catalyst's
    // parser): 12.34BD decimal, array(…), map(k1, v1, …)
    case d: BigDecimal => s"${d.toString}BD"
    case d: java.math.BigDecimal => s"${d.toString}BD"
    case t: Timestamp => s"TIMESTAMP '${t.toString}'"
    case d: Date => s"DATE '${d.toString}'"
    case xs: Seq[_] => xs.map(renderLiteral).mkString("array(", ", ", ")")
    case m: Map[_, _] =>
      m.toSeq.map { case (k, v) => s"${renderLiteral(k)}, ${renderLiteral(v)}" }
        .mkString("map(", ", ", ")")
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
    @volatile private var lastInvalidation = 0L

    def normalize(sql: String): String =
      sql.trim.stripSuffix(";").replaceAll("\\s+", " ").toLowerCase

    /** A hit must be younger than `maxAgeSeconds` (the reference's
      * `max_cache_seconds`, `athena/_cache.py:64-92`) AND younger than
      * the last dataset write seen by this session — a cache that
      * survives an overwrite of its inputs serves wrong answers. */
    def get(sql: String,
        maxAgeSeconds: Long = Long.MaxValue): Option[DataFrame] =
      entries.get(normalize(sql)).flatMap { case (df, bornNanos) =>
        val ageOk = (System.nanoTime() - bornNanos) / 1e9 <= maxAgeSeconds
        val fresh = bornNanos > lastInvalidation
        if (ageOk && fresh) Some(df)
        else { entries.remove(normalize(sql)).foreach(_._1.unpersist()); None }
      }

    def put(sql: String, df: DataFrame): DataFrame = {
      val cached = df.persist()
      entries.put(normalize(sql), (cached, System.nanoTime()))
      if (entries.size > maxEntries)
        entries.toSeq.sortBy(_._2._2).take(entries.size - maxEntries)
          .foreach { case (k, (d, _)) => d.unpersist(); entries.remove(k) }
      cached
    }

    /** Every entry born before now is stale (called on dataset writes). */
    def invalidateAll(): Unit = lastInvalidation = System.nanoTime()

    def clear(): Unit = {
      entries.values.foreach(_._1.unpersist())
      entries.clear()
    }

    def size: Int = entries.size
  }

  // Weak keys: a cache dies with its SparkSession instead of pinning it
  // (the old TrieMap held every session that ever queried, forever).
  private val sessionCaches =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, QueryCache]())
  def cacheFor(spark: SparkSession): QueryCache =
    sessionCaches.synchronized {
      Option(sessionCaches.get(spark)).getOrElse {
        val c = new QueryCache(); sessionCaches.put(spark, c); c
      }
    }

  /** Dataset writers call this after mutating storage: all cached query
    * results predating the write stop being served. */
  def noteDatasetWrite(spark: SparkSession): Unit =
    sessionCaches.synchronized {
      Option(sessionCaches.get(spark)).foreach(_.invalidateAll())
    }

  /** `read_sql_query(sql, params=…, use_cache=…)` → Catalyst.
    *
    * Parameter dispatch mirrors `athena/_utils.py:385-401`: scalar
    * params bind SERVER-SIDE through Spark's named-parameter API (no
    * string splicing, no injection channel, `:name` inside string
    * literals untouched); collection params (ARRAY/MAP literals, which
    * the binding API cannot express) fall back to the client-side
    * formatter above.
    */
  def readSqlQuery(
      spark: SparkSession,
      sql: String,
      params: Map[String, Any] = Map.empty,
      useCache: Boolean = false,
      maxCacheSeconds: Long = Long.MaxValue): DataFrame = {
    def run(): DataFrame = {
      val (collections, scalars) = params.partition {
        case (_, _: Seq[_]) | (_, _: Map[_, _]) => true
        case _ => false
      }
      // the reference's entry point takes Athena (= Trino) SQL verbatim
      // (`athena/_read.py:951-1308`): register the Trino-name functions
      // and translate the Trino-only syntax before Catalyst parses
      TrinoCompat.ensureRegistered(spark)
      val text = TrinoCompat.rewrite(substitute(sql, collections, strict = false))
      if (scalars.nonEmpty)
        spark.sql(text, scalars.map { case (k, v) => k -> unwrap(v) })
      else spark.sql(text)
    }
    if (!useCache) run()
    else {
      val cache = cacheFor(spark)
      val key = formatSql(sql, params) // fully-rendered text as cache key
      cache.get(key, maxCacheSeconds).getOrElse(cache.put(key, run()))
    }
  }

  private val DmlHead = """(?is)^\s*(INSERT|UPDATE|DELETE|MERGE)\b""".r

  /** ONE front door for reads AND table DML — the reference executes
    * both through the same `start_query_execution` path
    * (`athena/_executions.py:34`); Athena's engine routes
    * INSERT/UPDATE/DELETE/MERGE to its Iceberg DML executor and
    * everything else to the query engine. Here: a DML head dispatches
    * to [[TableDml.execute]] with table paths resolved from the
    * SESSION CATALOG (`DESCRIBE FORMATTED … Location`, the mapping
    * `catalog.getTableLocation` serves) — `tables` entries override or
    * extend that; anything else runs through [[readSqlQuery]]. DML
    * params render client-side (the regex dialect has no binding
    * channel); reads keep server-side scalar binding. DML invalidates
    * this session's query cache, exactly like the dataset writers.
    * Returns the result rows for reads; for DML a one-row frame
    * `(operation, table)` mirroring the reference's execution record. */
  def executeSql(
      spark: SparkSession,
      sql: String,
      params: Map[String, Any] = Map.empty,
      tables: Map[String, String] = Map.empty): DataFrame =
    if (DmlHead.findFirstIn(sql).isEmpty)
      readSqlQuery(spark, sql, params)
    else {
      val rendered = substitute(sql, params, strict = true)
      val resolve: String => Option[String] = name =>
        tables.get(name).orElse(tables.get(name.toLowerCase)).orElse(
          try Some(graft.catalog.Catalog.getTableLocation(spark, name))
          catch { case _: Exception => None })
      val res = TableDml.execute(spark, rendered, resolve)
      noteDatasetWrite(spark)
      import spark.implicits._
      Seq((res.operation, res.table)).toDF("operation", "table")
    }

  /** Positional `?` binding — the reference's server-side "qmark" style
    * (`EXECUTE … USING`, `athena/_utils.py:385-401`). */
  def readSqlQueryQmark(
      spark: SparkSession,
      sql: String,
      args: Seq[Any]): DataFrame = {
    TrinoCompat.ensureRegistered(spark)
    spark.sql(TrinoCompat.rewrite(sql), args.map(unwrap).toArray)
  }

  private def unwrap(v: Any): Any = v match {
    case Some(x) => x
    case None => null
    case other => other
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
      compression: String = "snappy",
      options: Map[String, String] = Map.empty): Unit = {
    val w = spark.sql(sql).write.format(format)
      .option("compression", compression).options(options)
    val p = if (partitionedBy.nonEmpty) w.partitionBy(partitionedBy: _*) else w
    p.mode("overwrite").save(path)
  }
}
