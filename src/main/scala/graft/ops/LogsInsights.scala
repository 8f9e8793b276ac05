package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** CloudWatch Logs Insights query language — the reference's
  * `cloudwatch.read_logs` / `run_query` surface (`cloudwatch.py:45-230`):
  * a pipe-delimited pipeline compiled stage by stage onto the DataFrame.
  *
  * Supported stages (the subset the reference's own examples use):
  * {{{
  *   fields a, b, c
  *   filter <col> = 'v' | != | > | >= | < | <= | like 'substr'
  *   parse <col> /regex/ as x, y        (regex capture groups)
  *   stats count(*)|sum(x)|avg(x)|min(x)|max(x) [as name]
  *         by bin(<n>m|<n>h)[, col...]
  *   sort <col> [asc|desc]
  *   limit n
  * }}}
  *
  * Every stage is declarative: filters reach the scan through Catalyst,
  * stats compile to one hash aggregate with map-side partials, sort+limit
  * to TakeOrderedAndProject — the same plans the hand-written operators
  * get, driven from the log-query dialect.
  */
object LogsInsights {

  /** Compile and run a Logs Insights query against a log DataFrame with
    * an event-time column named `@timestamp`. Stages separate on `|` or
    * newlines (the console accepts both) — regex literals in `parse`
    * stages keep their `|` alternations via the slash delimiters. */
  def query(logs: DataFrame, q: String): DataFrame =
    splitStages(q).foldLeft(logs)((df, stage) => applyStage(df, stage))

  private def splitStages(q: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inRegex = false
    var inQuote = false
    var escaped = false
    q.foreach {
      case c if escaped => escaped = false; cur += c
      case '\\' if inRegex => escaped = true; cur += '\\'
      case '\'' if !inRegex => inQuote = !inQuote; cur += '\''
      // '/' only delimits a regex literal inside a `parse` stage — a '/'
      // in a quoted filter value (or any other stage) is plain data
      case '/' if !inQuote &&
          (inRegex || cur.toString.trim.toLowerCase.startsWith("parse")) =>
        inRegex = !inRegex; cur += '/'
      case c @ ('|' | '\n') if !inRegex && !inQuote =>
        if (cur.toString.trim.nonEmpty) out += cur.toString.trim
        cur.clear()
      case c => cur += c
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.toSeq
  }

  private val FilterRe =
    """(?i)filter\s+(\S+)\s*(=|!=|>=|<=|>|<|like)\s*(?:'([^']*)'|([0-9.eE+-]+))""".r
  private val StatsRe = """(?i)stats\s+(.+?)(?:\s+by\s+(.+))?""".r
  private val AggRe = """(?i)(count|sum|avg|min|max)\s*\(\s*(\*|\S+?)\s*\)(?:\s+as\s+(\w+))?""".r
  private val BinRe = """(?i)bin\s*\(\s*(\d+)\s*(m|h)\s*\)""".r
  private val ParseRe = """(?i)parse\s+(\S+)\s+/(.+)/\s+as\s+(.+)""".r
  private val SortRe = """(?i)(\S+)(?:\s+(asc|desc))?""".r

  private def applyStage(df: DataFrame, stage: String): DataFrame = {
    val lower = stage.toLowerCase
    if (lower.startsWith("fields"))
      df.select(stage.drop("fields".length).split(",")
        .map(_.trim).filter(_.nonEmpty).map(resolve): _*)
    else if (lower.startsWith("filter")) stage match {
      case FilterRe(c, op, str, num) =>
        val v: Column = if (str != null) lit(str) else lit(num.toDouble)
        val target = resolve(c)
        df.filter(op.toLowerCase match {
          case "=" => target === v
          case "!=" => target =!= v
          case ">" => target > v
          case ">=" => target >= v
          case "<" => target < v
          case "<=" => target <= v
          case "like" => target.contains(str)
        })
      case _ => throw new IllegalArgumentException(s"bad filter: $stage")
    }
    else if (lower.startsWith("parse")) stage match {
      case ParseRe(c, regex, names) =>
        // direct Catalyst expression, NOT functions.regexp_extract: the
        // DSL function resolves by NAME through the session registry in
        // Spark 4, so the Trino shim's session-wide regexp_extract
        // (NULL on no match) would silently change parse semantics for
        // any session that ran a dialect query first
        names.split(",").map(_.trim).zipWithIndex.foldLeft(df) {
          case (d, (n, i)) =>
            d.withColumn(n, org.apache.spark.sql.GraftBridge.column(
              org.apache.spark.sql.catalyst.expressions.RegExpExtract(
                org.apache.spark.sql.GraftBridge.expr(resolve(c)),
                org.apache.spark.sql.catalyst.expressions.Literal(regex),
                org.apache.spark.sql.catalyst.expressions.Literal(i + 1))))
        }
      case _ => throw new IllegalArgumentException(s"bad parse: $stage")
    }
    else if (lower.startsWith("stats")) stage match {
      case StatsRe(aggs, byOrNull) =>
        val aggCols = AggRe.findAllMatchIn(aggs).map { m =>
          val fn = m.group(1).toLowerCase
          val arg = m.group(2)
          val name = Option(m.group(3)).getOrElse(
            s"${fn}_${if (arg == "*") "all" else arg}")
          (fn match {
            case "count" =>
              if (arg == "*") count(lit(1)) else count(resolve(arg))
            case "sum" => sum(resolve(arg))
            case "avg" => avg(resolve(arg))
            case "min" => min(resolve(arg))
            case "max" => max(resolve(arg))
          }).as(name)
        }.toSeq
        require(aggCols.nonEmpty, s"no aggregates in: $stage")
        val groupCols = Option(byOrNull).toSeq.flatMap(_.split(",").toSeq)
          .map(_.trim).filter(_.nonEmpty).map {
            case b @ BinRe(n, unit) =>
              val seconds = n.toLong * (if (unit.toLowerCase == "h") 3600 else 60)
              (floor(unix_timestamp(resolve("@timestamp")) / seconds) *
                seconds).cast("timestamp").as("bin")
            case c => resolve(c)
          }
        if (groupCols.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
        else df.groupBy(groupCols: _*).agg(aggCols.head, aggCols.tail: _*)
      case _ => throw new IllegalArgumentException(s"bad stats: $stage")
    }
    else if (lower.startsWith("sort")) {
      val keys = stage.drop("sort".length).split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq.map {
          case SortRe(c, dir) =>
            if (Option(dir).exists(_.equalsIgnoreCase("desc")))
              resolve(c).desc
            else resolve(c).asc
          case other =>
            throw new IllegalArgumentException(s"bad sort key: $other")
        }
      require(keys.nonEmpty, s"bad sort: $stage")
      df.orderBy(keys: _*)
    }
    else if (lower.startsWith("limit"))
      df.limit(stage.drop("limit".length).trim.toInt)
    else if (lower.startsWith("dedup")) {
      // CloudWatch's `dedup f1, f2`: keep the MOST RECENT row per key
      // (ties broken deterministically by the full remaining order) —
      // one window pass, hash-partitioned on the dedup key
      val keys = stage.drop("dedup".length).split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
      require(keys.nonEmpty, s"bad dedup: $stage")
      val bare = keys.map(_.stripPrefix("@"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(resolve): _*)
        .orderBy(resolve("@timestamp").desc +:
          df.columns.toSeq
            .filterNot(c => bare.contains(c) || c == "timestamp")
            .map(c => col(c).asc): _*)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    else throw new IllegalArgumentException(s"unsupported stage: $stage")
  }

  /** `@timestamp` / `@message`-style field names resolve like columns. */
  private def resolve(name: String): Column = col(name.stripPrefix("@"))

  /** Oracle-gated query: hourly error-ish volume by type through the
    * Insights dialect (events table standing in for a log group).
    * Measures pre-cast to decimal so the stats sums are exact and
    * order-independent; sort keys fully tiebroken so the limit cutoff is
    * deterministic cross-engine. */
  /** Oracle-gated `dedup` query: the most recent event per user —
    * CloudWatch's "latest state per key" idiom — through the dialect's
    * new dedup stage (one hash-partitioned window pass). */
  def lastEventQuery(s: SparkSession, dir: String): DataFrame = {
    val logs = Tables.events(s, dir).withColumnRenamed("ts", "timestamp")
    query(logs,
      """fields @timestamp, user_id, event_type, value
        | dedup user_id
        | sort user_id asc""".stripMargin)
      .select(col("user_id"),
        date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        col("event_type"), col("value"))
  }

  def lastEventOracle: String =
    """SELECT user_id,
      |  strftime(cast(ts as timestamp), '%Y-%m-%d %H:%M:%S') AS last_ts,
      |  event_type, value
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY cast(ts as timestamp) DESC, event_type ASC, value ASC)
      |    AS rn
      |  FROM events) t
      |WHERE rn = 1""".stripMargin

  def errorVolumeQuery(s: SparkSession, dir: String): DataFrame = {
    val logs = Tables.events(s, dir)
      .withColumnRenamed("ts", "timestamp")
      .withColumn("value", col("value").cast("decimal(10,2)"))
    query(logs,
      """fields @timestamp, event_type, value
        | filter event_type != 'view'
        | stats count(*) as n, sum(value) as sum_value by bin(1h), event_type
        | sort n desc, bin asc, event_type asc
        | limit 50""".stripMargin)
      .select(date_format(col("bin"), "yyyy-MM-dd HH:mm:ss").as("bin"),
        col("event_type"), col("n"),
        col("sum_value").cast("double").as("sum_value"))
  }

  def errorVolumeOracle: String =
    """SELECT strftime(time_bucket(INTERVAL '1 hour', cast(ts as timestamp)),
      |                '%Y-%m-%d %H:%M:%S') AS bin,
      |  event_type, count(*) AS n,
      |  cast(sum(cast(value as decimal(10,2))) as double) AS sum_value
      |FROM events
      |WHERE event_type <> 'view'
      |GROUP BY 1, 2
      |ORDER BY n DESC, 1, 2
      |LIMIT 50""".stripMargin
}
