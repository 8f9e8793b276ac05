package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

import graft.io.{DeltaLogReader, DeltaLogWriter, IcebergReader, IcebergWriter}

/** Athena's table-format DML statements — `MERGE INTO`, `UPDATE`,
  * `DELETE FROM` (the engine-v3 Iceberg DML surface the reference
  * drives through `athena.start_query_execution` /
  * `read_sql_query`) — compiled onto the format writers instead of a
  * server: predicates and assignment expressions parse through
  * Catalyst (`expr`), and the execution is the writers' ZERO-REWRITE
  * paths (position deletes / deletion vectors, single-commit UPDATE,
  * partition-granular MERGE). Table names resolve through an explicit
  * name→path registry; a MERGE source is any SQL the session can run
  * (temp views included).
  *
  * Grammar (case-insensitive):
  *   DELETE FROM t WHERE <predicate>
  *   UPDATE t SET c = <expr> [, c2 = <expr>…] WHERE <predicate>
  *   MERGE INTO t USING (<query>) [AS] s ON t.k = s.k [AND …]
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  * Anything else raises — never a silent partial parse.
  */
object TableDml {

  private val InsertRe =
    """(?is)\s*INSERT\s+INTO\s+([\w.]+)\s+(SELECT\s+.+?|VALUES\s+.+?)\s*;?\s*""".r
  private val DeleteRe =
    """(?is)\s*DELETE\s+FROM\s+([\w.]+)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val UpdateRe =
    """(?is)\s*UPDATE\s+([\w.]+)\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val MergeRe =
    ("""(?is)\s*MERGE\s+INTO\s+([\w.]+)(?:\s+AS)?(?:\s+(\w+))?\s+""" +
      """USING\s+\((.+)\)\s*(?:AS\s+)?(\w+)\s+ON\s+(.+?)\s+""" +
      """WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+""" +
      """WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*""").r

  final case class Result(operation: String, table: String)

  def execute(spark: SparkSession, sql: String,
      tables: Map[String, String]): Result = sql match {
    case InsertRe(t, body) =>
      val path = pathOf(tables, t)
      // VALUES renders through a SELECT so types resolve identically;
      // the incoming frame aligns to the table schema by NAME for a
      // SELECT and by POSITION for bare VALUES
      val src0 = spark.sql(
        if (body.trim.toUpperCase.startsWith("VALUES")) s"SELECT * FROM ($body)"
        else body)
      route(spark, path,
        ice = {
          val schema = IcebergReader.tableInfo(spark, path)._1
          IcebergWriter.write(aligned(src0, schema), path)
        },
        delta = {
          val schema = DeltaLogReader.snapshot(spark, path).schema
          DeltaLogWriter.write(aligned(src0, schema), path)
        })
      Result("INSERT", t)
    case DeleteRe(t, pred) =>
      val path = pathOf(tables, t)
      route(spark, path,
        ice = IcebergWriter.deleteWhere(spark, path, expr(pred)),
        delta = DeltaLogWriter.deleteWhere(spark, path, expr(pred)))
      Result("DELETE", t)
    case UpdateRe(t, setList, pred) =>
      val path = pathOf(tables, t)
      val assignments = splitTop(setList).map { a =>
        val i = a.indexOf('=')
        require(i > 0, s"malformed assignment '$a'")
        a.take(i).trim -> expr(a.drop(i + 1).trim)
      }
      route(spark, path,
        ice = IcebergWriter.updateWhere(spark, path, expr(pred), assignments),
        delta = DeltaLogWriter.updateWhere(spark, path, expr(pred),
          assignments))
      Result("UPDATE", t)
    case MergeRe(t, tAliasOpt, srcQuery, sAlias, onCond) =>
      val path = pathOf(tables, t)
      val tAlias = Option(tAliasOpt).getOrElse(t)
      val keys = parseMergeKeys(onCond, tAlias, sAlias)
      val src = spark.sql(srcQuery)
      route(spark, path,
        ice = IcebergWriter.merge(spark, path, src, keys),
        delta = DeltaLogWriter.merge(spark, path, src, keys))
      Result("MERGE", t)
    case other =>
      throw new IllegalArgumentException(
        s"unsupported DML statement (DELETE FROM / UPDATE / MERGE INTO " +
          s"with UPDATE SET * + INSERT *): ${other.take(120)}")
  }

  /** Align an INSERT source to the table schema: by NAME when the
    * names match, by POSITION otherwise (the bare-VALUES case, whose
    * synthesized col1/col2 names mean nothing). */
  private def aligned(src: DataFrame, schema: org.apache.spark.sql.types.StructType): DataFrame = {
    require(src.schema.length == schema.length,
      s"INSERT arity ${src.schema.length} != table's ${schema.length}")
    val byName = schema.fieldNames.forall(src.schema.fieldNames.contains)
    val picked =
      if (byName) src.select(schema.fieldNames.map(src(_)).toSeq: _*)
      else src
    picked.toDF(schema.fieldNames.toSeq: _*)
      .select(schema.fields.map(f =>
        org.apache.spark.sql.functions.col(f.name)
          .cast(f.dataType).as(f.name)).toSeq: _*)
  }

  private def pathOf(tables: Map[String, String], name: String): String =
    tables.getOrElse(name, tables.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(
        s"table $name not registered (known: ${tables.keys.mkString(", ")})")))

  private def route(spark: SparkSession, path: String,
      ice: => Any, delta: => Any): Unit =
    if (IcebergReader.isIcebergTable(spark, path)) { ice; () }
    else if (DeltaLogReader.latestVersion(spark, path) >= 0) { delta; () }
    else throw new IllegalArgumentException(
      s"no Iceberg or Delta table at $path")

  /** The equality key columns of `ON t.k = s.k AND …` — both sides must
    * reference the same column name through their aliases; anything
    * fancier raises. */
  private[sql] def parseMergeKeys(cond: String, tAlias: String,
      sAlias: String): Seq[String] = {
    val EqRe = """(?i)\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*""".r
    cond.split("(?i)\\s+AND\\s+").toSeq.map {
      case EqRe(a1, c1, a2, c2) =>
        val byAlias = Map(a1.toLowerCase -> c1, a2.toLowerCase -> c2)
        val tc = byAlias.getOrElse(tAlias.toLowerCase,
          throw new IllegalArgumentException(
            s"ON condition must reference $tAlias: $cond"))
        val sc = byAlias.getOrElse(sAlias.toLowerCase,
          throw new IllegalArgumentException(
            s"ON condition must reference $sAlias: $cond"))
        require(tc.equalsIgnoreCase(sc),
          s"MERGE key must join the same column on both sides, got $tc/$sc")
        tc
      case other => throw new IllegalArgumentException(
        s"unsupported ON conjunct (need alias.col = alias.col): $other")
    }
  }

  /** Split a comma list at the TOP level only (commas inside parens or
    * quotes belong to function calls / literals). */
  private[sql] def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    s.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' => quote = c; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
