package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Key-value WRITE surface — the DynamoDB write API of the reference
  * (`dynamodb/_write.py:146-271` put_df / put_items with key-schema
  * upsert semantics, `_delete.py` delete_items, `_read.py`
  * execute_statement). A "put" replaces the whole item bearing the same
  * key; a delete removes by key. Both delegate to the staged-atomic
  * [[graft.table.MergeOps]] DML over the keyed dataset.
  *
  * Scale: the put path is one shuffle join on the key schema (source side
  * broadcast when small) + a staged rewrite of only the touched
  * partitions; `put_items` batches arbitrary driver-side items but the
  * merge itself is distributed — there is no per-item RPC loop.
  */
object KeyValueWrite {

  /** DynamoDB-style key schema: partition (hash) key + optional sort
    * (range) key. */
  final case class KeySchema(hashKey: String, rangeKey: Option[String] = None) {
    def cols: Seq[String] = hashKey +: rangeKey.toSeq
  }

  /** `put_df`: upsert every row of `df` into the keyed dataset —
    * matched keys are replaced whole, new keys inserted. */
  def putDf(df: DataFrame, tablePath: String, schema: KeySchema): Long =
    graft.table.MergeOps.upsert(df.sparkSession, tablePath, df,
      keys = schema.cols)

  /** `put_items`: driver-side item maps (attribute → value), written
    * through the same upsert path. Missing attributes become NULL; the
    * item set must cover the key schema. Values are coerced to the target
    * column's DataType through a Catalyst cast (a PartiQL integer literal
    * lands in an int, long, double or decimal column alike) rather than
    * relying on exact runtime-class match. */
  def putItems(
      spark: SparkSession,
      items: Seq[Map[String, Any]],
      tablePath: String,
      schema: KeySchema): Long = {
    require(items.nonEmpty, "put_items requires at least one item")
    items.foreach(i => require(
      schema.cols.forall(c => i.get(c).exists(_ != null)),
      s"item missing key attributes ${schema.cols}: $i"))
    val target = spark.read.parquet(tablePath)
    val loose = org.apache.spark.sql.types.StructType(
      target.schema.fields.map(f => org.apache.spark.sql.types
        .StructField(f.name, org.apache.spark.sql.types.StringType)))
    val rows = items.map { m =>
      Row.fromSeq(target.schema.fields.toSeq.map(f =>
        m.get(f.name).flatMap(Option(_)).map(_.toString).orNull))
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), loose)
      .select(target.schema.fields.toSeq.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
    putDf(df, tablePath, schema)
  }

  /** `put_csv` / `put_json` (`dynamodb/_write.py:38-143`): file →
    * keyed-table upsert through the same merge path. */
  def putCsv(spark: SparkSession, csvPath: String, tablePath: String,
      schema: KeySchema, options: Map[String, String] = Map.empty): Long =
    putDf(graft.io.DatasetReader.readCsv(spark, csvPath, options = options),
      tablePath, schema)

  def putJson(spark: SparkSession, jsonPath: String, tablePath: String,
      schema: KeySchema, lines: Boolean = true): Long =
    putDf(graft.io.DatasetReader.readJson(spark, jsonPath, lines),
      tablePath, schema)

  /** `delete_items`: remove items by key. */
  def deleteItems(
      spark: SparkSession,
      keys: Seq[Map[String, Any]],
      tablePath: String,
      schema: KeySchema): Long = {
    val keyRows = keys.map(m =>
      Row.fromSeq(schema.cols.map(c => Option(m(c)).map(_.toString).orNull)))
    val target = spark.read.parquet(tablePath)
    val loose = org.apache.spark.sql.types.StructType(
      schema.cols.map(c => org.apache.spark.sql.types
        .StructField(c, org.apache.spark.sql.types.StringType)))
    val keyDf = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(keyRows).asJava), loose)
      .select(schema.cols.map(c =>
        col(c).cast(target.schema(c).dataType).as(c)): _*)
    graft.table.MergeOps.deleteMatched(spark, tablePath, keyDf, schema.cols)
  }

  /** `execute_statement` — the PartiQL entry point. SELECTs run through
    * Catalyst against the registered table view; INSERT/DELETE map onto
    * the keyed write path (PartiQL `VALUE {…}` items and key-equality
    * WHERE clauses, the forms DynamoDB itself accepts). */
  def executeStatement(
      spark: SparkSession,
      statement: String,
      tablePath: String,
      schema: KeySchema,
      view: String = "kv_table"): Option[DataFrame] = {
    val trimmed = statement.trim
    val upper = trimmed.toUpperCase
    if (upper.startsWith("SELECT")) {
      spark.read.parquet(tablePath).createOrReplaceTempView(view)
      Some(spark.sql(trimmed))
    } else if (upper.startsWith("INSERT")) {
      val ItemRe = "(?is)INSERT\\s+INTO\\s+\\S+\\s+VALUE\\s+(\\{.*\\})".r
      trimmed match {
        case ItemRe(json) =>
          putItems(spark, Seq(parseItem(json)), tablePath, schema); None
        case _ => throw new IllegalArgumentException(
          s"unsupported PartiQL INSERT form: $statement")
      }
    } else if (upper.startsWith("DELETE")) {
      val WhereRe = "(?is)DELETE\\s+FROM\\s+\\S+\\s+WHERE\\s+(.*)".r
      trimmed match {
        case WhereRe(cond) =>
          deleteItems(spark, Seq(parseKeyEqualities(cond)), tablePath, schema)
          None
        case _ => throw new IllegalArgumentException(
          s"unsupported PartiQL DELETE form: $statement")
      }
    } else throw new IllegalArgumentException(
      s"unsupported PartiQL statement: $statement")
  }

  /** Minimal PartiQL item literal: {'k': v, …} with string/number/bool
    * values (the attribute types the roundtrip needs; nested documents
    * are out of scope exactly as in the reference's typed writer). */
  private[ops] def parseItem(json: String): Map[String, Any] = {
    val body = json.trim.stripPrefix("{").stripSuffix("}")
    val Entry = "\\s*'([^']+)'\\s*:\\s*(.+)\\s*".r
    splitTop(body).map {
      case Entry(k, v) => k -> parseValue(v.trim)
      case other => throw new IllegalArgumentException(s"bad item entry: $other")
    }.toMap
  }

  private def parseValue(v: String): Any =
    if (v.startsWith("'")) v.stripPrefix("'").stripSuffix("'")
    else if (v.equalsIgnoreCase("true")) true
    else if (v.equalsIgnoreCase("false")) false
    else if (v.equalsIgnoreCase("null")) null
    else if (v.contains('.')) v.toDouble
    else v.toLong

  private def parseKeyEqualities(cond: String): Map[String, Any] =
    cond.split("(?i)\\s+AND\\s+").map { c =>
      val Array(k, v) = c.split("=", 2).map(_.trim)
      k.stripPrefix("\"").stripSuffix("\"") -> parseValue(v)
    }.toMap

  /** Split a PartiQL item body on top-level commas (quotes respected). */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    s.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case ',' if !inQuote => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  /** Oracle-gated end-to-end roundtrip: seed a keyed table from
    * `customer`, put updated + new items through the write path, read the
    * final state back. The oracle reconstructs the same final state from
    * the raw table — any divergence in the merge (lost update, stale row,
    * dropped insert) hash-mismatches. */
  def upsertRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.session.Scratch.dir("graft-kv-roundtrip")
    val base = Tables.customer(s, dir)
      .filter(col("c_custkey") <= 50L)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    graft.io.DatasetWriter.toParquet(base, tmp,
      mode = graft.io.DatasetWriter.Overwrite)
    val source = Tables.customer(s, dir)
      .filter(col("c_custkey") >= 40L && col("c_custkey") <= 60L)
      .select(col("c_custkey"), col("c_name"),
        (col("c_acctbal") + lit(1000.0)).as("c_acctbal"))
    putDf(source, tmp, KeySchema("c_custkey"))
    s.read.parquet(tmp)
  }

  def upsertRoundtripOracle: String =
    """SELECT c_custkey, c_name,
      |  CASE WHEN c_custkey >= 40 THEN c_acctbal + 1000.0 ELSE c_acctbal END
      |    AS c_acctbal
      |FROM customer WHERE c_custkey <= 60""".stripMargin
}
