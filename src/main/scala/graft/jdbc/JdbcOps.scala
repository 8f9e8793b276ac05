package graft.jdbc

import java.sql.DriverManager
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC database surface — the `postgresql/mysql/sqlserver/oracle/
  * redshift.read_sql_query / read_sql_table / to_sql` trio of the
  * reference (`postgresql.py:245-651` et al., shared core
  * `_databases.py:150-355`) on Spark's JDBC source. Engine-specific
  * wire details live in the JDBC URL/driver; the operator semantics —
  * query pushdown, partitioned parallel reads, mode-based writes, staged
  * upsert — are what this module provides.
  */
object JdbcOps {

  /** Connection registry — `get_connection` (`_databases.py:42-147`
    * resolves a named Glue connection to connectivity attributes). Names
    * map to a JDBC URL + driver options; `read_sql_*`/`to_sql` accept a
    * registered name through [[resolve]]. */
  final case class Connection(url: String,
      options: Map[String, String] = Map.empty)

  private val connections =
    scala.collection.concurrent.TrieMap.empty[String, Connection]

  def registerConnection(name: String, url: String,
      options: Map[String, String] = Map.empty): Unit =
    connections.put(name, Connection(url, options))

  def getConnection(name: String): Connection =
    connections.getOrElse(name,
      throw new IllegalArgumentException(s"no registered connection: $name"))

  def listConnections(): Seq[String] = connections.keys.toSeq.sorted

  /** A `urlOrName` argument: a registered connection name wins, anything
    * else is treated as a literal JDBC URL. */
  def resolve(urlOrName: String): Connection =
    connections.getOrElse(urlOrName, Connection(urlOrName))

  /** `read_sql_query`: run SQL on the database, results as a DataFrame.
    * The whole query executes remotely (pushdown by construction). */
  def readSqlQuery(spark: SparkSession, url: String, sql: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val conn = resolve(url)
    spark.read.format("jdbc")
      .option("url", conn.url)
      .option("query", sql)
      .options(conn.options ++ options)
      .load()
  }

  /** `read_sql_table`: full-table read; with `partitionColumn` bounds the
    * read fans out over numPartitions parallel range queries — the
    * reference's chunked cursor, distributed. */
  def readSqlTable(spark: SparkSession, url: String, table: String,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Int = 1,
      options: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
    val r = (partitionColumn, lowerBound, upperBound) match {
      case (Some(c), Some(lo), Some(hi)) =>
        base.option("partitionColumn", c)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", numPartitions)
      case _ => base
    }
    r.load()
  }

  /** `to_sql` with the reference's mode surface: append / overwrite /
    * upsert. Upsert stages the batch into a temp table and issues one
    * MERGE statement — the exact shape of the reference's staged upsert
    * (`redshift/_write.py:544-769`, `mysql.py upsert_duplicate_key`).
    *
    * `engine` selects the per-engine DDL type mapping
    * ([[graft.types.DbTypes]], reference `_data_types.py:71-285`): the
    * table is created with engine-correct column types (SUPER for nested
    * Redshift columns, NUMBER widths on Oracle, varchar-length
    * overrides…) before the rows land; without it Spark's default JDBC
    * DDL decides, which is wrong/lossy on non-default engines.
    */
  def toSql(df: DataFrame, url: String, table: String,
      mode: String = "append",
      upsertKeys: Seq[String] = Nil,
      options: Map[String, String] = Map.empty,
      engine: Option[String] = None,
      dtype: Map[String, String] = Map.empty,
      varcharLengthsDefault: Either[Int, String] = Left(256),
      varcharLengths: Map[String, Int] = Map.empty): Unit = mode match {
    case "append" =>
      engine.foreach(e => ensureTable(url, table, df, e, dtype,
        varcharLengthsDefault, varcharLengths, dropFirst = false))
      df.write.format("jdbc").option("url", url).option("dbtable", table)
        .options(options).mode(SaveMode.Append).save()
    case "overwrite" if engine.isDefined =>
      ensureTable(url, table, df, engine.get, dtype,
        varcharLengthsDefault, varcharLengths, dropFirst = true)
      df.write.format("jdbc").option("url", url).option("dbtable", table)
        .options(options).mode(SaveMode.Append).save()
    case "overwrite" =>
      df.write.format("jdbc").option("url", url).option("dbtable", table)
        .options(options).mode(SaveMode.Overwrite).save()
    case "upsert" =>
      require(upsertKeys.nonEmpty, "upsert requires key columns")
      val stage = s"${table}_stage_${System.nanoTime() % 1000000}"
      df.write.format("jdbc").option("url", url).option("dbtable", stage)
        .options(options).mode(SaveMode.Overwrite).save()
      // quote identifiers: Spark's JDBC writer creates case-sensitive
      // quoted column names; unquoted references would be case-folded
      val cols = df.columns
      def q(c: String) = "\"" + c + "\""
      val on = upsertKeys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
      val setters = cols.filterNot(upsertKeys.contains)
        .map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
      val insertCols = cols.map(q).mkString(", ")
      val insertVals = cols.map(c => s"s.${q(c)}").mkString(", ")
      executeStatement(url,
        s"""MERGE INTO $table t USING $stage s ON $on
           |WHEN MATCHED THEN UPDATE SET $setters
           |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin)
      executeStatement(url, s"DROP TABLE $stage")
    case other =>
      throw new IllegalArgumentException(s"unknown to_sql mode: $other")
  }

  /** Create `table` with engine-dialect DDL if absent (drop first for
    * overwrite). Existence is probed with a zero-row select — portable
    * across engines without information_schema dialect differences. */
  private def ensureTable(url: String, table: String, df: DataFrame,
      engine: String, dtype: Map[String, String],
      varcharLengthsDefault: Either[Int, String],
      varcharLengths: Map[String, Int], dropFirst: Boolean): Unit = {
    val exists =
      try { executeStatement(url, s"SELECT 1 FROM $table WHERE 1=0"); true }
      catch { case _: java.sql.SQLException => false }
    if (exists && dropFirst) executeStatement(url, s"DROP TABLE $table")
    if (!exists || dropFirst)
      executeStatement(url, graft.types.DbTypes.createTableDdl(
        table, df.schema, engine, dtype, varcharLengthsDefault, varcharLengths))
  }

  /** `redshift.copy_from_files` (`redshift/_write.py:254-543`): bulk-load
    * staged files into a warehouse table. The reference stages parquet on
    * S3 and issues COPY; here the same files are read distributed and
    * land through [[toSql]] — append/overwrite/upsert (COPY's
    * mode=upsert with `precombine` dedup handled by the staged MERGE). */
  def copyFromFiles(spark: SparkSession, paths: Seq[String], url: String,
      table: String, mode: String = "append",
      upsertKeys: Seq[String] = Nil, format: String = "parquet",
      engine: Option[String] = None): Unit = {
    val df = format match {
      case "parquet" => spark.read.parquet(paths: _*)
      case "csv" => spark.read.option("header", "true").csv(paths: _*)
      case other => throw new IllegalArgumentException(
        s"unsupported copy format: $other")
    }
    toSql(df, url, table, mode, upsertKeys, engine = engine)
  }

  /** `redshift.copy`: DataFrame → staged files → bulk load (one call). */
  def copy(df: DataFrame, stagingPath: String, url: String, table: String,
      mode: String = "append", upsertKeys: Seq[String] = Nil,
      engine: Option[String] = None): Unit = {
    df.write.mode("overwrite").parquet(stagingPath)
    copyFromFiles(df.sparkSession, Seq(stagingPath), url, table, mode,
      upsertKeys, engine = engine)
  }

  /** `redshift.unload_to_files` / `unload` (`redshift/_read.py`): run a
    * query on the warehouse, land the result as partitioned files, and
    * (for `unload`) read them back distributed. */
  def unloadToFiles(spark: SparkSession, url: String, sql: String,
      path: String, partitionBy: Seq[String] = Nil): Unit = {
    val df = readSqlQuery(spark, url, sql)
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  def unload(spark: SparkSession, url: String, sql: String,
      path: String, partitionBy: Seq[String] = Nil): DataFrame = {
    unloadToFiles(spark, url, sql, path, partitionBy)
    spark.read.option("basePath", path).parquet(path)
  }

  /** Raw DDL/DML passthrough (the `execute_statement` escape hatch). */
  def executeStatement(url: String, sql: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(sql) finally st.close()
    } finally conn.close()
  }
}
