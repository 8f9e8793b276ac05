package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.types.AthenaTypes

/** Glue-catalog surface of the reference (`catalog/_create.py`,
  * `catalog/_get.py`, `catalog/_add.py`, `catalog/_delete.py`) over
  * Spark's `SessionCatalog`. Operations are DDL statements so they work
  * against any configured metastore (in-memory, Hive, or a lakehouse
  * catalog at scale).
  */
object Catalog {

  def createDatabase(spark: SparkSession, name: String,
      ifNotExists: Boolean = true): Unit =
    spark.sql(s"CREATE DATABASE ${ine(ifNotExists)} `$name`")

  def deleteDatabase(spark: SparkSession, name: String,
      cascade: Boolean = true): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS `$name` ${if (cascade) "CASCADE" else ""}")

  def databases(spark: SparkSession): DataFrame =
    spark.sql("SHOW DATABASES")

  /** `catalog.tables` — table inventory as a DataFrame, with the
    * reference's name filters (`catalog/_get.py:219-474`:
    * `name_contains` / `name_prefix` / `name_suffix`). */
  def tables(spark: SparkSession, database: Option[String] = None,
      nameContains: Option[String] = None,
      namePrefix: Option[String] = None,
      nameSuffix: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val base = database.map(d => spark.sql(s"SHOW TABLES IN `$d`"))
      .getOrElse(spark.sql("SHOW TABLES"))
    Seq(
      nameContains.map(s => col("tableName").contains(s)),
      namePrefix.map(s => col("tableName").startsWith(s)),
      nameSuffix.map(s => col("tableName").endsWith(s))
    ).flatten.foldLeft(base)(_ filter _)
  }

  /** `catalog.search_tables(text)`: substring match over table names. */
  def searchTables(spark: SparkSession, text: String,
      database: Option[String] = None): DataFrame =
    tables(spark, database, nameContains = Some(text))

  /** `catalog.create_parquet_table` (`catalog/_create.py`): external
    * path-backed table with optional hive partitions. */
  def createParquetTable(
      spark: SparkSession,
      table: String,
      location: String,
      columns: Seq[(String, String)],
      partitionCols: Seq[(String, String)] = Nil,
      format: String = "parquet",
      ifNotExists: Boolean = true): Unit = {
    // all columns (data + partition) in the column list; PARTITIONED BY
    // names only — Spark's USING-table syntax
    val cols = (columns ++ partitionCols)
      .map { case (n, t) => s"`$n` ${AthenaTypes.fromAthena(t).sql}" }
      .mkString(", ")
    val part =
      if (partitionCols.nonEmpty)
        partitionCols.map(c => s"`${c._1}`")
          .mkString(" PARTITIONED BY (", ", ", ")")
      else ""
    spark.sql(
      s"CREATE TABLE ${ine(ifNotExists)} $table ($cols) USING $format$part" +
        s" LOCATION '$location'")
  }

  /** `catalog.add_parquet_partitions` (`catalog/_add.py`). */
  def addPartitions(spark: SparkSession, table: String,
      partitions: Seq[Map[String, String]]): Unit =
    partitions.foreach { p =>
      val spec = p.map { case (k, v) => s"`$k`='$v'" }.mkString(", ")
      spark.sql(s"ALTER TABLE $table ADD IF NOT EXISTS PARTITION ($spec)")
    }

  /** `athena.repair_table` → MSCK (`athena/_utils.py:526-599`). */
  def repairTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"MSCK REPAIR TABLE $table")

  def deletePartitions(spark: SparkSession, table: String,
      partitions: Seq[Map[String, String]]): Unit =
    partitions.foreach { p =>
      val spec = p.map { case (k, v) => s"`$k`='$v'" }.mkString(", ")
      spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION ($spec)")
    }

  def getPartitions(spark: SparkSession, table: String): DataFrame =
    spark.sql(s"SHOW PARTITIONS $table")

  /** `catalog.get_table_types` (`catalog/_get.py:475-520`): column →
    * Athena DDL type map. */
  def getTableTypes(spark: SparkSession, table: String): Map[String, String] =
    spark.table(table).schema.fields
      .map(f => f.name -> AthenaTypes.toAthena(f.dataType)).toMap

  /** `catalog.upsert_table_parameters` → TBLPROPERTIES
    * (`catalog/_get.py:768-803`). */
  def upsertTableParameters(spark: SparkSession, table: String,
      params: Map[String, String]): Unit = {
    val kv = params.map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES ($kv)")
  }

  def getTableParameters(spark: SparkSession, table: String)
      : Map[String, String] = {
    import spark.implicits._
    spark.sql(s"SHOW TBLPROPERTIES $table").as[(String, String)].collect().toMap
  }

  /** `athena.show_create_table` (`athena/_utils.py:936-1011`). */
  def showCreateTable(spark: SparkSession, table: String): String = {
    import spark.implicits._
    spark.sql(s"SHOW CREATE TABLE $table").as[String].head()
  }

  /** `athena.generate_create_query` (`athena/_utils.py:1015-1096`):
    * render a CREATE TABLE statement from schema + layout without
    * touching the metastore. */
  def generateCreateQuery(
      table: String,
      columns: Seq[(String, String)],
      partitionCols: Seq[(String, String)] = Nil,
      location: String = "",
      format: String = "parquet"): String = {
    val cols = (columns ++ partitionCols)
      .map { case (n, t) => s"  `$n` ${AthenaTypes.fromAthena(t).sql}" }
      .mkString(",\n")
    val part =
      if (partitionCols.nonEmpty)
        partitionCols.map(c => s"`${c._1}`")
          .mkString("\nPARTITIONED BY (", ", ", ")")
      else ""
    val loc = if (location.nonEmpty) s"\nLOCATION '$location'" else ""
    s"CREATE TABLE $table (\n$cols\n)\nUSING $format$part$loc"
  }

  /** `catalog.add_column` (`catalog/_add.py`): append a column to a
    * table's schema (existing files read it as NULL — parquet
    * schema-evolution semantics). */
  def addColumn(spark: SparkSession, table: String, name: String,
      athenaType: String, comment: Option[String] = None): Unit = {
    val c = comment.map(x => s" COMMENT '${x.replace("'", "''")}'")
      .getOrElse("")
    spark.sql(s"ALTER TABLE $table ADD COLUMNS (`$name` $athenaType$c)")
  }

  /** `catalog.get_table_location`: the storage path backing a table. */
  def getTableLocation(spark: SparkSession, table: String): String =
    spark.sql(s"DESCRIBE FORMATTED $table")
      .filter(org.apache.spark.sql.functions.col("col_name") === "Location")
      .select("data_type").head().getString(0)

  /** `catalog.get_columns_comments`. */
  def getColumnsComments(spark: SparkSession, table: String)
      : Map[String, String] = {
    import org.apache.spark.sql.functions.col
    spark.sql(s"DESCRIBE TABLE $table")
      .filter(!col("col_name").startsWith("#") && col("col_name") =!= "")
      .select("col_name", "comment").collect()
      .map(r => r.getString(0) -> Option(r.getString(1)).getOrElse(""))
      .toMap
  }

  def doesTableExist(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)

  def deleteTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")

  private def ine(b: Boolean) = if (b) "IF NOT EXISTS" else ""
}
