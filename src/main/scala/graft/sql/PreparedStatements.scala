package graft.sql

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.types.AthenaTypes

/** Prepared / named statements — `athena.create_prepared_statement` /
  * `delete_prepared_statement` / `list_prepared_statements` /
  * `get_named_query_statement` (`athena/_statements.py`,
  * `athena/_utils.py:545-583`): named SQL templates executed later with
  * server-side parameter binding, plus `get_query_columns_types`
  * (result-schema introspection without execution — Catalyst analyzes
  * the plan, no job runs).
  */
object PreparedStatements {

  private val statements = TrieMap.empty[String, String]

  def createPreparedStatement(name: String, sql: String,
      replace: Boolean = false): Unit = {
    if (!replace && statements.contains(name))
      throw new IllegalArgumentException(s"prepared statement exists: $name")
    statements.put(name, sql)
  }

  def deletePreparedStatement(name: String): Unit = statements.remove(name)

  def listPreparedStatements(): Seq[String] = statements.keys.toSeq.sorted

  def getNamedQueryStatement(name: String): String =
    statements.getOrElse(name,
      throw new IllegalArgumentException(s"no prepared statement: $name"))

  /** Execute a prepared statement with bound parameters (server-side
    * binding through [[SqlEngine.readSqlQuery]]). */
  def execute(spark: SparkSession, name: String,
      params: Map[String, Any] = Map.empty): DataFrame =
    SqlEngine.readSqlQuery(spark, getNamedQueryStatement(name), params)

  /** `get_query_columns_types`: column → Athena type name of a query's
    * result, from analysis only (the query is never executed). */
  def getQueryColumnsTypes(spark: SparkSession, sql: String,
      params: Map[String, Any] = Map.empty): Map[String, String] = {
    val df = SqlEngine.readSqlQuery(spark, sql, params)
    df.schema.fields.map(f => f.name -> AthenaTypes.toAthena(f.dataType)).toMap
  }
}
