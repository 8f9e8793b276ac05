package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.types.DbTypes

/** Per-engine DDL type matrix vs the reference's conversion tables
  * (`_data_types.py:71-285`): signed/unsigned widths, floats, decimals,
  * strings with varchar-length overrides, nested SUPER/array handling,
  * uint64 rejection — plus the runtime wiring through
  * [[graft.jdbc.JdbcOps.toSql]] creating the table with generated DDL. */
class DbTypesSpec extends AnyFunSuite {
  import TestSpark._

  private val V = "VARCHAR(256)"

  test("redshift mapping incl. nested->SUPER and varbyte") {
    val m = Map[DataType, String](
      ByteType -> "SMALLINT", ShortType -> "SMALLINT",
      IntegerType -> "INTEGER", LongType -> "BIGINT",
      FloatType -> "FLOAT4", DoubleType -> "FLOAT8",
      BooleanType -> "BOOL", StringType -> V,
      TimestampType -> "TIMESTAMP", DateType -> "DATE",
      BinaryType -> "VARBYTE", DecimalType(10, 2) -> "DECIMAL(10,2)",
      ArrayType(LongType) -> "SUPER",
      StructType(Seq(StructField("a", LongType))) -> "SUPER",
      MapType(StringType, LongType) -> "SUPER")
    m.foreach { case (dt, want) =>
      assert(DbTypes.render("redshift", dt, V) == want, dt.simpleString)
    }
  }

  test("mysql / postgresql / oracle / sqlserver / timestream mappings") {
    assert(DbTypes.render("mysql", ByteType, V) == "TINYINT")
    assert(DbTypes.render("mysql", DoubleType, V) == "DOUBLE PRECISION")
    assert(DbTypes.render("mysql", BinaryType, V) == "BLOB")
    intercept[IllegalArgumentException] {
      DbTypes.render("mysql", ArrayType(LongType), V) // no nested on MySQL
    }
    assert(DbTypes.render("postgresql", FloatType, V) == "FLOAT")
    assert(DbTypes.render("postgresql", BinaryType, V) == "BYTEA")
    assert(DbTypes.render("postgresql", ArrayType(IntegerType), V) ==
      "INTEGER[]")
    assert(DbTypes.render("oracle", ByteType, V) == "NUMBER(3)")
    assert(DbTypes.render("oracle", IntegerType, V) == "NUMBER(10)")
    assert(DbTypes.render("oracle", LongType, V) == "NUMBER(19)")
    assert(DbTypes.render("oracle", BooleanType, V) == "NUMBER(3)")
    assert(DbTypes.render("oracle", FloatType, V) == "BINARY_FLOAT")
    assert(DbTypes.render("oracle", DecimalType(12, 3), V) == "NUMBER(12,3)")
    assert(DbTypes.render("sqlserver", IntegerType, V) == "INT")
    assert(DbTypes.render("sqlserver", FloatType, V) == "FLOAT(24)")
    assert(DbTypes.render("sqlserver", BooleanType, V) == "BIT")
    assert(DbTypes.render("sqlserver", TimestampType, V) == "DATETIME2")
    assert(DbTypes.render("sqlserver", BinaryType, V) == "VARBINARY")
    assert(DbTypes.render("timestream", IntegerType, V) == "BIGINT")
    assert(DbTypes.render("timestream", FloatType, V) == "DOUBLE")
    assert(DbTypes.render("timestream", StringType, V) == "VARCHAR")
    intercept[IllegalArgumentException] {
      DbTypes.render("timestream", BinaryType, V) // no binary measures
    }
  }

  test("uint widening per engine; uint64 rejected except mysql/timestream") {
    assert(DbTypes.renderArrow("redshift", "uint8", V) == "SMALLINT")
    assert(DbTypes.renderArrow("redshift", "uint16", V) == "INTEGER")
    assert(DbTypes.renderArrow("redshift", "uint32", V) == "BIGINT")
    intercept[IllegalArgumentException] {
      DbTypes.renderArrow("redshift", "uint64", V)
    }
    assert(DbTypes.renderArrow("mysql", "uint8", V) == "UNSIGNED TINYINT")
    assert(DbTypes.renderArrow("mysql", "uint64", V) == "UNSIGNED BIGINT")
    assert(DbTypes.renderArrow("oracle", "uint16", V) == "NUMBER(10)")
    assert(DbTypes.renderArrow("sqlserver", "uint32", V) == "BIGINT")
    assert(DbTypes.renderArrow("timestream", "uint64", V) == "BIGINT")
    intercept[IllegalArgumentException] {
      DbTypes.renderArrow("postgresql", "uint64", V)
    }
    // signed names route through the Spark-type table
    assert(DbTypes.renderArrow("redshift", "int32", V) == "INTEGER")
    assert(DbTypes.renderArrow("postgresql", "double", V) == "FLOAT8")
  }

  test("varchar-length override priority: per-column > default; string default allowed") {
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", StringType),
      StructField("c", LongType)))
    val types = DbTypes.databaseTypes(schema, "redshift",
      varcharLengthsDefault = Left(512),
      varcharLengths = Map("b" -> 32)).toMap
    assert(types("a") == "VARCHAR(512)")
    assert(types("b") == "VARCHAR(32)")
    assert(types("c") == "BIGINT")
    // a string default ("TEXT") is used literally
    val t2 = DbTypes.databaseTypes(schema, "postgresql",
      varcharLengthsDefault = Right("TEXT")).toMap
    assert(t2("a") == "TEXT")
    // explicit dtype override wins over everything
    val t3 = DbTypes.databaseTypes(schema, "redshift",
      dtype = Map("a" -> "VARCHAR(MAX)")).toMap
    assert(t3("a") == "VARCHAR(MAX)")
  }

  test("toSql(engine=...) creates the table from generated DDL, then appends") {
    val spark0 = spark
    import spark0.implicits._
    val url = "jdbc:derby:memory:graftdbtypes;create=true"
    // postgres renderings for long/string/date are Derby-valid, so the
    // generated CREATE TABLE executes for real here
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "name")
    jdbc.JdbcOps.toSql(df, url, "typed_t", mode = "append",
      engine = Some("postgresql"), varcharLengths = Map("name" -> 64))
    val back = jdbc.JdbcOps.readSqlQuery(spark, url,
      "SELECT * FROM typed_t")
    assert(back.count() == 2)
    // append into the existing engine-typed table keeps working
    jdbc.JdbcOps.toSql(Seq((3L, "z")).toDF("id", "name"), url, "typed_t",
      mode = "append", engine = Some("postgresql"))
    assert(jdbc.JdbcOps.readSqlQuery(spark, url,
      "SELECT * FROM typed_t").count() == 3)
    // overwrite with engine drops and recreates
    jdbc.JdbcOps.toSql(Seq((9L, "w")).toDF("id", "name"), url, "typed_t",
      mode = "overwrite", engine = Some("postgresql"))
    assert(jdbc.JdbcOps.readSqlQuery(spark, url,
      "SELECT * FROM typed_t").count() == 1)
  }
}
