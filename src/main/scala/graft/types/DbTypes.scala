package graft.types

import org.apache.spark.sql.types._

/** Per-engine database DDL type rendering — the reference's
  * `_data_types.py:71-285` conversion tables (`pyarrow2redshift`,
  * `pyarrow2mysql`, `pyarrow2postgresql`, `pyarrow2oracle`,
  * `pyarrow2sqlserver`, `pyarrow2timestream`) plus the
  * varchar-length-override resolution of
  * `database_types_from_pandas` (`_data_types.py:819-847`).
  * [[graft.jdbc.JdbcOps.toSql]] uses these to create tables with
  * engine-correct column types instead of Spark's default JDBC DDL —
  * without them a Redshift `to_sql` of a nested column loses SUPER, an
  * Oracle write gets wrong numeric widths, etc.
  *
  * Two entry points: [[render]] maps a Spark `DataType`; [[renderArrow]]
  * maps an Arrow-style type NAME (`"int32"`, `"uint16"`, …) so unsigned
  * widths widen exactly as the reference prescribes (Spark itself has no
  * unsigned types; readers of uint parquet surface them through names).
  */
object DbTypes {

  val Engines: Set[String] =
    Set("redshift", "mysql", "postgresql", "oracle", "sqlserver", "timestream")

  private def unsupported(engine: String, what: String): Nothing =
    throw new IllegalArgumentException(s"Unsupported $engine type: $what")

  /** Engine DDL for a Spark type. `stringType` is the already-resolved
    * string rendering (`VARCHAR(n)` / `TEXT`) — see [[stringTypeFor]]. */
  def render(engine: String, dt: DataType, stringType: String): String = {
    def rec(d: DataType): String = render(engine, d, stringType)
    engine match {
      case "redshift" => dt match {
        case ByteType | ShortType => "SMALLINT"
        case IntegerType => "INTEGER"
        case LongType => "BIGINT"
        case FloatType => "FLOAT4"
        case DoubleType => "FLOAT8"
        case BooleanType => "BOOL"
        case StringType => stringType
        case TimestampType | TimestampNTZType => "TIMESTAMP"
        case DateType => "DATE"
        case BinaryType => "VARBYTE"
        case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
        case _: ArrayType | _: StructType | _: MapType => "SUPER"
        case other => unsupported(engine, other.simpleString)
      }
      case "mysql" => dt match {
        case ByteType => "TINYINT"
        case ShortType => "SMALLINT"
        case IntegerType => "INTEGER"
        case LongType => "BIGINT"
        case FloatType => "FLOAT"
        case DoubleType => "DOUBLE PRECISION"
        case BooleanType => "BOOLEAN"
        case StringType => stringType
        case TimestampType | TimestampNTZType => "TIMESTAMP"
        case DateType => "DATE"
        case BinaryType => "BLOB"
        case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
        case other => unsupported(engine, other.simpleString)
      }
      case "postgresql" => dt match {
        case ByteType | ShortType => "SMALLINT"
        case IntegerType => "INTEGER"
        case LongType => "BIGINT"
        case FloatType => "FLOAT"
        case DoubleType => "FLOAT8"
        case BooleanType => "BOOL"
        case StringType => stringType
        case TimestampType | TimestampNTZType => "TIMESTAMP"
        case DateType => "DATE"
        case BinaryType => "BYTEA"
        case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
        case a: ArrayType => rec(a.elementType) + "[]"
        case other => unsupported(engine, other.simpleString)
      }
      case "oracle" => dt match {
        case ByteType => "NUMBER(3)"
        case ShortType => "NUMBER(5)"
        case IntegerType => "NUMBER(10)"
        case LongType => "NUMBER(19)"
        case FloatType => "BINARY_FLOAT"
        case DoubleType => "BINARY_DOUBLE"
        case BooleanType => "NUMBER(3)"
        case StringType => stringType
        case TimestampType | TimestampNTZType => "TIMESTAMP"
        case DateType => "DATE"
        case BinaryType => "BLOB"
        case d: DecimalType => s"NUMBER(${d.precision},${d.scale})"
        case other => unsupported(engine, other.simpleString)
      }
      case "sqlserver" => dt match {
        case ByteType | ShortType => "SMALLINT"
        case IntegerType => "INT"
        case LongType => "BIGINT"
        case FloatType => "FLOAT(24)"
        case DoubleType => "FLOAT"
        case BooleanType => "BIT"
        case StringType => stringType
        case TimestampType | TimestampNTZType => "DATETIME2"
        case DateType => "DATE"
        case BinaryType => "VARBINARY"
        case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
        case other => unsupported(engine, other.simpleString)
      }
      case "timestream" => dt match {
        case ByteType | ShortType | IntegerType | LongType => "BIGINT"
        case FloatType | DoubleType => "DOUBLE"
        case BooleanType => "BOOLEAN"
        case StringType => "VARCHAR"
        case DateType => "DATE"
        case TimestampType | TimestampNTZType => "TIMESTAMP"
        case other => unsupported(engine, other.simpleString)
      }
      case other =>
        throw new IllegalArgumentException(s"unknown database engine: $other")
    }
  }

  /** Arrow-type-name rendering — adds the unsigned widths the reference
    * handles (`uint8` widens to the next signed type per engine; `uint64`
    * is rejected everywhere except MySQL's native UNSIGNED BIGINT and
    * Timestream's lossy BIGINT, exactly as `_data_types.py` does). */
  def renderArrow(engine: String, arrowName: String,
      stringType: String): String = {
    def noUint64(): Nothing = throw new IllegalArgumentException(
      "There is no support for uint64, please consider int64 or uint32.")
    (engine, arrowName) match {
      case ("mysql", "uint8") => "UNSIGNED TINYINT"
      case ("mysql", "uint16") => "UNSIGNED SMALLINT"
      case ("mysql", "uint32") => "UNSIGNED INTEGER"
      case ("mysql", "uint64") => "UNSIGNED BIGINT"
      case ("timestream", "uint8" | "uint16" | "uint32" | "uint64") => "BIGINT"
      case (_, "uint64") => noUint64()
      // unsigned widens to the signed type one step up
      case (e, "uint8") => render(e, ShortType, stringType)
      case (e, "uint16") => render(e, IntegerType, stringType)
      case (e, "uint32") => render(e, LongType, stringType)
      case (e, name) => render(e, parseArrowName(name), stringType)
    }
  }

  private def parseArrowName(name: String): DataType = name match {
    case "int8" => ByteType
    case "int16" => ShortType
    case "int32" => IntegerType
    case "int64" => LongType
    case "float" | "float32" => FloatType
    case "double" | "float64" => DoubleType
    case "bool" | "boolean" => BooleanType
    case "string" | "large_string" | "utf8" => StringType
    case "timestamp" => TimestampType
    case "date" | "date32" | "date64" => DateType
    case "binary" | "large_binary" => BinaryType
    case d if d.startsWith("decimal") => DataType.fromDDL(d) match {
      case dt: DecimalType => dt
      case _ => throw new IllegalArgumentException(s"bad decimal: $d")
    }
    case other => throw new IllegalArgumentException(s"unknown arrow type: $other")
  }

  /** String rendering for one column after override resolution — the
    * reference's priority: per-column `varchar_lengths`, then the default
    * (an int renders `VARCHAR(n)`; a string like `"TEXT"` is literal). */
  def stringTypeFor(colName: String, varcharLengthsDefault: Either[Int, String],
      varcharLengths: Map[String, Int]): String =
    varcharLengths.get(colName).map(n => s"VARCHAR($n)")
      .getOrElse(varcharLengthsDefault match {
        case Left(n) => s"VARCHAR($n)"
        case Right(literal) => literal
      })

  /** `database_types_from_pandas`: column → engine DDL type, with
    * explicit `dtype` overrides winning over inference. */
  def databaseTypes(schema: StructType, engine: String,
      dtype: Map[String, String] = Map.empty,
      varcharLengthsDefault: Either[Int, String] = Left(256),
      varcharLengths: Map[String, Int] = Map.empty): Seq[(String, String)] =
    schema.fields.toSeq.map { f =>
      f.name -> dtype.getOrElse(f.name,
        render(engine, f.dataType,
          stringTypeFor(f.name, varcharLengthsDefault, varcharLengths)))
    }

  /** CREATE TABLE statement in the engine's dialect. */
  def createTableDdl(table: String, schema: StructType, engine: String,
      dtype: Map[String, String] = Map.empty,
      varcharLengthsDefault: Either[Int, String] = Left(256),
      varcharLengths: Map[String, Int] = Map.empty): String = {
    val cols = databaseTypes(schema, engine, dtype, varcharLengthsDefault,
      varcharLengths).map { case (n, t) => s"\"$n\" $t" }
    s"CREATE TABLE $table (${cols.mkString(", ")})"
  }
}
