package graft.io

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg partition transforms (iceberg.apache.org/spec §Partition
  * Transforms; the reference accepts them in `to_iceberg`'s
  * `partition_cols`, `athena/_write_iceberg.py:269-281`):
  *
  *   - `identity` — the column value;
  *   - `bucket[N]` — `(murmur3(v) & Int.MaxValue) % N`
  *     ([[graft.expr.IcebergBucketHash]]; NOT the Athena/Hive hash);
  *   - `year`/`month`/`day`/`hour` — whole periods since 1970-01-01 UTC
  *     (day renders as a DATE so partition paths read naturally, the
  *     others as ints, matching Iceberg's own path rendering).
  *
  * Timestamp arithmetic happens on `unix_micros` (timezone-free), not on
  * session-zone field extraction, so a cluster running in any timezone
  * produces the UTC-defined partition values the spec requires. Exact up
  * to |micros| < 2^53 (~year 2255) — the double floor below is
  * bit-exact in that range.
  */
object IcebergTransforms {

  /** One partition-spec field: `name` is the spec field name
    * (`ts_day`, `id_bucket`), `transform` the spec string
    * (`day`, `bucket[4]`, `identity`), `source` the schema column. */
  final case class PartitionField(name: String, transform: String, source: String)

  private val BucketSpec = """bucket\s*\(\s*(\d+)\s*,\s*([^)]+)\)""".r
  private val UnarySpec = """(year|month|day|hour)\s*\(\s*([^)]+)\)""".r
  private val BucketTransform = """bucket\[(\d+)\]""".r

  /** Parse a user-facing partition spec entry (`"day(ts)"`,
    * `"bucket(4, id)"`, or a bare column name = identity). */
  def parse(spec: String): PartitionField = spec.trim match {
    case BucketSpec(n, c) =>
      PartitionField(s"${c.trim}_bucket", s"bucket[${n.toInt}]", c.trim)
    case UnarySpec(t, c) => PartitionField(s"${c.trim}_$t", t, c.trim)
    case c => PartitionField(c, "identity", c)
  }

  def isIdentity(f: PartitionField): Boolean = f.transform == "identity"

  /** The transform as a Column over the source column (evaluated at
    * write time to route rows into partition directories, and at merge
    * time to find touched partitions). */
  def column(spark: SparkSession, f: PartitionField, dt: DataType): Column =
    columnOf(spark, f, dt, col(f.source))

  /** The transform over an arbitrary source Column — the literal form
    * serves read-time partition pruning (transform a filter value once,
    * compare against manifest partition values). */
  def columnOf(spark: SparkSession, f: PartitionField, dt: DataType,
      src: Column): Column = {
    f.transform match {
      case "identity" => src
      case BucketTransform(n) =>
        graft.expr.IcebergBucketHash.register(spark)
        (call_function("iceberg_bucket_hash", src)
          .bitwiseAND(lit(Int.MaxValue)) % lit(n.toInt)).cast(IntegerType)
      case "day" => dt match {
        case DateType => src
        case TimestampType | TimestampNTZType =>
          date_add(lit(java.sql.Date.valueOf("1970-01-01")), epochDays(src))
        case other => unsupported(f, other)
      }
      case "hour" => dt match {
        case TimestampType | TimestampNTZType =>
          floor(unix_micros(src) / lit(3600000000.0)).cast(IntegerType)
        case other => unsupported(f, other)
      }
      case "month" => monthsFromEpoch(dateOf(f, src, dt))
      case "year" => (year(dateOf(f, src, dt)) - lit(1970)).cast(IntegerType)
      case other => throw new IllegalArgumentException(
        s"unsupported Iceberg transform: $other")
    }
  }

  /** Evaluate the transform of one literal value on the driver (a 1-row
    * local projection — read-setup cost, never a distributed job).
    * Returns the transformed value (Date for `day`, Int otherwise). */
  def applyToLiteral(spark: SparkSession, f: PartitionField, dt: DataType,
      value: Any): Option[Any] =
    try {
      val c = columnOf(spark, f, dt, lit(value).cast(dt))
      Option(spark.range(1).select(c.as("v")).head.get(0))
    } catch { case _: Exception => None }

  private def dateOf(f: PartitionField, src: Column, dt: DataType): Column =
    dt match {
      case DateType => src
      case TimestampType | TimestampNTZType =>
        date_add(lit(java.sql.Date.valueOf("1970-01-01")), epochDays(src))
      case other => unsupported(f, other)
    }

  /** Whole days since epoch, floor semantics (UTC, timezone-free). */
  private def epochDays(ts: Column): Column =
    floor(unix_micros(ts) / lit(86400000000.0)).cast(IntegerType)

  private def monthsFromEpoch(d: Column): Column =
    ((year(d) - lit(1970)) * lit(12) + month(d) - lit(1)).cast(IntegerType)

  private def unsupported(f: PartitionField, dt: DataType): Nothing =
    throw new IllegalArgumentException(
      s"transform ${f.transform} not defined for ${dt.simpleString} (${f.source})")
}
