package graft.io

import java.time.LocalDate
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** One conjunct of a file-pruning predicate for the external-format
  * readers — the Spark-side shape of the reference's `partitions`
  * filter tuples (`s3/_read_deltalake.py:41` `list[tuple[str, str,
  * Any]]`, delta-rs `files_by_partitions` syntax). `op` is one of
  * `=`, `!=`, `<`, `<=`, `>`, `>=`, `in`, `not in`; for the set ops
  * `value` is a `Seq`.
  *
  * Semantics are EXACT row filtering: the readers prune the snapshot's
  * file list by partition values and file statistics (metadata only,
  * keep-if-maybe-match), then re-apply the same predicate as a normal
  * codegen'd row filter — pruning is purely a scan-size optimization
  * and can never change the result. */
final case class ScanFilter(column: String, op: String, value: Any) {
  def valueSeq: Seq[Any] = value match {
    case s: Seq[_] => s.asInstanceOf[Seq[Any]]
    case other => Seq(other)
  }
}

/** Driver-side conservative evaluation of [[ScanFilter]]s against
  * partition constants and min/max file statistics. Every comparison
  * that cannot be decided (unparseable value, type mismatch, missing
  * stat) KEEPS the file — the residual row filter guarantees
  * exactness, pruning only has to never drop a matching file. */
object ScanFilters {

  private val Ops = Set("=", "!=", "<", "<=", ">", ">=", "in", "not in")

  def validate(f: ScanFilter): Unit =
    require(Ops.contains(f.op),
      s"unsupported filter op '${f.op}' (supported: ${Ops.toSeq.sorted.mkString(", ")})")

  /** The residual row predicate — SQL three-valued semantics (nulls
    * never match, including `!=`/`not in`), matching what the pruning
    * below assumes. */
  def toColumn(f: ScanFilter): Column = {
    validate(f)
    val c = col(f.column)
    f.op match {
      case "=" => c === lit(f.value)
      case "!=" => c =!= lit(f.value)
      case "<" => c < lit(f.value)
      case "<=" => c <= lit(f.value)
      case ">" => c > lit(f.value)
      case ">=" => c >= lit(f.value)
      case "in" => c.isin(f.valueSeq: _*)
      case "not in" => !c.isin(f.valueSeq: _*)
    }
  }

  def residual(filters: Seq[ScanFilter]): Option[Column] =
    filters.map(toColumn).reduceOption(_ && _)

  /** May a partition-constant value match `f`? `raw` is the value as the
    * log/manifest carries it (hive string, avro scalar, or null). A null
    * partition value matches NO comparison (SQL semantics). */
  def constantMayMatch(dt: DataType, raw: Any, f: ScanFilter): Boolean = {
    validate(f)
    toComparable(dt, raw) match {
      case None => false // null: =,!=,<,… are all NULL → row filter drops it
      case Some(pv) =>
        f.op match {
          case "=" => cmp(pv, dt, f.value).forall(_ == 0)
          case "!=" => cmp(pv, dt, f.value).forall(_ != 0)
          case "<" => cmp(pv, dt, f.value).forall(_ < 0)
          case "<=" => cmp(pv, dt, f.value).forall(_ <= 0)
          case ">" => cmp(pv, dt, f.value).forall(_ > 0)
          case ">=" => cmp(pv, dt, f.value).forall(_ >= 0)
          case "in" => f.valueSeq.exists(v => cmp(pv, dt, v).forall(_ == 0))
          case "not in" => f.valueSeq.forall(v => cmp(pv, dt, v).forall(_ != 0))
        }
    }
  }

  /** May any row in [min, max] match `f`? Missing bounds keep the file.
    * Writers may truncate string maxima upward (Delta stats), which only
    * widens the interval — still safe. */
  def intervalMayMatch(dt: DataType, minRaw: Option[Any], maxRaw: Option[Any],
      f: ScanFilter): Boolean = {
    validate(f)
    val lo = minRaw.flatMap(toComparable(dt, _))
    val hi = maxRaw.flatMap(toComparable(dt, _))
    def contains(v: Any): Boolean =
      lo.forall(l => cmp(l, dt, v).forall(_ <= 0)) &&
        hi.forall(h => cmp(h, dt, v).forall(_ >= 0))
    f.op match {
      case "=" => contains(f.value)
      case "in" => f.valueSeq.exists(contains)
      case "<" => lo.forall(l => cmp(l, dt, f.value).forall(_ < 0))
      case "<=" => lo.forall(l => cmp(l, dt, f.value).forall(_ <= 0))
      case ">" => hi.forall(h => cmp(h, dt, f.value).forall(_ > 0))
      case ">=" => hi.forall(h => cmp(h, dt, f.value).forall(_ >= 0))
      case "!=" | "not in" =>
        // prunable only when EVERY row equals a rejected value (min==max)
        val point = for { l <- lo; h <- hi; c <- cmpAny(l, h) } yield c == 0
        if (!point.getOrElse(false)) true
        else !f.valueSeq.exists(v => cmp(lo.get, dt, v).contains(0))
    }
  }

  private def cmp(normalized: Any, dt: DataType, rawOther: Any): Option[Int] =
    toComparable(dt, rawOther).flatMap(o => cmpAny(normalized, o))

  private def cmpAny(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => Some(x.compare(y))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(x.compareTo(y))
    case _ => None
  }

  /** Normalize a raw value (hive partition string, avro scalar, user
    * filter literal) to a comparable form for `dt`: BigDecimal for
    * numeric/temporal, String for strings, Boolean for booleans. None
    * for null or an unrecognizable encoding (→ conservative keep,
    * except partition nulls which never match). */
  def toComparable(dt: DataType, raw: Any): Option[Any] = {
    if (raw == null) return None
    try dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | _: DecimalType =>
        Some(BigDecimal(raw.toString))
      case DateType => Some(BigDecimal(epochDay(raw)))
      case TimestampType | TimestampNTZType => Some(BigDecimal(epochMicros(raw)))
      case StringType => Some(raw.toString)
      case BooleanType => raw match {
        case b: Boolean => Some(b)
        case s => Some(s.toString.toBoolean)
      }
      case _ => None
    } catch { case _: Exception => None }
  }

  private def epochDay(raw: Any): Long = raw match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case d: LocalDate => d.toEpochDay
    case n: Number => n.longValue // already an ordinal (Iceberg avro)
    case s => LocalDate.parse(s.toString.trim).toEpochDay
  }

  private def epochMicros(raw: Any): Long = raw match {
    case t: java.sql.Timestamp => t.getTime * 1000L + t.getNanos / 1000 % 1000
    case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000
    case n: Number => n.longValue // micros (Iceberg avro encoding)
    case s =>
      // accept both "yyyy-MM-dd HH:mm:ss[.f]" and ISO forms incl. a
      // trailing Z (delta-rs stats render timestamps with it)
      val txt = s.toString.trim.stripSuffix("Z").replace(' ', 'T')
      val ldt = java.time.LocalDateTime.parse(txt)
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000
  }
}
