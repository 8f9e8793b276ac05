package graft.expr

import org.apache.spark.sql.catalyst.expressions.{
  Cast, DateFormatClass, Expression, Literal, RuntimeReplaceable}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Trino's `to_iso8601(x)` (trino.io docs: date/time functions),
  * registered by [[graft.sql.TrinoCompat]]. The rendered shape depends
  * on the ARGUMENT TYPE — a DATE renders as `yyyy-MM-dd`, a timestamp
  * as `yyyy-MM-ddTHH:mm:ss.SSS` — so this dispatches on the resolved
  * child type (the [[TrinoContains]] pattern). RuntimeReplaceable: the
  * wrapper never evaluates; the optimizer swaps in the codegen'd
  * `date_format`. */
case class ToIso8601(child: Expression) extends RuntimeReplaceable {

  // the replacement must be RESOLVED when CheckAnalysis sees it, and
  // date_format/cast are timezone-aware — bind the session zone here
  // (ResolveTimeZone does not descend into a replacement)
  override lazy val replacement: Expression = {
    val tz = Some(SQLConf.get.sessionLocalTimeZone)
    child.dataType match {
      case DateType =>
        DateFormatClass(Cast(child, TimestampType, tz),
          Literal("yyyy-MM-dd"), tz)
      case _ =>
        DateFormatClass(Cast(child, TimestampType, tz),
          Literal("yyyy-MM-dd'T'HH:mm:ss.SSS"), tz)
    }
  }

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "to_iso8601"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
