package graft.expr

import org.apache.spark.sql.catalyst.expressions.{
  ArrayContains, Contains, Expression, RuntimeReplaceable}
import org.apache.spark.sql.types.ArrayType

/** Trino's `contains(array, elem)` (trino.io docs: array functions),
  * registered as `contains` by [[graft.sql.TrinoCompat]]. Spark's own
  * `contains` is string-only; Trino's is array-only. This dispatches on
  * the resolved type of the first argument so BOTH dialects keep
  * working through the one name: an array left-hand side becomes
  * `array_contains`, anything else falls back to Spark's string
  * `contains`. RuntimeReplaceable: the analyzer resolves the raw
  * children, then the optimizer swaps in the (codegen'd) replacement —
  * this wrapper never evaluates. */
case class TrinoContains(left: Expression, right: Expression)
    extends RuntimeReplaceable {

  override lazy val replacement: Expression = left.dataType match {
    case _: ArrayType => ArrayContains(left, right)
    case _ => Contains(left, right)
  }

  override def children: Seq[Expression] = Seq(left, right)
  override def prettyName: String = "contains"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}
