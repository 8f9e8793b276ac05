package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MongoDB-style metadata filter compiler — the S3 Vectors filter
  * surface (`s3/_vectors/_read.py:276`, operator tree with
  * $eq/$ne/$gt/$gte/$lt/$lte/$in/$nin/$exists/$and/$or) translated into
  * Catalyst `Column` predicates, so the same filter document that the
  * reference forwards to the service becomes a pushdown-eligible plan
  * predicate here.
  *
  * Filter document model: `Map[String, Any]` where keys are field names
  * (value = literal → $eq, or a nested Map of operators) or `$and`/`$or`
  * (value = Seq of documents).
  */
object MetadataFilter {

  def compile(doc: Map[String, Any]): Column =
    doc.map { case (k, v) => compileEntry(k, v) }
      .reduceOption(_ && _)
      .getOrElse(lit(true))

  private def compileEntry(key: String, value: Any): Column = key match {
    case "$and" => seqOf(value).map(compile).reduce(_ && _)
    case "$or" => seqOf(value).map(compile).reduce(_ || _)
    case "$not" => !compile(value.asInstanceOf[Map[String, Any]])
    case field => value match {
      case ops: Map[_, _] =>
        ops.asInstanceOf[Map[String, Any]].map { case (op, v) =>
          compileOp(col(field), op, v)
        }.reduce(_ && _)
      case literal => col(field) === lit(literal)
    }
  }

  private def compileOp(c: Column, op: String, v: Any): Column = op match {
    case "$eq" => c === lit(v)
    case "$ne" => !(c <=> lit(v))
    case "$gt" => c > lit(v)
    case "$gte" => c >= lit(v)
    case "$lt" => c < lit(v)
    case "$lte" => c <= lit(v)
    case "$in" => c.isin(literals(v): _*)
    case "$nin" => !c.isin(literals(v): _*)
    case "$exists" =>
      if (v.asInstanceOf[Boolean]) c.isNotNull else c.isNull
    case other =>
      throw new IllegalArgumentException(s"unsupported operator: $other")
  }

  private def literals(v: Any): Seq[Any] = v match {
    case s: Seq[_] => s
    case other => throw new IllegalArgumentException(
      s"expected a list of literals, got: $other")
  }

  private def seqOf(v: Any): Seq[Map[String, Any]] = v match {
    case s: Seq[_] => s.map(_.asInstanceOf[Map[String, Any]])
    case other => throw new IllegalArgumentException(
      s"expected a list, got: $other")
  }
}
