package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import graft.Tables

/** Typed `Dataset[T]` surface — where case-class encoders give
  * compile-time field safety (SURVEY §1.4: `Dataset[T]` where type safety
  * helps, `DataFrame` where schema is dynamic) — plus a user-facing
  * `Aggregator[IN, BUF, OUT]`, the §2.15 extension point users get in
  * place of the reference's (absent) UDF API.
  */
object TypedOps {

  final case class Line(
      l_orderkey: Long, l_suppkey: Long, l_quantity: Double,
      l_extendedprice: Double, l_discount: Double, l_returnflag: String)

  final case class SupplierRevenue(supp: Long, revenue: Double, lines: Long)

  def lines(s: SparkSession, dir: String): Dataset[Line] = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_returnflag")
      .as[Line]
  }

  /** Discount-weighted revenue as a typed Aggregator: merge-associative
    * buffer → runs as partial + final aggregation like any builtin. */
  object RevenueAgg extends Aggregator[Line, (Double, Long), (Double, Long)] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), l: Line): (Double, Long) =
      (b._1 + l.l_extendedprice * (1.0 - l.l_discount), b._2 + 1)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Long)): (Double, Long) = r
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  }

  /** Typed pipeline: filter → groupByKey → custom Aggregator. */
  def revenuePerSupplier(s: SparkSession, dir: String)
      : Dataset[SupplierRevenue] = {
    import s.implicits._
    lines(s, dir)
      .filter(_.l_returnflag != "R")
      .groupByKey(_.l_suppkey)
      .agg(RevenueAgg.toColumn.name("rev_lines"))
      .map { case (supp, (rev, n)) => SupplierRevenue(supp, rev, n) }
  }
}
