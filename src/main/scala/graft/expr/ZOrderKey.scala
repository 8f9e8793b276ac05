package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Multi-dimensional Z-order (Morton) sort key — TRUE bit-interleaved
  * clustering for `OPTIMIZE ... ZORDER BY (a, b, …)`, upgrading the
  * single-dimension range clustering the optimize path had. Each
  * dimension maps to its quantile bucket (cut points sampled
  * driver-side — the same range-id scheme Delta OSS uses, so skew
  * cannot collapse a dimension), and the low `bits` bits of every
  * bucket interleave MSB-first into one long. Sorting a rewrite by this
  * key gives every output file a NARROW min/max envelope in ALL
  * clustered dimensions at once, which is what makes stats-pruned
  * selective reads skip most files regardless of which dimension the
  * predicate hits — the entire point of clustering at 100 TB.
  *
  * Codegen'd: per row, one binary search per dimension over a
  * referenced cuts array plus a fused interleave loop — no boxing, no
  * UDF. Null orders first (bucket 0), matching NULLS FIRST sort
  * semantics.
  */
object ZOrderImpl {
  /** Index of the first cut ≥ v (0..cuts.length): the quantile bucket. */
  def bucket(v: Double, cuts: Array[Double]): Int = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v <= cuts(mid)) hi = mid else lo = mid + 1
    }
    lo
  }

  /** Interleave the low `bits` bits of each bucket, MSB-first, first
    * dimension highest — the Morton code. */
  def interleave(bs: Array[Int], bits: Int): Long = {
    var out = 0L
    var b = bits - 1
    while (b >= 0) {
      var d = 0
      while (d < bs.length) {
        out = (out << 1) | ((bs(d) >>> b) & 1)
        d += 1
      }
      b -= 1
    }
    out
  }
}

/** `zorder_key(bits, cuts1, value1, cuts2, value2, …)` — `bits` and the
  * cuts arrays must be foldable (they are planning-time constants; the
  * arrays land in the generated code as references, never re-evaluated
  * per row). */
case class ZOrderKey(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  private lazy val bits: Int =
    children.head.eval(null).asInstanceOf[Number].intValue
  private lazy val dims: Seq[(Array[Double], Expression)] =
    children.tail.grouped(2).map { pair =>
      (pair.head.eval(null).asInstanceOf[ArrayData].toDoubleArray(),
        pair(1))
    }.toSeq

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 3 || (children.size - 1) % 2 != 0)
      return TypeCheckResult.TypeCheckFailure(
        "zorder_key(bits, cuts1, value1, ...) needs bits plus " +
          "(cuts, value) pairs")
    val bitsOk = children.head.foldable && (children.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })
    if (!bitsOk)
      return TypeCheckResult.TypeCheckFailure(
        "zorder_key bits must be a foldable integer")
    val pairsOk = children.tail.grouped(2).forall { pair =>
      pair.head.foldable &&
        (pair.head.dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        }) && pair(1).dataType == DoubleType
    }
    if (pairsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "zorder_key pairs must be (foldable array<double> cuts, double value)")
  }

  override def eval(input: InternalRow): Any = {
    val bs = new Array[Int](dims.length)
    var i = 0
    dims.foreach { case (cuts, v) =>
      val x = v.eval(input)
      bs(i) = if (x == null) 0
        else ZOrderImpl.bucket(x.asInstanceOf[Double], cuts)
      i += 1
    }
    ZOrderImpl.interleave(bs, bits)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val impl = ZOrderImpl.getClass.getName.stripSuffix("$")
    val bs = ctx.freshName("zbs")
    val dimCode = dims.zipWithIndex.map { case ((cuts, v), i) =>
      val ref = ctx.addReferenceObj(s"zcuts$i", cuts, "double[]")
      val c = v.genCode(ctx)
      s"""${c.code}
         |$bs[$i] = ${c.isNull} ? 0 : $impl.bucket(${c.value}, $ref);"""
        .stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        |int[] $bs = new int[${dims.length}];
        |$dimCode
        |long ${ev.value} = $impl.interleave($bs, $bits);""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZOrderKey {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder_key", exprs => ZOrderKey(exprs), "built-in")

  /** Column builder: quantile cuts (one sorted array per dimension) are
    * baked in as literals. */
  def key(spark: org.apache.spark.sql.SparkSession,
      cols: Seq[org.apache.spark.sql.Column],
      cuts: Seq[Array[Double]], bits: Int = 8)
      : org.apache.spark.sql.Column = {
    require(cols.size == cuts.size, "one cuts array per column")
    register(spark)
    import org.apache.spark.sql.functions.{call_function, lit}
    val args = lit(bits) +: cuts.zip(cols).flatMap { case (c, v) =>
      Seq(lit(c), v.cast("double"))
    }
    call_function("zorder_key", args: _*)
  }
}
