package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization codec — the memory-bound ANN scale path
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011): a d-dim float vector splits into `m` subvectors, each
  * quantized to its nearest of `ksub ≤ 16` per-subspace centroids, and
  * the codes pack 4 bits each into ONE long — a 64-dim float32
  * embedding (256 bytes) becomes 8 bytes, so a 10^10-vector scan reads
  * 32× less. Query-side, asymmetric distance (ADC) is `m` table
  * lookups per vector against a per-query distance table — no float
  * math in the scan loop at all.
  *
  * Both expressions are codegen'd; centroid/table arrays ride as
  * foldable array literals evaluated once at plan time and referenced
  * from generated code.
  */
object PqImpl {
  /** Pack the per-subspace argmin centroid ids, 4 bits each,
    * subspace 0 in the lowest bits. */
  def encode(emb: ArrayData, cents: Array[Float], m: Int, ksub: Int,
      dsub: Int): Long = {
    var code = 0L
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var d = 0.0
        var t = 0
        val base = (j * ksub + c) * dsub
        while (t < dsub) {
          val diff = emb.getFloat(j * dsub + t).toDouble - cents(base + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      code |= best.toLong << (4 * j)
      j += 1
    }
    code
  }

  /** Sum of per-subspace table entries for the packed code. */
  def adc(code: Long, table: Array[Double], m: Int, ksub: Int): Double = {
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = ((code >>> (4 * j)) & 0xFL).toInt
      s += table(j * ksub + c)
      j += 1
    }
    s
  }
}

/** `pq_encode(embedding, centsFlat, m, ksub, dsub)` → packed long code.
  * `centsFlat` (array<float>, foldable) is the [m][ksub][dsub] centroid
  * tensor flattened row-major. */
case class PqEncode(children: Seq[Expression]) extends Expression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.head.nullable

  private lazy val cents: Array[Float] =
    children(1).eval(null).asInstanceOf[ArrayData].toFloatArray()
  private lazy val m: Int =
    children(2).eval(null).asInstanceOf[Number].intValue
  private lazy val ksub: Int =
    children(3).eval(null).asInstanceOf[Number].intValue
  private lazy val dsub: Int =
    children(4).eval(null).asInstanceOf[Number].intValue

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size != 5)
      return TypeCheckResult.TypeCheckFailure(
        "pq_encode(embedding, cents, m, ksub, dsub)")
    val ok = (children.head.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }) && children(1).foldable && (children(1).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }) && children.drop(2).forall(c => c.foldable &&
      c.dataType.isInstanceOf[IntegerType])
    if (!ok) return TypeCheckResult.TypeCheckFailure(
      "pq_encode expects (array<float>, foldable array<float>, int, int, int)")
    if (children(3).eval(null).asInstanceOf[Number].intValue > 16)
      TypeCheckResult.TypeCheckFailure("pq ksub must be <= 16 (4-bit codes)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) null
    else PqImpl.encode(v.asInstanceOf[ArrayData], cents, m, ksub, dsub)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val impl = PqImpl.getClass.getName.stripSuffix("$")
    val ref = ctx.addReferenceObj("pqCents", cents, "float[]")
    val c = children.head.genCode(ctx)
    ev.copy(code = code"""
      |${c.code}
      |boolean ${ev.isNull} = ${c.isNull};
      |long ${ev.value} = 0L;
      |if (!${ev.isNull}) {
      |  ${ev.value} = $impl.encode(${c.value}, $ref, $m, $ksub, $dsub);
      |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** `pq_adc(code, tableFlat, m, ksub)` → summed asymmetric distance.
  * `tableFlat` (array<double>, foldable) is the per-query [m][ksub]
  * distance table flattened row-major. */
case class PqAdc(children: Seq[Expression]) extends Expression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.head.nullable

  private lazy val table: Array[Double] =
    children(1).eval(null).asInstanceOf[ArrayData].toDoubleArray()
  private lazy val m: Int =
    children(2).eval(null).asInstanceOf[Number].intValue
  private lazy val ksub: Int =
    children(3).eval(null).asInstanceOf[Number].intValue

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.size == 4 &&
      children.head.dataType == LongType &&
      children(1).foldable && (children(1).dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }) && children.drop(2).forall(c => c.foldable &&
        c.dataType.isInstanceOf[IntegerType])
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_adc expects (bigint code, foldable array<double>, int, int)")
  }

  override def eval(input: InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) null
    else PqImpl.adc(v.asInstanceOf[Long], table, m, ksub)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val impl = PqImpl.getClass.getName.stripSuffix("$")
    val ref = ctx.addReferenceObj("pqTable", table, "double[]")
    val c = children.head.genCode(ctx)
    ev.copy(code = code"""
      |${c.code}
      |boolean ${ev.isNull} = ${c.isNull};
      |double ${ev.value} = 0.0;
      |if (!${ev.isNull}) {
      |  ${ev.value} = $impl.adc(${c.value}, $ref, $m, $ksub);
      |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object PqCodec {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode", exprs => PqEncode(exprs), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_adc", exprs => PqAdc(exprs), "built-in")
  }
}
