package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Count of positionally-equal elements between two arrays — the
  * signature-agreement kernel of the MinHash estimate
  * (`size(filter(zip_with(s1, s2, eq), id))`, which evaluates its
  * lambdas interpreted per element per pair). One fused generated loop
  * per candidate pair instead; semantics identical, including NULL
  * slots (a NULL element matches nothing, as with `=` in the HOF).
  *
  * Supports `array<long>` (xxhash64 signatures) and `array<string>`
  * (md5 signatures) — the two hash families of `ops/Dedup`.
  */
object ArrayMatchCountImpl {
  def countLong(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0; var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c
  }

  def countString(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0; var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) &&
        a.getUTF8String(i).equals(b.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}

case class ArrayMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => true
      case (ArrayType(StringType, _), ArrayType(StringType, _)) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"array_match_count expects two array<bigint> or two array<string>, " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def implCall: String = elemType match {
    case LongType => "countLong"
    case _ => "countString"
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    elemType match {
      case LongType => ArrayMatchCountImpl.countLong(x, y)
      case _ => ArrayMatchCountImpl.countString(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = ArrayMatchCountImpl.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $impl.$implCall($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayMatchCount {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_match_count", exprs => ArrayMatchCount(exprs(0), exprs(1)),
      "built-in")
}
