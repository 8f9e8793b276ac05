package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment in ONE codegen'd pass:
  * `nearest_centroid(embedding, centroids)` returns the `c_id` of the
  * highest-cosine centroid, ties to the FIRST entry (centroid arrays
  * are sorted by `c_id`, so ties resolve to the lowest id — the same
  * rule as `max(struct(cdist, -c_id))` and the DuckDB oracles'
  * `ORDER BY cos DESC, c_id`).
  *
  * This is the scale shape for quantizer assignment (SemDeDup, IVF
  * coarse cells): the crossJoin-against-broadcast-centroids + argmax
  * AGGREGATION it replaces materializes n×k rows through a hash
  * aggregate — measured as the dominant cost of `vec_semdedup` at 100×
  * data, where k = ⌈√n⌉ made that 4.6×10⁸ rows. Here the k×d loop runs
  * fused inside whole-stage codegen per INPUT row: n rows out, no
  * intermediate rows, no shuffle, and the cosine per centroid is the
  * same sequential fold as [[CosineSimImpl.cosine]] — bit-identical
  * assignments, purely a plan improvement. */
object NearestCentroidImpl {
  /** `cents` is `array<struct<c_id: bigint, centroid: array<float>>>`.
    * A null centroid embedding is SKIPPED (the argmax-aggregate shape
    * this replaced produced a null distance for it and never picked
    * it); if no valid centroid remains the call raises rather than
    * inventing an assignment. A dimension mismatch raises inside the
    * cosine — a ragged corpus is loud, never silently mis-clustered. */
  def nearest(e: ArrayData, cents: ArrayData): Long = {
    val k = cents.numElements()
    var bestId = 0L
    var best = Double.NegativeInfinity
    var found = false
    var j = 0
    while (j < k) {
      val c = cents.getStruct(j, 2)
      if (c != null && !c.isNullAt(1)) {
        val cos = CosineSimImpl.cosine(e, c.getArray(1))
        // first valid entry seeds; then strictly-greater, with NaN
        // ranked ABOVE every real value — how BOTH replay engines
        // order it (Spark's struct-max and DuckDB's DESC sort treat
        // NaN as greatest), so assignments stay bit-identical even on
        // a zero-vector corpus. NaN-vs-NaN keeps the first (lowest
        // c_id), the shared tie rule.
        if (!found || cos > best || (cos.isNaN && !best.isNaN)) {
          best = cos; bestId = c.getLong(0); found = true
        }
      }
      j += 1
    }
    if (!found)
      throw new IllegalArgumentException(
        "nearest_centroid: no non-null centroid to assign to")
    bestId
  }
}

case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(StructType(Array(f1, f2)), _)) =>
        f1.dataType == LongType &&
          (f2.dataType match {
            case ArrayType(FloatType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "nearest_centroid expects (array<float>, " +
        "array<struct<bigint, array<float>>>), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NearestCentroidImpl.nearest(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = NearestCentroidImpl.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $impl.nearest($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nearest_centroid", exprs => NearestCentroid(exprs(0), exprs(1)),
      "built-in")
}
