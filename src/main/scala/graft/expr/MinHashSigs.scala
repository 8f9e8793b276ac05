package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native one-pass MinHash signature over a token array — the fused
  * replacement for the higher-order formulation
  * `transform(sequence(0,k-1), i -> array_min(transform(toks, t ->
  * xxhash64(i, t))))`, which materializes k interpreted lambda arrays
  * per document. This expression keeps k running minima in one loop
  * over the tokens, calling the SAME hash chain Spark's `xxhash64(i, t)`
  * evaluates (seed 42 → hashInt(i) → hashBytes(t)), so the signature
  * values are bit-identical to the form it replaces — pinned by spec
  * against the HOF expression on the real corpus.
  *
  * Per-seed prefixes (`hash(i, 42)`) are precomputed once per operator,
  * not once per row — the loop body is one bytes-hash per (token, seed).
  */
object MinHashSigsImpl {
  def seeds(k: Int): Array[Long] =
    Array.tabulate(k)(i =>
      XxHash64Function.hash(i, IntegerType, 42L))

  def sigs(toks: ArrayData, seeds: Array[Long]): ArrayData = {
    val k = seeds.length
    val n = toks.numElements()
    if (n == 0) // array_min of an empty array is null per component
      return new GenericArrayData(Array.fill[Any](k)(null))
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val t = toks.getUTF8String(j)
      if (t != null) {
        var i = 0
        while (i < k) {
          val h = XxHash64Function.hash(t, StringType, seeds(i))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

/** `minhash_sigs(toks, k)` — see [[MinHashSigsImpl]]. */
case class MinHashSigs(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, s"minhash_sigs needs k > 0, got $k")

  @transient private lazy val seedArr = MinHashSigsImpl.seeds(k)

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs expects array<string>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(a: Any): Any =
    MinHashSigsImpl.sigs(a.asInstanceOf[ArrayData], seedArr)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val impl = MinHashSigsImpl.getClass.getName.stripSuffix("$")
    val seedsRef = ctx.addReferenceObj("mhSeeds", seedArr, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $impl.sigs($a, $seedsRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object MinHashSigs {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs", exprs => MinHashSigs(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
}

/** Native 64-bit SimHash over a token array — one pass voting all 64
  * bits per token hash (`xxhash64(tok)`, seed 42) and emitting the
  * majority signature. Replaces the explode → 64-SUM groupBy
  * formulation WITHOUT its shuffle: the signature becomes a pure
  * codegen'd map over the corpus scan, which at 100 TB removes the
  * only exchange the simhash pipeline had before banding.
  * Bit-identical to the aggregation form (spec-pinned); an empty or
  * all-null token array yields null, matching the aggregation's
  * absent-group behavior. */
object SimHash64Impl {
  def simhash(toks: ArrayData): Any = {
    val n = toks.numElements()
    val votes = new Array[Int](64)
    var cnt = 0
    var j = 0
    while (j < n) {
      val t = toks.getUTF8String(j)
      if (t != null) {
        cnt += 1
        val h = XxHash64Function.hash(t, StringType, 42L)
        var b = 0
        while (b < 64) { votes(b) += ((h >> b) & 1L).toInt; b += 1 }
      }
      j += 1
    }
    if (cnt == 0) null
    else {
      var sig = 0L
      var b = 0
      while (b < 64) { if (votes(b) * 2 > cnt) sig |= (1L << b); b += 1 }
      java.lang.Long.valueOf(sig)
    }
  }
}

/** `simhash64(toks)` — see [[SimHash64Impl]]. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(a: Any): Any =
    SimHash64Impl.simhash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val impl = SimHash64Impl.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => s"""
      Object r = $impl.simhash($a);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Long) r).longValue(); }""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object SimHash64 {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs(0)), "built-in")
}
