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

  /** The HOF form's value for a NULL token array (r17, advice fix):
    * `transform(null, ...)` is null, `array_min(null)` is null, and the
    * OUTER transform still maps every seed — an array of k nulls, never
    * a null array. The old nullSafeEval returned NULL for that input,
    * diverging sig-grouping and est for null-text docs from the
    * engine-portable formulation the oracle computes. */
  def nullSigs(k: Int): ArrayData =
    new GenericArrayData(Array.fill[Any](k)(null))

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

  // null input yields k nulls (the HOF twin's value), so the expression
  // itself is never null — see MinHashSigsImpl.nullSigs
  override def nullable: Boolean = false

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) MinHashSigsImpl.nullSigs(k)
    else MinHashSigsImpl.sigs(a.asInstanceOf[ArrayData], seedArr)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
    val impl = MinHashSigsImpl.getClass.getName.stripSuffix("$")
    val seedsRef = ctx.addReferenceObj("mhSeeds", seedArr, "long[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        ${c.isNull} ? $impl.nullSigs($k) : $impl.sigs(${c.value}, $seedsRef);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
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

/** Native one-pass MD5-family MinHash signature (round 16) — the fused
  * replacement for the ENGINE-PORTABLE higher-order formulation
  * `transform(sequence(0,k-1), i -> array_min(transform(toks, t ->
  * md5(concat(cast(i as string), ':', t)))))` that every oracled
  * dedup operator shares with its DuckDB twin. Bit-identical by
  * construction (spec-pinned beside the xxhash64 twin above):
  * lowercase-hex MD5 strings compare lexicographically exactly as the
  * 16 digest bytes compare unsigned, so the loop keeps k running
  * 16-byte minima and hex-encodes only the k winners — the HOF form
  * hex-encoded (and boxed into k intermediate arrays) every candidate
  * hash of every token. One MessageDigest instance per call, seed
  * prefixes ("<i>:") rendered once per operator. */
object MinHashSigsMd5Impl {
  def prefixes(k: Int): Array[Array[Byte]] =
    Array.tabulate(k)(i => (i.toString + ":")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): org.apache.spark.unsafe.types.UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xf).toByte
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
  }

  def sigs(toks: ArrayData, prefixes: Array[Array[Byte]]): ArrayData = {
    val k = prefixes.length
    val n = toks.numElements()
    val mins = new Array[Array[Byte]](k)
    if (n > 0) {
      val md = java.security.MessageDigest.getInstance("MD5")
      var j = 0
      while (j < n) {
        val t = toks.getUTF8String(j)
        // a null token hashes to null and array_min skips it
        if (t != null) {
          val tb = t.getBytes
          var i = 0
          while (i < k) {
            md.reset()
            md.update(prefixes(i)); md.update(tb)
            val d = md.digest()
            if (mins(i) == null || unsignedLess(d, mins(i))) mins(i) = d
            i += 1
          }
          j += 1
        } else j += 1
      }
    }
    new GenericArrayData(mins.map(d =>
      if (d == null) null else hex(d)): Array[Any])
  }
}

/** `minhash_sigs_md5(toks, k)` — see [[MinHashSigsMd5Impl]]. */
case class MinHashSigsMd5(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, s"minhash_sigs_md5 needs k > 0, got $k")

  @transient private lazy val prefixArr = MinHashSigsMd5Impl.prefixes(k)

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs_md5 expects array<string>, got ${other.simpleString}")
    }

  // null input yields k nulls (the HOF twin's value), so the expression
  // itself is never null — see MinHashSigsImpl.nullSigs
  override def nullable: Boolean = false

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) MinHashSigsImpl.nullSigs(k)
    else MinHashSigsMd5Impl.sigs(a.asInstanceOf[ArrayData], prefixArr)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
    val impl = MinHashSigsMd5Impl.getClass.getName.stripSuffix("$")
    val implX = MinHashSigsImpl.getClass.getName.stripSuffix("$")
    val pRef = ctx.addReferenceObj("mhMd5Prefixes", prefixArr, "byte[][]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        ${c.isNull} ? $implX.nullSigs($k) : $impl.sigs(${c.value}, $pRef);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object MinHashSigsMd5 {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs_md5", exprs => MinHashSigsMd5(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
}
