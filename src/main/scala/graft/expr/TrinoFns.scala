package graft.expr

import com.fasterxml.jackson.databind.JsonNode

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime statics for the round-12 Trino tier-3 expressions (all
  * codegen'd via static-method calls — the [[TrinoJsonImpl]] pattern).
  * Semantics per trino.io function docs; the reference ships these
  * names to Athena verbatim (`athena/_read.py:951`). */
object TrinoFnsImpl {
  private def mapper = TrinoJsonImpl.sharedMapper

  /** Unicode normalization (Trino `normalize(s[, form])`, NFC default). */
  def normalize(s: UTF8String, form: UTF8String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form.toString.toUpperCase)
    UTF8String.fromString(java.text.Normalizer.normalize(s.toString, f))
  }

  /** Trino `hamming_distance`: differing code-point count; inputs must
    * have the same code-point length (Trino fails the query). */
  def hammingDistance(a: UTF8String, b: UTF8String): Long = {
    val x = a.toString; val y = b.toString
    val nx = x.codePointCount(0, x.length)
    val ny = y.codePointCount(0, y.length)
    if (nx != ny) throw new IllegalArgumentException(
      "hamming_distance: the input strings must have the same length")
    var i = 0; var j = 0; var d = 0L
    while (i < x.length) {
      val cx = x.codePointAt(i); val cy = y.codePointAt(j)
      if (cx != cy) d += 1
      i += Character.charCount(cx); j += Character.charCount(cy)
    }
    d
  }

  /** Trino `bit_count(x, bits)`: set bits of x in `bits`-wide two's
    * complement; x must fit in `bits` bits (Trino fails the query). */
  def bitCount(x: Long, bits: Int): Long = {
    if (bits < 2 || bits > 64) throw new IllegalArgumentException(
      s"bit_count: bits must be between 2 and 64, got $bits")
    if (bits < 64) {
      val min = -(1L << (bits - 1)); val max = (1L << (bits - 1)) - 1
      if (x < min || x > max) throw new IllegalArgumentException(
        s"bit_count: $x is out of range for a $bits-bit signed integer")
    }
    val masked = if (bits == 64) x else x & ((1L << bits) - 1)
    java.lang.Long.bitCount(masked).toLong
  }

  /** Trino `json_array_get(json, index)`: element at a zero-based
    * (negative = from the end) index as JSON text; NULL when the input
    * is not an array, the index is out of bounds, or the element is
    * JSON null. */
  def jsonArrayGet(json: UTF8String, idx: Long): UTF8String = {
    val root = parse(json)
    if (root == null || !root.isArray) return null
    val n = root.size()
    val i = if (idx < 0) n + idx else idx
    if (i < 0 || i >= n) return null
    val node = root.get(i.toInt)
    if (node == null || node.isNull) null
    else UTF8String.fromString(mapper.writeValueAsString(node))
  }

  /** Trino `json_size(json, path)`: object field count / array length
    * at the path; 0 for scalars; NULL for missing path or bad input. */
  def jsonSize(json: UTF8String, path: UTF8String): java.lang.Long = {
    val text = TrinoJsonImpl.extract(json, path, scalarMode = false)
    if (text == null) return null
    val node = parse(text)
    if (node == null) return null
    if (node.isContainerNode) java.lang.Long.valueOf(node.size().toLong)
    else java.lang.Long.valueOf(0L)
  }

  /** Trino `is_json_scalar(json)`: true for a JSON number, string,
    * true, false or null; false for arrays/objects. Malformed input
    * returns NULL (the shim's varchar-input policy, matching
    * json_extract). */
  def isJsonScalar(json: UTF8String): java.lang.Boolean = {
    val node = parse(json)
    if (node == null) return null
    java.lang.Boolean.valueOf(!node.isContainerNode)
  }

  /** Trino `json_array_contains(json, value)` for boolean / numeric /
    * string probes; NULL on malformed or non-array input. */
  def jsonArrayContains(json: UTF8String, value: Any): java.lang.Boolean = {
    val root = parse(json)
    if (root == null || !root.isArray) return null
    val it = root.elements()
    while (it.hasNext) {
      val e = it.next()
      val hit = value match {
        case b: java.lang.Boolean => e.isBoolean && e.booleanValue() == b
        case s: UTF8String => e.isTextual && e.textValue() == s.toString
        case n @ (_: java.lang.Byte | _: java.lang.Short |
                  _: java.lang.Integer | _: java.lang.Long) =>
          e.isNumber && !e.isFloatingPointNumber &&
            e.longValue() == n.asInstanceOf[Number].longValue()
        case f @ (_: java.lang.Float | _: java.lang.Double) =>
          e.isNumber && e.doubleValue() == f.asInstanceOf[Number].doubleValue()
        case d: Decimal => e.isNumber &&
          e.decimalValue().compareTo(d.toJavaBigDecimal) == 0
        case _ => false
      }
      if (hit) return java.lang.Boolean.TRUE
    }
    java.lang.Boolean.FALSE
  }

  private def parse(json: UTF8String): JsonNode =
    try {
      val n = mapper.readTree(json.toString)
      // Jackson 2.10+: empty/whitespace input parses to MissingNode
      if (n == null || n.isMissingNode) null else n
    } catch { case _: Exception => null }

  /** Trino `format_number(x)`: three-significant-digit rendering with
    * a thousands unit suffix (K/M/B/T/Q) — `123456` → `123K`,
    * `1000000` → `1M`. Divide by 1000 until |v| < 1000, then format
    * with `#.##`/`#.#`/`#` by magnitude (HALF_EVEN, the DecimalFormat
    * default), US symbols pinned so the output is locale-independent. */
  // DecimalFormat is not thread-safe, so the three patterns are cached
  // per thread instead of allocated per row
  private val fmtCache: ThreadLocal[
      java.util.HashMap[String, java.text.DecimalFormat]] =
    ThreadLocal.withInitial(() =>
      new java.util.HashMap[String, java.text.DecimalFormat]())

  def formatNumber(value0: Double): UTF8String = {
    val units = Array("", "K", "M", "B", "T", "Q")
    var value = value0
    var i = 0
    while (math.abs(value) >= 1000 && i < units.length - 1) {
      value /= 1000; i += 1
    }
    val pattern =
      if (math.abs(value) < 10) "#.##"
      else if (math.abs(value) < 100) "#.#"
      else "#"
    val cache = fmtCache.get()
    var fmt = cache.get(pattern)
    if (fmt == null) {
      fmt = new java.text.DecimalFormat(pattern,
        java.text.DecimalFormatSymbols.getInstance(java.util.Locale.US))
      cache.put(pattern, fmt)
    }
    UTF8String.fromString(fmt.format(value) + units(i))
  }

  /** Trino `human_readable_seconds(x)`: weeks/days/hours/minutes/
    * seconds with pluralization, zero units skipped, input rounded to
    * the nearest second of its ABSOLUTE value (Trino drops the sign) —
    * `96` → `1 minute, 36 seconds`, `0` → `0 seconds`. NaN/Infinity
    * fail the query, as in Trino. */
  def humanReadableSeconds(input: Double): UTF8String = {
    if (java.lang.Double.isNaN(input) || java.lang.Double.isInfinite(input))
      throw new IllegalArgumentException(
        s"human_readable_seconds: invalid argument found: $input")
    var s = math.round(math.abs(input))
    val parts = Seq.newBuilder[String]
    def take(unitSeconds: Long, name: String): Unit = {
      val n = s / unitSeconds; s %= unitSeconds
      if (n == 1) parts += s"1 $name"
      else if (n > 1) parts += s"$n ${name}s"
    }
    take(604800L, "week"); take(86400L, "day"); take(3600L, "hour")
    take(60L, "minute"); take(1L, "second")
    val all = parts.result()
    UTF8String.fromString(
      if (all.isEmpty) "0 seconds" else all.mkString(", "))
  }

  /** Trino `combinations(array, n)`: the n-element subsets of the
    * input, lexicographic by element index — `(['a','b','c'], 2)` →
    * `[['a','b'],['a','c'],['b','c']]`; `n = 0` → `[[]]`; `n >` the
    * array length → `[]`. Trino's guards: 0 ≤ n ≤ 5 and at most
    * 100,000 subsets, both failing the query. */
  def combinations(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int, elemType: DataType)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    if (n < 0) throw new IllegalArgumentException(
      s"combinations: size must not be negative: $n")
    if (n > 5) throw new IllegalArgumentException(
      s"combinations: size must not exceed 5: $n")
    val elems = arr.toObjectArray(elemType)
    val len = elems.length
    if (n > len) return new GenericArrayData(Array.empty[Any])
    // C(len, n) with n ≤ 5 — overflow-free at any realistic length
    var total = 1L
    var k = 0
    while (k < n && total <= 100000L) {
      total = total * (len - k) / (k + 1); k += 1
    }
    if (total > 100000L) throw new IllegalArgumentException(
      s"combinations: the number of subsets exceeds the maximum of 100000")
    if (n == 0)
      return new GenericArrayData(
        Array[Any](new GenericArrayData(Array.empty[Any])))
    val out = Array.newBuilder[Any]
    val idx = Array.range(0, n)
    var done = false
    while (!done) {
      out += new GenericArrayData(idx.map(elems))
      var i = n - 1
      while (i >= 0 && idx(i) == len - n + i) i -= 1
      if (i < 0) done = true
      else {
        idx(i) += 1
        var j = i + 1
        while (j < n) { idx(j) = idx(j - 1) + 1; j += 1 }
      }
    }
    new GenericArrayData(out.result())
  }

  /** Trino `bar(x, width)` — the terminal bar-chart renderer of the
    * public ColorFunctions surface: ⌊x·width⌋ filled U+2588 cells
    * (clamped to [0, width]), each prefixed by a 256-color-cube ANSI
    * escape (`ESC[38;5;Nm`, cube index 16 + 36r + 6g + b with channels
    * quantized c·6/256) whose color interpolates red → green linearly
    * across the FULL width, then the reset escape (`ESC[0m`) and space
    * padding to exactly `width` columns. Java float-cast semantics are
    * kept (width = 1 yields a NaN fraction → channel 0). The 4-arg
    * form takes Trino COLOR values (a Trino-private type); only the
    * red-to-green default is implemented — the shim fails loudly on
    * the color-arg arities. Width is bounded (1..1,000,000) to keep a
    * typo from materializing a gigabyte string. */
  def bar(percent: Double, width: Long): UTF8String = {
    if (width <= 0 || width > 1000000L) throw new IllegalArgumentException(
      s"bar: width must be between 1 and 1000000, got $width")
    var count = (percent * width).toLong
    count = math.max(0L, math.min(width, count))
    val sb = new java.lang.StringBuilder()
    var i = 0L
    while (i < count) {
      val fraction = (i.toDouble / (width - 1)).toFloat
      def ch(lo: Int, hi: Int): Int = (lo + (hi - lo) * fraction).toInt
      val r = ch(255, 0); val g = ch(0, 255)
      val ansi = 16 + 36 * (r * 6 / 256) + 6 * (g * 6 / 256)
      sb.append("\u001b[38;5;").append(ansi).append('m').append('█')
      i += 1
    }
    sb.append("\u001b[0m")
    i = count
    while (i < width) { sb.append(' '); i += 1 }
    UTF8String.fromString(sb.toString)
  }

  /** Trino `approx_most_frequent(buckets, value, capacity)` semantics,
    * computed EXACTLY: the true top-`buckets` values by count, ordered
    * count-descending with ties broken by ascending value. One sort +
    * run-length pass — O(n log n) in the group, replacing the round-13
    * composition's per-distinct-value array recount (O(n·d), the
    * ADVICE defect: this function is used exactly when d is large).
    * Trino's Space-Saving sketch returns the same set whenever its
    * capacity suffices (its counts are exact until eviction); where
    * the sketch would err, the exact answer is the defensible
    * Spark-side semantics. */
  def approxMostFrequent(entries: org.apache.spark.sql.catalyst.util.ArrayData,
      buckets: Int, elemType: DataType)
      : org.apache.spark.sql.catalyst.util.MapData = {
    import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
    val elems = entries.toObjectArray(elemType).asInstanceOf[Array[AnyRef]]
    val ord = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(elemType)
    java.util.Arrays.sort(elems,
      ord.asInstanceOf[java.util.Comparator[AnyRef]])
    val n = elems.length
    val keys = Array.newBuilder[AnyRef]
    val counts = Array.newBuilder[Long]
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && ord.compare(elems(j), elems(i)) == 0) j += 1
      keys += elems(i); counts += (j - i).toLong
      i = j
    }
    val ks = keys.result(); val cs = counts.result()
    // stable sort by count desc: runs are already value-ascending, so
    // ties keep the ascending-value order
    val order = Array.range(0, ks.length).sortBy(idx => -cs(idx))
    val top = order.take(math.min(buckets, ks.length))
    new ArrayBasedMapData(
      new GenericArrayData(top.map(ks(_): Any)),
      new GenericArrayData(top.map(cs(_): Any)))
  }

  /** Trino `numeric_histogram(buckets, value[, weight])` with a
    * DOCUMENTED divergence-class decision (the `approx_percentile`
    * precedent): Trino runs the Ben-Haim/Tom-Tov streaming histogram,
    * whose bins depend on input arrival and merge order — Trino's own
    * results are not deterministic across runs. This implementation
    * keeps the SAME approximation class (BHTT §2.1 centroid merges:
    * repeatedly fuse the two closest bins into their weighted mean
    * until `buckets` remain) but applies it deterministically to the
    * exact sorted value/weight multiset, ties to the smaller value.
    * Bin weights always sum to the exact total; with ≤ `buckets`
    * distinct values the result is exact and matches Trino. O(d log d)
    * via a lazy-deletion gap heap. Like the `histogram` shim, the
    * per-group collected array bounds group cardinality to
    * driver-friendly sizes — stated, not hidden. */
  def numericHistogram(entries: org.apache.spark.sql.catalyst.util.ArrayData,
      buckets: Int): org.apache.spark.sql.catalyst.util.MapData = {
    import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
    if (buckets <= 0) throw new IllegalArgumentException(
      s"numeric_histogram: buckets must be positive, got $buckets")
    val n0 = entries.numElements()
    val vs0 = new Array[Double](n0); val ws0 = new Array[Double](n0)
    var n = 0
    var i = 0
    while (i < n0) {
      if (!entries.isNullAt(i)) {
        val row = entries.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          vs0(n) = row.getDouble(0); ws0(n) = row.getDouble(1); n += 1
        }
      }
      i += 1
    }
    if (n == 0)
      return new ArrayBasedMapData(
        new GenericArrayData(Array.empty[Any]),
        new GenericArrayData(Array.empty[Any]))
    val byV = Array.range(0, n).sortBy(vs0(_))
    // coalesce exact-equal values (their merge is weight addition with
    // an unchanged centroid, so this is the first merges for free)
    val v = new Array[Double](n); val w = new Array[Double](n)
    var d = 0
    i = 0
    while (i < n) {
      var j = i + 1
      var acc = ws0(byV(i))
      while (j < n && vs0(byV(j)) == vs0(byV(i))) { acc += ws0(byV(j)); j += 1 }
      v(d) = vs0(byV(i)); w(d) = acc; d += 1
      i = j
    }
    // doubly linked list over 0..d-1 + lazy-deletion min-gap heap
    val prev = Array.tabulate(d)(_ - 1)
    val next = Array.tabulate(d)(i => if (i == d - 1) -1 else i + 1)
    val ver = new Array[Int](d)
    val heap = new java.util.PriorityQueue[(Double, Int, Int, Int, Int)](
      math.max(1, d), (a, b) =>
        if (a._1 != b._1) java.lang.Double.compare(a._1, b._1)
        else Integer.compare(a._2, b._2))
    def push(l: Int): Unit = {
      val r = next(l)
      if (l >= 0 && r >= 0) heap.add((v(r) - v(l), l, r, ver(l), ver(r)))
    }
    i = 0
    while (i < d - 1) { push(i); i += 1 }
    var bins = d
    while (bins > buckets) {
      val (_, l, r, vl, vr) = heap.poll()
      if (next(l) == r && ver(l) == vl && ver(r) == vr) {
        val wm = w(l) + w(r)
        v(l) = (v(l) * w(l) + v(r) * w(r)) / wm
        w(l) = wm
        ver(l) += 1; ver(r) += 1
        next(l) = next(r)
        if (next(r) >= 0) prev(next(r)) = l
        bins -= 1
        if (prev(l) >= 0) push(prev(l))
        push(l)
      }
    }
    val ks = new Array[Any](bins); val cs = new Array[Any](bins)
    // node 0 is always the list head: merges only ever remove the
    // RIGHT member of a pair, and 0 is never anyone's right
    var node = 0
    i = 0
    while (node >= 0) { ks(i) = v(node); cs(i) = w(node); node = next(node); i += 1 }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(cs))
  }

  /** Trino type-name rendering for `typeof`. Documented approximation:
    * varchar/char render WITHOUT a length (Spark's StringType carries
    * none), and timestamps render at Trino's default precision 3. */
  def typeName(dt: DataType): String = dt match {
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "integer"
    case LongType => "bigint"
    case FloatType => "real"
    case DoubleType => "double"
    case BooleanType => "boolean"
    case DateType => "date"
    case StringType => "varchar"
    case BinaryType => "varbinary"
    case TimestampType => "timestamp(3) with time zone"
    case TimestampNTZType => "timestamp(3)"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case CharType(n) => s"char($n)"
    case VarcharType(n) => s"varchar($n)"
    case ArrayType(e, _) => s"array(${typeName(e)})"
    case MapType(k, v, _) => s"map(${typeName(k)}, ${typeName(v)})"
    case s: StructType =>
      s.fields.map(f => s"${f.name} ${typeName(f.dataType)}")
        .mkString("row(", ", ", ")")
    case NullType => "unknown"
    case CalendarIntervalType => "interval"
    case other => other.simpleString
  }
}

/** Trino `typeof(x)`: the TYPE of the argument as a varchar — a
  * metadata function, constant per plan, so it is foldable and the
  * optimizer collapses it to a literal before any codegen (the
  * fallback eval below only runs during that fold). A string LITERAL
  * child renders Trino's length-parameterized type (`typeof('foo')` →
  * `varchar(3)` — Trino types literals exactly, round 13); any other
  * string expression stays bare `varchar` (Spark's StringType carries
  * no length). */
case class TrinoTypeOf(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def prettyName: String = "typeof"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child match {
      case org.apache.spark.sql.catalyst.expressions.Literal(
          s: UTF8String, dt) if dt == StringType =>
        UTF8String.fromString(s"varchar(${s.numChars})")
      case _ =>
        UTF8String.fromString(TrinoFnsImpl.typeName(child.dataType))
    }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class TrinoNormalize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize expects (string[, form]), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize"
  override def nullSafeEval(s: Any, f: Any): Any =
    TrinoFnsImpl.normalize(s.asInstanceOf[UTF8String],
      f.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = TrinoFnsImpl.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (s, f) => s"$impl.normalize($s, $f)")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class TrinoHammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "hamming_distance expects (string, string)")
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_distance"
  override def nullSafeEval(a: Any, b: Any): Any =
    TrinoFnsImpl.hammingDistance(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = TrinoFnsImpl.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$impl.hammingDistance($a, $b)")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class TrinoBitCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bit_count expects (bigint, int bits), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "bit_count"
  override def nullSafeEval(x: Any, bits: Any): Any =
    TrinoFnsImpl.bitCount(x.asInstanceOf[Long], bits.asInstanceOf[Int])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = TrinoFnsImpl.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (x, b) => s"$impl.bitCount($x, $b)")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class TrinoJsonArrayGet(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "json_array_get expects (json varchar, bigint index)")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_array_get"
  override def nullSafeEval(j: Any, i: Any): Any =
    TrinoFnsImpl.jsonArrayGet(j.asInstanceOf[UTF8String],
      i.asInstanceOf[Long])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = TrinoFnsImpl.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (j, i) => {
      s"""${ev.value} = $impl.jsonArrayGet($j, $i);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class TrinoJsonSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "json_size expects (json varchar, path varchar)")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "json_size"
  override def nullSafeEval(j: Any, p: Any): Any = {
    val r = TrinoFnsImpl.jsonSize(j.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String])
    if (r == null) null else r.longValue()
  }
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = TrinoFnsImpl.getClass.getName.stripSuffix("$")
    val tmp = ctx.freshName("graftJsonSize")
    nullSafeCodeGen(ctx, ev, (j, p) => {
      s"""java.lang.Long $tmp = $impl.jsonSize($j, $p);
         |${ev.isNull} = $tmp == null;
         |${ev.value} = ${ev.isNull} ? -1L : $tmp.longValue();"""
        .stripMargin
    })
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class TrinoIsJsonScalar(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "is_json_scalar expects a json varchar")
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "is_json_scalar"
  override def nullSafeEval(j: Any): Any = {
    val r = TrinoFnsImpl.isJsonScalar(j.asInstanceOf[UTF8String])
    if (r == null) null else r.booleanValue()
  }
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = TrinoFnsImpl.getClass.getName.stripSuffix("$")
    val tmp = ctx.freshName("graftIjs")
    nullSafeCodeGen(ctx, ev, j => {
      s"""java.lang.Boolean $tmp = $impl.isJsonScalar($j);
         |${ev.isNull} = $tmp == null;
         |${ev.value} = ${ev.isNull} ? false : $tmp.booleanValue();"""
        .stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class TrinoJsonArrayContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType == StringType && (right.dataType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | StringType => true
      case _: DecimalType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "json_array_contains expects (json varchar, boolean|bigint|double|varchar)")
  }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "json_array_contains"
  override def nullSafeEval(j: Any, v: Any): Any = {
    val boxed: Any = v match {
      case b: Boolean => java.lang.Boolean.valueOf(b)
      case l: Long => java.lang.Long.valueOf(l)
      case d: Double => java.lang.Double.valueOf(d)
      case other => other
    }
    val r = TrinoFnsImpl.jsonArrayContains(j.asInstanceOf[UTF8String], boxed)
    if (r == null) null else r.booleanValue()
  }
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = TrinoFnsImpl.getClass.getName.stripSuffix("$")
    val tmp = ctx.freshName("graftJac")
    nullSafeCodeGen(ctx, ev, (j, v) => {
      s"""java.lang.Boolean $tmp =
         |  $impl.jsonArrayContains($j, (Object) $v);
         |${ev.isNull} = $tmp == null;
         |${ev.value} = ${ev.isNull} ? false : $tmp.booleanValue();"""
        .stripMargin
    })
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Trino `format_number(x)` — see [[TrinoFnsImpl.formatNumber]]. Spark
  * claims the bare name (comma-grouping `format_number(x, d)`), so the
  * shim's registration is auto-namespaced by the shadowed-builtin
  * machinery. */
case class TrinoFormatNumber(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"format_number expects a numeric argument, got " +
        child.dataType.simpleString)
  override def dataType: DataType = StringType
  override def prettyName: String = "format_number"
  override def nullSafeEval(x: Any): Any =
    TrinoFnsImpl.formatNumber(x.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = TrinoFnsImpl.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, x => s"$impl.formatNumber($x)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Trino `human_readable_seconds(x)` — see
  * [[TrinoFnsImpl.humanReadableSeconds]]. */
case class TrinoHumanReadableSeconds(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"human_readable_seconds expects a numeric argument, got " +
        child.dataType.simpleString)
  override def dataType: DataType = StringType
  override def prettyName: String = "human_readable_seconds"
  override def nullSafeEval(x: Any): Any =
    TrinoFnsImpl.humanReadableSeconds(x.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = TrinoFnsImpl.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, x => s"$impl.humanReadableSeconds($x)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Trino `combinations(array, n)` — see [[TrinoFnsImpl.combinations]]. */
case class TrinoCombinations(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: ArrayType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"combinations expects (array, integer n), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  private def elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = {
    val at = left.dataType.asInstanceOf[ArrayType]
    ArrayType(at, containsNull = false)
  }
  override def prettyName: String = "combinations"
  override def nullSafeEval(a: Any, n: Any): Any =
    TrinoFnsImpl.combinations(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      n.asInstanceOf[Int], elementType)
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = TrinoFnsImpl.getClass.getName.stripSuffix("$")
    val dtRef = ctx.addReferenceObj("graftCombElemType", elementType)
    defineCodeGen(ctx, ev,
      (a, n) => s"$impl.combinations($a, $n, (org.apache.spark.sql.types." +
        s"DataType) $dtRef)")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Trino `bar(x, width)` — see [[TrinoFnsImpl.bar]]. */
case class TrinoBar(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bar expects (double x, bigint width), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "bar"
  override def nullSafeEval(x: Any, w: Any): Any =
    TrinoFnsImpl.bar(x.asInstanceOf[Double], w.asInstanceOf[Long])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = TrinoFnsImpl.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (x, w) => s"$impl.bar($x, $w)")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Trino `approx_most_frequent` over a collected entries array — see
  * [[TrinoFnsImpl.approxMostFrequent]]. `left` is the collect_list
  * aggregate of the group's values, `right` the bucket count. */
case class TrinoApproxMostFrequent(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: ArrayType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"approx_most_frequent expects (array, integer buckets), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  private def elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType =
    MapType(elementType, LongType, valueContainsNull = false)
  override def prettyName: String = "approx_most_frequent"
  override def nullSafeEval(entries: Any, b: Any): Any =
    TrinoFnsImpl.approxMostFrequent(
      entries.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[Int], elementType)
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = TrinoFnsImpl.getClass.getName.stripSuffix("$")
    val dtRef = ctx.addReferenceObj("graftAmfElemType", elementType)
    defineCodeGen(ctx, ev, (e, b) =>
      s"$impl.approxMostFrequent($e, $b, (org.apache.spark.sql.types." +
        s"DataType) $dtRef)")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Trino `numeric_histogram` over a collected entries array of
  * struct(v double, w double) — see [[TrinoFnsImpl.numericHistogram]]. */
case class TrinoNumericHistogram(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: StructType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"numeric_histogram expects (array<struct<v,w>>, integer " +
          s"buckets), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType =
    MapType(DoubleType, DoubleType, valueContainsNull = false)
  override def prettyName: String = "numeric_histogram"
  override def nullSafeEval(entries: Any, b: Any): Any =
    TrinoFnsImpl.numericHistogram(
      entries.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[Int])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = TrinoFnsImpl.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (e, b) => s"$impl.numericHistogram($e, $b)")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Trino `word_stem(word)` — the Snowball English (Porter2) stemmer
  * Trino runs via `org.tartarus.snowball.ext.EnglishStemmer`; the full
  * algorithm lives in [[Porter2]] (implemented from the published
  * Snowball definition). Codegen'd via a static call, like every other
  * tier-3 expression. */
case class TrinoWordStem(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_stem expects a varchar argument, got " +
        child.dataType.simpleString)
  override def dataType: DataType = StringType
  override def prettyName: String = "word_stem"
  override def nullSafeEval(w: Any): Any =
    Porter2.stem(w.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = Porter2.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, w =>
      s"$impl.stem((org.apache.spark.unsafe.types.UTF8String) $w)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
