package graft.expr

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Trino-exact `json_extract` / `json_extract_scalar` (trino.io docs:
  * JSON functions; the reference ships both names to Athena verbatim,
  * `athena/_read.py:951`). Spark's `get_json_object` is CLOSE but
  * diverges on exactly the cases a digest-comparison or JSON-pipeline
  * query notices:
  *
  *  - `json_extract` returns the addressed node as JSON TEXT — a
  *    string scalar keeps its quotes (`"abc"`), escapes intact.
  *    `get_json_object` unquotes top-level string scalars.
  *  - `json_extract_scalar` returns NULL for non-scalar nodes
  *    (objects/arrays); `get_json_object` returns their JSON text.
  *  - JSON `null` at the path → SQL NULL in both modes (Trino
  *    semantics).
  *
  * Path dialect: the lax JSONPath subset Trino documents and the
  * reference's tutorials use — `$`, `.name`, `["name"]`/`['name']`,
  * `[index]` (0-based array index, as in Trino). An unparseable path
  * throws at first evaluation (loud, like Trino's
  * INVALID_FUNCTION_ARGUMENT); malformed JSON input returns NULL
  * (Athena behavior for varchar input).
  *
  * Codegen'd via a static-method call (no UDF boxing): the generated
  * code invokes [[TrinoJsonImpl.extract]] directly, so the expression
  * stays inside WholeStageCodegen like the rest of the shim.
  */
object TrinoJsonImpl {
  // strict parse: '1 garbage' must be malformed (Jackson's default
  // readTree stops at the first complete token), and the malformed-
  // input-returns-NULL policy below must actually fire for it
  private val mapper = new ObjectMapper().enable(
    com.fasterxml.jackson.databind.DeserializationFeature
      .FAIL_ON_TRAILING_TOKENS)

  /** Shared with the [[TrinoFnsImpl]] JSON helpers (same parse +
    * canonical-render configuration). */
  private[expr] def sharedMapper: ObjectMapper = mapper

  /** Parsed path step: Left(field) or Right(arrayIndex). */
  private type Step = Either[String, Int]

  // paths are overwhelmingly literal; memoize the last few parses.
  // THREAD-LOCAL, not a synchronized map: this sits on the per-row
  // codegen path, and an access-ordered LRU behind a global mutex
  // (get() mutates order) would serialize every executor thread
  private val pathCache =
    ThreadLocal.withInitial[java.util.LinkedHashMap[String, Array[Step]]](
      () => new java.util.LinkedHashMap[String, Array[Step]](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[Step]]): Boolean =
          size() > 64
      })

  private def parsePath(path: String): Array[Step] = {
    val cached = pathCache.get().get(path)
    if (cached != null) return cached
    val steps = scala.collection.mutable.ArrayBuffer.empty[Step]
    val s = path.trim
    if (s.isEmpty || s(0) != '$')
      throw new IllegalArgumentException(
        s"json path must start with '$$': $path")
    var i = 1
    while (i < s.length) {
      s(i) match {
        case '.' =>
          val start = i + 1
          var j = start
          while (j < s.length && s(j) != '.' && s(j) != '[') j += 1
          if (j == start) throw new IllegalArgumentException(
            s"empty field name in json path: $path")
          steps += Left(s.substring(start, j))
          i = j
        case '[' =>
          val close = s.indexOf(']', i)
          if (close < 0) throw new IllegalArgumentException(
            s"unclosed '[' in json path: $path")
          val inner = s.substring(i + 1, close).trim
          if (inner.length >= 2 &&
              (inner(0) == '"' || inner(0) == '\'') &&
              inner.last == inner(0))
            steps += Left(inner.substring(1, inner.length - 1))
          else
            steps += Right(
              try inner.toInt
              catch { case _: NumberFormatException =>
                throw new IllegalArgumentException(
                  s"bad subscript '$inner' in json path: $path") })
          i = close + 1
        case c => throw new IllegalArgumentException(
          s"unexpected '$c' in json path: $path")
      }
    }
    val arr = steps.toArray
    pathCache.get().put(path, arr)
    arr
  }

  /** Called from generated code and from `eval`. `scalarMode` selects
    * json_extract_scalar semantics. Returns null for SQL NULL. */
  def extract(json: UTF8String, path: UTF8String,
      scalarMode: Boolean): UTF8String = {
    val steps = parsePath(path.toString)
    val root: JsonNode =
      try mapper.readTree(json.toString)
      catch { case _: Exception => return null }
    // Jackson 2.10+: readTree("") / whitespace returns MissingNode,
    // not null — empty input is malformed, not a JSON value
    if (root == null || root.isMissingNode) return null
    var node: JsonNode = root
    var i = 0
    while (i < steps.length) {
      if (node == null) return null
      steps(i) match {
        case Left(field) => node = node.get(field)
        case Right(idx) => node = node.get(idx)
      }
      i += 1
    }
    if (node == null || node.isNull) null
    else if (scalarMode) {
      if (node.isContainerNode) null
      else UTF8String.fromString(node.asText())
    } else UTF8String.fromString(mapper.writeValueAsString(node))
  }
}

case class TrinoJsonExtract(left: Expression, right: Expression,
    scalarMode: Boolean) extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string json, string path), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (scalarMode) "json_extract_scalar" else "json_extract"

  override def nullSafeEval(json: Any, path: Any): Any =
    TrinoJsonImpl.extract(json.asInstanceOf[UTF8String],
      path.asInstanceOf[UTF8String], scalarMode)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = TrinoJsonImpl.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (j, p) => {
      s"""${ev.value} = $impl.extract($j, $p, $scalarMode);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
