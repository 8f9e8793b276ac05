package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gremlin text front-end — the reference's `neptune.execute_gremlin`
  * (`neptune/_neptune.py:28-54`) accepts a Gremlin query string; this
  * compiles the traversal-chain subset onto [[Graph.Traversal]] joins:
  *
  * {{{
  *   g.V().hasLabel('supplier').out('located_in').has('name','JAPAN')
  *        .in('located_in').values('name')
  * }}}
  *
  * Supported steps: `V([ids…])`, `hasLabel('l')`, `has('k', literal)` and
  * `has('k', P)` with P ∈ eq/neq/gt/gte/lt/lte/within, `out('label')`,
  * `in('label')`, `both('label')`, `where(out/in/both('label'))`
  * (edge-existence semi-join), `outE('label')`/`inE('label')` with
  * edge-property `values(…)` and `inV()`/`outV()` back to vertices,
  * `order().by('k' [, desc])`, `values('p'…)`, `id()`, `limit(n)`,
  * `count()`, `dedup()`. Each step compiles to the same declarative plan
  * the Traversal API builds — label filters pushed to the vertex/edge
  * scans, one equi-join per hop — so Catalyst sees nothing it can't
  * optimize (dimension frontiers broadcast from stats, exactly as with
  * the programmatic form).
  */
object Gremlin {

  /** Execute a Gremlin traversal string against a property graph. */
  def query(g: Graph.PropertyGraph, gremlin: String): DataFrame = {
    val steps = splitSteps(gremlin.trim)
    require(steps.nonEmpty && steps.head._1 == "g",
      s"Gremlin query must start with g.V(): $gremlin")
    require(steps.length >= 2 && steps(1)._1 == "V",
      s"Gremlin query must start with g.V(): $gremlin")
    val startIds = steps(1)._2.collect { case StrArg(s) => s }
    var t: Graph.Traversal =
      if (startIds.isEmpty) g.v()
      else g.v(col("id").isin(startIds: _*))
    // edges frontier after outE/inE; projection after values()/id()/count()
    var edgeFrontier: Option[DataFrame] = None
    var projected: Option[DataFrame] = None
    var orderPending = false

    def current: DataFrame =
      projected.orElse(edgeFrontier).getOrElse(t.frontier)
    def replaceCurrent(df: DataFrame): Unit =
      if (projected.isDefined) projected = Some(df)
      else if (edgeFrontier.isDefined) edgeFrontier = Some(df)
      else t = Graph.Traversal(t.g, df)

    steps.drop(2).foreach { case (name, args) =>
      require(!orderPending || name == "by",
        s"order() must be followed by by(...), got $name")
      require(projected.isEmpty || Set("limit", "dedup", "count", "order",
        "by").contains(name),
        s"step $name cannot follow a terminal values()/id() projection")
      (name, args) match {
        case ("hasLabel", Seq(StrArg(l))) =>
          t = t.has(col("vlabel") === l)
        case ("has", Seq(StrArg(k), v)) if edgeFrontier.isEmpty =>
          t = t.has(predicate(propCol(k), v))
        case ("has", Seq(StrArg(k), v)) =>
          edgeFrontier = edgeFrontier.map(_.filter(predicate(col(k), v)))
        case ("out", Seq(StrArg(l))) => t = t.out(l)
        case ("in", Seq(StrArg(l)))  => t = t.in(l)
        case ("both", Seq(StrArg(l))) => t = t.both(l)
        case ("where", Seq(PredArg(dir @ ("out" | "in" | "both"),
            Seq(StrArg(l))))) =>
          t = t.hasEdge(l, dir)
        case ("outE", Seq(StrArg(l))) => edgeFrontier = Some(t.outE(l))
        case ("inE", Seq(StrArg(l))) => edgeFrontier = Some(t.inE(l))
        case ("inV", Seq()) =>
          val e = edgeFrontier.getOrElse(throw new IllegalArgumentException(
            "inV() requires an edge frontier (outE/inE first)"))
          t = Graph.Traversal(t.g, e.select(col("dst").as("id")).distinct()
            .join(t.g.vertices, "id"))
          edgeFrontier = None
        case ("outV", Seq()) =>
          val e = edgeFrontier.getOrElse(throw new IllegalArgumentException(
            "outV() requires an edge frontier (outE/inE first)"))
          t = Graph.Traversal(t.g, e.select(col("src").as("id")).distinct()
            .join(t.g.vertices, "id"))
          edgeFrontier = None
        case ("values", as) if as.nonEmpty && as.forall(_.isInstanceOf[StrArg]) =>
          val cols = as.collect { case StrArg(p) => col(p).as(p) }
          projected = Some(current.select(cols: _*))
        case ("id", Seq()) =>
          projected = Some(t.frontier.select(col("id")))
        case ("order", Seq()) => orderPending = true
        case ("by", StrArg(k) +: rest) if orderPending =>
          orderPending = false
          val desc = rest.exists {
            case SymArg("desc") | SymArg("decr") | StrArg("desc") => true
            case _ => false
          }
          val key = if (edgeFrontier.isEmpty && projected.isEmpty)
            propCol(k) else col(k)
          replaceCurrent(current.orderBy(if (desc) key.desc else key.asc))
        case ("dedup", Seq()) => replaceCurrent(current.distinct())
        case ("limit", Seq(NumArg(n))) => replaceCurrent(current.limit(n.toInt))
        case ("count", Seq()) =>
          projected = Some(current.agg(count(lit(1)).as("count")))
          edgeFrontier = None
        case (other, _) =>
          throw new IllegalArgumentException(s"unsupported Gremlin step: $other")
      }
    }
    require(!orderPending, "order() must be followed by by(...)")
    projected.orElse(edgeFrontier).getOrElse(t.frontier)
  }

  /** Gremlin reserves `label` for the element label; graph vertices store
    * it as `vlabel` (a DataFrame column can't start with `~`). */
  private def propCol(k: String): Column =
    if (k == "label" || k == "~label") col("vlabel") else col(k)

  // ---- argument model ------------------------------------------------------

  private sealed trait Arg
  private final case class StrArg(v: String) extends Arg
  private final case class NumArg(v: Double) extends Arg
  private final case class BoolArg(v: Boolean) extends Arg
  private final case class SymArg(v: String) extends Arg // bare keyword: desc, asc
  private final case class PredArg(op: String, values: Seq[Arg]) extends Arg

  private def litOf(a: Arg): Column = a match {
    case StrArg(s) => lit(s)
    case NumArg(n) => if (n == n.floor && !n.isInfinite) lit(n.toLong) else lit(n)
    case BoolArg(b) => lit(b)
    case other => throw new IllegalArgumentException(
      s"literal expected here, got: $other")
  }

  private def predicate(c: Column, v: Arg): Column = v match {
    case PredArg("eq", Seq(x))  => c === litOf(x)
    case PredArg("neq", Seq(x)) => c =!= litOf(x)
    case PredArg("gt", Seq(x))  => c > litOf(x)
    case PredArg("gte", Seq(x)) => c >= litOf(x)
    case PredArg("lt", Seq(x))  => c < litOf(x)
    case PredArg("lte", Seq(x)) => c <= litOf(x)
    case PredArg("within", xs) if xs.nonEmpty => c.isin(xs.map {
      case StrArg(s) => s: Any
      case NumArg(n) => if (n == n.floor) n.toLong: Any else n: Any
      case other => throw new IllegalArgumentException(s"bad within arg: $other")
    }: _*)
    case PredArg(op, _) =>
      throw new IllegalArgumentException(s"unsupported P predicate: $op")
    case lit0 => c === litOf(lit0)
  }

  // ---- scanner -------------------------------------------------------------

  /** Split `g.V().has('a', gt(3)).out('x')` into (stepName, args) pairs:
    * '.' separates steps only at paren depth 0 outside quotes. */
  private def splitSteps(q: String): Seq[(String, Seq[Arg])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    q.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case '(' if !inQuote => depth += 1; cur += '('
      case ')' if !inQuote => depth -= 1; cur += ')'
      case '.' if !inQuote && depth == 0 =>
        if (cur.nonEmpty) { out += cur.toString; cur.clear() }
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(parseStep)
  }

  private def parseStep(s: String): (String, Seq[Arg]) = {
    val t = s.trim
    val open = t.indexOf('(')
    if (open < 0) (t, Nil)
    else {
      require(t.endsWith(")"), s"malformed Gremlin step: $s")
      (t.take(open).trim, splitArgs(t.substring(open + 1, t.length - 1)))
    }
  }

  /** Split an argument list on top-level commas, then type each token. */
  private def splitArgs(body: String): Seq[Arg] = {
    if (body.trim.isEmpty) return Nil
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    body.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case '(' if !inQuote => depth += 1; cur += '('
      case ')' if !inQuote => depth -= 1; cur += ')'
      case ',' if !inQuote && depth == 0 => parts += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) parts += cur.toString
    parts.toSeq.map(p => parseArg(p.trim))
  }

  private val PredRe = """([A-Za-z]+)\((.*)\)""".r

  private def parseArg(a: String): Arg = a match {
    case s if s.startsWith("'") && s.endsWith("'") && s.length >= 2 =>
      StrArg(s.substring(1, s.length - 1))
    case "true" => BoolArg(true)
    case "false" => BoolArg(false)
    case PredRe(op, inner) =>
      // `P.gt(5)` and bare `gt(5)` both appear in Gremlin text
      PredArg(op.stripPrefix("P."), splitArgs(inner))
    case s if s.startsWith("P.") => parseArg(s.stripPrefix("P."))
    case s if s.startsWith("__.") => parseArg(s.stripPrefix("__."))
    case s if s.matches("[A-Za-z_][A-Za-z0-9_]*") =>
      SymArg(s) // Order.desc-style bare keywords
    case n => NumArg(java.lang.Double.parseDouble(n))
  }

  /** Oracle-gated query: names of suppliers located in EUROPE, expressed
    * as Gremlin text — starts at the region, walks the two edges
    * backwards (same join chain [[Cypher.supplierRegionQuery]] builds
    * forwards). */
  def supplierInEuropeQuery(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    query(Graph.testGraph(s, dir),
      "g.V().hasLabel('region').has('name','EUROPE')" +
        ".in('in_region').in('located_in').values('name')")

  def supplierInEuropeOracle: String =
    """SELECT s_name AS name
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'""".stripMargin

  /** Oracle-gated query #2 — the steps Neptune notebooks lean on:
    * `both` (direction-free hop region↔nation), `where(in(…))`
    * (nations that actually have suppliers), `order().by(…, desc)`. */
  def asiaNationsWithSuppliersQuery(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    query(Graph.testGraph(s, dir),
      "g.V().hasLabel('region').has('name','ASIA')" +
        ".both('in_region').where(__.in('located_in'))" +
        ".order().by('name', desc).values('name')")

  def asiaNationsWithSuppliersOracle: String =
    """SELECT n_name AS name
      |FROM nation
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
      |ORDER BY n_name DESC""".stripMargin
}
