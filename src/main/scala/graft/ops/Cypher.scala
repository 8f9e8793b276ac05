package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** openCypher front-end — the reference's third Neptune query language
  * (`neptune/_neptune.py:79-123` execute_opencypher) as a compiler from
  * the MATCH subset onto [[Graph.PropertyGraph]] joins:
  *
  * {{{
  *   MATCH (a:label)-[:REL]->(b)<-[:REL2]-(c:label2)
  *   WHERE a.name = 'X' AND b.kind = 'y'
  *   RETURN a.name, b, c.name
  * }}}
  *
  * Each node pattern scans the vertex table (label-filtered), each
  * relationship an edge slice; direction decides the join orientation.
  * The compiled plan is the same join chain a Gremlin traversal or a
  * SPARQL BGP produces — one equi-join per hop, label filters pushed to
  * the scans.
  */
object Cypher {

  private final case class NodePat(name: String, label: Option[String])
  private final case class RelPat(label: String, outgoing: Boolean)

  private val NodeRe = """\(\s*([A-Za-z_]\w*)\s*(?::\s*([A-Za-z_]\w*))?\s*\)""".r
  private val OutRe = """^-\[\s*:\s*([A-Za-z_]\w*)\s*\]->""".r
  private val InRe = """^<-\[\s*:\s*([A-Za-z_]\w*)\s*\]-""".r
  private val WhereRe =
    """([A-Za-z_]\w*)\.(\w+)\s*=\s*(?:'([^']*)'|([0-9][0-9.]*))""".r

  /** Run a MATCH…WHERE…RETURN query against a property graph. */
  def query(g: Graph.PropertyGraph, cypher: String): DataFrame = {
    val text = cypher.trim.replaceAll("\\s+", " ")
    val MatchRe = """(?i)MATCH (.+?)(?: WHERE (.+?))? RETURN (.+)""".r
    text match {
      case MatchRe(pattern, whereOrNull, returns) =>
        val (nodes, rels) = parsePattern(pattern.trim)
        var df = nodeScan(g, nodes.head)
        nodes.tail.zip(rels).zipWithIndex.foreach {
          case ((node, rel), i) =>
            val prev = nodes(i).name
            val e = g.edges.filter(col("label") === rel.label)
              .select(col("src").as(s"__src$i"), col("dst").as(s"__dst$i"))
            val (fromCol, toCol) =
              if (rel.outgoing) (s"__src$i", s"__dst$i")
              else (s"__dst$i", s"__src$i")
            df = df
              .join(e, col(s"${prev}_id") === col(fromCol))
              .join(nodeScan(g, node), col(toCol) === col(s"${node.name}_id"))
              .drop(s"__src$i", s"__dst$i")
        }
        Option(whereOrNull).foreach { w =>
          df = df.filter(compileWhere(w))
        }
        df.select(compileReturn(returns): _*)
      case _ => throw new IllegalArgumentException(
        s"unsupported openCypher form (MATCH … [WHERE …] RETURN … only): $cypher")
    }
  }

  private def parsePattern(p: String): (Seq[NodePat], Seq[RelPat]) = {
    val nodes = scala.collection.mutable.ArrayBuffer.empty[NodePat]
    val rels = scala.collection.mutable.ArrayBuffer.empty[RelPat]
    var rest = p.trim
    val first = NodeRe.findPrefixMatchOf(rest).getOrElse(
      throw new IllegalArgumentException(s"expected node pattern at: $rest"))
    nodes += NodePat(first.group(1), Option(first.group(2)))
    rest = rest.drop(first.end).trim
    while (rest.nonEmpty) {
      val (rel, afterRel) = OutRe.findPrefixMatchOf(rest) match {
        case Some(m) => (RelPat(m.group(1), outgoing = true), rest.drop(m.end))
        case None => InRe.findPrefixMatchOf(rest) match {
          case Some(m) =>
            (RelPat(m.group(1), outgoing = false), rest.drop(m.end))
          case None => throw new IllegalArgumentException(
            s"expected relationship pattern at: $rest")
        }
      }
      rels += rel
      val trimmed = afterRel.trim
      val n = NodeRe.findPrefixMatchOf(trimmed).getOrElse(
        throw new IllegalArgumentException(s"expected node pattern at: $trimmed"))
      nodes += NodePat(n.group(1), Option(n.group(2)))
      rest = trimmed.drop(n.end).trim
    }
    (nodes.toSeq, rels.toSeq)
  }

  /** A node scan: vertices (label-filtered) with columns prefixed by the
    * variable name — `(a:nation)` yields a_id, a_vlabel, a_name, … */
  private def nodeScan(g: Graph.PropertyGraph, n: NodePat): DataFrame = {
    val base = n.label match {
      case Some(l) => g.vertices.filter(col("vlabel") === l)
      case None => g.vertices
    }
    base.select(base.columns.map(c => col(c).as(s"${n.name}_$c")).toSeq: _*)
  }

  private def compileWhere(w: String): Column =
    w.split("(?i) AND ").map(_.trim).map {
      case WhereRe(v, prop, str, num) =>
        val value: Column = if (str != null) lit(str) else lit(num.toDouble)
        col(s"${v}_$prop") === value
      case other => throw new IllegalArgumentException(
        s"unsupported WHERE clause (var.prop = literal only): $other")
    }.reduce(_ && _)

  private def compileReturn(r: String): Seq[Column] =
    r.split(",").map(_.trim).toSeq.map { item =>
      if (item.contains(".")) {
        val Array(v, prop) = item.split("\\.", 2)
        col(s"${v.trim}_${prop.trim}").as(s"${v.trim}_${prop.trim}")
      } else col(s"${item}_id").as(item)
    }

  /** Oracle-gated query: suppliers with their nation, restricted to the
    * ASIA region, through two labelled hops. */
  def supplierRegionQuery(s: SparkSession, dir: String): DataFrame =
    query(Graph.testGraph(s, dir),
      """MATCH (sup:supplier)-[:located_in]->(n:nation)-[:in_region]->(r:region)
        |WHERE r.name = 'ASIA'
        |RETURN sup.name, n.name""".stripMargin)

  def supplierRegionOracle: String =
    """SELECT s_name AS sup_name, n_name
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'""".stripMargin
}
