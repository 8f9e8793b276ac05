package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** RDF graph surface — the reference's `neptune.to_rdf_graph` and SPARQL
  * query path (`neptune/_neptune.py:225-315`): rows become
  * (subject, predicate, object) triples, and a SPARQL basic graph
  * pattern compiles to self-joins over the triple table keyed on shared
  * variables.
  *
  * Scale: a BGP of n patterns is n-1 equi-joins on variable bindings —
  * the classic triple-store plan. Predicate-literal patterns filter
  * before joining (predicate is the natural partition/bucket key for a
  * triple table at scale), so each join input is one predicate's slice,
  * not the whole graph.
  */
object Rdf {

  /** A term in a triple pattern: a variable binds, a literal filters. */
  sealed trait Term
  final case class Var(name: String) extends Term
  final case class Lit(value: String) extends Term

  final case class TriplePattern(s: Term, p: Term, o: Term)

  /** `to_rdf_graph`: one row per (subject, predicate → column) pair.
    * `subject` supplies the node id; each mapping contributes a
    * predicate whose object is the column value rendered as a string
    * (RDF terms are lexical). */
  def toRdfGraph(
      df: DataFrame,
      subject: Column,
      predicates: Seq[(String, Column)]): DataFrame = {
    val legs = predicates.map { case (p, o) =>
      df.select(subject.cast("string").as("s"), lit(p).as("p"),
        o.cast("string").as("o"))
    }
    legs.reduce(_.unionByName(_))
  }

  /** Compile a basic graph pattern to joins over the triple table.
    * Output columns are the distinct variables in first-appearance
    * order. */
  def bgp(triples: DataFrame, patterns: Seq[TriplePattern]): DataFrame = {
    require(patterns.nonEmpty, "empty graph pattern")

    def leg(t: TriplePattern): DataFrame = {
      var d = triples
      def bindOrFilter(col0: Column, term: Term, acc: DataFrame): DataFrame =
        term match {
          case Lit(v) => acc.filter(col0 === lit(v))
          case Var(_) => acc
        }
      d = bindOrFilter(col("s"), t.s, d)
      d = bindOrFilter(col("p"), t.p, d)
      d = bindOrFilter(col("o"), t.o, d)
      val proj = Seq(t.s -> "s", t.p -> "p", t.o -> "o").collect {
        case (Var(n), c) => col(c).as(n)
      }
      // a pattern like (?x, :p, ?x) needs the self-equality kept
      val dupFiltered = (t.s, t.o) match {
        case (Var(a), Var(b)) if a == b => d.filter(col("s") === col("o"))
        case _ => d
      }
      dupFiltered.select(distinctBy(proj): _*)
    }

    def vars(t: TriplePattern): Seq[String] =
      Seq(t.s, t.p, t.o).collect { case Var(n) => n }.distinct

    // Greedy connected join order: always prefer a pattern sharing a
    // variable with what's already bound — a disconnected pattern (true
    // cartesian product) only when the BGP itself is disconnected.
    val legs = scala.collection.mutable.ListBuffer(
      patterns.map(p => (leg(p), vars(p))): _*)
    var (acc, bound) = legs.remove(0)
    while (legs.nonEmpty) {
      val i = legs.indexWhere(_._2.exists(bound.contains)) match {
        case -1 => 0
        case n => n
      }
      val (next, nextVars) = legs.remove(i)
      val shared = nextVars.filter(bound.contains)
      acc =
        if (shared.nonEmpty) acc.join(next, shared)
        else acc.crossJoin(next)
      bound = (bound ++ nextVars).distinct
    }
    // joins move shared keys to the front; restore first-appearance order
    acc.select(bound.map(col): _*)
  }

  private def distinctBy(cols: Seq[Column]): Seq[Column] = {
    val seen = scala.collection.mutable.Set.empty[String]
    cols.filter { c =>
      val n = c.toString.split(" AS ").last.replaceAll("[`']", "")
      seen.add(n)
    }
  }

  /** Persist a triple table partitioned by predicate — the storage
    * layout the BGP compiler exploits at scale: a pattern with a literal
    * predicate prunes to one partition directory before any data is
    * read (hive partition pruning on `p`), so each join leg scans one
    * predicate's slice of a 10^11-triple graph, never the whole graph.
    * Clustered on the predicate before writing (one file per predicate
    * per task group, not one per task × predicate). */
  def saveTriples(triples: DataFrame, path: String): Unit =
    graft.io.DatasetWriter.toParquet(
      triples.repartition(col("p")), path,
      mode = graft.io.DatasetWriter.Overwrite, partitionCols = Seq("p"))

  def loadTriples(spark: SparkSession, path: String): DataFrame =
    spark.read.option("basePath", path).parquet(path)

  /** Oracle-gated BGP query: customers and suppliers co-located in a
    * nation, customers restricted to the BUILDING segment —
    * `?c :segment 'BUILDING' . ?c :inNation ?n . ?s :inNation ?n`
    * over triples derived from the TPC-H tables. */
  def bgpQuery(s: SparkSession, dir: String): DataFrame = {
    val customerTriples = toRdfGraph(Tables.customer(s, dir),
      concat(lit("c"), col("c_custkey")),
      Seq("type" -> lit("customer"),
        "inNation" -> concat(lit("n"), col("c_nationkey")),
        "segment" -> col("c_mktsegment")))
    val supplierTriples = toRdfGraph(Tables.supplier(s, dir),
      concat(lit("s"), col("s_suppkey")),
      Seq("type" -> lit("supplier"),
        "inNation" -> concat(lit("n"), col("s_nationkey"))))
    val triples = customerTriples.unionByName(supplierTriples)
    bgp(triples, Seq(
      TriplePattern(Var("c"), Lit("segment"), Lit("BUILDING")),
      TriplePattern(Var("c"), Lit("inNation"), Var("n")),
      TriplePattern(Var("s"), Lit("type"), Lit("supplier")),
      TriplePattern(Var("s"), Lit("inNation"), Var("n"))))
      .select(col("c"), col("n"), col("s"))
  }

  def bgpQueryOracle: String =
    """SELECT 'c' || c_custkey AS c, 'n' || c_nationkey AS n,
      |  's' || s_suppkey AS s
      |FROM customer JOIN supplier ON c_nationkey = s_nationkey
      |WHERE c_mktsegment = 'BUILDING'""".stripMargin
}
