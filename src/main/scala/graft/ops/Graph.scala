package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Tables

/** Graph operators — the Neptune-shaped surface of the reference
  * (`neptune/_neptune.py:28-123` traversals, `632-692` flatten_nested_df).
  * A property graph on Spark is two DataFrames (vertices, edges) and a
  * traversal is a chain of joins; the star-schema foreign keys of the
  * testdata stand in for edges. Dimension hops broadcast; only fact-table
  * hops shuffle.
  */
object Graph {

  /** Two-hop traversal region←nation←supplier/customer with per-node
    * aggregation — the `g.V().in().in().groupCount()` shape as joins. */
  def twoHop(s: SparkSession, dir: String): DataFrame = {
    val region = broadcast(Tables.region(s, dir))
    val nation = broadcast(Tables.nation(s, dir))
    val sup = Tables.supplier(s, dir)
    val cust = Tables.customer(s, dir)
    val supPerNation = sup.groupBy(col("s_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_suppliers"))
    val custPerNation = cust.groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_customers"))
    nation
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .join(supPerNation, col("n_nationkey") === supPerNation("nk"), "left_outer")
      .join(custPerNation, col("n_nationkey") === custPerNation("nk"), "left_outer")
      .select(col("r_name"), col("n_name"),
        coalesce(supPerNation("n_suppliers"), lit(0L)).as("n_suppliers"),
        coalesce(custPerNation("n_customers"), lit(0L)).as("n_customers"))
  }

  def twoHopOracle: String =
    """SELECT r_name, n_name,
      |  coalesce(s.n_suppliers, 0) AS n_suppliers,
      |  coalesce(c.n_customers, 0) AS n_customers
      |FROM nation
      |JOIN region ON n_regionkey = r_regionkey
      |LEFT OUTER JOIN (SELECT s_nationkey, count(*) AS n_suppliers
      |                 FROM supplier GROUP BY 1) s ON n_nationkey = s.s_nationkey
      |LEFT OUTER JOIN (SELECT c_nationkey, count(*) AS n_customers
      |                 FROM customer GROUP BY 1) c ON n_nationkey = c.c_nationkey""".stripMargin

  /** Triangle-ish 3-hop with a fact edge: customer→order→lineitem→supplier
    * where customer and supplier share a nation (the "local trade"
    * motif (c)-[order]->(l)<-[supplies]-(s), c.nation = s.nation). */
  def motif(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(sup),
        li("l_suppkey") === sup("s_suppkey") &&
          cust("c_nationkey") === sup("s_nationkey"))
      .groupBy(cust("c_nationkey").as("nation"))
      .agg(count(lit(1)).as("n_local_lineitems"),
        countDistinct(ord("o_orderkey")).as("n_orders"))
  }

  def motifOracle: String =
    """SELECT c_nationkey AS nation, count(*) AS n_local_lineitems,
      |  cast(count(DISTINCT o_orderkey) as bigint) AS n_orders
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |GROUP BY c_nationkey""".stripMargin

  /** JSON property extraction (the property-bag column on events) —
    * `flatten_nested_df` for semi-structured payloads. */
  def flattenProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  def flattenPropsOracle: String =
    """SELECT event_type, cast(k % 10 as int) AS k_mod, count(*) AS n,
      |  min(k) AS min_k, max(k) AS max_k
      |FROM (SELECT event_type,
      |        cast(json_extract_string(props, '$.k') as int) AS k
      |      FROM events) t
      |GROUP BY 1, 2""".stripMargin

  /** Property graph as two DataFrames — the Neptune data model
    * (`neptune/_neptune.py:126-211`: `~id`/`~label` vertices, edges with
    * `~from`/`~to`). Traversal steps compile to joins: `out(label)` /
    * `in(label)` hop along edges, `has` filters the frontier — the
    * Gremlin-shaped subset the reference ships queries through.
    * Dimension-sized frontiers broadcast automatically (Catalyst stats).
    */
  final case class PropertyGraph(vertices: DataFrame, edges: DataFrame) {
    import org.apache.spark.sql.functions.{col => c}

    /** Current frontier = vertex set; start from all or a filtered set. */
    def v(): Traversal = Traversal(this, vertices)
    def v(filter: Column): Traversal = Traversal(this, vertices.filter(filter))
  }

  final case class Traversal(g: PropertyGraph, frontier: DataFrame) {
    import org.apache.spark.sql.functions.{col => c}

    /** Follow outgoing edges with `label`; frontier becomes the targets. */
    def out(label: String): Traversal = {
      val e = g.edges.filter(c("label") === label)
        .select(c("src"), c("dst"))
      val next = frontier.select(c("id").as("src"))
        .join(e, "src")
        .select(c("dst").as("id")).distinct()
        .join(g.vertices, "id")
      Traversal(g, next)
    }

    /** Follow incoming edges with `label`. */
    def in(label: String): Traversal = {
      val e = g.edges.filter(c("label") === label)
        .select(c("src"), c("dst"))
      val next = frontier.select(c("id").as("dst"))
        .join(e, "dst")
        .select(c("src").as("id")).distinct()
        .join(g.vertices, "id")
      Traversal(g, next)
    }

    /** Follow edges with `label` in EITHER direction (Gremlin `both`). */
    def both(label: String): Traversal = {
      val e = g.edges.filter(c("label") === label)
        .select(c("src"), c("dst"))
      val viaOut = frontier.select(c("id").as("src"))
        .join(e, "src").select(c("dst").as("id"))
      val viaIn = frontier.select(c("id").as("dst"))
        .join(e, "dst").select(c("src").as("id"))
      Traversal(g, viaOut.unionByName(viaIn).distinct()
        .join(g.vertices, "id"))
    }

    /** Keep only frontier vertices that HAVE such an edge (Gremlin
      * `where(out('l'))` / `where(in('l'))` / `where(both('l'))`) — a
      * left-semi join, no frontier movement. */
    def hasEdge(label: String, direction: String): Traversal = {
      val e = g.edges.filter(c("label") === label)
      val withEdge = direction match {
        case "out" => frontier.join(
          e.select(c("src").as("id")), Seq("id"), "left_semi")
        case "in" => frontier.join(
          e.select(c("dst").as("id")), Seq("id"), "left_semi")
        case "both" => frontier.join(
          e.select(c("src").as("id"))
            .unionByName(e.select(c("dst").as("id"))), Seq("id"), "left_semi")
        case other => throw new IllegalArgumentException(
          s"unknown edge direction: $other")
      }
      Traversal(g, withEdge)
    }

    /** The outgoing/incoming EDGES of the frontier (Gremlin `outE`/`inE`)
      * with all their properties — step back to vertices with the
      * returned frame's `src`/`dst`. */
    def outE(label: String): DataFrame =
      g.edges.filter(c("label") === label)
        .join(frontier.select(c("id").as("src")), Seq("src"), "left_semi")

    def inE(label: String): DataFrame =
      g.edges.filter(c("label") === label)
        .join(frontier.select(c("id").as("dst")), Seq("dst"), "left_semi")

    def has(predicate: Column): Traversal =
      Traversal(g, frontier.filter(predicate))

    def values: DataFrame = frontier
    def count(): Long = frontier.count()
  }

  /** The testdata star schema as a property graph: nations/regions/
    * customers/suppliers as vertices, foreign keys as edges. */
  def testGraph(s: SparkSession, dir: String): PropertyGraph = {
    val nation = Tables.nation(s, dir)
      .select(concat(lit("n"), col("n_nationkey")).as("id"),
        lit("nation").as("vlabel"), col("n_name").as("name"))
    val region = Tables.region(s, dir)
      .select(concat(lit("r"), col("r_regionkey")).as("id"),
        lit("region").as("vlabel"), col("r_name").as("name"))
    val supplier = Tables.supplier(s, dir)
      .select(concat(lit("s"), col("s_suppkey")).as("id"),
        lit("supplier").as("vlabel"), col("s_name").as("name"))
    val vertices = nation.unionByName(region).unionByName(supplier)
    // edges carry properties (Neptune edges are property-bearing too):
    // located_in gets the supplier's account balance as `weight`
    val inRegion = Tables.nation(s, dir)
      .select(concat(lit("n"), col("n_nationkey")).as("src"),
        concat(lit("r"), col("n_regionkey")).as("dst"),
        lit("in_region").as("label"),
        lit(null).cast("double").as("weight"))
    val locatedIn = Tables.supplier(s, dir)
      .select(concat(lit("s"), col("s_suppkey")).as("src"),
        concat(lit("n"), col("s_nationkey")).as("dst"),
        lit("located_in").as("label"),
        col("s_acctbal").cast("double").as("weight"))
    PropertyGraph(vertices, inRegion.unionByName(locatedIn))
  }

  /** Weakly-connected components of the high-volume trade graph:
    * vertices are customers (even ids) and suppliers (odd ids), an
    * undirected edge joins a customer to a supplier when a ≥48-quantity
    * lineitem links them through an order. Components via the same
    * alternating large-star/small-star kernel the dedup family uses
    * ([[Dedup.connectedComponents]]) — O(log n) rounds of two
    * groupBy-min + equi-join passes, no driver-side graph. The Gremlin/
    * openCypher component queries (`g.V().…` cluster analyses) are this
    * operator. */
  def wcc(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).where(col("l_quantity") >= 48)
    val ord = Tables.orders(s, dir)
    val edges = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select((col("o_custkey") * 2).as("u"),
        (col("l_suppkey") * 2 + 1).as("v"))
      .distinct()
    // the star edges label every non-root node; roots label themselves
    val labels = Dedup.connectedComponents(edges)
    val nodes = edges.select(col("u").as("node"))
      .union(edges.select(col("v").as("node"))).distinct()
    nodes.join(labels, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node"))
        .as("component"))
  }

  def wccOracle: String =
    """WITH RECURSIVE edges AS (
      |  SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_quantity >= 48),
      |und AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
      |nodes AS (SELECT DISTINCT u AS node FROM und),
      |walk(node, lab) AS (
      |  SELECT node, node FROM nodes
      |  UNION
      |  SELECT und.u, walk.lab FROM walk JOIN und ON walk.node = und.v)
      |SELECT node, min(lab) AS component FROM walk GROUP BY node""".stripMargin

  /** Triangle counting — the classic distributed graph workload (the
    * clustering-coefficient numerator every graph-analytics engine
    * ships), over the co-purchase graph: customers are adjacent when
    * they bought the SAME part at high quantity. Plan shape: the edge
    * list builds from one equi-self-join per part (sparse by the
    * quantity filter), then triangles close with TWO hash joins over
    * the `u < v < w` canonical orientation — each triangle counted
    * exactly once, no permutation blowup, intermediate wedge volume
    * bounded by Σ deg². Pure integer counting, bit-exact vs DuckDB. */
  def triangles(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.lineitem(s, dir).where(col("l_quantity") >= 45)
      .join(Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey").as("pk"), col("o_custkey").as("cust"))
      .distinct()
    // the canonical edge list feeds FOUR plan branches (three triangle
    // join legs + the edge count) and each recompute re-runs the
    // lineitem⋈orders join plus the per-part self-join — persist the
    // two-long-column rows once (r16; the narrow-cache case, not the
    // rejected text-cache one). DISK_ONLY (r17, the repo convention for
    // corpus-proportional rows — Dedup's winnow fingerprints apply the
    // same rule): edges are far under the wedge volume the query then
    // enumerates, but at 100 TB a co-purchase edge list can still
    // pressure the block manager, and the recompute being avoided is
    // I/O-shaped either way.
    val edges = t.toDF("pk", "u")
      .join(t.toDF("pk", "v"), "pk")
      .where(col("u") < col("v"))
      .select(col("u"), col("v")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    graft.ops.Dedup.registerCache(edges)
    val tri = edges.toDF("u", "v")
      .join(edges.toDF("v", "w"), "v")
      .join(edges.toDF("u", "w"), Seq("u", "w"))
    tri.agg(count(lit(1)).as("n_triangles"))
      .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
  }

  def trianglesOracle: String =
    """WITH t AS (
      |  SELECT DISTINCT l_partkey AS pk, o_custkey AS cust
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_quantity >= 45
      |), edges AS (
      |  SELECT DISTINCT a.cust AS u, b.cust AS v
      |  FROM t a JOIN t b ON a.pk = b.pk AND a.cust < b.cust
      |)
      |SELECT
      |  (SELECT count(*) FROM edges e1
      |     JOIN edges e2 ON e2.u = e1.v
      |     JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles,
      |  (SELECT count(*) FROM edges) AS n_edges""".stripMargin

  /** Recursively flatten struct columns into `parent_child` top-level
    * columns (arrays left intact) — the general `flatten_nested_df`
    * utility, usable on any DataFrame. */
  def flattenSchema(df: DataFrame, sep: String = "_"): DataFrame = {
    def cols(schema: StructType, prefix: String): Seq[org.apache.spark.sql.Column] =
      schema.fields.flatMap { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        val alias = path.replace(".", sep)
        f.dataType match {
          case st: StructType => cols(st, path)
          case _ => Seq(col(path).as(alias))
        }
      }
    df.select(cols(df.schema, ""): _*)
  }
}
