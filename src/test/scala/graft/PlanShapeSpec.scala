package graft

import java.io.ByteArrayOutputStream
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the scale-relevant plan properties —
  * scan pushdown, column pruning, broadcast choices, top-k via
  * TakeOrderedAndProject — asserted on the formatted plan so a future
  * refactor cannot silently regress them.
  */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    val out = new ByteArrayOutputStream()
    Console.withOut(out) { df.explain("formatted") }
    out.toString
  }

  test("q6 scan pushes all three predicates and prunes columns") {
    val p = planOf("q6_forecast_revenue")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)"))
    assert(p.contains("LessThan(l_quantity,24.0)"))
    // projection pruned to the 4 referenced columns — a full-width read
    // would list all 11
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_tax"))
  }

  test("q3 broadcasts the filtered dimension and plans top-k without a global sort") {
    val p = planOf("q3_shipping_priority")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"))
  }

  test("q19 top-k uses TakeOrderedAndProject") {
    assert(planOf("q19_top_k").contains("TakeOrderedAndProject"))
  }

  test("text_classifier broadcasts the weight table; one shuffle only") {
    val p = planOf("text_classifier")
    assert(p.contains("BroadcastHashJoin"),
      "weights must broadcast, not shuffle-join")
    // the per-document sum is the ONLY exchange beyond the broadcast
    assert(!p.contains("SortMergeJoin"))
  }

  test("curate_pipeline: decontamination gram set broadcasts over the corpus") {
    val p = planOf("curate_pipeline")
    assert(p.contains("BroadcastHashJoin"),
      "benchmark grams must reach the corpus as a broadcast")
  }

  test("q22 global ntile never funnels into a single-partition window") {
    // the distributed formulation: range exchange + per-range window,
    // never an `Exchange SinglePartition` feeding a global sort
    val p = planOf("q22_cte_chain")
    assert(!p.contains("SinglePartition"),
      "q22 plan collapsed to a single partition:\n" + p)
  }

  test("kv point lookup pushes the key equality into the scan") {
    val p = planOf("kv_point_lookup")
    assert(p.contains("EqualTo(c_custkey,42)"))
  }

  test("q1 aggregates with map-side partials (two-phase hash aggregate)") {
    val p = planOf("q1_pricing_summary")
    // partial + final HashAggregate pair around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("Exchange"))
  }

  test("vec_knn_lsh carries the hyperplane matrix as a literal, not md5 calls") {
    val p = planOf("vec_knn_lsh")
    // per-row md5 of the hyperplane seed would show up in the plan; the
    // matrix must be a precomputed literal (only the signature fold runs
    // per row)
    assert(!p.toLowerCase.contains("md5"),
      "hyperplane matrix must be precomputed, not hashed per row")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("graph_cypher hops broadcast and never go cartesian") {
    val p = planOf("graph_cypher")
    // label filters constant-fold away non-matching union branches, so
    // they never appear as runtime predicates; the hops themselves must
    // be broadcast equi-joins
    assert(p.contains("BroadcastHashJoin"), "dimension-sized hops broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("graph_bgp predicate-literal patterns filter before joining") {
    val p = planOf("graph_bgp")
    // the segment literal must reach a Filter below the joins, not sit
    // above the cartesian result
    assert(p.contains("BUILDING"))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
  }

  test("ts_sliding_window expands windows without a shuffle-per-bucket") {
    val p = planOf("ts_sliding_window")
    // window expansion via Expand — not four separate scans of events
    assert("Expand".r.findAllIn(p).size >= 1)
    assert("Scan parquet".r.findAllIn(p).size <= 2)
  }

  test("decontamination broadcasts the benchmark gram set over the corpus stream") {
    val p = planOf("curate_decontaminate")
    // the corpus side must meet the benchmark grams in a map-side
    // broadcast join — a shuffle of corpus grams would not survive 100 TB.
    // Shuffle exchanges print as "(N) Exchange" in the details section
    // (BroadcastExchange prints as "(N) BroadcastExchange"): allowed are
    // the benchmark-side distinct and the per-doc count aggregate only.
    assert(p.contains("BroadcastHashJoin"))
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size <= 2,
      "corpus grams must not shuffle before the contamination join")
  }

  test("stratified sample is a pure map-side filter — no exchange at all") {
    val p = planOf("curate_strat_sample")
    assert("""\(\d+\) Exchange""".r.findAllIn(p).isEmpty,
      "a keep-predicate sample must not shuffle anything")
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1)
  }
}
