package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

/** Specs for the Spark-only operators (hash families / window semantics
  * with no SQL oracle) plus library-level behaviors. The oracled queries
  * are covered by the Verify + DuckDB differential gate.
  */
class OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and returns a schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.schema.fields.nonEmpty, name)
    }
  }

  test("minhash fast variant: pairs are ordered, estimates in [0,1]") {
    val df = Dedup.minhashLshFast(spark, sf).cache()
    val n = df.count()
    assert(n > 0, "expected candidate pairs on near-dup corpus")
    assert(df.filter(col("d1") >= col("d2")).count() == 0)
    assert(df.filter(col("est_jaccard") < 0.0 || col("est_jaccard") > 1.0)
      .count() == 0)
  }

  test("minhash fast est correlates with exact jaccard on identical docs") {
    // a document compared with itself must estimate 1.0
    val docs = Tables.documents(spark, sf).limit(5)
      .select(col("doc_id"), col("text"))
    val sig = docs.withColumn("toks", array_distinct(split(col("text"), " ")))
    // identical token sets => identical signatures => all bands match
    val self = Dedup.minhashLshFast(spark, sf)
      .filter(col("est_jaccard") === 1.0)
    // existence is data-dependent; the invariant: est==1 implies shared band
    assert(self.filter(col("d1") === col("d2")).count() == 0)
  }

  test("simhash: hamming bounded and symmetric ordering") {
    val df = Dedup.simhash(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("hamming") > 16 || col("hamming") < 0).count() == 0)
    assert(df.filter(col("d1") >= col("d2")).count() == 0)
  }

  test("sliding window covers each event exactly 4 times") {
    val total = Tables.events(spark, sf).count()
    val slidingSum = TimeSeries.sliding(spark, sf)
      .agg(sum(col("n"))).head().getLong(0)
    assert(slidingSum == 4 * total,
      s"1h window / 15min slide must place each event in 4 buckets " +
        s"($slidingSum vs ${4 * total})")
  }

  test("knn lsh candidates come from the query bucket and rank by cosine") {
    val df = Vectors.knnLsh(spark, sf)
    val rows = df.collect()
    assert(rows.length <= 10)
    assert(rows.map(_.getAs[Long]("bucket")).distinct.length <= 1)
  }

  test("knn exact returns 10 ordered neighbours") {
    assert(Vectors.knnExact(spark, sf).count() == 10)
  }

  test("ivf search recalls most exact neighbours with 3 of 10 probes") {
    val exact = Vectors.knnExact(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val ivf = Vectors.ivfSearch(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(ivf.size == 10)
    // probing 3/10 coarse cells must still recover a meaningful share
    assert((exact intersect ivf).size >= 3,
      s"recall too low: ${(exact intersect ivf).size}/10")
  }

  test("bucketed asof join equals the plain asof join within horizon") {
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    // horizon covers the whole month => identical results
    val plain = ops.AsOf.asofJoin(clicks, purchases, Seq("user_id"),
      "click_ts", "purchase_ts")
      .select("click_id", "purchase_id").collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet
    val bucketed = ops.AsOf.asofJoinBucketed(clicks, purchases,
      Seq("user_id"), "click_ts", "purchase_ts",
      bucketSeconds = 86400, horizonBuckets = 40)
      .select("click_id", "purchase_id").collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet
    assert(plain == bucketed && plain.nonEmpty)
  }

  test("flattenSchema flattens nested structs") {
    import spark.implicits._
    val df = Seq((1, (2, (3, "x")))).toDF("a", "b")
    val flat = Graph.flattenSchema(df)
    assert(flat.columns.toSeq == Seq("a", "b__1", "b__2__1", "b__2__2"))
    assert(flat.head().getInt(2) == 3)
  }

  test("property-graph traversal compiles hops to joins") {
    val g = ops.Graph.testGraph(spark, sf)
    // suppliers located in nations of one region == SQL join count
    val europeNations = g.v(col("vlabel") === "region")
      .has(col("name") === "EUROPE")
      .in("in_region")
    val nEurope = europeNations.count()
    val sqlCount = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey")).count()
    assert(nEurope == sqlCount && nEurope > 0)
    // two hops: suppliers in those nations
    val suppliers = europeNations.in("located_in")
    val sqlSupp = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey")).count()
    assert(suppliers.count() == sqlSupp)
    // forward hop returns to the region
    assert(suppliers.out("located_in").out("in_region")
      .values.select("name").distinct().head().getString(0) == "EUROPE")
  }

  test("search query DSL compiles match/term/range/bool") {
    val docs = Tables.documents(spark, sf)
    val got = ops.Search.search(docs, Map(
      "bool" -> Map(
        "must" -> Seq(
          Map("match" -> Map("text" -> "spark join")),
          Map("range" -> Map("n_chars" -> Map("gte" -> 100, "lt" -> 400)))),
        "must_not" -> Seq(Map("term" -> Map("lang" -> "zh"))))))
    val manual = docs.filter(
      (expr("array_contains(split(lower(text), ' '), 'spark')") ||
        expr("array_contains(split(lower(text), ' '), 'join')")) &&
        col("n_chars") >= 100 && col("n_chars") < 400 &&
        !(col("lang") === "zh"))
    assert(got.count() == manual.count() && got.count() > 0)
    intercept[IllegalArgumentException](
      ops.Search.compileQueryDsl(Map("fuzzy" -> Map("x" -> "y"))))
  }

  test("search DSL round-12 kinds: match_phrase/exists/prefix/wildcard/minimum_should_match") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, "the data engine runs", Some("en")),
      (2L, "data the engine runs", Some("en")),    // phrase out of order
      (3L, "THE DATA loud case", Some("es")),      // analyzer lowercases
      (4L, "prefix the dataset here", Some("fr")), // 'dataset' ≠ 'data' token
      (5L, "no match at all", None))
      .toDF("doc_id", "text", "lang")
    def ids(q: Map[String, Any]): Set[Long] =
      ops.Search.search(docs, q).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    // match_phrase: adjacency + order + case-insensitive analysis
    assert(ids(Map("match_phrase" -> Map("text" -> "the data"))) ==
      Set(1L, 3L))
    assert(ids(Map("match_phrase" -> Map("text" -> "The  Data"))) ==
      Set(1L, 3L), "analyzer collapses whitespace and case")
    // single-term phrase degrades to token membership, not substring
    assert(ids(Map("match_phrase" -> Map("text" -> "data"))) ==
      Set(1L, 2L, 3L))
    // exists / prefix / wildcard (keyword-style: case-sensitive)
    assert(ids(Map("exists" -> Map("field" -> "lang"))) ==
      Set(1L, 2L, 3L, 4L))
    assert(ids(Map("prefix" -> Map("text" -> "prefix"))) == Set(4L))
    assert(ids(Map("prefix" -> Map("text" -> "THE"))) == Set(3L))
    assert(ids(Map("wildcard" -> Map("lang" -> "e?"))) == Set(1L, 2L, 3L))
    assert(ids(Map("wildcard" -> Map("text" -> "*engine*"))) == Set(1L, 2L))
    // regex metacharacters in a wildcard are literal
    assert(ids(Map("wildcard" -> Map("text" -> "*.*"))) == Set.empty[Long])
    // minimum_should_match counts satisfied should clauses:
    // doc1 satisfies all three, doc2 two, doc3 one, docs 4-5 none
    val should = Seq(
      Map("match" -> Map("text" -> "engine")),
      Map("match_phrase" -> Map("text" -> "the data")),
      Map("term" -> Map("lang" -> "en")))
    assert(ids(Map("bool" -> Map("should" -> should,
      "minimum_should_match" -> 2))) == Set(1L, 2L))
    assert(ids(Map("bool" -> Map("should" -> should,
      "minimum_should_match" -> 1))) == Set(1L, 2L, 3L))
    // ...and composes with must
    assert(ids(Map("bool" -> Map(
      "must" -> Seq(Map("exists" -> Map("field" -> "lang"))),
      "should" -> should, "minimum_should_match" -> 3))) == Set(1L))
    // OpenSearch default: with must present and NO explicit
    // minimum_should_match, should is scoring-only (msm = 0) — the
    // should clause must not filter anything
    assert(ids(Map("bool" -> Map(
      "must" -> Seq(Map("exists" -> Map("field" -> "lang"))),
      "should" -> Seq(Map("match" -> Map("text" -> "engine")))))) ==
      Set(1L, 2L, 3L, 4L))
    // must_not against a missing/null field is a non-match: the doc is
    // KEPT (doc 5 has lang = None; three-valued NOT would drop it)
    assert(ids(Map("bool" -> Map(
      "must_not" -> Seq(Map("term" -> Map("lang" -> "de")))))) ==
      Set(1L, 2L, 3L, 4L, 5L))
  }

  test("data-quality ruleset evaluates every rule in one pass") {
    val res = DataQuality.lineitemRuleset(spark, sf).collect()
    assert(res.length == 5)
    assert(res.forall(_.getAs[Boolean]("passed")))
  }

  test("nearest_centroid skips null centroids; empty set raises") {
    graft.expr.NearestCentroid.register(spark)
    // the null-embedding centroid must never win; the valid one does
    val r = spark.sql(
      """SELECT nearest_centroid(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |  array(named_struct('c_id', CAST(1 AS BIGINT),
        |                     'centroid', CAST(NULL AS ARRAY<FLOAT>)),
        |        named_struct('c_id', CAST(2 AS BIGINT),
        |                     'centroid', CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)))) AS c""".stripMargin)
    assert(r.head().getLong(0) == 2L)
    // only null centroids → loud failure, never an invented assignment
    intercept[Exception](spark.sql(
      """SELECT nearest_centroid(CAST(array(1.0) AS ARRAY<FLOAT>),
        |  array(named_struct('c_id', CAST(1 AS BIGINT),
        |                     'centroid', CAST(NULL AS ARRAY<FLOAT>)))) AS c""".stripMargin)
      .head())
  }
}
