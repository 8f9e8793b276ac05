package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.SchemaEvolution
import graft.ops.{Cypher, Graph, Gremlin, TimeSeries, VectorStore}

/** Round-4 surface: the Gremlin text dialect, Glue-style additive schema
  * evolution on write, the Timestream unload call shape, and the
  * vector-store CRUD + embed hook. */
class Round4Spec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-r4").toString

  // ---- Gremlin text dialect -----------------------------------------------

  test("gremlin text equals the programmatic traversal") {
    val g = Graph.testGraph(spark, sf)
    val text = Gremlin.query(g,
      "g.V().hasLabel('region').has('name','EUROPE')" +
        ".in('in_region').in('located_in').values('name')")
      .collect().map(_.getString(0)).toSet
    val api = g.v(col("vlabel") === "region" && col("name") === "EUROPE")
      .in("in_region").in("located_in")
      .values.select(col("name"))
      .collect().map(_.getString(0)).toSet
    assert(text == api && text.nonEmpty)
  }

  test("gremlin text equals the cypher compilation of the same pattern") {
    val g = Graph.testGraph(spark, sf)
    val gremlin = Gremlin.query(g,
      "g.V().hasLabel('region').has('name','ASIA')" +
        ".in('in_region').in('located_in').values('name')")
      .collect().map(_.getString(0)).toSet
    val cypher = Cypher.supplierRegionQuery(spark, sf)
      .collect().map(_.getString(0)).toSet
    assert(gremlin == cypher)
  }

  test("gremlin: V(ids), P predicates, dedup, limit, count") {
    val g = Graph.testGraph(spark, sf)
    // start from explicit vertex ids
    val byId = Gremlin.query(g, "g.V('r0','r1').values('name')").count()
    assert(byId == 2)
    // P predicate on a property
    val within = Gremlin.query(g,
      "g.V().hasLabel('region').has('name', within('ASIA','EUROPE')).id()")
      .collect().map(_.getString(0)).toSet
    assert(within.size == 2)
    // count() terminal
    val n = Gremlin.query(g, "g.V().hasLabel('nation').count()")
      .head().getLong(0)
    assert(n == 25)
    // neq predicate + limit
    val lim = Gremlin.query(g,
      "g.V().hasLabel('region').has('name', neq('ASIA')).limit(2).values('name')")
      .count()
    assert(lim == 2)
    // unsupported step raises
    intercept[IllegalArgumentException](
      Gremlin.query(g, "g.V().repeat(out('x'))"))
  }

  test("gremlin: both, where(edge-existence), order().by, edge values") {
    val g = Graph.testGraph(spark, sf)
    // both() from a region reaches its nations regardless of direction
    val viaBoth = Gremlin.query(g,
      "g.V().hasLabel('region').has('name','ASIA').both('in_region').values('name')")
      .collect().map(_.getString(0)).toSet
    val viaIn = Gremlin.query(g,
      "g.V().hasLabel('region').has('name','ASIA').in('in_region').values('name')")
      .collect().map(_.getString(0)).toSet
    assert(viaBoth == viaIn && viaBoth.size == 5)
    // both() from a nation reaches its region AND its suppliers
    val around = Gremlin.query(g,
      "g.V('n0').both('in_region').count()").head().getLong(0)
    assert(around == 1, "n0's only in_region neighbor is its region")
    // where(out(...)) keeps only vertices WITH such an edge: all 25
    // nations have a region; no region has an outgoing in_region edge
    assert(Gremlin.query(g,
      "g.V().hasLabel('nation').where(__.out('in_region')).count()")
      .head().getLong(0) == 25)
    assert(Gremlin.query(g,
      "g.V().hasLabel('region').where(out('in_region')).count()")
      .head().getLong(0) == 0)
    // order().by desc on a projection
    val ordered = Gremlin.query(g,
      "g.V().hasLabel('region').values('name').order().by('name', desc)")
      .collect().map(_.getString(0))
    assert(ordered.toSeq == ordered.sorted.reverse.toSeq && ordered.length == 5)
    // edge frontier: outE carries edge properties (weight = acctbal)
    val weights = Gremlin.query(g,
      "g.V().hasLabel('supplier').outE('located_in').values('weight')")
    assert(weights.columns.toSeq == Seq("weight"))
    assert(weights.filter(col("weight").isNotNull).count() ==
      Gremlin.query(g, "g.V().hasLabel('supplier').count()").head().getLong(0))
    // inV steps back to vertices from the edge frontier — same set as
    // the direct out().dedup() hop
    val viaEdges = Gremlin.query(g,
      "g.V().hasLabel('supplier').outE('located_in').inV().hasLabel('nation').count()")
      .head().getLong(0)
    val viaOut = Gremlin.query(g,
      "g.V().hasLabel('supplier').out('located_in').dedup().count()")
      .head().getLong(0)
    assert(viaEdges == viaOut && viaEdges > 0)
  }

  // ---- schema evolution on write ------------------------------------------

  test("schema evolution: append with a new column evolves the table") {
    val spark0 = spark
    import spark0.implicits._
    val loc = s"${tmp()}/t"
    spark.sql("DROP TABLE IF EXISTS evo_t")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write
      .option("path", loc).saveAsTable("evo_t")

    val d = SchemaEvolution.appendToTable(
      Seq((3L, "c", 9.5)).toDF("id", "v", "score"), "evo_t")
    assert(d.toAdd.map(_.name) == Seq("score"))

    val back = spark.table("evo_t")
    assert(back.columns.toSeq == Seq("id", "v", "score"))
    val rows = back.as[(Long, String, Option[Double])].collect().toSet
    assert(rows == Set((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(9.5))))
    spark.sql("DROP TABLE evo_t")
  }

  test("schema evolution: widening cast allowed, narrowing raises") {
    val spark0 = spark
    import spark0.implicits._
    val loc = s"${tmp()}/t"
    spark.sql("DROP TABLE IF EXISTS evo_w")
    Seq((1L, 2.0)).toDF("id", "x").write
      .option("path", loc).saveAsTable("evo_w")

    // int frame column widens into the bigint table column
    SchemaEvolution.appendToTable(
      Seq((2, 3.0f)).toDF("id", "x"), "evo_w")
    assert(spark.table("evo_w").count() == 2)
    assert(spark.table("evo_w").schema("id").dataType.simpleString == "bigint")

    // string into double is an incompatible type change
    intercept[SchemaEvolution.SchemaEvolutionException](
      SchemaEvolution.appendToTable(
        Seq((3L, "not-a-number")).toDF("id", "x"), "evo_w"))

    // strict mode rejects even additive drift
    intercept[SchemaEvolution.SchemaEvolutionException](
      SchemaEvolution.appendToTable(
        Seq((4L, 1.0, "extra")).toDF("id", "x", "y"), "evo_w",
        schemaEvolution = false))
    spark.sql("DROP TABLE evo_w")
  }

  test("schema evolution: missing frame columns land as NULL") {
    val spark0 = spark
    import spark0.implicits._
    val loc = s"${tmp()}/t"
    spark.sql("DROP TABLE IF EXISTS evo_m")
    Seq((1L, "a", 1.0)).toDF("id", "v", "x").write
      .option("path", loc).saveAsTable("evo_m")
    SchemaEvolution.appendToTable(Seq((2L, "b")).toDF("id", "v"), "evo_m")
    val back = spark.table("evo_m").as[(Long, String, Option[Double])]
      .collect().toSet
    assert(back == Set((1L, "a", Some(1.0)), (2L, "b", None)))
    spark.sql("DROP TABLE evo_m")
  }

  test("schema evolution: generated ALTER statement matches the drift") {
    val existing = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val incoming = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType)))
    assert(SchemaEvolution.generateAlterStatements("t", existing, incoming) ==
      Seq("ALTER TABLE t ADD COLUMNS (`name` string)"))
    assert(SchemaEvolution.generateAlterStatements("t", incoming, incoming)
      .isEmpty)
  }

  // ---- timestream unload call shape ---------------------------------------

  test("timestream unload: partitioned export + read-back") {
    Tables.registerAll(spark, sf)
    val out = s"${tmp()}/unload"
    val df = TimeSeries.unload(spark,
      "SELECT event_type, user_id, value FROM events",
      out, partitionedBy = Seq("event_type"))
    // hive-partitioned directories per event_type
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new Path(out)).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("event_type=")).toSeq
    assert(dirs.nonEmpty)
    assert(df.count() == Tables.events(spark, sf).count())
    assert(df.columns.toSet == Set("event_type", "user_id", "value"))

    // csv form writes header'd files
    val outCsv = s"${tmp()}/unload_csv"
    TimeSeries.unloadToFiles(spark,
      "SELECT user_id, count(*) AS n FROM events GROUP BY 1",
      outCsv, format = "csv", compression = "gzip")
    val back = spark.read.option("header", "true").csv(outCsv)
    assert(back.columns.toSeq == Seq("user_id", "n"))
    assert(back.count() > 0)
  }

  // ---- vector store CRUD + embed hook --------------------------------------

  test("vector store: put_vectors_from_df routes texts through the embed hook") {
    val spark0 = spark
    import spark0.implicits._
    val store = s"${tmp()}/vstore"
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "how vexingly quick daft zebras jump"),
      (4L, "sphinx of black quartz judge my vow"),
      (5L, "the five boxing wizards jump quickly")
    ).toDF("key", "text")
    val emb = VectorStore.HashEmbedder(dim = 16, batchSize = 2)
    val n = VectorStore.putVectorsFromDf(corpus, store, embedder = emb)
    assert(n == 5)

    // stored rows carry the embedding produced by the hook
    val stored = spark.read.parquet(store)
    assert(stored.columns.toSet == Set("key", "text", "embedding"))
    val e1 = stored.filter(col("key") === 1L)
      .select("embedding").head().getSeq[Float](0)
    assert(e1 == emb.embedBatch(Seq(corpus.head().getString(1))).head.toSeq)

    // query by text: the exact same text must come back rank-1, cosine 1
    val hit = VectorStore.queryByText(spark, store,
      "pack my box with five dozen liquor jugs", k = 1, embedder = emb)
      .head()
    assert(hit.getAs[String]("label") == "2")
    assert(math.abs(hit.getAs[Double]("cosine") - 1.0) < 1e-6)
  }

  test("vector store: get / list / delete") {
    val spark0 = spark
    import spark0.implicits._
    val store = s"${tmp()}/vstore"
    val emb = VectorStore.HashEmbedder(dim = 8)
    VectorStore.putVectorsFromDf(
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("key", "text"),
      store, embedder = emb)

    assert(VectorStore.getVectors(spark, store, Seq(1L, 3L))
      .select("key").as[Long].collect().toSet == Set(1L, 3L))
    assert(VectorStore.listVectors(spark, store).count() == 3)
    assert(VectorStore.listVectors(spark, store,
      Some(Map("key" -> Map("$gt" -> 1)))).count() == 2)

    // upsert: same key replaces the row (store count unchanged)
    VectorStore.putVectors(
      VectorStore.embedText(Seq((2L, "BETA")).toDF("key", "text"), "text", emb),
      store)
    val after = spark.read.parquet(store)
    assert(after.count() == 3)
    assert(after.filter(col("key") === 2L).head().getAs[String]("text") == "BETA")

    VectorStore.deleteVectors(spark, store, Seq(1L))
    assert(spark.read.parquet(store).count() == 2)
  }
}
