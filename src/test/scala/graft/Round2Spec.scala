package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.DatasetWriter
import graft.ops.{AsOf, Search}
import graft.sql.SqlEngine

/** Round-2 fixes: server-side parameter binding, cache TTL/invalidation,
  * as-of duplicate-left semantics, bucketed overwrite-partitions
  * correctness, query-DSL injection safety. */
class Round2Spec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-r2").toString

  // ---- parameterized SQL -------------------------------------------------

  test("formatSql: word boundary — :date does not eat :dateTime / :date_2") {
    val out = SqlEngine.formatSql(
      "SELECT :date, :dateTime, :date_2",
      Map("date" -> "a", "dateTime" -> "b", "date_2" -> "c"))
    assert(out == "SELECT 'a', 'b', 'c'")
  }

  test("formatSql: unbound parameter is an error") {
    val e = intercept[IllegalArgumentException] {
      SqlEngine.formatSql("SELECT :bound, :missing", Map("bound" -> 1))
    }
    assert(e.getMessage.contains("missing"))
  }

  test("server-side named params: scalar type matrix binds correctly") {
    val df = SqlEngine.readSqlQuery(spark,
      """SELECT :s AS s, :i AS i, :b AS b, :d AS d, :ts AS ts, :dt AS dt,
        |       :n AS n""".stripMargin,
      Map(
        "s" -> "it's",
        "i" -> 42,
        "b" -> true,
        "d" -> new java.math.BigDecimal("12.34"),
        "ts" -> java.sql.Timestamp.valueOf("2024-05-01 12:00:00"),
        "dt" -> java.sql.Date.valueOf("2024-05-01"),
        "n" -> null))
    val r = df.head()
    assert(r.getString(0) == "it's")
    assert(r.getInt(1) == 42)
    assert(r.getBoolean(2))
    assert(r.getDecimal(3).toPlainString == "12.34")
    assert(r.getTimestamp(4) == java.sql.Timestamp.valueOf("2024-05-01 12:00:00"))
    assert(r.getDate(5) == java.sql.Date.valueOf("2024-05-01"))
    assert(r.isNullAt(6))
  }

  test("server-side named params: injection payload stays data") {
    val payload = "x'; DROP TABLE lineitem; --"
    val df = SqlEngine.readSqlQuery(spark, "SELECT :v AS v",
      Map("v" -> payload))
    assert(df.head().getString(0) == payload)
  }

  test("collection params render as ARRAY/MAP literals alongside scalars") {
    val df = SqlEngine.readSqlQuery(spark,
      "SELECT array_contains(:xs, :x) AS hit, :m AS m",
      Map("xs" -> Seq(1, 2, 3), "x" -> 2, "m" -> Map("k" -> 1)))
    val r = df.head()
    assert(r.getBoolean(0))
    assert(r.getAs[Map[String, Int]]("m") == Map("k" -> 1))
  }

  test("qmark positional binding") {
    val df = SqlEngine.readSqlQueryQmark(spark,
      "SELECT ? AS a, ? AS b", Seq(7, "x"))
    val r = df.head()
    assert(r.getInt(0) == 7 && r.getString(1) == "x")
  }

  test(":name inside a cast-like token is untouched") {
    // `::` cast syntax must not be treated as a parameter
    val df = SqlEngine.readSqlQuery(spark, "SELECT '5'::int AS v",
      Map.empty[String, Any])
    assert(df.head().getInt(0) == 5)
  }

  // ---- query cache -------------------------------------------------------

  test("query cache: TTL expiry and dataset-write invalidation") {
    val cache = SqlEngine.cacheFor(spark)
    cache.clear()
    val sql = "SELECT 1 AS one -- r2-cache-spec"
    SqlEngine.readSqlQuery(spark, sql, useCache = true)
    assert(cache.get(sql).isDefined, "warm hit expected")
    // TTL: an entry older than maxAge is dropped
    Thread.sleep(1100)
    assert(cache.get(sql, maxAgeSeconds = 1).isEmpty, "TTL must expire entry")
    // repopulate, then a dataset write must invalidate
    SqlEngine.readSqlQuery(spark, sql, useCache = true)
    assert(cache.get(sql).isDefined)
    val spark0 = spark
    import spark0.implicits._
    DatasetWriter.toParquet(Seq((1, "a")).toDF("k", "v"), tmp(),
      mode = DatasetWriter.Overwrite)
    assert(cache.get(sql).isEmpty, "write must invalidate cached results")
  }

  // ---- as-of join duplicate-left semantics -------------------------------

  test("asofJoin matches every duplicate left row") {
    val spark0 = spark
    import spark0.implicits._
    val left = Seq(
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")), // exact dup
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 11:00:00")))
      .toDF("user", "lts")
    val right = Seq(
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 1L),
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 2L))
      .toDF("user", "rts", "rid")
    val out = AsOf.asofJoin(left, right, Seq("user"), "lts", "rts")
    assert(out.count() == 3, "duplicate left rows must each match")
    assert(out.filter(col("rid") === 1L).count() == 2)
    assert(out.filter(col("rid") === 2L).count() == 1)
    val outB = AsOf.asofJoinBucketed(left, right, Seq("user"), "lts", "rts",
      bucketSeconds = 3600, horizonBuckets = 4)
    assert(outB.count() == 3, "bucketed variant must keep duplicates too")
  }

  // ---- bucketed overwrite_partitions -------------------------------------

  test("bucketed OverwritePartitions does not duplicate rewritten data") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    val b = DatasetWriter.BucketingInfo(Seq("id"), 4)
    val base = (1 to 40).map(i => (i.toLong, s"v$i", if (i % 2 == 0) "p1" else "p2"))
      .toDF("id", "v", "p")
    DatasetWriter.toParquet(base, dir, mode = DatasetWriter.Overwrite,
      partitionCols = Seq("p"), bucketing = Some(b))
    assert(spark.read.parquet(dir).count() == 40)
    // rewrite partition p1 only
    val p1New = (1 to 10).map(i => (i.toLong * 100, s"n$i", "p1"))
      .toDF("id", "v", "p")
    DatasetWriter.toParquet(p1New, dir,
      mode = DatasetWriter.OverwritePartitions,
      partitionCols = Seq("p"), bucketing = Some(b))
    val after = spark.read.parquet(dir)
    assert(after.filter(col("p") === "p1").count() == 10,
      "old flattened bucket files must not survive the partition rewrite")
    assert(after.filter(col("p") === "p2").count() == 20)
    assert(after.count() == 30)
  }

  // ---- persisted vector indexes ------------------------------------------

  test("persisted LSH index: probe opens a fraction of the files, finds hits") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    val emb = Tables.embeddings(spark, sf)
    ops.VectorIndex.putLsh(emb, dir)
    val query = emb.filter(col("vec_id") === 0L).head()
      .getAs[Seq[Float]]("embedding").toArray
    val res = ops.VectorIndex.searchLsh(spark, dir, query, k = 10, nProbe = 4)
      .collect()
    assert(res.nonEmpty && res.length <= 10)
    // the query vector itself is indexed: it must be the top hit
    assert(res.head.getAs[Long]("vec_id") == 0L)
    // results only come from probed buckets
    val probes = ops.VectorIndex.probeBuckets(
      ops.VectorIndex.queryLshBucket(spark, query), 4).toSet
    assert(res.map(_.getAs[Number]("bucket").longValue()).forall(probes))
    // file pruning: probed directories are a strict minority of the index
    // (the snapshot root resolves the current rebuilt tree, round 14)
    val root = ops.VectorIndex.indexRoot(spark, dir)
    val idx = spark.read.option("basePath", root).parquet(root)
    val total = idx.select(input_file_name()).distinct().count()
    val touched = idx
      .filter(col("bucket").isin(probes.toSeq.map(_.toInt): _*))
      .select(input_file_name()).distinct().count()
    assert(touched * 3 < total,
      s"probe touched $touched of $total index files")
  }

  test("persisted IVF index: k-means cells, pruned probe, useful recall") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    val emb = Tables.embeddings(spark, sf)
    ops.VectorIndex.putIvf(emb, dir, k = 8, iters = 3)
    val query = emb.filter(col("vec_id") === 0L).head()
      .getAs[Seq[Float]]("embedding").toArray
    val res = ops.VectorIndex.searchIvf(spark, dir, query, k = 10, nprobe = 3)
      .collect()
    assert(res.length == 10)
    assert(res.head.getAs[Long]("vec_id") == 0L, "query vector is top hit")
    assert(res.map(_.getAs[Number]("cell").intValue()).distinct.length <= 3)
    // file pruning on the data directory (under the snapshot tree root)
    val root = ops.VectorIndex.indexRoot(spark, dir)
    val data = spark.read.option("basePath", s"$root/data")
      .parquet(s"$root/data")
    val cells = res.map(_.getAs[Number]("cell").intValue()).distinct.toSeq
    val total = data.select(input_file_name()).distinct().count()
    assert(spark.read.parquet(s"$root/centroids").count() == 8)
    val touched = data.filter(col("cell").isin(cells: _*))
      .select(input_file_name()).distinct().count()
    assert(touched < total, "probe must not scan every cell")
    // recall against exact brute force (excluding the query itself)
    val exact = emb.crossJoin(broadcast(
        emb.filter(col("vec_id") === 0L).select(col("embedding").as("q"))))
      .withColumn("c", call_function("cosine_sim", col("embedding"), col("q")))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val got = res.map(_.getAs[Long]("vec_id")).toSet
    assert((exact intersect got).size >= 2,
      s"recall too low: ${(exact intersect got).size}/10")
  }

  // ---- prepared statements + execution metadata --------------------------

  test("prepared statements: create/list/execute/delete + schema introspect") {
    sql.PreparedStatements.createPreparedStatement("top_customers",
      "SELECT :n AS n, 'x' AS tag")
    intercept[IllegalArgumentException] {
      sql.PreparedStatements.createPreparedStatement("top_customers", "SELECT 1")
    }
    assert(sql.PreparedStatements.listPreparedStatements()
      .contains("top_customers"))
    val df = sql.PreparedStatements.execute(spark, "top_customers",
      Map("n" -> 7))
    assert(df.head().getInt(0) == 7)
    // analysis-only result schema with Athena type names
    val types = sql.PreparedStatements.getQueryColumnsTypes(spark,
      "SELECT cast(1 as bigint) AS a, cast(1.5 as double) AS b, 'x' AS c")
    assert(types == Map("a" -> "bigint", "b" -> "double", "c" -> "string"))
    sql.PreparedStatements.deletePreparedStatement("top_customers")
    intercept[IllegalArgumentException] {
      sql.PreparedStatements.getNamedQueryStatement("top_customers")
    }
  }

  test("execution registry lists executions with metadata") {
    val q = sql.Executions.startQueryExecution(spark, "SELECT 41 + 1 AS v")
    sql.Executions.waitQuery(q)
    assert(sql.Executions.listQueryExecutions().contains(q.id))
    val meta = sql.Executions.getQueryExecution(q.id)
    assert(meta("Query").contains("41 + 1"))
    assert(meta("State") == "Succeeded")
  }

  test("catalog addColumn / getTableLocation / column comments") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/t")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cat_db")
    catalog.Catalog.createParquetTable(spark, "graft_cat_db.ext_t",
      s"$dir/t", Seq("id" -> "bigint", "v" -> "string"))
    try {
      catalog.Catalog.addColumn(spark, "graft_cat_db.ext_t", "score",
        "double", comment = Some("model score"))
      val cols = spark.table("graft_cat_db.ext_t").columns.toSeq
      assert(cols == Seq("id", "v", "score"))
      // pre-evolution files read the new column as NULL
      assert(spark.table("graft_cat_db.ext_t")
        .filter(col("score").isNull).count() == 1)
      assert(catalog.Catalog.getTableLocation(spark, "graft_cat_db.ext_t")
        .contains(dir))
      assert(catalog.Catalog.getColumnsComments(spark, "graft_cat_db.ext_t")
        .get("score").contains("model score"))
    } finally spark.sql("DROP DATABASE graft_cat_db CASCADE")
  }

  test("kv putCsv and search indexJson route files through the upserts") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    io.DatasetWriter.toParquet(
      Seq(("a", "v0")).toDF("pk", "v"), s"$dir/kv",
      mode = io.DatasetWriter.Overwrite)
    Seq(("a", "v1"), ("b", "v2")).toDF("pk", "v")
      .coalesce(1).write.option("header", "true").csv(s"$dir/in_csv")
    ops.KeyValueWrite.putCsv(spark, s"$dir/in_csv", s"$dir/kv",
      ops.KeyValueWrite.KeySchema("pk"))
    assert(spark.read.parquet(s"$dir/kv").as[(String, String)]
      .collect().toSet == Set(("a", "v1"), ("b", "v2")))
    Seq((1L, "doc one"), (2L, "doc two")).toDF("doc_id", "text")
      .coalesce(1).write.json(s"$dir/in_json")
    ops.Search.indexJson(spark, s"$dir/in_json", s"$dir/idx", Seq("doc_id"))
    assert(spark.read.parquet(s"$dir/idx").count() == 2)
  }

  // ---- catalog search ----------------------------------------------------

  test("catalog table search filters by contains/prefix/suffix") {
    val spark0 = spark
    import spark0.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_search_db")
    Seq((1, "x")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable("graft_search_db.sales_raw")
    Seq((1, "x")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable("graft_search_db.sales_clean")
    Seq((1, "x")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable("graft_search_db.events_raw")
    try {
      val db = Some("graft_search_db")
      assert(catalog.Catalog.searchTables(spark, "sales", db).count() == 2)
      assert(catalog.Catalog.tables(spark, db,
        namePrefix = Some("events")).count() == 1)
      assert(catalog.Catalog.tables(spark, db,
        nameSuffix = Some("_raw")).count() == 2)
      assert(catalog.Catalog.tables(spark, db,
        nameContains = Some("sales"), nameSuffix = Some("_clean"))
        .count() == 1)
    } finally spark.sql("DROP DATABASE graft_search_db CASCADE")
  }

  // ---- shuffle-free bucketed joins ---------------------------------------

  test("same-bucketed tables join with zero Exchange below the join") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    io.BucketedTables.saveBucketedTable(orders, "b_orders",
      Seq("o_orderkey"), 8)
    io.BucketedTables.saveBucketedTable(lineitem, "b_lineitem",
      Seq("o_orderkey"), 8)
    // disable broadcast so the join would otherwise need a shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = io.BucketedTables.bucketedJoin(spark,
        "b_orders", "b_lineitem", Seq("o_orderkey"))
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(out) { joined.explain("formatted") }
      val plan = out.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange"),
        "co-located bucketed join must not shuffle either side:\n" + plan)
      // and the result is still correct
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  // ---- logs insights dialect + table-format wrappers ---------------------

  test("logs insights: fields/filter/parse/stats/sort/limit stages") {
    val spark0 = spark
    import spark0.implicits._
    val logs = Seq(
      ("2024-01-01 10:01:00", "ERROR code=500 path=/a", 1.0),
      ("2024-01-01 10:02:00", "ERROR code=404 path=/b", 2.0),
      ("2024-01-01 11:00:00", "INFO code=200 path=/c", 3.0))
      .toDF("timestamp", "message", "v")
      .withColumn("timestamp", col("timestamp").cast("timestamp"))
    val parsed = ops.LogsInsights.query(logs,
      """fields @timestamp, @message, v
        | filter @message like 'ERROR'
        | parse @message /code=(\d+) path=(\S+)/ as code, path
        | sort code asc
        | limit 10""".stripMargin)
    assert(parsed.select("code").as[String].collect().toSeq ==
      Seq("404", "500"))
    val stats = ops.LogsInsights.query(logs,
      "stats count(*) as n, max(v) as mx by bin(60m)")
    assert(stats.count() == 2)
    assert(stats.agg(sum(col("n"))).head().getLong(0) == 3)
    // dedup keeps the MOST RECENT row per key
    val latest = ops.LogsInsights.query(logs
        .withColumn("sev", split(col("message"), " ").getItem(0)),
      "dedup sev | sort sev asc")
    assert(latest.select(col("sev"), col("v")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("ERROR", 2.0), ("INFO", 3.0)))
    intercept[IllegalArgumentException] {
      ops.LogsInsights.query(logs, "explode x")
    }
  }

  test("table-format wrappers keep the reference call shapes over TxnLog") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/t"
    io.TableFormats.toTable(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir, mode = "append")
    io.TableFormats.toIceberg(
      Seq((2L, "B"), (3L, "c")).toDF("id", "v"), dir,
      mergeCols = Seq("id"))
    val now = io.TableFormats.readDeltalake(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(now == Set((1L, "a"), (2L, "B"), (3L, "c")))
    assert(io.TableFormats.fromIceberg(spark, dir, version = Some(1))
      .count() == 2)
    val hist = io.TableFormats.describeHistory(spark, dir)
    assert(hist.select("operation").as[String].collect().toSeq ==
      Seq("create", "merge"))
    intercept[IllegalArgumentException] {
      io.TableFormats.toTable(Seq((9L, "z")).toDF("id", "v"), dir,
        mode = "error")
    }
  }

  test("persisted triple store prunes to the pattern's predicate partition") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/triples"
    val triples = Seq(
      ("a", "knows", "b"), ("b", "knows", "c"),
      ("a", "type", "person"), ("b", "type", "person"),
      ("a", "likes", "c")).toDF("s", "p", "o")
    ops.Rdf.saveTriples(triples, dir)
    val stored = ops.Rdf.loadTriples(spark, dir)
    // BGP over the persisted table still answers correctly
    import ops.Rdf._
    val out = bgp(stored, Seq(
      TriplePattern(Var("x"), Lit("knows"), Var("y")),
      TriplePattern(Var("x"), Lit("type"), Lit("person")))).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "b"), ("b", "c")))
    // a literal-predicate leg reads ONE partition directory
    val leg = stored.filter(col("p") === "knows")
    val touched = leg.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
    assert(touched.nonEmpty && touched.forall(_.contains("p=knows")),
      s"leg must scan only its predicate partition, got: ${touched.toSeq}")
  }

  // ---- openCypher front-end ----------------------------------------------

  test("cypher MATCH compiles hops, directions, WHERE, RETURN forms") {
    val g = ops.Graph.testGraph(spark, sf)
    // reverse direction: nations pointed at by suppliers
    val rev = ops.Cypher.query(g,
      "MATCH (n:nation)<-[:located_in]-(s:supplier) RETURN n.name, s")
    assert(rev.columns.toSeq == Seq("n_name", "s"))
    assert(rev.count() ==
      g.edges.filter(col("label") === "located_in").count())
    // two-hop chain equals the join-built twoHop count
    val two = ops.Cypher.query(g,
      """MATCH (s:supplier)-[:located_in]->(n:nation)-[:in_region]->(r:region)
        |RETURN s.name, r.name""".stripMargin)
    assert(two.count() == Tables.supplier(spark, sf).count())
    // unsupported form is a typed error, not a wrong answer
    intercept[IllegalArgumentException] {
      ops.Cypher.query(g, "CREATE (x) RETURN x")
    }
  }

  // ---- native expressions ------------------------------------------------

  test("array_match_count equals the zip_with/filter HOF on both types") {
    val spark0 = spark
    import spark0.implicits._
    graft.expr.ArrayMatchCount.register(spark)
    val longs = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 4L)),
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(5L), Seq(5L))).toDF("a", "b")
    val both = longs.select(
      call_function("array_match_count", col("a"), col("b")).as("native"),
      expr("cast(size(filter(zip_with(a, b, (x, y) -> x = y), v -> v)) as int)")
        .as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    val strs = Seq((Seq("x", "y", null.asInstanceOf[String]),
      Seq("x", "z", null.asInstanceOf[String]))).toDF("a", "b")
    val r = strs.select(
      call_function("array_match_count", col("a"), col("b"))).head().getInt(0)
    assert(r == 1, "NULL slots must not count as matches")
  }

  // ---- registries + listings ---------------------------------------------

  test("listDirectories/listBuckets enumerate child prefixes") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    Seq((1, "p1"), (2, "p2")).toDF("id", "p").write.partitionBy("p")
      .parquet(s"$dir/ds")
    val dirs = io.DatasetReader.listDirectories(spark, s"$dir/ds")
    assert(dirs.map(d => new java.io.File(d.stripSuffix("/")).getName) ==
      Seq("p=p1", "p=p2"))
    assert(dirs.forall(_.endsWith("/")))
    assert(io.DatasetReader.listBuckets(spark, dir) == Seq("ds"))
  }

  test("ruleset registry: create/update/get/list/evaluate") {
    val spark0 = spark
    import spark0.implicits._
    val reg = new ops.DataQuality.RulesetRegistry(spark, s"${tmp()}/rules")
    reg.createRuleset("basic", "Rules = [ RowCount > 2 ]")
    intercept[IllegalArgumentException] {
      reg.createRuleset("basic", "Rules = [ RowCount > 5 ]")
    }
    intercept[IllegalArgumentException] { // invalid DQDL rejected at write
      reg.createRuleset("bad", "Rules = [ Bogus > 1 ]")
    }
    reg.createRuleset("strict", """Rules = [ Completeness "v" > 0.9 ]""")
    reg.updateRuleset("basic", "Rules = [ RowCount > 3 ]")
    assert(reg.listRulesets() == Seq("basic", "strict"))
    assert(reg.getRuleset("basic").get.contains("RowCount > 3"))
    val df = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("id", "v")
    val verdicts = reg.evaluateRuleset("basic", df)
    assert(verdicts.filter(col("passed") === false).count() == 0)
  }

  test("jdbc connection registry resolves names to urls") {
    jdbc.JdbcOps.registerConnection("warehouse",
      "jdbc:derby:memory:graftconn;create=true")
    assert(jdbc.JdbcOps.listConnections().contains("warehouse"))
    assert(jdbc.JdbcOps.getConnection("warehouse").url.startsWith("jdbc:derby"))
    assert(jdbc.JdbcOps.resolve("jdbc:other:url").url == "jdbc:other:url")
    intercept[IllegalArgumentException] { jdbc.JdbcOps.getConnection("nope") }
  }

  test("streaming single-commit: all micro-batches land as ONE snapshot") {
    val dir = s"${tmp()}/t"
    val events = streaming.EventStream.readEvents(spark, s"$sf")
    val agg = streaming.EventStream.tumblingAgg(events)
    val snap = streaming.EventStream.runToTxnTableSingleCommit(
      agg, dir, tmp())
    assert(snap.op == "streaming-append")
    val hist = table.TxnLog.history(spark, dir)
    assert(hist.length == 1, "every micro-batch must share one version")
    val n = table.TxnLog.read(spark, dir).count()
    assert(n > 0)
    // tracks the batch computation (watermark may drop a few late
    // buckets — exact late-data semantics are LateDataSpec's subject)
    val batch = ops.TimeSeries.tumbling(spark, sf).count()
    assert(n <= batch && n >= batch - 10, s"streamed $n vs batch $batch")
  }

  // ---- snapshot transaction log ------------------------------------------

  test("txn log: create/append/overwrite commits with time travel") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/t"
    table.TxnLog.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    table.TxnLog.append(Seq((3L, "c")).toDF("id", "v"), dir)
    table.TxnLog.overwrite(Seq((9L, "z")).toDF("id", "v"), dir)
    assert(table.TxnLog.read(spark, dir).count() == 1)
    // VERSION AS OF
    assert(table.TxnLog.read(spark, dir, asOfVersion = Some(1)).count() == 2)
    assert(table.TxnLog.read(spark, dir, asOfVersion = Some(2)).count() == 3)
    val hist = table.TxnLog.history(spark, dir)
    assert(hist.map(_.version) == Seq(1, 2, 3))
    assert(hist.map(_.op) == Seq("create", "append", "overwrite"))
    intercept[IllegalArgumentException] {
      table.TxnLog.create(Seq((1L, "x")).toDF("id", "v"), dir)
    }
  }

  test("txn log: merge upserts by key in one snapshot") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/t"
    table.TxnLog.create(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), dir)
    table.TxnLog.merge(spark, dir,
      Seq((2L, "B"), (4L, "d")).toDF("id", "v"), keys = Seq("id"))
    val got = table.TxnLog.read(spark, dir).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
    // pre-merge state still readable
    assert(table.TxnLog.read(spark, dir, asOfVersion = Some(1)).count() == 3)
  }

  test("txn log: torn manifest invisible, claimed version skipped") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/t"
    table.TxnLog.create(Seq((1L, "a")).toDF("id", "v"), dir)
    // simulate a writer that crashed mid-manifest at v2
    val torn = new java.io.File(s"$dir/_graft_log/v00000002.manifest")
    java.nio.file.Files.writeString(torn.toPath, "version=2\nop=append\n")
    assert(table.TxnLog.read(spark, dir).count() == 1, "torn commit hidden")
    assert(table.TxnLog.history(spark, dir).map(_.version) == Seq(1))
    // next commit must skip the claimed number, not deadlock on it
    val snap = table.TxnLog.append(Seq((2L, "b")).toDF("id", "v"), dir)
    assert(snap.version == 3)
    assert(table.TxnLog.read(spark, dir).count() == 2)
  }

  test("txn log: concurrent appenders all land, versions stay distinct") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/t"
    table.TxnLog.create(Seq((0L, "seed")).toDF("id", "v"), dir)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    // eight writers race; optimistic retry must serialize them all
    val futures = (1 to 8).map { i =>
      Future {
        table.TxnLog.append(Seq((i.toLong, s"w$i")).toDF("id", "v"), dir)
      }
    }
    val snaps = Await.result(Future.sequence(futures), 120.seconds)
    assert(snaps.map(_.version).distinct.length == 8,
      "every writer must own a distinct version")
    assert(table.TxnLog.read(spark, dir).count() == 9,
      "no append may be lost")
    assert(table.TxnLog.history(spark, dir).map(_.version) == (1 to 9))
  }

  test("txn log: merge racing an append re-resolves and loses nothing") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/t"
    table.TxnLog.create(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val merge = Future {
      table.TxnLog.merge(spark, dir,
        Seq((2L, "B"), (3L, "c")).toDF("id", "v"), keys = Seq("id"))
    }
    val append = Future {
      table.TxnLog.append(Seq((9L, "x")).toDF("id", "v"), dir)
    }
    Await.result(Future.sequence(Seq(merge, append)), 120.seconds)
    val got = table.TxnLog.read(spark, dir).as[(Long, String)].collect().toSet
    // either serialization converges on the same state: merge-first →
    // append retries on top; append-first → merge detects the advanced
    // parent, re-resolves, and carries the appended row through
    assert(got == Set((1L, "a"), (2L, "B"), (3L, "c"), (9L, "x")))
  }

  test("staged commit: recover() restores a crash inside the swap window") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    io.DatasetWriter.toParquet(Seq((1L, "a")).toDF("id", "v"), dir,
      mode = io.DatasetWriter.Overwrite)
    // simulate the window between rename(target→old) and
    // rename(staging→target): target missing, .old intact
    val target = new java.io.File(dir)
    val old = new java.io.File(target.getParent,
      s".${target.getName}.old-deadbeef")
    assert(target.renameTo(old))
    assert(!target.exists())
    assert(table.StagedCommit.recover(spark, dir) == 1)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet ==
      Set((1L, "a")), "old data must be restored as the live target")
  }

  test("txn log: vacuum keeps retained versions, drops orphans") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/t"
    table.TxnLog.create(Seq((1L, "a")).toDF("id", "v"), dir)
    table.TxnLog.overwrite(Seq((2L, "b")).toDF("id", "v"), dir)
    table.TxnLog.overwrite(Seq((3L, "c")).toDF("id", "v"), dir)
    val removed = table.TxnLog.vacuum(spark, dir, keepVersions = 1)
    assert(removed == 2, s"expected 2 dropped data dirs, got $removed")
    assert(table.TxnLog.read(spark, dir).as[(Long, String)].head() ==
      ((3L, "c")))
    assert(table.TxnLog.history(spark, dir).map(_.version) == Seq(3))
  }

  // ---- strict schema validation / dtype overrides ------------------------

  test("validateSchema: conflicting file schemas raise, converged pass") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/f1")
    Seq((2L, "b")).toDF("id", "v").repartition(1)
      .write.mode("append").parquet(s"$dir/f1")
    // converged: same schema in every file
    val schema = io.DatasetReader.validateSchema(spark, s"$dir/f1")
    assert(schema.fieldNames.toSeq == Seq("id", "v"))
    // divergent types for 'id' across files
    val dir2 = s"$dir/f2"
    Seq((1L, "a")).toDF("id", "v").write.parquet(dir2)
    Seq(("oops", "b")).toDF("id", "v").repartition(1)
      .write.mode("append").parquet(dir2)
    intercept[io.DatasetReader.InvalidSchemaConvergence] {
      io.DatasetReader.validateSchema(spark, dir2)
    }
    // mergeSchema read path stays available and un-strict for new columns
    val dir3 = s"$dir/f3"
    Seq((1L, "a")).toDF("id", "v").write.parquet(dir3)
    Seq((2L, "b", 3.0)).toDF("id", "v", "extra").repartition(1)
      .write.mode("append").parquet(dir3)
    assert(io.DatasetReader.readParquet(spark, dir3, mergeSchema = true)
      .columns.length == 3)
    intercept[io.DatasetReader.InvalidSchemaConvergence] {
      io.DatasetReader.validateSchema(spark, dir3) // strict rejects evolution
    }
  }

  test("castWithAthenaTypes applies string→typed coercions") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("2024-05-01", "2024-05-01 12:30:00", "12.345", "7"))
      .toDF("d", "ts", "dec", "n")
    val cast = io.DatasetReader.castWithAthenaTypes(df, Map(
      "d" -> "date", "ts" -> "timestamp", "dec" -> "decimal(10,3)",
      "n" -> "bigint"))
    val r = cast.head()
    assert(r.getDate(0) == java.sql.Date.valueOf("2024-05-01"))
    assert(r.getTimestamp(1) ==
      java.sql.Timestamp.valueOf("2024-05-01 12:30:00"))
    assert(r.getDecimal(2).toPlainString == "12.345")
    assert(r.getLong(3) == 7L)
    intercept[IllegalArgumentException] {
      io.DatasetReader.castWithAthenaTypes(df, Map("absent" -> "int"))
    }
  }

  test("listObjects lists distributed and filters by suffix") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    Seq((1L, "x", "p1"), (2L, "y", "p2")).toDF("id", "v", "p")
      .write.partitionBy("p").parquet(s"$dir/ds")
    val all = io.DatasetReader.listObjects(spark, s"$dir/ds")
    assert(all.filter(col("path").endsWith(".parquet")).count() >= 2)
    val pq = io.DatasetReader.listObjects(spark, s"$dir/ds",
      suffix = Some(".parquet"))
    assert(pq.count() >= 2)
    assert(pq.filter(!col("path").endsWith(".parquet")).count() == 0)
    assert(pq.columns.toSeq == Seq("path", "size_bytes", "modified_ms"))
  }

  // ---- timestream batch load ---------------------------------------------

  test("batchLoad maps the data model and captures rejects with reasons") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    val csv = s"$dir/in"
    Seq(
      ("2024-01-01 10:00:00", "dev1", "1.5"),
      ("2024-01-01 11:00:00", "dev2", "2.5"),
      ("not-a-time", "dev3", "3.5"),          // bad time
      ("2024-01-01 12:00:00", "dev4", "oops"), // bad measure
      ("2024-01-01 13:00:00", null, "4.5"))    // null dimension
      .toDF("time", "device", "temp")
      .coalesce(1).write.option("header", "true").csv(csv)
    val (loaded, rejected) = ops.TimeSeries.batchLoad(spark, csv,
      s"$dir/out", s"$dir/rejects",
      timeCol = "time", dimensionCols = Seq("device"),
      measureCols = Seq("temp"))
    assert(loaded == 2 && rejected == 3)
    val reasons = spark.read.option("header", "true").csv(s"$dir/rejects")
      .select("reject_reason").as[String].collect()
    assert(reasons.exists(_.contains("unparseable time")))
    assert(reasons.exists(_.contains("unparseable measure")))
    assert(reasons.exists(_.contains("null dimension")))
    val out = spark.read.parquet(s"$dir/out")
    assert(out.select("device").as[String].collect().toSet ==
      Set("dev1", "dev2"))
  }

  // ---- kv write API ------------------------------------------------------

  test("kv putItems/deleteItems/executeStatement roundtrip") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    val schema = ops.KeyValueWrite.KeySchema("pk", Some("sk"))
    io.DatasetWriter.toParquet(
      Seq(("a", 1L, "v1"), ("a", 2L, "v2"), ("b", 1L, "v3"))
        .toDF("pk", "sk", "v"),
      dir, mode = io.DatasetWriter.Overwrite)
    // put: replace (a,2), insert (c,1)
    ops.KeyValueWrite.putItems(spark,
      Seq(Map("pk" -> "a", "sk" -> 2L, "v" -> "V2"),
        Map("pk" -> "c", "sk" -> 1L, "v" -> "v4")), dir, schema)
    assert(spark.read.parquet(dir).as[(String, Long, String)].collect().toSet ==
      Set(("a", 1L, "v1"), ("a", 2L, "V2"), ("b", 1L, "v3"), ("c", 1L, "v4")))
    // delete by full key
    ops.KeyValueWrite.deleteItems(spark,
      Seq(Map("pk" -> "b", "sk" -> 1L)), dir, schema)
    assert(spark.read.parquet(dir).count() == 3)
    // PartiQL: INSERT VALUE, DELETE WHERE, SELECT
    ops.KeyValueWrite.executeStatement(spark,
      "INSERT INTO kv VALUE {'pk': 'd', 'sk': 9, 'v': 'part'}", dir, schema)
    ops.KeyValueWrite.executeStatement(spark,
      "DELETE FROM kv WHERE \"pk\" = 'a' AND \"sk\" = 1", dir, schema)
    val sel = ops.KeyValueWrite.executeStatement(spark,
      "SELECT pk, sk, v FROM kv_table ORDER BY pk, sk", dir, schema).get
    assert(sel.as[(String, Long, String)].collect().toSeq ==
      Seq(("a", 2L, "V2"), ("c", 1L, "v4"), ("d", 9L, "part")))
  }

  // ---- rdf / sparql bgp --------------------------------------------------

  test("bgp compiler: shared-var joins, literal filters, repeated vars") {
    val spark0 = spark
    import spark0.implicits._
    val triples = Seq(
      ("a", "knows", "b"), ("b", "knows", "c"), ("a", "type", "person"),
      ("b", "type", "person"), ("c", "type", "robot"),
      ("x", "likes", "x")).toDF("s", "p", "o")
    import ops.Rdf._
    // chain: ?x knows ?y . ?y knows ?z
    val chain = bgp(triples, Seq(
      TriplePattern(Var("x"), Lit("knows"), Var("y")),
      TriplePattern(Var("y"), Lit("knows"), Var("z")))).collect()
    assert(chain.map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet == Set(("a", "b", "c")))
    // typed endpoints: only persons knowing persons
    val typed = bgp(triples, Seq(
      TriplePattern(Var("x"), Lit("knows"), Var("y")),
      TriplePattern(Var("x"), Lit("type"), Lit("person")),
      TriplePattern(Var("y"), Lit("type"), Lit("person")))).collect()
    assert(typed.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "b")))
    // self-loop pattern: ?v likes ?v
    val self = bgp(triples,
      Seq(TriplePattern(Var("v"), Lit("likes"), Var("v")))).collect()
    assert(self.map(_.getString(0)).toSet == Set("x"))
  }

  // ---- search DSL injection safety ---------------------------------------

  test("query DSL: quotes and backticks in terms are data, not SQL") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, "it's a test"), (2L, "plain text"))
      .toDF("doc_id", "text")
    val hit = Search.search(docs,
      Map("match" -> Map("text" -> "it's"))).collect()
    assert(hit.map(_.getLong(0)).toSet == Set(1L))
    // a malicious term must neither parse-error nor inject
    val none = Search.search(docs,
      Map("match" -> Map("text" -> "x') or true --`"))).count()
    assert(none == 0)
  }

  test("occurrences scoring treats regex metacharacters literally") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, "a.b a.b", "en")).toDF("doc_id", "text", "lang")
    // '.' must not match arbitrary characters: "a.b" occurs twice, and a
    // term like "axb" (absent literally) scores zero
    val two = docs.withColumn("n",
      ((length(col("text")) - length(regexp_replace(col("text"),
        lit(java.util.regex.Pattern.quote("a.b")), lit("")))) / 3).cast("int"))
    assert(two.head().getAs[Int]("n") == 2)
  }
}
