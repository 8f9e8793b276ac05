package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Postings, VectorIndex}

/** The scan-pruning contracts the round-15 index structures stand on —
  * asserted on the EXECUTED plan's scan nodes and their file-count
  * metrics, not on scaladoc: an IVF-PQ probe must open only the
  * `nprobe` probed cell directories of the codes table, and a layered
  * postings probe must open only the query's term buckets in EVERY
  * layer. If a refactor drops the partition filter (e.g. a transform
  * that hides `cell`/`tok_bucket` from pushdown), the I/O silently
  * becomes index-proportional at 100 TB — this spec makes it loud. */
class IndexPruningSpec extends AnyFunSuite {
  import TestSpark._

  private def scansOf(df: org.apache.spark.sql.DataFrame)
      : Seq[FileSourceScanExec] = {
    df.collect() // executed metrics need a real run
    // AQE wraps stages in AdaptiveSparkPlanExec/QueryStageExec nodes
    // that plain collect() does not see through — walk the FINAL
    // adaptive plan explicitly
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        walk(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("IVF-PQ: the codes scan prunes to the probed cell directories") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val idx = graft.session.Scratch.dir("prune-ivfpq") + "/idx"
    VectorIndex.putIvfPq(emb, idx, kCells = 8)
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head.getAs[Seq[Float]](0).toArray
    val nprobe = 3
    val df = VectorIndex.searchIvfPq(spark, idx, q, k = 5,
      nprobe = nprobe, rerank = 0)
    val scans = scansOf(df)
    val codes = scans.filter(
      _.metadata.get("Location").exists(_.contains("codes")))
    assert(codes.nonEmpty, s"no codes scan in ${scans.map(_.metadata)}")
    codes.foreach { s =>
      assert(s.metadata.get("PartitionFilters").exists(_.contains("cell")),
        s"codes scan lost its cell partition filter: ${s.metadata}")
      // putIvfPq repartitions by cell → one file per cell directory,
      // so a pruned scan reads exactly nprobe files
      val read = s.metrics("numFiles").value
      assert(read == nprobe,
        s"codes scan read $read files (expected $nprobe probed cells)")
    }
  }

  test("filtered IVF-PQ: the metadata predicate lands in the codes " +
    "scan's pushed filters (pre-ADC), pruning intact") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val idx = graft.session.Scratch.dir("prune-ivfpq-f") + "/idx"
    VectorIndex.putIvfPq(emb, idx, kCells = 8)
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head.getAs[Seq[Float]](0).toArray
    val nprobe = 3
    val f = graft.ops.MetadataFilter.compile(
      Map("label" -> Map("$in" -> Seq(1, 3))))
    val df = VectorIndex.searchIvfPq(spark, idx, q, k = 5,
      nprobe = nprobe, rerank = 0, filter = Some(f))
    val scans = scansOf(df)
    val codes = scans.filter(
      _.metadata.get("Location").exists(_.contains("codes")))
    assert(codes.nonEmpty)
    codes.foreach { s =>
      assert(s.metadata.get("PartitionFilters").exists(_.contains("cell")),
        s"filtered codes scan lost cell pruning: ${s.metadata}")
      assert(s.metadata.get("PushedFilters").exists(_.contains("label")),
        "the metadata filter must push into the codes scan " +
          s"(pre-ADC), got: ${s.metadata.get("PushedFilters")}")
      assert(s.metrics("numFiles").value == nprobe)
    }
  }

  test("layered IVF-PQ: every layer's codes scan prunes to the " +
    "probed cell directories") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val idx = graft.session.Scratch.dir("prune-ivfpq-l") + "/idx"
    VectorIndex.putIvfPq(emb.filter(col("vec_id") % 10 =!= 7), idx,
      kCells = 8)
    VectorIndex.appendBatchIvfPq(emb.filter(col("vec_id") % 10 === 7),
      idx, batchId = 1L)
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head.getAs[Seq[Float]](0).toArray
    val nprobe = 3
    val df = VectorIndex.searchIvfPq(spark, idx, q, k = 5,
      nprobe = nprobe, rerank = 0)
    val scans = scansOf(df)
    val codes = scans.filter(
      _.metadata.get("Location").exists(_.contains("codes")))
    assert(codes.size == 2,
      s"expected one pruned codes scan per layer, got ${codes.size}")
    codes.foreach { s =>
      assert(s.metadata.get("PartitionFilters").exists(_.contains("cell")),
        s"layer codes scan lost cell pruning: ${s.metadata}")
      // one file per cell dir per layer => at most nprobe files each
      // (a layer may hold vectors in fewer than nprobe of the cells)
      assert(s.metrics("numFiles").value <= nprobe)
    }
  }

  test("layered postings: every layer's scan prunes to the query's " +
    "term buckets") {
    val spark0 = spark
    import spark0.implicits._
    def docs(ids: Range) = ids.map(i =>
      (i.toLong, s"spark stream word$i filler$i", "en"))
      .toDF("doc_id", "text", "lang")
    val idx = graft.session.Scratch.dir("prune-post") + "/idx"
    Postings.build(docs(0 until 40), idx, nBuckets = 16)
    Postings.appendBatch(docs(40 until 60), idx, batchId = 1L)
    val terms = Seq("spark", "stream")
    val nBuckets = terms.map(Postings.bucketOf(_, 16)).distinct.size
    val df = Postings.bm25Query(spark, idx, terms, k = 10)
    val scans = scansOf(df)
    val postings = scans.filter(s =>
      s.metadata.get("Location").exists(l =>
        !l.contains("_doclens")) &&
        s.metadata.get("PartitionFilters").exists(_.nonEmpty))
    assert(postings.size == 2,
      s"expected one pruned postings scan per layer, got " +
        s"${postings.size} of ${scans.size}")
    postings.foreach { s =>
      assert(
        s.metadata.get("PartitionFilters").exists(_.contains("tok_bucket")),
        s"postings scan lost its tok_bucket filter: ${s.metadata}")
      // build/append write one file per bucket directory, so a pruned
      // layer scan reads at most one file per probed bucket
      val read = s.metrics("numFiles").value
      assert(read <= nBuckets,
        s"layer scan read $read files (> $nBuckets probed buckets)")
    }
  }
}
