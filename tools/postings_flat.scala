// Isolated A/B for the incremental-postings scale claim (round 15): a
// FIXED-size ingest batch (sf0.1's doc_id % 10 = 7 slice, ~500 docs)
// appended as a layer to postings indexes built over corpora at
// 1x / 10x / 100x, then probed (BM25) and folded. The appendBatch cost
// must follow the BATCH (flat across index scales - one batch-sized
// tree build + one manifest append); the bm25 probe reads only the
// query's term buckets per layer; the fold is the deliberate
// O(index) maintenance and should scale linearly (reported for
// contrast, it runs at fold cadence, not per batch).
//
// Run (idle machine, no concurrent Spark jobs - bench contention rule):
//   spark-shell --master local[32] --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/postings_flat.scala > /tmp/postings_flat.log 2>&1
// Results recorded in BASELINE.md ("Incremental postings" row).
import org.apache.spark.sql.functions._

def timeIt[T](label: String)(f: => T): T = {
  val s = System.nanoTime; val r = f
  println(f"[postings_flat] $label ${(System.nanoTime - s) / 1e9}%.2f s"); r
}

val batch = graft.Tables.documents(spark, "/root/testdata/sf0.1")
  .filter(col("doc_id") % 10 === 7)

for ((dir, tag) <- Seq(("/root/testdata/sf0.1", "1x"),
    ("/tmp/sf1", "10x"), ("/tmp/sf10", "100x"))) {
  val corpus = graft.Tables.documents(spark, dir)
    .filter(col("doc_id") % 10 =!= 7)
  val idx = graft.session.Scratch.dir("postflat") + "/idx"
  timeIt(s"build $tag")(
    graft.ops.Postings.build(corpus, idx, nBuckets = 64))
  timeIt(s"append $tag")(
    graft.ops.Postings.appendBatch(batch, idx, batchId = 1L))
  val hits = timeIt(s"bm25 $tag")(
    graft.ops.Postings.bm25Query(spark, idx,
      Seq("spark", "join", "stream"), k = 20).collect())
  println(s"[postings_flat] top score $tag: " +
    hits.headOption.map(_.getAs[Double]("score")).getOrElse(-1.0))
  timeIt(s"fold $tag")(graft.ops.Postings.fold(spark, idx))
  timeIt(s"bm25 folded $tag")(
    graft.ops.Postings.bm25Query(spark, idx,
      Seq("spark", "join", "stream"), k = 20).collect())
}
System.exit(0)
