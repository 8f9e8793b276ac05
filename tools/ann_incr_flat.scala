// Isolated A/B for the incremental-ANN scale claim (round 16): a
// FIXED-size ingest batch (sf0.1's vec_id % 10 = 7 slice, ~200
// vectors) appended as a layer to IVF-PQ indexes built over corpora at
// 1x / 10x / 100x (auto geometry: sqrt-n cells, sample-trained), then
// probed and folded. The appendBatchIvfPq cost must follow the BATCH
// (flat across index scales - one batch-sized assignment+encode pass
// and one manifest append; the per-vector assignment cost grows only
// with sqrt(n) cells and is dwarfed by job overhead at batch size);
// the probe reads nprobe cells' codes per layer; the fold is the
// deliberate O(index) maintenance at fold cadence, reported for
// contrast.
//
// Run (idle machine, no concurrent Spark jobs - bench contention rule):
//   spark-shell --master local[32] --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/ann_incr_flat.scala > /tmp/ann_incr_flat.log 2>&1
// Results recorded in BASELINE.md ("Incremental ANN" rows).
import org.apache.spark.sql.functions._

def timeIt[T](label: String)(f: => T): T = {
  val s = System.nanoTime; val r = f
  println(f"[ann_incr_flat] $label ${(System.nanoTime - s) / 1e9}%.2f s"); r
}

val batch = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
  .filter(col("vec_id") % 10 === 7)
println(s"[ann_incr_flat] batch size ${batch.count()}")

for ((dir, tag) <- Seq(("/root/testdata/sf0.1", "1x"),
    ("/tmp/sf1", "10x"), ("/tmp/sf10", "100x"))) {
  val corpus = graft.Tables.embeddings(spark, dir)
    .filter(col("vec_id") % 10 =!= 7)
  val idx = graft.session.Scratch.dir("annflat") + "/idx"
  timeIt(s"build $tag")(graft.ops.VectorIndex.putIvfPq(corpus, idx))
  val q = graft.Tables.embeddings(spark, dir)
    .filter(col("vec_id") === 1L)
    .select(col("embedding")).head.getAs[Seq[Float]](0).toArray
  timeIt(s"probe pre-append $tag")(
    graft.ops.VectorIndex.searchIvfPq(spark, idx, q, k = 10,
      rerank = 0).collect())
  timeIt(s"append $tag")(
    graft.ops.VectorIndex.appendBatchIvfPq(batch, idx, batchId = 1L))
  timeIt(s"probe layered $tag")(
    graft.ops.VectorIndex.searchIvfPq(spark, idx, q, k = 10,
      rerank = 0).collect())
  println(s"[ann_incr_flat] retrainDue $tag: " +
    graft.ops.VectorIndex.retrainDue(spark, idx))
  timeIt(s"fold $tag")(graft.ops.VectorIndex.foldIvfPq(spark, idx))
  timeIt(s"probe folded $tag")(
    graft.ops.VectorIndex.searchIvfPq(spark, idx, q, k = 10,
      rerank = 0).collect())
}
System.exit(0)
