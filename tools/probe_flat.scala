// Isolated A/B for the incremental-dedup scale claim: a FIXED-size
// batch (sf0.1's doc_id % 10 = 7 slice, ~500 docs) probed against
// corpus indexes built at 1x / 10x / 100x. If the per-band
// signature-group reduction does its job, probe wall time tracks the
// number of DISTINCT signatures (which dup-dense replication does not
// grow), not corpus size.
//
// Run (idle machine, no concurrent Spark jobs - bench contention rule):
//   spark-shell --master local[32] --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/probe_flat.scala > /tmp/probe_flat.log 2>&1
// Results recorded in BASELINE.md ("Incremental dedup" row).
import org.apache.spark.sql.functions._

def timeIt[T](label: String)(f: => T): T = {
  val s = System.nanoTime; val r = f
  println(f"[probe_flat] $label ${(System.nanoTime - s) / 1e9}%.2f s"); r
}

val batch = graft.Tables.documents(spark, "/root/testdata/sf0.1")
  .filter(col("doc_id") % 10 === 7)

for ((dir, tag) <- Seq(("/root/testdata/sf0.1", "1x"),
    ("/tmp/sf1", "10x"), ("/tmp/sf10", "100x"))) {
  val corpus = graft.Tables.documents(spark, dir)
    .filter(col("doc_id") % 10 =!= 7)
  val idx = graft.session.Scratch.dir("pf") + "/idx"
  timeIt(s"build $tag")(graft.ops.Dedup.buildDedupIndex(corpus, idx))
  val out = timeIt(s"probe $tag")(
    graft.ops.Dedup.incrementalProbe(spark, batch, idx).localCheckpoint())
  println(s"[probe_flat] verdicts $tag: " + out.count())
  // daily-loop write-back: admit the batch's novel docs. If update cost
  // follows the BATCH (fixed here), this is flat across index scales.
  val admitted = batch.join(
    out.filter(col("verdict") === "novel").select("doc_id"), Seq("doc_id"))
  timeIt(s"update $tag")(
    graft.ops.Dedup.updateDedupIndex(admitted, idx))
  println(s"[probe_flat] index rows $tag: " +
    graft.ops.Dedup.readDedupIndex(spark, idx)._2.count())
}
System.exit(0)
