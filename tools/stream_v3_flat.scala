// Isolated A/B for the streaming-V3 scale claim (round 16): the SAME
// fixed held-out slice (sf0.1's doc_id % 10 = 7, ~500 docs in 4
// micro-batches) streamed through curationIngestV3 against historic
// state (pinned CCNet model + dedup index) built over corpora at
// 1x / 10x. Per-batch cost must follow the BATCH: the gate is
// batch-local, the pinned-model scan prunes to the batch's token
// buckets, the probe reads index term buckets with the batch side
// broadcast — nothing scans the historic corpus, so the per-batch
// p50 stays flat while the historic state grows 10x.
//
// Run (idle machine - bench contention rule):
//   spark-shell --master local[32] --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/stream_v3_flat.scala > /tmp/stream_v3_flat.log 2>&1
// Results recorded in BASELINE.md ("Streaming V3" rows).
import org.apache.spark.sql.functions._

val batchSrc = graft.Tables.documents(spark, "/root/testdata/sf0.1")
  .select("doc_id", "lang", "text")
  .filter(col("doc_id") % 10 === 7)

for ((dir, tag) <- Seq(("/root/testdata/sf0.1", "1x"), ("/tmp/sf1", "10x"))) {
  val root = graft.session.Scratch.dir("sv3flat")
  val hist = graft.Tables.documents(spark, dir)
    .select("doc_id", "lang", "text")
    .filter(col("doc_id") % 10 =!= 7)
  def timeIt[T](label: String)(f: => T): T = {
    val s = System.nanoTime; val r = f
    println(f"[stream_v3_flat] $label $tag ${(System.nanoTime - s) / 1e9}%.2f s")
    r
  }
  timeIt("train_model")(
    graft.ops.Curation.trainPplModel(hist, s"$root/model"))
  timeIt("build_index")(
    graft.ops.Dedup.buildDedupIndex(hist.select("doc_id", "text"),
      s"$root/idx"))
  batchSrc.repartition(4).write.mode("overwrite").parquet(s"$root/src")
  val schema = spark.read.parquet(s"$root/src").schema
  val q = graft.streaming.EventStream.curationIngestV3(
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/src"),
    s"$root/t", s"$root/ck", appId = s"sv3flat-$tag",
    indexPath = s"$root/idx", streamIndexPath = s"$root/sidx",
    pplModelPath = s"$root/model",
    gate = Some((d: org.apache.spark.sql.DataFrame) =>
      graft.ops.Curation.gopherGate(d,
        stopWords = graft.ops.Curation.CorpusStopWords)))
  timeIt("stream_total")(q.awaitTermination())
  val ms = q.recentProgress.filter(_.numInputRows > 0)
    .flatMap(p => Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue)).sorted
  if (ms.nonEmpty)
    println(f"[stream_v3_flat] batch_p50 $tag ${ms(ms.length / 2) / 1000.0}%.2f s " +
      f"(batches=${ms.length})")
  println(s"[stream_v3_flat] admitted $tag " +
    graft.io.DeltaLogReader.read(spark, s"$root/t").count())
}
System.exit(0)
