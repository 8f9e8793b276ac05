// A/B for curate_pipeline_v3's persistSelected knob at sf1 (idle):
// the `selected` frame feeds the routed signature table and the
// fuzzy-survivor join; streamed, each consumer re-runs scan + gate +
// the perplexity chain (a token-level shuffle). DISK_ONLY persist
// materializes it once. Unlike the repo's rejected text-cache A/Bs,
// the avoided recompute here carries a shuffle, so this one could go
// either way - measure, do not guess.
//
// Run (idle machine - bench contention rule):
//   spark-shell --master local[32] --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/v3_persist_ab.scala > /tmp/v3_persist_ab.log 2>&1
def timeIt[T](label: String)(f: => T): T = {
  val s = System.nanoTime; val r = f
  println(f"[v3ab] $label ${(System.nanoTime - s) / 1e9}%.2f s"); r
}

val stop = graft.ops.Curation.CorpusStopWords
for (round <- 1 to 2; (name, flag) <- Seq("streamed" -> false,
    "persisted" -> true)) {
  for ((dir, tag) <- Seq(("/root/testdata/sf0.1", "sf0.1"),
      ("/tmp/sf1", "sf1"))) {
    val df = graft.ops.Curation.curatePipelineV3(spark, dir,
      stopWords = stop, persistSelected = flag)
    timeIt(s"$tag $name r$round")(df.queryExecution.toRdd.count())
    graft.ops.Dedup.releaseCaches()
  }
}
System.exit(0)
