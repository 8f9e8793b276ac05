// Round-15 scale evidence for curate_pipeline_v3 (the production
// recipe with routed fuzzy dedup composed INSIDE): the composed plan
// must cost no more than its stages run standalone at every scale -
// each gate shrinks the next stage's shuffle mass, so composition is
// the cheap direction, not an overhead. Stages standalone = the
// routed dedup over the RAW corpus plus the v2 pipeline (gate + ppl +
// substr over the gated corpus); composed = v3 (gate + ppl + routed
// over SELECTED survivors + substr over fuzzy-unique survivors).
//
// Run (idle machine - bench contention rule):
//   spark-shell --master local[32] --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/v3_triple.scala > /tmp/v3_triple.log 2>&1
def timeIt[T](label: String)(f: => T): T = {
  val s = System.nanoTime; val r = f
  println(f"[v3] $label ${(System.nanoTime - s) / 1e9}%.2f s"); r
}

val stop = graft.ops.Curation.CorpusStopWords

for ((dir, tag) <- Seq(("/root/testdata/sf0.1", "sf0.1"),
    ("/tmp/sf1", "sf1"), ("/tmp/sf10", "sf10"))) {
  // one round at 100x: the three sf10 legs are minutes each and the
  // 1x/10x pairs already bound run-to-run noise
  for (round <- 1 to (if (tag == "sf10") 1 else 2)) {
    val v3 = graft.ops.Curation.curatePipelineV3(spark, dir,
      stopWords = stop)
    timeIt(s"v3 composed $tag r$round")(v3.queryExecution.toRdd.count())
    graft.ops.Dedup.releaseCaches()
    val routed = graft.ops.Dedup.minhashDedupRouted(spark, dir)
    timeIt(s"routed standalone $tag r$round")(
      routed.queryExecution.toRdd.count())
    graft.ops.Dedup.releaseCaches()
    val v2 = graft.ops.Curation.curatePipelineModern(spark, dir,
      stopWords = stop)
    timeIt(s"v2 standalone $tag r$round")(v2.queryExecution.toRdd.count())
    graft.ops.Dedup.releaseCaches()
  }
}
System.exit(0)
