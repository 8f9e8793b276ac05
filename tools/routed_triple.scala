// Round-14 scale evidence, two measurements in one idle run:
//  1. dedup_lsh_routed triple (sf0.1 / sf1 / sf10): the composed
//     skew-guard + cluster-route operator must keep the capped path's
//     ~linear floor where uncapped enumeration was 385 s at sf1.
//  2. gopherRepetition prefix-vs-explode9 at sf10 (verdict #7): the
//     round-13 win's mechanism (distinct-window second shuffle) could
//     erode at 100x if distinct windows grow faster than occurrences -
//     confirm or flip the default on data.
//
// Run (idle machine - bench contention rule):
//   spark-shell --master local[32] --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/routed_triple.scala > /tmp/routed_triple.log 2>&1
def timeIt[T](label: String)(f: => T): T = {
  val s = System.nanoTime; val r = f
  println(f"[r14] $label ${(System.nanoTime - s) / 1e9}%.2f s"); r
}

for ((dir, tag) <- Seq(("/root/testdata/sf0.1", "sf0.1"),
    ("/tmp/sf1", "sf1"), ("/tmp/sf10", "sf10"))) {
  for (round <- 1 to 2) {
    val df = graft.ops.Dedup.minhashDedupRouted(spark, dir)
    timeIt(s"routed $tag r$round")(df.queryExecution.toRdd.count())
    graft.ops.Dedup.releaseCaches()
  }
}

for (round <- 1 to 2; (name, flag) <- Seq("explode9" -> false,
    "prefix" -> true)) {
  val df = graft.ops.Curation.gopherRepetitionDerived(spark, "/tmp/sf10", flag)
  timeIt(s"gopher sf10 $name r$round")(df.queryExecution.toRdd.count())
}
System.exit(0)
