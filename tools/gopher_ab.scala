// A/B for the round-13 gopherRepetition prefix-window formulation
// (round-12 verdict #5): derive all nine n-gram tables from ONE
// up-to-10-token sliding window per position (prefix substrings of the
// aggregated window groups) vs the shipped 9-way (n, window) explode.
// Timed on sf0.1 and sf1 (= ScaleUp 10 of sf0.1, built to /tmp/sf1
// first: SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ScaleUp 10
// /root/testdata/sf0.1 /tmp/sf1").
//
// Run (idle machine - bench contention rule):
//   spark-shell --master local[32] --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/gopher_ab.scala > /tmp/gopher_ab.log 2>&1
// Results recorded in the gopherRepetitionOn scaladoc + BASELINE.md.
def timeIt[T](label: String)(f: => T): T = {
  val s = System.nanoTime; val r = f
  println(f"[gopher_ab] $label ${(System.nanoTime - s) / 1e9}%.2f s"); r
}

for ((dir, tag) <- Seq(("/root/testdata/sf0.1", "sf0.1"),
    ("/tmp/sf1", "sf1"))) {
  for (round <- 1 to 2; (name, flag) <- Seq("explode9" -> false,
      "prefix" -> true)) {
    val df = graft.ops.Curation.gopherRepetitionDerived(spark, dir, flag)
    timeIt(s"$tag $name r$round")(df.queryExecution.toRdd.count())
  }
}
System.exit(0)
