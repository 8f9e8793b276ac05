// Per-query timing harness for the round-16 optimization loop: times
// the named declared queries (full materialization via toRdd.count,
// same as Bench) best-of-N on the current classes, without paying a
// full 166-entry sweep per iteration.
//
// Run (IDLE machine - same contention rule as Bench):
//   ROUNDS=2 QUERIES=curate_pipeline_v3,curate_ppl_bucket \
//   spark-shell --master local[32] --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.adaptive.enabled=true \
//     --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/r16_time.scala
val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val rounds = sys.env.getOrElse("ROUNDS", "2").toInt
val names = sys.env.getOrElse("QUERIES", "").split(",").map(_.trim)
  .filter(_.nonEmpty).toSeq
// warmup: touch every table once (schema + footers + codegen), as Bench does
graft.Tables.names.foreach { n =>
  try {
    val df = if (n == "events") graft.Tables.events(spark, dir)
             else graft.Tables.load(spark, dir, n)
    df.count()
  } catch { case _: Throwable => }
}
for (r <- 1 to rounds; n <- names) {
  val fn = graft.SparkEntry.queries(n)
  val t0 = System.nanoTime()
  fn(spark, dir).queryExecution.toRdd.count()
  val dt = (System.nanoTime() - t0) / 1e9
  graft.ops.Dedup.releaseCaches()
  println(f"[r16time] $n r$r $dt%.2f s")
}
System.exit(0)
