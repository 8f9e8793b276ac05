// Dump .explain("formatted") for the named declared queries into
// plans/r17/<name>_<tag>.txt - the judge's evidence files for the
// round-17 plan claims.
//
// Run note: constructing curate_pipeline_v2/v3 (and curate_ppl_pinned's
// model fixture) executes corpus-scale work EAGERLY at declaration
// (localCheckpoint of the perplexity selection), so the sf dir must be
// populated and the run does real Spark jobs - plan dumping is NOT free
// for those entries:
//   TAG=before QUERIES=curate_pipeline_v3,curate_pipeline_v2 \
//   spark-shell --master local[32] --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/r16_plans.scala
val tag = sys.env.getOrElse("TAG", "before")
val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val names = sys.env.getOrElse("QUERIES", "").split(",").map(_.trim)
  .filter(_.nonEmpty).toSeq
val out = java.nio.file.Paths.get("plans/r17")
java.nio.file.Files.createDirectories(out)
for (n <- names) {
  val fn = graft.SparkEntry.queries(n)
  val df = fn(spark, dir)
  val txt = df.queryExecution.explainString(
    org.apache.spark.sql.execution.FormattedMode)
  java.nio.file.Files.write(out.resolve(s"${n}_$tag.txt"),
    txt.getBytes("UTF-8"))
  graft.ops.Dedup.releaseCaches()
  println(s"[plans] wrote ${n}_$tag.txt (${txt.length} chars)")
}
System.exit(0)
