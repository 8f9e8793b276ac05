// Stage-level timing of curate_pipeline_v3's components at sf0.1 -
// where do the composed seconds go? Run idle:
//   spark-shell --master local[32] --driver-memory 8g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/r16_v3_stages.scala
import org.apache.spark.sql.functions._
val dir = "/root/testdata/sf0.1"
def t[T](label: String)(f: => T): T = {
  val s = System.nanoTime; val r = f
  println(f"[v3stage] $label ${(System.nanoTime - s) / 1e9}%.2f s"); r
}
graft.Tables.names.foreach { n =>
  try graft.Tables.load(spark, dir, n).count() catch { case _: Throwable => } }
val stop = graft.ops.Curation.CorpusStopWords

for (round <- 1 to 2) {
  // full composed
  t(s"r$round full_v3") {
    graft.ops.Curation.curatePipelineV3(spark, dir, stopWords = stop)
      .queryExecution.toRdd.count()
  }
  graft.ops.Dedup.releaseCaches()
  // pieces
  val docs = graft.Tables.documents(spark, dir)
    .select(col("doc_id"), col("lang"), col("text"))
  val gated = graft.ops.Curation.gopherGate(docs, 50, 100000, stop)
  t(s"r$round gate_only")(gated.write.format("noop").mode("overwrite").save())
  val sel = t(s"r$round selected_mat") {
    val k = graft.ops.Curation.getClass.getDeclaredMethods
      .find(_.getName == "pplSelectedDocIds").get
    k.setAccessible(true)
    val keep = k.invoke(graft.ops.Curation, gated,
      new java.math.BigDecimal("-3.430000"))
      .asInstanceOf[org.apache.spark.sql.DataFrame]
    val s0 = gated.join(keep, Seq("doc_id")).select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    s0.write.format("noop").mode("overwrite").save()
    s0
  }
  t(s"r$round routed_on_sel") {
    graft.ops.Dedup.minhashDedupRoutedOn(sel, 16, 0.5)
      .filter(col("keep")).select(col("doc_id"))
      .write.format("noop").mode("overwrite").save()
  }
  t(s"r$round substr_on_sel") {
    val m = classOf[graft.ops.Dedup.type].getDeclaredMethods
      .find(_.getName == "substrDedupPass").get
    m.setAccessible(true)
    m.invoke(graft.ops.Dedup, sel, Int.box(8), Int.box(2))
      .asInstanceOf[org.apache.spark.sql.DataFrame]
      .write.format("noop").mode("overwrite").save()
  }
  graft.ops.Dedup.releaseCaches()
}
System.exit(0)
