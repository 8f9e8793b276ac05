// Auto-geometry tuning observable (round 16): recall@10 of the
// IVF-PQ index under the corpus-derived geometry (autoCells = sqrt n)
// as a function of probe fraction and rerank depth, on the fixed
// sf0.1 corpus (2000 vectors, 20 queries, exact cosine truth). Used
// to PIN autoNprobe/autoRerankScaled defaults on measurement.
//
// Run: spark-shell --master local[32] --driver-memory 16g \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//   --driver-class-path target/scala-2.13/classes \
//   -i tools/ivfpq_autotune.scala > /tmp/ivfpq_autotune.log 2>&1
import org.apache.spark.sql.functions._

val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
  .select(col("vec_id"), col("embedding"), col("label")).persist()
val all = emb.select("vec_id", "embedding").collect()
  .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray)
val queries = all.filter(_._1 < 20).sortBy(_._1).toSeq

def cos(a: Array[Float], b: Array[Float]): Double = {
  var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
  while (i < a.length) {
    dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
    nb += b(i).toDouble * b(i); i += 1
  }
  dot / (math.sqrt(na) * math.sqrt(nb))
}
val truth: Map[Long, Set[Long]] = queries.map { case (qid, q) =>
  qid -> all.filter(_._1 != qid).map { case (id, v) => (id, cos(q, v)) }
    .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
}.toMap

val root = graft.session.Scratch.dir("ivfpq-tune")
graft.ops.VectorIndex.putIvfPq(emb, s"$root/auto") // kCells = 0 -> sqrt
val nCells = spark.read.parquet(
  s"${graft.table.SnapshotTree.roots(spark, s"$root/auto").head}/centroids")
  .count().toInt
println(s"[tune] corpus=2000 autoCells=$nCells")

for (np <- Seq(4, 6, 9, 12, 16, 23, 32); rr <- Seq(60, 120, 240)) {
  var hit = 0
  for ((qid, q) <- queries) {
    val got = graft.ops.VectorIndex.searchIvfPq(spark, s"$root/auto", q,
      k = 12, nprobe = np, rerank = rr, emb = Some(emb),
      excludeId = Some(qid))
      .select("vec_id").collect().map(_.getLong(0)).take(10).toSet
    hit += got.intersect(truth(qid)).size
  }
  println(f"[tune] nprobe=$np%2d frac=${np.toDouble / nCells}%.2f " +
    f"rerank=$rr%3d recall@10=${hit / 200.0}%.3f")
}
System.exit(0)
