// Recall@10 observable for the persisted ANN indexes (round-13,
// verdict #6): flat probe latency is only half the at-scale claim -
// pruning that silently loses recall as the corpus grows would pass
// every latency gate.
//
// Protocol: needle-in-a-growing-haystack. The sf0.1 embeddings are the
// fixed "signal" set; the corpus grows 1x/10x/100x by adding
// DETERMINISTIC RANDOM distractors (xxhash64-derived components,
// cos ~ 0 to everything), so the true top-10 of a base query stays the
// base neighbors while the index must keep finding them through 100x
// more data. (A first protocol that replicated the base vectors with
// small jitter was measured and REJECTED: the replicas of the query's
// own base vector BECOME the true top-10, and every method scores a
// trivial 1.000 at 10x+.) Distractors are NORM-MATCHED to the base
// corpus (not separable by magnitude under L2). Truth = brute-force
// top-10 on the same corpus under each index's OWN metric (cosine for
// LSH/IVF/reranked-PQ, euclidean for raw ADC), self excluded; recall
// is intersection/10 over 20 queries; probe wall time alongside.
//
// Run (idle machine - bench contention rule):
//   spark-shell --master local[32] --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/ann_recall.scala > /tmp/ann_recall.log 2>&1
// Results recorded in BASELINE.md ("ANN recall" rows).
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

graft.expr.CosineSimilarity.register(spark)

val base = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
val baseN = base.count()
val dim = base.select(size(col("embedding"))).head.getInt(0)

// deterministic pseudo-random unit-cube components per (vec_id, j)
// mean base norm: distractors are NORM-MATCHED to the base corpus so
// they are not trivially separable under L2 (the PQ/ADC metric)
val bn = base.select(avg(expr(
  "sqrt(aggregate(embedding, 0.0d, (a, x) -> a + cast(x as double) * x))")))
  .head.getDouble(0)

def distractors(n: Long): DataFrame =
  spark.range(n)
    .select((col("id") + 100000000L).as("vec_id"))
    .withColumn("raw", expr(
      s"""transform(sequence(0, ${dim - 1}), j ->
         |  (cast(pmod(xxhash64(vec_id, j), 1000L) as double) / 500.0d)
         |    - 1.0d)""".stripMargin))
    .withColumn("nrm", expr(
      "sqrt(aggregate(raw, 0.0d, (a, x) -> a + x * x))"))
    .withColumn("embedding", expr(
      s"cast(transform(raw, x -> x / nrm * ${bn}d) as array<float>)"))
    .withColumn("label", lit(-1))
    .select("vec_id", "embedding", "label")

def scaled(factor: Int): DataFrame =
  if (factor == 1) base
  else base.unionByName(distractors(baseN * (factor - 1)))

val queries: Seq[(Long, Array[Float])] = base
  .filter(col("vec_id") < 20).orderBy("vec_id")
  .collect()
  .map(r => r.getAs[Long]("vec_id") ->
    r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
  .toSeq

def topIds(df: DataFrame, self: Long): Seq[Long] =
  df.select("vec_id").collect().map(_.getLong(0))
    .filter(_ != self).take(10).toSeq

def timed[T](f: => T): (T, Double) = {
  val s = System.nanoTime; val r = f; (r, (System.nanoTime - s) / 1e9)
}

for ((factor, tag) <- Seq(1 -> "1x", 10 -> "10x", 100 -> "100x")) {
  val emb = scaled(factor)
    .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
  println(s"[ann_recall] scale=$tag corpus=${emb.count()}")
  val root = graft.session.Scratch.dir("annrec")
  graft.ops.VectorIndex.putLsh(emb, s"$root/lsh")
  // the OR-amplification knob: 4 independent 8-bit bands - a
  // candidate needs to collide in ANY band, trading scan width for
  // recall (the same knob the MinHash text family uses)
  graft.ops.VectorIndex.putLsh(emb, s"$root/lsh4", nBands = 4)
  graft.ops.VectorIndex.putIvf(emb, s"$root/ivf")
  graft.ops.VectorIndex.putPq(emb, s"$root/pq", m = 8)
  // the code-length knob: 16 subspaces (16B codes) - PQ recall at a
  // growing corpus is bounded by quantization noise vs neighbor
  // margin, so code length must grow with the corpus
  graft.ops.VectorIndex.putPq(emb, s"$root/pq16", m = 16)
  // the composed production shape (r15): FIXED 8-cell geometry +
  // auto-budget PQ codes (m=16) + exact rerank - kept as the
  // frozen-geometry contrast row for the r16 auto geometry below
  graft.ops.VectorIndex.putIvfPq(emb, s"$root/ivfpq", kCells = 8)
  // r16 auto geometry: sqrt-n cells (sample-trained), 1/3 probed
  // fraction, probed/4 rerank window - the corpus-scaled defaults;
  // the gate is the 100x row not sitting below the 1x point
  graft.ops.VectorIndex.putIvfPq(emb, s"$root/ivfpqauto")
  // metric-matched truths: cosine for LSH/IVF/reranked PQ, L2 for the
  // raw ADC path (searchPq's contract is euclidean)
  graft.expr.EuclideanDistance.register(spark)
  val truthCos = queries.map { case (qid, q) =>
    qid -> topIds(
      emb.withColumn("c",
          call_function("cosine_sim", col("embedding"), typedLit(q.toSeq)))
        .orderBy(col("c").desc, col("vec_id")).limit(12), qid)
  }.toMap
  val truthL2 = queries.map { case (qid, q) =>
    qid -> topIds(
      emb.withColumn("d",
          call_function("euclidean_dist", col("embedding"), typedLit(q.toSeq)))
        .orderBy(col("d").asc, col("vec_id")).limit(12), qid)
  }.toMap
  val methods: Seq[(String, Map[Long, Seq[Long]], Array[Float] => DataFrame)] =
    Seq(
      ("lsh", truthCos, (q: Array[Float]) =>
        graft.ops.VectorIndex.searchLsh(spark, s"$root/lsh", q, k = 12)),
      ("lsh_probe32", truthCos, (q: Array[Float]) =>
        graft.ops.VectorIndex.searchLsh(spark, s"$root/lsh", q, k = 12,
          nProbe = 32)),
      ("lsh_bands4", truthCos, (q: Array[Float]) =>
        graft.ops.VectorIndex.searchLsh(spark, s"$root/lsh4", q, k = 12)),
      ("lsh_bands4_probe8", truthCos, (q: Array[Float]) =>
        graft.ops.VectorIndex.searchLsh(spark, s"$root/lsh4", q, k = 12,
          nProbe = 8)),
      ("ivf", truthCos, (q: Array[Float]) =>
        graft.ops.VectorIndex.searchIvf(spark, s"$root/ivf", q, k = 12)),
      ("ivf_probe6", truthCos, (q: Array[Float]) =>
        graft.ops.VectorIndex.searchIvf(spark, s"$root/ivf", q, k = 12,
          nprobe = 6)),
      ("pq_l2", truthL2, (q: Array[Float]) =>
        graft.ops.VectorIndex.searchPq(spark, s"$root/pq", q, k = 12)),
      ("pq_rerank50", truthCos, (q: Array[Float]) =>
        graft.ops.VectorIndex.searchPq(spark, s"$root/pq", q, k = 12,
          rerank = 50, emb = Some(emb))),
      ("pq16_l2", truthL2, (q: Array[Float]) =>
        graft.ops.VectorIndex.searchPq(spark, s"$root/pq16", q, k = 12)),
      ("pq16_rerank50", truthCos, (q: Array[Float]) =>
        graft.ops.VectorIndex.searchPq(spark, s"$root/pq16", q, k = 12,
          rerank = 50, emb = Some(emb))),
      ("ivfpq_probe3", truthCos, (q: Array[Float]) =>
        graft.ops.VectorIndex.searchIvfPq(spark, s"$root/ivfpq", q,
          k = 12, nprobe = 3, rerank = 60, emb = Some(emb))),
      ("ivfpq_probe6", truthCos, (q: Array[Float]) =>
        graft.ops.VectorIndex.searchIvfPq(spark, s"$root/ivfpq", q,
          k = 12, nprobe = 6, rerank = 60, emb = Some(emb))),
      ("ivfpq_auto", truthCos, (q: Array[Float]) =>
        graft.ops.VectorIndex.searchIvfPq(spark, s"$root/ivfpqauto", q,
          k = 12, emb = Some(emb))))
  for ((name, truth, search) <- methods) {
    var hit = 0; var n = 0; var wall = 0.0
    for ((qid, q) <- queries) {
      val (got, t) = timed(topIds(search(q), qid))
      hit += got.toSet.intersect(truth(qid).toSet).size
      n += truth(qid).size
      wall += t
    }
    println(f"[ann_recall] scale=$tag method=$name " +
      f"recall@10=${hit.toDouble / n}%.3f avg_probe_s=${wall / queries.size}%.3f")
  }
  emb.unpersist()
}
System.exit(0)
