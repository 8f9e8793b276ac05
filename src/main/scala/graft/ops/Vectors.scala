package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Vector similarity search over the `embeddings` table — the S3 Vectors
  * surface of the reference (`s3/_vectors/_read.py:249-344` query_vectors,
  * top-k with distance metric) plus the ANN scale path the brief requires.
  *
  * All distance math runs through the native codegen'd
  * [[graft.expr.CosineSimilarity]] expression (one fused loop per pair —
  * no UDFs, no interpreted lambdas). Exact brute-force KNN is
  * the baseline (one scan + TakeOrderedAndProject); the LSH variant
  * prunes candidates with random hyperplane signatures (sign-of-dot-
  * product bits), turning top-k into a bucket-join — the plan that holds
  * when the index has 10^10 vectors: signatures are precomputable, the
  * probe is an equi-join on the bucket key.
  */
object Vectors {

  /** Cosine via the native codegen'd expression (same sequential
    * accumulation as the higher-order fold it replaced — bit-identical
    * values, one fused loop instead of interpreted lambdas). */
  private def cosine(s: SparkSession, a: String, b: String) = {
    graft.expr.CosineSimilarity.register(s)
    call_function("cosine_sim", col(a), col(b))
  }

  /** Exact brute-force cosine top-k against the vec_id=0 query vector.
    * Output carries ids + rank only: float-sum rounding may differ at the
    * last ulp between engines, which cannot change the ordering of
    * well-separated random vectors but would break value hashing.
    */
  def knnExact(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val query = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("q"))
    emb.filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(query))
      .withColumn("cosine", cosine(s, "embedding", "q"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), col("label"))
  }

  def knnExactOracle: String =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id, label
      |FROM embeddings, q
      |WHERE vec_id <> 0
      |ORDER BY
      |  list_sum(list_transform(generate_series(1, 64),
      |    i -> cast(embedding[i] as double) * cast(qe[i] as double)))
      |  / (sqrt(list_sum(list_transform(generate_series(1, 64),
      |       i -> cast(embedding[i] as double) * cast(embedding[i] as double))))
      |     * sqrt(list_sum(list_transform(generate_series(1, 64),
      |       i -> cast(qe[i] as double) * cast(qe[i] as double)))))
      |  DESC, vec_id
      |LIMIT 10""".stripMargin

  /** Exact brute-force EUCLIDEAN top-k — the reference's second
    * distance metric (`s3/_vectors/_mgmt.py` `distance_metric`
    * cosine|euclidean; queries honor the index's metric). Same plan
    * shape as [[knnExact]] with the native codegen'd
    * [[graft.expr.EuclideanDistance]]; ids-only output for the same
    * last-ulp reason. */
  def knnEuclidean(s: SparkSession, dir: String): DataFrame = {
    graft.expr.EuclideanDistance.register(s)
    val emb = Tables.embeddings(s, dir)
    val query = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("q"))
    emb.filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(query))
      .withColumn("dist", call_function("euclidean_dist",
        col("embedding"), col("q")))
      .orderBy(col("dist").asc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), col("label"))
  }

  def knnEuclideanOracle: String =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id, label
      |FROM embeddings, q
      |WHERE vec_id <> 0
      |ORDER BY
      |  sqrt(list_sum(list_transform(generate_series(1, 64),
      |    i -> (cast(embedding[i] as double) - cast(qe[i] as double))
      |       * (cast(embedding[i] as double) - cast(qe[i] as double)))))
      |  ASC, vec_id
      |LIMIT 10""".stripMargin

  /** Per-label centroid norms + membership — the IVF coarse-quantizer
    * statistics (label plays the role of the coarse cell). Counts only
    * (exact in both engines). */
  def labelStats(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        min(col("vec_id")).as("min_vec_id"),
        max(col("vec_id")).as("max_vec_id"))

  def labelStatsOracle: String =
    """SELECT label, count(*) AS n_vectors,
      |  min(vec_id) AS min_vec_id, max(vec_id) AS max_vec_id
      |FROM embeddings GROUP BY label""".stripMargin

  /** Embedding-cosine near-duplicate pairs within a label block — the
    * vector leg of the dedup family. Blocking by the coarse cell (label)
    * is the candidate-generation step every scale deployment needs (here
    * it also bounds the exact pair join: pairs grow per-block, not
    * globally). Output carries ids only: cosine values differ in the
    * last ulp across engines, the ≥-threshold membership does not.
    */
  def embeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val a = emb.select(col("vec_id").as("id1"), col("label"),
      col("embedding").as("e1"))
    val b = emb.select(col("vec_id").as("id2"), col("label"),
      col("embedding").as("e2"))
    a.join(b, Seq("label"))
      .filter(col("id1") < col("id2"))
      .withColumn("cosine", cosine(s, "e1", "e2"))
      .filter(col("cosine") >= 0.4)
      .select(col("id1"), col("id2"), col("label"))
  }

  def embeddingNearDupOracle: String =
    """WITH n AS (
      |  SELECT vec_id, label, embedding,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> cast(x as double) * cast(x as double)))) AS nrm
      |  FROM embeddings)
      |SELECT a.vec_id AS id1, b.vec_id AS id2, a.label
      |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_sum(list_transform(generate_series(1, 64),
      |        i -> cast(a.embedding[i] as double) * cast(b.embedding[i] as double)))
      |      / (a.nrm * b.nrm) >= 0.4""".stripMargin

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC
    * deduplication over embeddings — cluster with a coarse quantizer,
    * then prune near-identical pairs WITHIN each cluster only, keeping
    * one representative (lowest id) per duplicate group. The clustering
    * is what makes semantic dedup tractable at corpus scale: the
    * quadratic pair comparison is bounded per cluster instead of global
    * (k clusters cut the candidate join by ~k²/k = k).
    *
    * ONE operator, one knob (r11 — folds the former fixed-k variant):
    * `k` is the cluster count of the deterministic seed quantizer
    * (centroids = the embeddings of the k lowest vec_ids — no
    * iteration, bit-exact in any engine). The DEFAULT k ≈ ⌈√n⌉ SCALES
    * WITH THE CORPUS, holding the within-cluster quadratic at
    * n²/√n = n^1.5 — the scale-safe shape; a fixed k is reachable as an
    * explicit argument but at 100× data makes every cluster 100×
    * heavier (the measured 42×-vs-13× contrast in BASELINE.md). The
    * knob is priced by one count(*) (parquet footer metadata, no data
    * scan).
    *
    * Shapes: a broadcast nearest-centroid assignment reduced by a
    * partial-aggregable `max(struct(...))` — map-side combine, no
    * window sort over the n×k cross join — then one within-cluster
    * self-join. Keep rule: drop any vector that has a ≥τ neighbor with
    * a smaller id in its cluster; deterministic and SQL-expressible,
    * so the whole pipeline differentially tests against DuckDB. */
  def semDedup(s: SparkSession, dir: String, tau: Double = 0.4,
      k: Option[Int] = None): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val kk = k.getOrElse(
      math.max(1, math.ceil(math.sqrt(emb.count().toDouble)).toInt))
    val centroids = emb.orderBy(col("vec_id")).limit(kk)
      .select(col("vec_id").as("c_id"), col("embedding").as("centroid"))
    // assignment: ONE codegen'd argmax per row over the broadcast
    // centroid array (graft.expr.NearestCentroid — same cosine fold,
    // same lowest-c_id tie rule as the crossJoin+argmax-agg shape it
    // replaced, which materialized n×k rows through a hash aggregate
    // and dominated the 100× wall time once k scaled as √n). The
    // 1-row centroid collection is k-bounded (k ≈ √n) and rides the
    // same broadcast the join shipped anyway.
    graft.expr.NearestCentroid.register(s)
    val centArr = centroids
      .agg(array_sort(collect_list(struct(col("c_id"), col("centroid"))))
        .as("cents"))
    // repartition before the argmax: the k·d flops per row dwarf one
    // linear shuffle for any real k (a compact corpus can arrive as a
    // single input split, which would run the whole assignment on one
    // core); persist because the assignment feeds THREE plan branches
    // (both pair sides + the final anti-join) — without it the n×k
    // argmax re-runs per branch. Released by the harness via
    // [[Dedup.releaseCaches]], the LSH-signature lifecycle.
    val parts = math.max(s.sparkContext.defaultParallelism,
      s.conf.get("spark.sql.shuffle.partitions").toInt)
    val withCluster = emb.select(col("vec_id"), col("embedding"))
      .repartition(parts)
      .crossJoin(broadcast(centArr))
      .select(col("vec_id"), col("embedding"),
        call_function("nearest_centroid", col("embedding"), col("cents"))
          .as("cluster"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.registerCache(withCluster)
    val a = withCluster.select(col("vec_id").as("id1"), col("cluster"),
      col("embedding").as("e1"))
    val b = withCluster.select(col("vec_id").as("id2"), col("cluster"),
      col("embedding").as("e2"))
    val dups = a.join(b, Seq("cluster"))
      .filter(col("id1") < col("id2"))
      .withColumn("cosine", cosine(s, "e1", "e2"))
      .filter(col("cosine") >= tau)
      .select(col("id2")).distinct()
    withCluster
      .join(dups, col("vec_id") === col("id2"), "left_anti")
      .select(col("vec_id"), col("cluster"))
  }

  /** Oracle for the DEFAULT (scale-safe) path: DuckDB computes the same
    * k = ⌈√n⌉ via a scalar-subquery LIMIT. */
  def semDedupOracle: String =
    s"""WITH cent AS (
       |  SELECT vec_id AS c_id, embedding AS c
       |  FROM embeddings ORDER BY vec_id
       |  LIMIT (SELECT cast(ceil(sqrt(count(*))) as bigint)
       |         FROM embeddings)),
       |asg AS (
       |  SELECT vec_id, c_id AS cluster, embedding FROM (
       |    SELECT e.vec_id, cent.c_id, e.embedding,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosineSql("c", "e.embedding")} DESC, cent.c_id)
       |        AS rk
       |    FROM embeddings e CROSS JOIN cent) z WHERE rk = 1),
       |dups AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM asg a JOIN asg b
       |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.4)
       |SELECT vec_id, cluster FROM asg
       |WHERE vec_id NOT IN (SELECT vec_id FROM dups)""".stripMargin

  /** Oracle for the explicit fixed-k path (k=64). */
  def semDedupKOracle: String =
    s"""WITH cent AS (
       |  SELECT vec_id AS c_id, embedding AS c
       |  FROM embeddings ORDER BY vec_id LIMIT 64),
       |asg AS (
       |  SELECT vec_id, c_id AS cluster, embedding FROM (
       |    SELECT e.vec_id, cent.c_id, e.embedding,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosineSql("c", "e.embedding")} DESC, cent.c_id)
       |        AS rk
       |    FROM embeddings e CROSS JOIN cent) z WHERE rk = 1),
       |dups AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM asg a JOIN asg b
       |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.4)
       |SELECT vec_id, cluster FROM asg
       |WHERE vec_id NOT IN (SELECT vec_id FROM dups)""".stripMargin

  /** IVF-style ANN: coarse quantizer = per-label centroids (label plays
    * the coarse cell here; [[VectorIndex]] holds the k-means + persisted
    * variant), probe the `nprobe` nearest cells, exact re-rank inside.
    * The scan prunes to nprobe/ncells of the index — the structure that
    * survives 10^10 vectors.
    *
    * Differentially testable end-to-end: centroid means go through exact
    * decimal sums (order-independent, so Spark's partial aggregation and
    * DuckDB's sequential sum agree bit-for-bit), and every cosine is a
    * sequential double fold both engines evaluate identically.
    */
  def ivfSearch(s: SparkSession, dir: String, k: Int = 10,
      nprobe: Int = 3): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    // centroids: exact-decimal per-dimension mean via posexplode
    val centroids = emb
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("col").cast("decimal(20,10)")).cast("double") /
        count(lit(1)).cast("double")).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label").as("c_label"),
        expr("transform(pm, x -> cast(x.m as float))").as("centroid"))
    val query = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("q"))
    // probe the nprobe closest cells (label tiebreak: deterministic)
    val probed = centroids.crossJoin(broadcast(query))
      .withColumn("cdist", cosine(s, "centroid", "q"))
      .orderBy(col("cdist").desc, col("c_label"))
      .limit(nprobe)
      .select(col("c_label"))
    emb.filter(col("vec_id") =!= 0L)
      .join(broadcast(probed), col("label") === col("c_label"))
      .crossJoin(broadcast(query))
      .withColumn("cosine", cosine(s, "embedding", "q"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"))
  }

  /** One persisted PQ index per corpus directory (build is ingest-time
    * cost, paid once per JVM like [[Postings.indexFor]]). */
  private val pqIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** PQ ANN probe: ADC over 8-byte codes (32× less scan I/O than raw
    * embeddings), exact cosine rerank of the top candidates — the
    * memory-bound scale path beside the IVF and LSH variants
    * ([[VectorIndex.searchPq]]; recall gated by `PqSpec`).
    *
    * The codebook comes from [[VectorIndex.trainPqExact]] — seeds at the
    * `ksub` lowest vec_ids, one Lloyd step with order-independent
    * decimal(20,10) means — so every centroid, every packed code, the
    * whole ADC candidate ranking and the exact rerank reproduce
    * bit-for-bit in DuckDB: the full probe differentially tests against
    * [[pqSearchOracle]], not just a rows-count check. */
  def pqSearch(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val emb = graft.Tables.embeddings(s, dir)
    val idx = pqIndexCache.computeIfAbsent(dir, _ => {
      val tmp = graft.session.Scratch.dir("graft-pq-idx") + "/idx"
      // m pinned to the oracle's geometry (8 subspaces × 8 dims): the
      // auto default is 16, and with dim=64 both geometries share a
      // 1024-float codebook length, so an implicit default here would
      // silently re-slice the exact codebook
      VectorIndex.putPq(emb, tmp, m = 8,
        codebook = Some(VectorIndex.trainPqExact(emb)))
      tmp
    })
    val query = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head.getAs[Seq[Float]](0).toArray
    VectorIndex.searchPq(s, idx, query, k = k, rerank = 5 * k,
      emb = Some(emb), excludeId = Some(0L))
      .select(col("vec_id"), col("label"))
  }

  /** DuckDB mirror of the ENTIRE PQ probe: exact-decimal codebook
    * training (seed → one Lloyd step → decimal mean), per-subspace
    * argmin encoding (ties to the lowest cell, the strict-< scan of
    * `PqImpl.encode`), per-query ADC table, candidate top-`rerank` by
    * (adist, vec_id), exact cosine rerank. Every float is cast to
    * double before arithmetic and every sum is a sequential fold, the
    * byte-for-byte arithmetic of the Spark path. */
  def pqSearchOracle: String =
    s"""WITH sample AS (
       |  SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 2048),
       |sub AS (
       |  SELECT vec_id, j,
       |    list_transform(generate_series(1, 8), t -> embedding[j*8 + t]) AS p
       |  FROM sample, generate_series(0, 7) g(j)),
       |seeds AS (
       |  SELECT j, row_number() OVER (PARTITION BY j ORDER BY vec_id) - 1 AS c,
       |         p AS s
       |  FROM sub
       |  WHERE vec_id IN (SELECT vec_id FROM sample ORDER BY vec_id LIMIT 16)),
       |asg AS (
       |  SELECT j, c, p FROM (
       |    SELECT sub.j, seeds.c, sub.p,
       |      row_number() OVER (PARTITION BY sub.vec_id, sub.j
       |        ORDER BY list_sum(list_transform(generate_series(1, 8), t ->
       |          (cast(p[t] as double) - cast(s[t] as double)) *
       |          (cast(p[t] as double) - cast(s[t] as double)))), seeds.c)
       |        AS rk
       |    FROM sub JOIN seeds ON sub.j = seeds.j) z WHERE rk = 1),
       |cm AS (
       |  SELECT j, c, t,
       |    cast(cast(sum(cast(p[t] as decimal(20,10))) as double)
       |         / cast(count(*) as double) as float) AS v
       |  FROM asg, generate_series(1, 8) g(t)
       |  GROUP BY j, c, t),
       |cmeans AS (
       |  SELECT j, c, list(v ORDER BY t) AS cv FROM cm GROUP BY j, c),
       |cent AS (
       |  SELECT seeds.j, seeds.c, coalesce(cmeans.cv, seeds.s) AS cv
       |  FROM seeds LEFT JOIN cmeans
       |    ON seeds.j = cmeans.j AND seeds.c = cmeans.c),
       |allsub AS (
       |  SELECT vec_id, j,
       |    list_transform(generate_series(1, 8), t -> embedding[j*8 + t]) AS p
       |  FROM embeddings, generate_series(0, 7) g(j)),
       |codes AS (
       |  SELECT vec_id, j, c FROM (
       |    SELECT a.vec_id, a.j, cent.c,
       |      row_number() OVER (PARTITION BY a.vec_id, a.j
       |        ORDER BY list_sum(list_transform(generate_series(1, 8), t ->
       |          (cast(p[t] as double) - cast(cv[t] as double)) *
       |          (cast(p[t] as double) - cast(cv[t] as double)))), cent.c)
       |        AS rk
       |    FROM allsub a JOIN cent ON a.j = cent.j) z WHERE rk = 1),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |dtab AS (
       |  SELECT cent.j, cent.c,
       |    list_sum(list_transform(generate_series(1, 8), t ->
       |      (cast(qe[cent.j*8 + t] as double) - cast(cv[t] as double)) *
       |      (cast(qe[cent.j*8 + t] as double) - cast(cv[t] as double))))
       |      AS d
       |  FROM cent CROSS JOIN q),
       |adc AS (
       |  SELECT vec_id, list_sum(list(d ORDER BY j)) AS adist
       |  FROM (SELECT codes.vec_id, codes.j, dtab.d
       |        FROM codes JOIN dtab ON codes.j = dtab.j AND codes.c = dtab.c
       |        WHERE codes.vec_id <> 0) z
       |  GROUP BY vec_id),
       |cand AS (SELECT vec_id FROM adc ORDER BY adist, vec_id LIMIT 50)
       |SELECT e.vec_id, e.label
       |FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id CROSS JOIN q
       |ORDER BY ${cosineSql("e.embedding", "qe")} DESC, e.vec_id
       |LIMIT 10""".stripMargin

  /** One persisted IVF-PQ index per corpus directory (cf.
    * [[pqIndexCache]]). */
  private val ivfPqIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The COMPOSED production ANN probe ([[VectorIndex.putIvfPq]] /
    * [[VectorIndex.searchIvfPq]] — FAISS's IVFPQ shape, reference
    * anchor `s3/_vectors/_read.py:249-344` query_vectors at scale):
    * coarse cells prune the scan to `nprobe`/ncells of the corpus, ADC
    * over 8-byte codes ranks within the probed cells, exact cosine
    * rerank of the top 50 recovers quantization loss.
    *
    * Differentially testable END-TO-END like [[pqSearch]]: the coarse
    * quantizer is the exact-decimal per-label centroid family
    * ([[ivfSearch]]'s trick — order-independent decimal(20,10) means),
    * cell assignment is the nearest-centroid total order (cosine
    * desc, cell asc — [[graft.expr.NearestCentroid]]'s exact rule),
    * and the codebook is [[VectorIndex.trainPqExact]]; every stage of
    * build AND probe reproduces bit-for-bit in DuckDB. */
  /** Exact-decimal per-label coarse quantizer over an explicit frame —
    * the differential-oracle hook shared by the full, incremental, and
    * filtered IVF-PQ entries (cell ids = label rank, order-independent
    * decimal(20,10) means, so DuckDB reproduces every centroid). */
  private def exactLabelCoarse(emb: DataFrame): Seq[(Int, Array[Float])] =
    emb
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("col").cast("decimal(20,10)")).cast("double") /
        count(lit(1)).cast("double")).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label"),
        expr("transform(pm, x -> cast(x.m as float))").as("centroid"))
      .orderBy(col("label")).collect()
      .zipWithIndex
      .map { case (r, i) =>
        i -> r.getAs[scala.collection.Seq[Float]]("centroid").toArray }
      .toSeq

  private def ivfPqIndexFor(dir: String, emb: DataFrame): String =
    ivfPqIndexCache.computeIfAbsent(dir, _ => {
      val tmp = graft.session.Scratch.dir("graft-ivfpq-idx") + "/idx"
      // m pinned to the oracle geometry (8 x 8), same note as pqSearch
      VectorIndex.putIvfPq(emb, tmp, m = 8,
        codebook = Some(VectorIndex.trainPqExact(emb)),
        coarse = Some(exactLabelCoarse(emb)))
      tmp
    })

  def ivfPqSearch(s: SparkSession, dir: String, k: Int = 10,
      nprobe: Int = 3): DataFrame = {
    val emb = graft.Tables.embeddings(s, dir)
    val idx = ivfPqIndexFor(dir, emb)
    val query = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head.getAs[Seq[Float]](0).toArray
    VectorIndex.searchIvfPq(s, idx, query, k = k, nprobe = nprobe,
      rerank = 5 * k, emb = Some(emb), excludeId = Some(0L))
      .select(col("vec_id"), col("label"))
  }

  /** One INCREMENTAL per-corpus IVF-PQ index (the
    * [[Postings.incrIndexFor]] fixture shape): 90% of the vectors
    * indexed at build time, the held-out 10% appended as a batch layer
    * under the FROZEN base geometry and left un-folded, so queries
    * exercise the layer-union probe path. */
  private val ivfPqIncrIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Oracle-gated INCREMENTAL IVF-PQ probe
    * ([[VectorIndex.appendBatchIvfPq]] / [[VectorIndex.foldIvfPq]] —
    * the reference's append-shaped vector ingest,
    * `s3/_vectors/_write.py:109-233`): coarse centroids and codebook
    * train on the BASE slice (exact-decimal — the production contract:
    * geometry is frozen at build time, batches encode under it), the
    * held-out batch appends as a layer, and the probe unions layers
    * inside the probed cells. The DuckDB twin recomputes the whole
    * thing from the raw corpus — base-trained geometry applied to
    * every vector — which is exactly the "layered index answers
    * identically to a rebuild under the same geometry" contract. */
  def ivfPqIncrSearch(s: SparkSession, dir: String, k: Int = 10,
      nprobe: Int = 3): DataFrame = {
    val emb = graft.Tables.embeddings(s, dir)
    val idx = ivfPqIncrIndexCache.computeIfAbsent(dir, _ => {
      val tmp = graft.session.Scratch.dir("graft-ivfpq-incr") + "/idx"
      val base = emb.filter(col("vec_id") % 10 =!= 7)
      VectorIndex.putIvfPq(base, tmp, m = 8,
        codebook = Some(VectorIndex.trainPqExact(base)),
        coarse = Some(exactLabelCoarse(base)))
      VectorIndex.appendBatchIvfPq(emb.filter(col("vec_id") % 10 === 7),
        tmp, batchId = 1L)
      tmp
    })
    val query = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head.getAs[Seq[Float]](0).toArray
    VectorIndex.searchIvfPq(s, idx, query, k = k, nprobe = nprobe,
      rerank = 5 * k, emb = Some(emb), excludeId = Some(0L))
      .select(col("vec_id"), col("label"))
  }

  /** Oracle-gated METADATA-FILTERED IVF-PQ probe (the reference
    * composes KNN with a filter document,
    * `s3/_vectors/_read.py:276,333-334`): the compiled
    * [[MetadataFilter]] predicate lands INSIDE the probed-cell codes
    * scan — pre-ADC, so a filtered query reads fewer row groups and
    * the top-k is exact over the filtered population (query vector 0
    * is label 2; the filter asks for labels {1, 3}, so post-filtering
    * an unfiltered top-k would return the wrong rows entirely). */
  def ivfPqFilteredSearch(s: SparkSession, dir: String, k: Int = 10,
      nprobe: Int = 3): DataFrame = {
    val emb = graft.Tables.embeddings(s, dir)
    // same persisted index as ivfPqSearch — a filter is a query-time
    // argument, never a rebuild
    val idx = ivfPqIndexFor(dir, emb)
    val query = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head.getAs[Seq[Float]](0).toArray
    val f = MetadataFilter.compile(
      Map("label" -> Map("$in" -> Seq(1, 3))))
    VectorIndex.searchIvfPq(s, idx, query, k = k, nprobe = nprobe,
      rerank = 5 * k, emb = Some(emb), excludeId = Some(0L),
      filter = Some(f))
      .select(col("vec_id"), col("label"))
  }

  /** DuckDB mirror of the ENTIRE IVF-PQ probe: [[pqSearchOracle]]'s
    * codebook/codes/ADC CTEs + [[ivfSearchOracle]]'s exact-decimal
    * label centroids, fused — vectors assign to their
    * highest-cosine centroid (ties to the lowest cell, NaN greatest:
    * the NearestCentroid total order), the query probes the `nprobe`
    * best cells, ADC ranks only vectors assigned to probed cells, and
    * the exact rerank is the shared sequential-double cosine.
    *
    * Parameterized (round 16): `baseCond` restricts the TRAINING pool
    * (codebook sample + label centroids) — the incremental twin trains
    * geometry on the base slice and applies it to every vector,
    * exactly what append-under-frozen-geometry does; `candCond` is an
    * extra ADC candidate predicate — the metadata-filter twin's
    * pre-ADC label cut. */
  private def ivfPqOracleSql(baseCond: String, candCond: String): String =
    s"""WITH sample AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE $baseCond
       |  ORDER BY vec_id LIMIT 2048),
       |sub AS (
       |  SELECT vec_id, j,
       |    list_transform(generate_series(1, 8), t -> embedding[j*8 + t]) AS p
       |  FROM sample, generate_series(0, 7) g(j)),
       |seeds AS (
       |  SELECT j, row_number() OVER (PARTITION BY j ORDER BY vec_id) - 1 AS c,
       |         p AS s
       |  FROM sub
       |  WHERE vec_id IN (SELECT vec_id FROM sample ORDER BY vec_id LIMIT 16)),
       |asg AS (
       |  SELECT j, c, p FROM (
       |    SELECT sub.j, seeds.c, sub.p,
       |      row_number() OVER (PARTITION BY sub.vec_id, sub.j
       |        ORDER BY list_sum(list_transform(generate_series(1, 8), t ->
       |          (cast(p[t] as double) - cast(s[t] as double)) *
       |          (cast(p[t] as double) - cast(s[t] as double)))), seeds.c)
       |        AS rk
       |    FROM sub JOIN seeds ON sub.j = seeds.j) z WHERE rk = 1),
       |cm AS (
       |  SELECT j, c, t,
       |    cast(cast(sum(cast(p[t] as decimal(20,10))) as double)
       |         / cast(count(*) as double) as float) AS v
       |  FROM asg, generate_series(1, 8) g(t)
       |  GROUP BY j, c, t),
       |cmeans AS (
       |  SELECT j, c, list(v ORDER BY t) AS cv FROM cm GROUP BY j, c),
       |cent AS (
       |  SELECT seeds.j, seeds.c, coalesce(cmeans.cv, seeds.s) AS cv
       |  FROM seeds LEFT JOIN cmeans
       |    ON seeds.j = cmeans.j AND seeds.c = cmeans.c),
       |allsub AS (
       |  SELECT vec_id, j,
       |    list_transform(generate_series(1, 8), t -> embedding[j*8 + t]) AS p
       |  FROM embeddings, generate_series(0, 7) g(j)),
       |codes AS (
       |  SELECT vec_id, j, c FROM (
       |    SELECT a.vec_id, a.j, cent.c,
       |      row_number() OVER (PARTITION BY a.vec_id, a.j
       |        ORDER BY list_sum(list_transform(generate_series(1, 8), t ->
       |          (cast(p[t] as double) - cast(cv[t] as double)) *
       |          (cast(p[t] as double) - cast(cv[t] as double)))), cent.c)
       |        AS rk
       |    FROM allsub a JOIN cent ON a.j = cent.j) z WHERE rk = 1),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |lcm AS (
       |  SELECT label, i,
       |    cast(cast(sum(cast(embedding[i] as decimal(20,10))) as double)
       |         / cast(count(*) as double) as float) AS m
       |  FROM embeddings, generate_series(1, 64) g(i)
       |  WHERE $baseCond
       |  GROUP BY label, i),
       |lcent AS (
       |  SELECT label, row_number() OVER (ORDER BY label) - 1 AS cell,
       |         list(m ORDER BY i) AS cv
       |  FROM lcm GROUP BY label),
       |vassign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, l.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosineSql("e.embedding", "l.cv")} DESC, l.cell)
       |        AS rk
       |    FROM embeddings e CROSS JOIN lcent l) z WHERE rk = 1),
       |probe AS (
       |  SELECT cell FROM lcent CROSS JOIN q
       |  ORDER BY ${cosineSql("cv", "qe")} DESC, cell LIMIT 3),
       |dtab AS (
       |  SELECT cent.j, cent.c,
       |    list_sum(list_transform(generate_series(1, 8), t ->
       |      (cast(qe[cent.j*8 + t] as double) - cast(cv[t] as double)) *
       |      (cast(qe[cent.j*8 + t] as double) - cast(cv[t] as double))))
       |      AS d
       |  FROM cent CROSS JOIN q),
       |adc AS (
       |  SELECT vec_id, list_sum(list(d ORDER BY j)) AS adist
       |  FROM (SELECT codes.vec_id, codes.j, dtab.d
       |        FROM codes JOIN dtab ON codes.j = dtab.j AND codes.c = dtab.c
       |        WHERE codes.vec_id <> 0
       |          AND codes.vec_id IN (SELECT vec_id FROM vassign
       |            WHERE cell IN (SELECT cell FROM probe))
       |          $candCond) z
       |  GROUP BY vec_id),
       |cand AS (SELECT vec_id FROM adc ORDER BY adist, vec_id LIMIT 50)
       |SELECT e.vec_id, e.label
       |FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id CROSS JOIN q
       |ORDER BY ${cosineSql("e.embedding", "qe")} DESC, e.vec_id
       |LIMIT 10""".stripMargin

  def ivfPqSearchOracle: String = ivfPqOracleSql("1 = 1", "")

  /** Incremental twin: geometry (codebook sample + label centroids)
    * from the base 90%, applied to the whole corpus — the rebuild a
    * layered index must equal. */
  def ivfPqIncrSearchOracle: String =
    ivfPqOracleSql("vec_id % 10 <> 7", "")

  /** Filtered twin: the metadata predicate cuts the ADC candidate
    * pool (pre-ADC, pre-rerank) — top-k over the filtered population. */
  def ivfPqFilteredSearchOracle: String =
    ivfPqOracleSql("1 = 1",
      "AND codes.vec_id IN (SELECT vec_id FROM embeddings WHERE label IN (1, 3))")

  private def cosineSql(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, 64),
       |    i -> cast($a[i] as double) * cast($b[i] as double)))
       |  / (sqrt(list_sum(list_transform(generate_series(1, 64),
       |       i -> cast($a[i] as double) * cast($a[i] as double))))
       |     * sqrt(list_sum(list_transform(generate_series(1, 64),
       |       i -> cast($b[i] as double) * cast($b[i] as double)))))""".stripMargin

  def ivfSearchOracle: String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |cm AS (
       |  SELECT label, i,
       |    cast(cast(sum(cast(embedding[i] as decimal(20,10))) as double)
       |         / cast(count(*) as double) as float) AS m
       |  FROM embeddings, generate_series(1, 64) g(i)
       |  GROUP BY label, i),
       |cent AS (SELECT label, list(m ORDER BY i) AS c FROM cm GROUP BY label),
       |probe AS (
       |  SELECT cent.label FROM cent CROSS JOIN q
       |  ORDER BY ${cosineSql("c", "qe")} DESC, cent.label
       |  LIMIT 3)
       |SELECT e.vec_id, e.label
       |FROM embeddings e JOIN probe ON e.label = probe.label CROSS JOIN q
       |WHERE e.vec_id <> 0
       |ORDER BY ${cosineSql("e.embedding", "qe")} DESC, e.vec_id
       |LIMIT 10""".stripMargin

  /** LSH-bucketed ANN: 8-bit random-hyperplane signature, candidates =
    * query's bucket, exact cosine re-rank inside the bucket. Hyperplane
    * component i of plane j is `(md5int(j ':' i) mod 1001 - 500) / 500`
    * — md5 renders identical hex in every engine, so the whole pipeline
    * (signature → bucket join → re-rank) differentially tests against
    * DuckDB. The hyperplane matrix has no column references, so Catalyst
    * constant-folds it once per plan, not per row. [[VectorIndex]] holds
    * the persisted multi-band production variant.
    */
  /** Deterministic random-hyperplane matrix, computed once driver-side
    * (md5 hex prefix → int — the exact arithmetic of the DuckDB oracle;
    * Catalyst cannot constant-fold lambda bodies, so building this with
    * `transform()` re-ran 512 md5s per row: 15 s at sf0.1). Shared by
    * [[knnLsh]] and the persisted [[VectorIndex]]. */
  private[ops] def hyperplaneMatrix(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map(j => (0 until dim).map { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      ((java.lang.Long.parseLong(hex, 16) % 1001L) - 500L).toDouble / 500.0
    })

  def knnLsh(s: SparkSession, dir: String): DataFrame = {
    val hyper = typedLit(hyperplaneMatrix(8, 64))
    val sigExpr = expr(
      """aggregate(sequence(0, 7), cast(0 as bigint), (acc, j) ->
        |  acc | shiftleft(
        |    case when aggregate(zip_with(embedding, element_at(hp, j + 1),
        |      (x, h) -> cast(x as double) * h),
        |      cast(0.0 as double), (a, v) -> a + v) >= 0.0d
        |    then 1L else 0L end, cast(j as int)))""".stripMargin)
    val emb = Tables.embeddings(s, dir)
      .withColumn("hp", hyper)
      .withColumn("bucket", sigExpr)
      .drop("hp")
    val query = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("q"), col("bucket").as("qbucket"))
    emb.filter(col("vec_id") =!= 0L)
      .join(broadcast(query), col("bucket") === col("qbucket"))
      .withColumn("cosine", cosine(s, "embedding", "q"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), col("label"), col("bucket"))
  }

  def knnLshOracle: String =
    s"""WITH sig AS (
       |  SELECT vec_id, label, embedding,
       |    cast(list_sum(list_transform(generate_series(0, 7), j ->
       |      CASE WHEN list_sum(list_transform(generate_series(1, 64), i ->
       |          cast(embedding[i] as double) *
       |          (cast((('0x' || substr(md5(cast(j as varchar) || ':' ||
       |                cast(i - 1 as varchar)), 1, 6))::BIGINT % 1001) - 500
       |             as double) / 500.0)))
       |        >= 0.0
       |      THEN (1::BIGINT << j) ELSE 0::BIGINT END)) as bigint) AS bucket
       |  FROM embeddings),
       |q AS (SELECT embedding AS qe, bucket AS qb FROM sig WHERE vec_id = 0)
       |SELECT s.vec_id, s.label, s.bucket
       |FROM sig s CROSS JOIN q
       |WHERE s.vec_id <> 0 AND s.bucket = q.qb
       |ORDER BY ${cosineSql("s.embedding", "qe")} DESC, s.vec_id
       |LIMIT 10""".stripMargin
}
