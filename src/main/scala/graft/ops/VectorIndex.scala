package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN indexes over an embedding column — the build/query split
  * of the reference's vector surface (`s3/_vectors/_write.py:109-233`
  * builds the index at put time; `_read.py:249-344` queries it). The
  * round-1 prototypes recomputed signatures/centroids per query, which
  * defeats the point at 10^10 vectors; here `put` pays the indexing cost
  * once and `search` opens only the probed partition directories:
  *
  *  - LSH: one 8-bit random-hyperplane signature per vector, persisted
  *    hive-partitioned by `bucket` (≤256 directories). A query probes its
  *    own bucket plus the `nProbe` Hamming-1 neighbours (multi-probe LSH)
  *    — partition pruning keeps the scan to probed directories only,
  *    verified by the file-pruning spec via `input_file_name`.
  *  - IVF: Lloyd's k-means coarse quantizer (deterministic seeding: the
  *    k lowest vec_ids), assignments persisted partitioned by `cell`,
  *    centroids as a tiny side dataset. A query ranks centroids
  *    driver-side (k×dim floats) and scans `nprobe` cells.
  *
  * Scale notes: index build is one linear pass + (for IVF) `iters` joins
  * against a broadcast centroid table; search I/O is proportional to
  * probed partitions, not index size. Vectors are stored WITH their
  * payload columns so re-ranking never joins back to the base table.
  */
object VectorIndex {

  // ---- snapshotted index trees (round 14) -----------------------------

  /** Every index family (LSH / IVF / PQ) builds MULTIPLE sub-tables
    * that must be read as a consistent unit — PQ's `codes` are only
    * meaningful under the `pq_meta` codebook that produced them, IVF's
    * assignments under their `centroids`. Round-13 rebuilds overwrote
    * the live directories in place, so a search running concurrently
    * with a nightly re-index could read the NEW codebook against the
    * OLD codes — silently wrong distances, worse than the
    * file-not-found race. Round 14 versions the WHOLE index tree
    * through [[graft.table.TxnLog]]: a rebuild stages a fresh
    * self-contained tree under `files/idx-<uuid>/` and publishes it as
    * ONE manifest (atomic whole-index swap), a search resolves the
    * current manifest ONCE and reads every sub-table from inside that
    * immutable tree, and [[vacuumIndex]] reclaims superseded trees
    * with a probe-covering retention — the same snapshot contract the
    * dedup index got, strengthened to multi-sub-table atomicity by
    * the single-dir manifest. */
  private def publishIndexTree(spark: SparkSession, indexPath: String)(
      build: String => Unit): Unit =
    graft.table.SnapshotTree.publish(spark, indexPath)(build)

  /** The CURRENT snapshot's tree root — directory resolution happens
    * here, once per search, so the returned path stays consistent
    * under a concurrent rebuild. Paths without a TxnLog (pre-round-14
    * indexes) resolve to themselves. */
  private[graft] def indexRoot(spark: SparkSession,
      indexPath: String): String =
    graft.table.SnapshotTree.root(spark, indexPath)

  /** Reclaim index trees superseded by rebuilds. Retention is the
    * concurrency contract (see [[graft.ops.Dedup.vacuumDedupIndex]]):
    * keep ≥ 2 versions when searches can overlap a rebuild. */
  def vacuumIndex(spark: SparkSession, indexPath: String,
      keepVersions: Int = 2): Int =
    graft.table.SnapshotTree.vacuum(spark, indexPath, keepVersions)

  // ---- LSH ----------------------------------------------------------------

  /** Defaults preserve the round-2 index shape (8 bits, one band). At
    * 10^10 vectors a 256-bucket table still scans ~2×10^8 vectors per
    * probe; the scale path is `nBits` 16-24 (65k-16M buckets per band)
    * with `nBands` independent band tables — near neighbours collide in
    * at least one band with high probability, so recall is recovered by
    * the union of per-band probes, not by widening any one probe. */
  private val DefaultBits = 8
  final case class LshMeta(nBits: Int, nBands: Int, dim: Int)

  /** All `nBands` signatures in one pass over the data. Hyperplanes come
    * from the shared precomputed constant matrix
    * ([[Vectors.hyperplaneMatrix]], band `b` owns rows `b*nBits ..<
    * (b+1)*nBits`); recomputing them per row through hash expressions
    * cost 18 s per 20k vectors in the 10× probe. */
  private def withBandBuckets(df: DataFrame, meta: LshMeta): DataFrame =
    df.withColumn("hp",
        typedLit(Vectors.hyperplaneMatrix(meta.nBits * meta.nBands, meta.dim)))
      .withColumn("__bands", expr(
        s"""transform(sequence(0, ${meta.nBands - 1}), b ->
           |  aggregate(sequence(0, ${meta.nBits - 1}), cast(0 as bigint),
           |    (acc, j) -> acc | shiftleft(
           |      case when aggregate(
           |        zip_with(embedding,
           |          element_at(hp, b * ${meta.nBits} + j + 1),
           |          (x, h) -> cast(x as double) * h),
           |        cast(0.0 as double), (a, v) -> a + v) >= 0.0d
           |      then 1L else 0L end, cast(j as int))))""".stripMargin))
      .drop("hp")
      .select(col("*"), posexplode(col("__bands")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .drop("__bands")

  /** Build (or rebuild) the LSH index: one signature pass emitting one
    * row per (vector, band), persisted partitioned by (band, bucket).
    * Clustered on the partition keys before the write so each bucket
    * directory holds ONE file — without it every task fans out into
    * every bucket dir (32 tasks × 256 buckets of tiny files cost 17 s
    * of the 10× probe's 18 s build time). Geometry is recorded in a
    * `_lsh_meta` side file so searches need no repeated parameters. */
  def putLsh(emb: DataFrame, indexPath: String,
      nBits: Int = DefaultBits, nBands: Int = 1): Unit = {
    val spark = emb.sparkSession
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val meta = LshMeta(nBits, nBands, dim)
    publishIndexTree(spark, indexPath) { t =>
      graft.io.DatasetWriter.toParquet(
        withBandBuckets(emb, meta).repartition(col("band"), col("bucket")),
        t, mode = graft.io.DatasetWriter.Overwrite,
        partitionCols = Seq("band", "bucket"))
      writeMeta(spark, t, meta)
    }
  }

  private def writeMeta(spark: SparkSession, indexPath: String,
      meta: LshMeta): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/_lsh_meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      s"nbits=${meta.nBits}\nnbands=${meta.nBands}\ndim=${meta.dim}\n"
        .getBytes("UTF-8"))
    finally out.close()
  }

  private[graft] def readMeta(spark: SparkSession, indexPath: String): LshMeta = {
    val p = new org.apache.hadoop.fs.Path(
      s"${indexRoot(spark, indexPath)}/_lsh_meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return LshMeta(DefaultBits, 1, 64)
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val kv = text.split("\n").filter(_.contains("="))
      .map(_.split("=", 2)).map(a => a(0) -> a(1).trim.toInt).toMap
    LshMeta(kv("nbits"), kv("nbands"), kv("dim"))
  }

  /** Buckets probed for a query signature: the bucket itself plus its
    * first `nProbe` Hamming-1 neighbours (multi-probe LSH). */
  def probeBuckets(bucket: Long, nProbe: Int,
      nBits: Int = DefaultBits): Seq[Long] =
    bucket +: (0 until math.min(nProbe, nBits)).map(j => bucket ^ (1L << j))

  /** Per-band signatures of a query vector, computed driver-side with
    * the same sequential double fold the SQL expression performs (IEEE
    * ops in the same order ⇒ identical signs ⇒ identical buckets). */
  private[graft] def querySignatures(query: Array[Float],
      meta: LshMeta): Seq[Long] = {
    val hp = Vectors.hyperplaneMatrix(meta.nBits * meta.nBands, meta.dim)
    (0 until meta.nBands).map { b =>
      (0 until meta.nBits).foldLeft(0L) { (acc, j) =>
        val row = hp(b * meta.nBits + j)
        var dot = 0.0
        var i = 0
        while (i < query.length) { dot += query(i).toDouble * row(i); i += 1 }
        if (dot >= 0.0) acc | (1L << j) else acc
      }
    }
  }

  /** Signature of a query vector under the default geometry (probe
    * planning / specs over default-built indexes). */
  def queryLshBucket(spark: SparkSession, query: Array[Float]): Long =
    querySignatures(query, LshMeta(DefaultBits, 1, query.length)).head

  /** Top-k by cosine against the persisted index; scans only probed
    * (band, bucket) directories — the filter is a disjunction of
    * per-band partition predicates, so hive partition pruning opens
    * `nBands × (nProbe + 1)` directories of the whole index. Duplicate
    * candidates (vectors colliding in several bands) are deduped before
    * the final rank. */
  def searchLsh(
      spark: SparkSession,
      indexPath: String,
      query: Array[Float],
      k: Int = 10,
      nProbe: Int = 4): DataFrame = {
    graft.expr.CosineSimilarity.register(spark)
    // ONE tree resolution per search: meta and data come from the same
    // immutable snapshot even if a rebuild publishes mid-query
    val t = indexRoot(spark, indexPath)
    val meta = readMeta(spark, t)
    val sigs = querySignatures(query, meta)
    val perBand = sigs.zipWithIndex.map { case (sig, b) =>
      col("band") === lit(b) &&
        col("bucket").isin(probeBuckets(sig, nProbe, meta.nBits): _*)
    }
    val qLit = typedLit(query.toSeq)
    spark.read.option("basePath", t).parquet(t)
      .filter(perBand.reduce(_ || _))
      .dropDuplicates("vec_id")
      .withColumn("cosine",
        call_function("cosine_sim", col("embedding"), qLit))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), col("bucket"), col("cosine"))
  }

  // ---- IVF ----------------------------------------------------------------

  /** Lloyd's k-means over the embedding column. Deterministic: seeds are
    * the `k` lowest vec_ids; assignment ties break on cell id. Returns
    * (cell → centroid) as driver-side arrays (k×dim floats — small by
    * construction; that is what makes a coarse quantizer coarse). */
  private def kmeans(
      emb: DataFrame, k: Int, iters: Int): Array[(Int, Array[Float])] = {
    val spark = emb.sparkSession
    graft.expr.CosineSimilarity.register(spark)
    var centroids: Array[(Int, Array[Float])] = emb
      .orderBy(col("vec_id")).limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => i -> r.getAs[Seq[Float]]("embedding").toArray }
    for (_ <- 0 until iters) {
      val cdf = spark.createDataFrame(centroids.toSeq
        .map { case (c, v) => (c, v.toSeq) }).toDF("cell", "centroid")
      val assigned = assignCells(emb, cdf)
      val means = assigned
        .select(col("cell"), posexplode(col("embedding")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"),
          expr("transform(pm, x -> cast(x.m as float))").as("centroid"))
        .collect()
        .map(r => r.getAs[Int]("cell") -> r.getAs[Seq[Float]]("centroid").toArray)
      // cells that lost every member keep their previous centroid
      val updated = means.toMap
      centroids = centroids.map { case (c, v) => c -> updated.getOrElse(c, v) }
    }
    centroids
  }

  /** Nearest-centroid assignment via the codegen'd `nearest_centroid`
    * argmax (`expr/NearestCentroid.scala`): ONE fused k·d loop per
    * input row against the broadcast centroid array — no n×k
    * intermediate rows and, unlike the previous `max_by` aggregate, NO
    * shuffle at all, which matters because k-means re-assigns every
    * iteration. Tie/NaN ordering is the same total order the aggregate
    * used (lowest cell on ties, NaN ranked greatest), so clustering is
    * bit-identical. */
  private def assignCells(emb: DataFrame, centroids: DataFrame): DataFrame = {
    graft.expr.NearestCentroid.register(emb.sparkSession)
    val centArr = centroids
      .agg(array_sort(collect_list(struct(
        col("cell").cast("long").as("c_id"), col("centroid")))).as("cents"))
    emb.crossJoin(broadcast(centArr))
      .withColumn("cell",
        call_function("nearest_centroid", col("embedding"), col("cents"))
          .cast("int"))
      .drop("cents")
  }

  /** Build the IVF index: k-means quantizer, assignments partitioned by
    * cell, centroids stored beside the data. */
  def putIvf(emb: DataFrame, indexPath: String, k: Int = 8,
      iters: Int = 3): Unit = {
    val spark = emb.sparkSession
    val centroids = kmeans(emb, k, iters)
    val cdf = spark.createDataFrame(centroids.toSeq
      .map { case (c, v) => (c, v.toSeq) }).toDF("cell", "centroid")
    publishIndexTree(spark, indexPath) { t =>
      graft.io.DatasetWriter.toParquet(
        assignCells(emb, cdf).repartition(col("cell")), s"$t/data",
        mode = graft.io.DatasetWriter.Overwrite, partitionCols = Seq("cell"))
      graft.io.DatasetWriter.toParquet(cdf, s"$t/centroids",
        mode = graft.io.DatasetWriter.Overwrite)
    }
  }

  /** Top-k by cosine over the `nprobe` nearest cells of the persisted
    * index. Centroid ranking happens on the driver (k×dim floats); the
    * data scan prunes to probed cell directories. */
  def searchIvf(
      spark: SparkSession,
      indexPath: String,
      query: Array[Float],
      k: Int = 10,
      nprobe: Int = 3): DataFrame = {
    graft.expr.CosineSimilarity.register(spark)
    // one tree resolution: centroids and assignments stay consistent
    // under a concurrent rebuild
    val t = indexRoot(spark, indexPath)
    val cents = spark.read.parquet(s"$t/centroids")
      .collect()
      .map(r => r.getAs[Int]("cell") -> r.getAs[Seq[Float]]("centroid").toArray)
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val probed = cents.sortBy { case (c, v) => (-cosine(v, query), c) }
      .take(nprobe).map(_._1)
    val qLit = typedLit(query.toSeq)
    spark.read.option("basePath", s"$t/data")
      .parquet(s"$t/data")
      .filter(col("cell").isin(probed.toSeq: _*))
      .withColumn("cosine",
        call_function("cosine_sim", col("embedding"), qLit))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), col("cell"), col("cosine"))
  }

  // ---- PQ (product quantization) ------------------------------------

  /** Default PQ code-budget derivation (round 15): the largest
    * subspace count ≤ 16 that divides `dim`. The measured recall
    * protocol (tools/ann_recall.scala, BASELINE.md rounds 13–14) put
    * 8 subspaces at recall@10 ≤ 0.46 — below the gate — at EVERY
    * corpus scale including 1×, while 16 subspaces clear 0.6 through
    * 100× distractor growth; so the default is the 16-subspace
    * geometry whenever dim admits it, independent of corpus size
    * (the floor already binds at the smallest scale — a bigger corpus
    * only adds distractors, it never earns the smaller budget back).
    * Callers with a measured reason to halve scan I/O pass `m`
    * explicitly and get the loud recall warning. */
  private[graft] def autoSubspaces(dim: Int): Int = {
    val m = (math.min(16, dim) to 1 by -1).find(dim % _ == 0).get
    org.slf4j.LoggerFactory.getLogger(getClass).info(
      s"PQ auto code budget: m = $m for dim = $dim " +
        "(largest divisor <= 16; see BASELINE.md recall protocol)")
    m
  }

  /** Auto rerank depth for a `k`-NN probe: the measured recall gate
    * (AnnRecallSpec, BASELINE.md) holds at rerank = 50 for k = 10 —
    * 5× the ask, floored at 50 so tiny `k` still funds the exact
    * pass with enough ADC candidates to recover quantization loss. */
  private[graft] def autoRerank(k: Int): Int = math.max(50, 5 * k)

  /** Build the PQ index (Jégou et al. 2011; see [[graft.expr.PqCodec]]):
    * per-subspace codebooks trained driver-side on a BOUNDED
    * deterministic sample (hash-spread across vec_ids — m×ksub×dsub
    * floats of state, milliseconds, paid once at build), then ONE
    * codegen'd distributed pass packs every vector into an 8-byte code.
    * The persisted codes table drops the raw embeddings entirely —
    * 32× less scan I/O at query time, the memory-bound ANN trade. */
  def putPq(emb: DataFrame, indexPath: String, m: Int = 0,
      ksub: Int = 16, iters: Int = 5, sampleN: Int = 2048,
      codebook: Option[Array[Float]] = None): Unit = {
    val spark = emb.sparkSession
    val dim0 = emb.select(size(col("embedding"))).head.getInt(0)
    // m = 0 (the default) derives the at-scale code budget from the
    // geometry (r14 verdict #6): a caller who never read BASELINE.md
    // gets the 16-subspace budget the recall gate was measured at
    val m0 = if (m > 0) m else autoSubspaces(dim0)
    putPqWith(emb, indexPath, m0, ksub, iters, sampleN, codebook, dim0)
  }

  private def putPqWith(emb: DataFrame, indexPath: String, m: Int,
      ksub: Int, iters: Int, sampleN: Int,
      codebook: Option[Array[Float]], dim: Int): Unit = {
    val spark = emb.sparkSession
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    require(ksub <= 16, "ksub must be <= 16 (4-bit packed codes)")
    // measured recall floor (BASELINE.md round-13 protocol, AnnRecallSpec
    // gate): 8-byte codes scored recall@10 ≤ 0.46 even WITH rerank=50
    // and degrade further as the corpus grows; 16 subspaces roughly
    // double it at every scale. Below the floor the caller gets a loud
    // pointer at the knob, not a silently bad index.
    if (m < 16)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"putPq(m = $m): code budgets below 16 subspaces measured " +
          "recall@10 <= 0.46 on the reference protocol (BASELINE.md); " +
          "raise m (and pair searchPq with rerank) for top-k use")
    val dsub = dim / m
    val cents = codebook.getOrElse(
      trainPqFloat(emb, m, ksub, dsub, iters, sampleN))
    require(cents.length == m * ksub * dsub,
      s"codebook length ${cents.length} != m*ksub*dsub ${m * ksub * dsub}")
    graft.expr.PqCodec.register(spark)
    val coded = emb
      .withColumn("code", call_function("pq_encode", col("embedding"),
        typedLit(cents.toSeq), lit(m), lit(ksub), lit(dsub)))
      .drop("embedding")
    // codes are meaningless under any codebook but their own: the tree
    // snapshot publishes both sub-tables in ONE commit, so a search
    // can never pair a new codebook with old codes (or vice versa)
    publishIndexTree(spark, indexPath) { t =>
      graft.io.DatasetWriter.toParquet(coded, s"$t/codes",
        mode = graft.io.DatasetWriter.Overwrite)
      val metaDf = spark.createDataFrame(
        Seq((m, ksub, dsub, dim, cents.toSeq)))
        .toDF("m", "ksub", "dsub", "dim", "cents")
      graft.io.DatasetWriter.toParquet(metaDf, s"$t/pq_meta",
        mode = graft.io.DatasetWriter.Overwrite)
    }
  }

  /** Driver-side float Lloyd's over a bounded sample — the default
    * codebook trainer (fast, not differentially testable: float means
    * are order-dependent). */
  private def trainPqFloat(emb: DataFrame, m: Int, ksub: Int, dsub: Int,
      iters: Int, sampleN: Int): Array[Float] = {
    // deterministic SPREAD sample (hash order, ids tie-break): the
    // round-12 "sampleN lowest vec_ids" was a biased slice — on a
    // growing corpus the lowest ids are the oldest data, and the
    // codebook drifts out of distribution (measured in
    // tools/ann_recall.scala: ADC recall fell 0.26 → 0.06 at 100×
    // when the added data never entered the sample). Hash order keeps
    // the build reproducible while sampling uniformly across ids.
    val sample: Array[Array[Float]] = emb
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(sampleN).select(col("embedding")).collect()
      .map(_.getAs[Seq[Float]](0).toArray)
    require(sample.nonEmpty, "empty embedding table")
    val cents = Array.ofDim[Float](m * ksub * dsub)
    for (j <- 0 until m) {
      val pts = sample.map(v =>
        java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      // deterministic init: first ksub distinct subvectors (cycled when
      // the sample has fewer distinct points)
      val distinct = pts.distinctBy(_.toSeq)
      var cs: Array[Array[Float]] = Array.tabulate(ksub)(i =>
        distinct(i % distinct.length).clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(ksub)(new Array[Double](dsub))
        val counts = new Array[Long](ksub)
        pts.foreach { p =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < ksub) {
            var d = 0.0; var t = 0
            while (t < dsub) {
              val diff = p(t).toDouble - cs(c)(t); d += diff * diff; t += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var t = 0
          while (t < dsub) { sums(best)(t) += p(t); t += 1 }
        }
        cs = Array.tabulate(ksub)(c =>
          if (counts(c) == 0) cs(c)
          else Array.tabulate(dsub)(t => (sums(c)(t) / counts(c)).toFloat))
      }
      for (c <- 0 until ksub; t <- 0 until dsub)
        cents((j * ksub + c) * dsub + t) = cs(c)(t)
    }
    cents
  }

  /** Exact-decimal deterministic PQ codebook — the differentially
    * testable trainer (same trick as the IVF centroids at
    * [[Vectors.ivfSearch]]): seeds are the subvectors of the `ksub`
    * lowest vec_ids, ONE Lloyd step assigns the bounded sample by
    * sequential-double squared L2 (ties to the lowest cell, the exact
    * argmin of [[graft.expr.PqImpl.encode]]), and the refined centroid
    * is an order-independent decimal(20,10) mean cast to float — so
    * DuckDB reproduces every centroid bit-for-bit and the whole
    * encode→ADC→rerank probe oracles end-to-end. Runs as Spark
    * DataFrame ops (the sample is bounded; the collect is k·dim floats).
    */
  def trainPqExact(emb: DataFrame, m: Int = 8, ksub: Int = 16,
      sampleN: Int = 2048): Array[Float] = {
    import org.apache.spark.sql.expressions.Window
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val sample = emb.orderBy(col("vec_id")).limit(sampleN)
      .select(col("vec_id"), col("embedding"))
    val sub = sample
      .select(col("vec_id"), explode(sequence(lit(0), lit(m - 1))).as("j"),
        col("embedding"))
      .select(col("vec_id"), col("j"),
        expr(s"slice(embedding, j * $dsub + 1, $dsub)").as("p"))
    val seedIds = sample.orderBy(col("vec_id")).limit(ksub)
      .select(col("vec_id"))
    val seeds = sub.join(broadcast(seedIds), "vec_id")
      .withColumn("c",
        row_number().over(Window.partitionBy("j").orderBy("vec_id")) - 1)
      .select(col("j"), col("c"), col("p").as("s"))
    // sequential-double squared L2, the byte-for-byte arithmetic of
    // PqImpl.encode (float operands promoted to double, left fold)
    val dist = expr(
      """aggregate(zip_with(p, s, (x, y) ->
        |  (cast(x as double) - cast(y as double)) *
        |  (cast(x as double) - cast(y as double))),
        |  cast(0.0 as double), (a, v) -> a + v)""".stripMargin)
    val asg = sub.join(broadcast(seeds), "j")
      .withColumn("d", dist)
      .groupBy(col("vec_id"), col("j"))
      .agg(min(struct(col("d"), col("c"))).as("b"), first(col("p")).as("p"))
      .select(col("j"), col("b.c").as("c"), col("p"))
    val cmeans = asg
      .select(col("j"), col("c"), posexplode(col("p")))
      .groupBy(col("j"), col("c"), col("pos"))
      .agg((sum(col("col").cast("decimal(20,10)")).cast("double") /
        count(lit(1)).cast("double")).cast("float").as("v"))
      .groupBy(col("j"), col("c"))
      .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pv"))
      .select(col("j"), col("c"), expr("transform(pv, x -> x.v)").as("cv"))
    // seed cells that attracted no sample member keep the seed itself
    val rows = seeds.join(cmeans, Seq("j", "c"), "left")
      .select(col("j"), col("c"), coalesce(col("cv"), col("s")).as("cv"))
      .collect()
    val cents = Array.ofDim[Float](m * ksub * dsub)
    rows.foreach { r =>
      val j = r.getAs[Int]("j"); val c = r.getAs[Int]("c")
      val cv = r.getAs[scala.collection.Seq[Float]]("cv")
      var t = 0
      while (t < dsub) { cents((j * ksub + c) * dsub + t) = cv(t); t += 1 }
    }
    cents
  }

  /** ADC top-k over the codes table: the per-query [m][ksub] distance
    * table is computed driver-side from the codebooks, rides into the
    * plan as a literal, and the scan does `m` table lookups per 8-byte
    * code — no embedding is read. With `rerank > 0` the top `rerank`
    * ADC candidates re-score exactly against the raw embeddings
    * (`emb`), the standard recall-recovery step; the exact pass touches
    * only the candidate ids (broadcast semi-join). */
  def searchPq(spark: SparkSession, indexPath: String,
      query: Array[Float], k: Int = 10, rerank: Int = -1,
      emb: Option[DataFrame] = None,
      excludeId: Option[Long] = None): DataFrame = {
    // rerank = -1 (the default) self-funds the exact pass whenever the
    // raw embeddings are available (r14 verdict #6): max(50, 5k)
    // candidates — the budget the recall gate was measured at. Pass 0
    // for a deliberate ADC-only probe.
    val rr = if (rerank >= 0) rerank
             else if (emb.isDefined) autoRerank(k) else 0
    // one tree resolution: the distance table derives from the SAME
    // codebook snapshot the codes scan reads — a rebuild publishing
    // mid-query cannot mix generations
    val t = indexRoot(spark, indexPath)
    val mr = spark.read.parquet(s"$t/pq_meta").head
    val (m, ksub, dsub) = (mr.getAs[Int]("m"), mr.getAs[Int]("ksub"),
      mr.getAs[Int]("dsub"))
    val cents = mr.getAs[Seq[Float]]("cents").toArray
    val table = new Array[Double](m * ksub)
    for (j <- 0 until m; c <- 0 until ksub) {
      var d = 0.0; var t = 0
      while (t < dsub) {
        val diff = query(j * dsub + t).toDouble -
          cents((j * ksub + c) * dsub + t)
        d += diff * diff; t += 1
      }
      table(j * ksub + c) = d
    }
    graft.expr.PqCodec.register(spark)
    val codes0 = spark.read.parquet(s"$t/codes")
    val codes = excludeId.fold(codes0)(id => codes0.filter(col("vec_id") =!= id))
    val scored = codes
      .withColumn("adist", call_function("pq_adc", col("code"),
        typedLit(table.toSeq), lit(m), lit(ksub)))
      .orderBy(col("adist"), col("vec_id"))
    if (rr <= 0)
      scored.limit(k).select(col("vec_id"), col("label"), col("adist"))
    else {
      val base = emb.getOrElse(throw new IllegalArgumentException(
        "rerank needs the raw embeddings DataFrame"))
      graft.expr.CosineSimilarity.register(spark)
      val cand = scored.limit(math.max(k, rr)).select(col("vec_id"))
      base.join(broadcast(cand), Seq("vec_id"), "left_semi")
        .withColumn("cosine", call_function("cosine_sim",
          col("embedding"), typedLit(query.toSeq)))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(k)
        .select(col("vec_id"), col("label"), col("cosine"))
    }
  }

  // ---- IVF-PQ (composed) ----------------------------------------------

  /** The production ANN shape (round 15; the composition FAISS ships as
    * IVFPQ, Jégou et al. 2011 §IV): a coarse quantizer prunes the scan
    * to `nprobe` cells, compact PQ codes rank WITHIN the probed cells,
    * and an exact rerank recovers quantization loss. Either component
    * alone leaves a 100 TB cost on the table — plain IVF reads raw
    * embeddings of every probed cell (dim×4 bytes/vector); plain PQ
    * scans every code in the corpus. Composed, a query reads
    * `nprobe/ncells` of a codes table that is already 32× smaller than
    * the embeddings.
    *
    * Codes quantize the RAW vectors, not per-cell residuals (FAISS's
    * `by_residual = false` variant): one global codebook means the
    * driver builds ONE ADC table per query instead of nprobe of them,
    * the same codes serve any future cell split, and the measured
    * recall loss vs residual coding is recovered by the exact rerank
    * the search runs anyway (AnnRecallSpec gates the composition at
    * the plain-PQ floor).
    *
    * Storage is ONE snapshot tree — `codes/` partitioned by cell,
    * `centroids/`, `pq_meta/` — so a rebuild can never pair new
    * centroids with old codes under a concurrent search.
    *
    * `coarse` overrides the k-means quantizer (cell id → centroid) —
    * the differential-oracle hook ([[Vectors.ivfPqSearch]] passes
    * exact-decimal per-label centroids so DuckDB reproduces the cell
    * assignment bit-for-bit); `codebook` is [[putPq]]'s same hook. */
  def putIvfPq(emb: DataFrame, indexPath: String, kCells: Int = 8,
      iters: Int = 3, m: Int = 0, ksub: Int = 16, sampleN: Int = 2048,
      codebook: Option[Array[Float]] = None,
      coarse: Option[Seq[(Int, Array[Float])]] = None): Unit = {
    val spark = emb.sparkSession
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val mEff = if (m > 0) m else autoSubspaces(dim)
    require(dim % mEff == 0, s"dim $dim not divisible by m=$mEff")
    require(ksub <= 16, "ksub must be <= 16 (4-bit packed codes)")
    val dsub = dim / mEff
    val cents = codebook.getOrElse(
      trainPqFloat(emb, mEff, ksub, dsub, 5, sampleN))
    require(cents.length == mEff * ksub * dsub,
      s"codebook length ${cents.length} != m*ksub*dsub " +
        s"${mEff * ksub * dsub}")
    val cells = coarse.getOrElse(kmeans(emb, kCells, iters).toSeq)
    val cdf = spark.createDataFrame(cells
      .map { case (c, v) => (c, v.toSeq) }).toDF("cell", "centroid")
    graft.expr.PqCodec.register(spark)
    // ONE distributed pass: nearest-centroid assignment (fused k·d
    // codegen loop) and PQ encoding on the same row, embeddings
    // dropped before the write — the index never stores raw vectors
    val coded = assignCells(emb, cdf)
      .withColumn("code", call_function("pq_encode", col("embedding"),
        typedLit(cents.toSeq), lit(mEff), lit(ksub), lit(dsub)))
      .drop("embedding")
    publishIndexTree(spark, indexPath) { t =>
      graft.io.DatasetWriter.toParquet(coded.repartition(col("cell")),
        s"$t/codes", mode = graft.io.DatasetWriter.Overwrite,
        partitionCols = Seq("cell"))
      graft.io.DatasetWriter.toParquet(cdf, s"$t/centroids",
        mode = graft.io.DatasetWriter.Overwrite)
      val metaDf = spark.createDataFrame(
        Seq((mEff, ksub, dsub, dim, cents.toSeq)))
        .toDF("m", "ksub", "dsub", "dim", "cents")
      graft.io.DatasetWriter.toParquet(metaDf, s"$t/pq_meta",
        mode = graft.io.DatasetWriter.Overwrite)
    }
  }

  /** Top-k over the IVF-PQ index: centroid ranking driver-side
    * (k×dim floats, cosine desc / cell asc — the shared tie rule),
    * partition-pruned ADC scan of the probed cells' codes, exact
    * cosine rerank of the top `rerank` candidates against `emb`
    * (auto: max(50, 5k), the gate-measured budget). One tree
    * resolution per query — centroids, meta, and codes from one
    * immutable generation. */
  def searchIvfPq(spark: SparkSession, indexPath: String,
      query: Array[Float], k: Int = 10, nprobe: Int = 3,
      rerank: Int = -1, emb: Option[DataFrame] = None,
      excludeId: Option[Long] = None): DataFrame = {
    val t = indexRoot(spark, indexPath)
    val rr = if (rerank >= 0) rerank
             else if (emb.isDefined) autoRerank(k) else 0
    val cents = spark.read.parquet(s"$t/centroids").collect()
      .map(r => r.getAs[Int]("cell") ->
        r.getAs[scala.collection.Seq[Float]]("centroid").toArray)
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val probed = cents.sortBy { case (c, v) => (-cosine(v, query), c) }
      .take(nprobe).map(_._1).toSeq
    val mr = spark.read.parquet(s"$t/pq_meta").head
    val (m, ksub, dsub) = (mr.getAs[Int]("m"), mr.getAs[Int]("ksub"),
      mr.getAs[Int]("dsub"))
    val cb = mr.getAs[scala.collection.Seq[Float]]("cents").toArray
    val table = new Array[Double](m * ksub)
    for (j <- 0 until m; c <- 0 until ksub) {
      var d = 0.0; var i = 0
      while (i < dsub) {
        val diff = query(j * dsub + i).toDouble -
          cb((j * ksub + c) * dsub + i)
        d += diff * diff; i += 1
      }
      table(j * ksub + c) = d
    }
    graft.expr.PqCodec.register(spark)
    val codes0 = spark.read.option("basePath", s"$t/codes")
      .parquet(s"$t/codes")
      .filter(col("cell").isin(probed: _*))
    val codes = excludeId.fold(codes0)(id =>
      codes0.filter(col("vec_id") =!= id))
    val scored = codes
      .withColumn("adist", call_function("pq_adc", col("code"),
        typedLit(table.toSeq), lit(m), lit(ksub)))
      .orderBy(col("adist"), col("vec_id"))
    if (rr <= 0)
      scored.limit(k)
        .select(col("vec_id"), col("label"), col("cell"), col("adist"))
    else {
      val base = emb.getOrElse(throw new IllegalArgumentException(
        "rerank needs the raw embeddings DataFrame"))
      graft.expr.CosineSimilarity.register(spark)
      val cand = scored.limit(math.max(k, rr)).select(col("vec_id"))
      base.join(broadcast(cand), Seq("vec_id"), "left_semi")
        .withColumn("cosine", call_function("cosine_sim",
          col("embedding"), typedLit(query.toSeq)))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(k)
        .select(col("vec_id"), col("label"), col("cosine"))
    }
  }
}
