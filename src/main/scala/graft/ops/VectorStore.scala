package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Vector-store CRUD + the pluggable embedding hook — the reference's
  * S3 Vectors write/read surface (`s3/_vectors/_write.py:109-233`
  * put_vectors, `_read.py:167-246` get/list, `_delete.py` delete) with
  * the batched text→vector endpoint of `s3/_vectors/_bedrock.py:20-90`:
  * texts are embedded in batches, one endpoint call per batch, inside
  * `mapPartitions` — the per-partition client-init pattern, so a
  * 1000-executor run opens 1000 clients, not one per row.
  *
  * The store itself is a keyed parquet dataset (`key`, `embedding`,
  * payload columns); puts/deletes run through the staged-atomic
  * [[graft.table.MergeOps]] merge — one shuffle join, touched partitions
  * rewritten, never the whole store. Indexing delegates to
  * [[VectorIndex]] (persisted LSH/IVF probes).
  */
object VectorStore {

  /** Pluggable text→vector endpoint. Implementations MUST be
    * Serializable — the hook ships to executors inside `mapPartitions`.
    * `embedBatch` receives at most `batchSize` texts per call (the
    * endpoint-invoke batching of the reference). */
  trait Embedder extends Serializable {
    def dim: Int
    def batchSize: Int = 64
    def embedBatch(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Deterministic stub endpoint — this container has no model runtime,
    * so the default embedder is a rolling-hash projection of the text
    * into `dim` floats in (-1, 1) (same family as the multimodal decode
    * stub). The contract — batched texts in, fixed-width unit-free float
    * vectors out — is the production surface; swap in a real client
    * without touching the pipeline. */
  final case class HashEmbedder(dim: Int = 64,
      override val batchSize: Int = 64) extends Embedder {
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < t.length) {
        h = 31 * h + t.charAt(i).toInt
        out(i % dim) += (h % 1000L).toFloat / 1000.0f
        i += 1
      }
      out.map(v => math.tanh(v.toDouble).toFloat)
    }
  }

  /** Embed `textCol` into an `embedding` column via the hook: batched
    * `mapPartitions`, input partitioning preserved (no shuffle). */
  def embedText(df: DataFrame, textCol: String,
      embedder: Embedder): DataFrame = {
    val outSchema = df.schema.add("embedding", ArrayType(FloatType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(embedder.batchSize).flatMap { batch =>
        val vecs = embedder.embedBatch(batch.map(_.getAs[String](textCol)))
        batch.lazyZip(vecs).map((r, v) => Row.fromSeq(r.toSeq :+ v.toSeq))
      }
    }(enc)
  }

  /** `put_vectors`: upsert (key, embedding, payload…) rows into the
    * store — matched keys replaced whole, new keys inserted. First put
    * creates the store. */
  def putVectors(df: DataFrame, storePath: String,
      keyCol: String = "key"): Long =
    if (!graft.io.DatasetReader.datasetExists(df.sparkSession, storePath)) {
      graft.io.DatasetWriter.toParquet(df, storePath,
        mode = graft.io.DatasetWriter.Overwrite)
      df.count()
    } else
      graft.table.MergeOps.upsert(df.sparkSession, storePath, df,
        keys = Seq(keyCol))

  /** `put_vectors` from a text frame: route through the embed hook, then
    * store AND build the persisted LSH index beside the data — the write
    * path a reference user gets from `put_vectors(texts=…)`. */
  def putVectorsFromDf(
      df: DataFrame,
      storePath: String,
      textCol: String = "text",
      keyCol: String = "key",
      embedder: Embedder = HashEmbedder(),
      nBits: Int = 8,
      nBands: Int = 1): Long = {
    val embedded = embedText(df, textCol, embedder)
    val n = putVectors(embedded, storePath, keyCol)
    // index rows carry (vec_id, label) — label = the store key, so a
    // probe result maps straight back to the stored item
    VectorIndex.putLsh(
      embedded.withColumn("vec_id", xxhash64(col(keyCol)))
        .withColumn("label", col(keyCol).cast("string")),
      s"$storePath/_lsh_index", nBits, nBands)
    n
  }

  /** `get_vectors`: point reads by key (bucket-prunable when the store
    * is bucketed; a key-list semi-join otherwise). */
  def getVectors(spark: SparkSession, storePath: String,
      keys: Seq[Any], keyCol: String = "key"): DataFrame =
    spark.read.parquet(storePath).filter(col(keyCol).isin(keys: _*))

  /** `list_vectors`: full store scan with optional metadata filter tree
    * ([[MetadataFilter]] `$eq`/`$gt`/… documents). */
  def listVectors(spark: SparkSession, storePath: String,
      filter: Option[Map[String, Any]] = None): DataFrame = {
    val base = spark.read.parquet(storePath)
    filter.map(f => base.filter(MetadataFilter.compile(f))).getOrElse(base)
  }

  /** `delete_vectors`: remove by key through the staged merge. */
  def deleteVectors(spark: SparkSession, storePath: String,
      keys: Seq[Any], keyCol: String = "key"): Long = {
    import spark.implicits._
    val keyDf = keys.map(_.toString).toDF(keyCol)
      .select(col(keyCol).cast(
        spark.read.parquet(storePath).schema(keyCol).dataType))
    graft.table.MergeOps.deleteMatched(spark, storePath, keyDf, Seq(keyCol))
  }

  /** Query by TEXT through the same hook: embed driver-side (one query
    * string), probe the persisted LSH index. */
  def queryByText(spark: SparkSession, storePath: String, text: String,
      k: Int = 10, nProbe: Int = 4,
      embedder: Embedder = HashEmbedder()): DataFrame =
    VectorIndex.searchLsh(spark, s"$storePath/_lsh_index",
      embedder.embedBatch(Seq(text)).head, k, nProbe)

  /** `query_vectors` (`s3/_vectors/_read.py:249-344`): exact top-k
    * over the store, ranked by the INDEX'S declared distance metric —
    * resolved from the store's `_vector_index.json` when present
    * (`metric = None`, the reference behavior) or overridden
    * explicitly. Cosine reports the conventional DISTANCE `1 - sim`
    * (0 = identical); euclidean the L2 distance — both ascending, both
    * through native codegen'd expressions. The query's dimension is
    * validated against the index's declared (or the store's actual)
    * dimension at the API boundary, and the fused loops themselves
    * raise on any per-row length mismatch (r11) — a ragged store can
    * never silently prefix-compare. The optional metadata filter tree
    * applies before ranking. */
  def queryVectors(spark: SparkSession, storePath: String,
      query: Array[Float], k: Int = 10,
      metric: Option[String] = None, vecCol: String = "embedding",
      filter: Option[Map[String, Any]] = None): DataFrame = {
    val declared = {
      val (fs, p) = fsFor(spark, s"$storePath/_vector_index.json")
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val node = try mapper.readTree(
          scala.io.Source.fromInputStream(in, "UTF-8").mkString)
        finally in.close()
        Some((node.get("distanceMetric").asText,
          node.get("dimension").asInt))
      }
    }
    val m = metric.orElse(declared.map(_._1)).getOrElse("cosine")
    require(Seq("cosine", "euclidean").contains(m),
      s"unsupported distance metric: $m")
    val base = listVectors(spark, storePath, filter)
    val dim = declared.map(_._2).getOrElse(
      base.select(org.apache.spark.sql.functions.size(col(vecCol)))
        .head.getInt(0))
    require(query.length == dim,
      s"query dimension ${query.length} != index dimension $dim")
    val qLit = org.apache.spark.sql.functions.typedLit(query.toSeq)
    val distCol =
      if (m == "cosine") {
        graft.expr.CosineSimilarity.register(spark)
        org.apache.spark.sql.functions.lit(1.0) -
          call_function("cosine_sim", col(vecCol), qLit)
      } else {
        graft.expr.EuclideanDistance.register(spark)
        call_function("euclidean_dist", col(vecCol), qLit)
      }
    base.withColumn("distance", distCol)
      .orderBy(col("distance").asc)
      .limit(k)
  }

  // ---- bucket / index management (`s3/_vectors/_mgmt.py:42-290`) --------
  //
  // A vector BUCKET is a root directory carrying `_vector_bucket.json`;
  // each INDEX is a child directory carrying `_vector_index.json`
  // (dimension, distance metric, non-filterable metadata keys — the
  // attributes the reference's create_vector_index takes) beside its
  // data. Metadata is driver-side JSON (one small object per index, the
  // same cost every catalog pays); the data underneath stays a plain
  // distributed dataset.

  final case class IndexMeta(name: String, dimension: Int,
      distanceMetric: String, nonFilterableMetadataKeys: Seq[String])

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def fsFor(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def writeJson(spark: SparkSession, path: String,
      content: String): Unit = {
    val (fs, p) = fsFor(spark, path)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  def createVectorBucket(spark: SparkSession, bucketPath: String): Unit =
    writeJson(spark, s"$bucketPath/_vector_bucket.json",
      s"""{"createdMs":${System.currentTimeMillis()}}""")

  def isVectorBucket(spark: SparkSession, bucketPath: String): Boolean = {
    val (fs, p) = fsFor(spark, s"$bucketPath/_vector_bucket.json")
    fs.exists(p)
  }

  def listVectorBuckets(spark: SparkSession, parent: String): Seq[String] = {
    val (fs, p) = fsFor(spark, parent)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d,
        "_vector_bucket.json")))
      .map(_.getName).toSeq.sorted
  }

  def deleteVectorBucket(spark: SparkSession, bucketPath: String): Unit = {
    require(listVectorIndexes(spark, bucketPath).isEmpty,
      s"vector bucket $bucketPath still holds indexes (the reference " +
        "rejects deleting a non-empty bucket)")
    val (fs, p) = fsFor(spark, bucketPath)
    fs.delete(p, true)
  }

  /** `create_vector_index(dimension, distance_metric,
    * non_filterable_metadata_keys)`. */
  def createVectorIndex(spark: SparkSession, bucketPath: String,
      name: String, dimension: Int, distanceMetric: String = "cosine",
      nonFilterableMetadataKeys: Seq[String] = Nil): Unit = {
    require(isVectorBucket(spark, bucketPath),
      s"$bucketPath is not a vector bucket (create_vector_bucket first)")
    require(Seq("cosine", "euclidean").contains(distanceMetric),
      s"unsupported distance metric: $distanceMetric")
    val keys = nonFilterableMetadataKeys
      .map(k => mapper.writeValueAsString(k)).mkString(",")
    writeJson(spark, s"$bucketPath/$name/_vector_index.json",
      s"""{"name":${mapper.writeValueAsString(name)},"dimension":$dimension,"distanceMetric":${mapper.writeValueAsString(distanceMetric)},"nonFilterableMetadataKeys":[$keys]}""")
  }

  def getVectorIndex(spark: SparkSession, bucketPath: String,
      name: String): IndexMeta = {
    val (fs, p) = fsFor(spark, s"$bucketPath/$name/_vector_index.json")
    require(fs.exists(p), s"no vector index $name under $bucketPath")
    val in = fs.open(p)
    val node =
      try mapper.readTree(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    IndexMeta(node.get("name").asText, node.get("dimension").asInt,
      node.get("distanceMetric").asText,
      (0 until node.get("nonFilterableMetadataKeys").size())
        .map(node.get("nonFilterableMetadataKeys").get(_).asText))
  }

  def listVectorIndexes(spark: SparkSession,
      bucketPath: String): Seq[String] = {
    val (fs, p) = fsFor(spark, bucketPath)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d,
        "_vector_index.json")))
      .map(_.getName).toSeq.sorted
  }

  def deleteVectorIndex(spark: SparkSession, bucketPath: String,
      name: String): Unit = {
    val (fs, p) = fsFor(spark, s"$bucketPath/$name")
    fs.delete(p, true)
  }

  /** `put_vectors` into a managed index: the embedding width must match
    * the index's declared dimension (the reference's put-time check). */
  def putVectorsIndexed(df: DataFrame, bucketPath: String,
      indexName: String, keyCol: String = "key",
      vecCol: String = "embedding"): Long = {
    val meta = getVectorIndex(df.sparkSession, bucketPath, indexName)
    val bad = df.filter(size(col(vecCol)) =!= meta.dimension).limit(1).count()
    require(bad == 0,
      s"embedding width != index dimension ${meta.dimension}")
    putVectors(df, s"$bucketPath/$indexName/data", keyCol)
  }
}
