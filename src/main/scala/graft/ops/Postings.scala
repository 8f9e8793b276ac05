package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Persisted inverted index for full-text search — the structure behind
  * the reference's OpenSearch indexes (`opensearch/_write.py:169-243`
  * index mappings; `opensearch/_read.py:65-155` search). [[Search]] scores
  * by scanning the corpus per query; that is correct but reads the whole
  * text column every time. At corpus scale the index is built ONCE as a
  * `(token, doc_id, tf)` postings table hash-partitioned by token, and a
  * match query reads only the partitions holding its terms — per-query
  * I/O is proportional to the query's term postings, not the corpus.
  *
  * Layout: `indexPath/tok_bucket=N/…` parquet, one row per (token, doc);
  * `_postings_meta` sidecar records the bucket count and analyzed column
  * so queries compute the same partition routing. The analyzer matches
  * [[Search.compileQueryDsl]]'s `match` semantics: whitespace tokens,
  * lowercase.
  *
  * Scale: build is one explode + one hash aggregate (map-side partials);
  * the shuffle key is (token, doc) so skewed stop-word tokens spread over
  * doc subkeys. Queries prune on the `tok_bucket` partition column —
  * directory-level pruning, no file listing outside the term buckets.
  */
object Postings {

  final case class Meta(nBuckets: Int, textCol: String, idCol: String,
      carryCols: Seq[String])

  private val MetaFile = "_postings_meta"

  /** Executor-side bucket routing for the build. */
  private def bucketCol(token: Column, nBuckets: Int): Column =
    pmod(xxhash64(token), lit(nBuckets.toLong)).cast("int")

  /** Driver-side routing for query terms — the same xxhash64 the build
    * used, evaluated on a literal. */
  def bucketOf(token: String, nBuckets: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.types.StringType
    val h = XxHash64(Seq(Literal(UTF8String.fromString(token), StringType)), 42L)
      .eval(null).asInstanceOf[Long]
    java.lang.Math.floorMod(h, nBuckets.toLong).toInt
  }

  /** Build (or rebuild) the postings table. `carryCols` are doc-level
    * attributes denormalized into the postings so common queries never
    * touch the corpus (the reference stores whole documents in the index;
    * carrying only the projected attributes is the columnar version). */
  def build(
      docs: DataFrame,
      indexPath: String,
      nBuckets: Int = 64,
      textCol: String = "text",
      idCol: String = "doc_id",
      carryCols: Seq[String] = Seq("lang")): Long = {
    val spark = docs.sparkSession
    val keyCols = (idCol +: carryCols).map(col)
    val postings = docs
      .select((col(textCol) +: keyCols): _*)
      .withColumn("token", explode(split(lower(col(textCol)), " ")))
      .filter(col("token") =!= "")
      .groupBy((col("token") +: keyCols): _*)
      .agg(count(lit(1)).cast("int").as("tf"))
      .withColumn("tok_bucket", bucketCol(col("token"), nBuckets))
    postings
      .repartition(col("tok_bucket"))
      .write.partitionBy("tok_bucket").mode("overwrite").parquet(indexPath)
    writeMeta(spark, indexPath, Meta(nBuckets, textCol, idCol, carryCols))
    spark.read.parquet(indexPath).count()
  }

  /** Weighted multi-term match over the postings: reads ONLY the term
    * buckets, aggregates one row per document with a `tf_<term>` column
    * per query term, scores, and returns the top-k. Result shape matches
    * [[Search.matchQuery]] so the two plans are interchangeable. */
  def matchQuery(
      spark: SparkSession,
      indexPath: String,
      weights: Seq[(String, Int)],
      k: Int = 20): DataFrame = {
    val meta = readMeta(spark, indexPath)
    val terms = weights.map(_._1)
    val buckets = terms.map(bucketOf(_, meta.nBuckets)).distinct
    val keyCols = (meta.idCol +: meta.carryCols).map(col)
    val scored = spark.read.option("basePath", indexPath).parquet(indexPath)
      .filter(col("tok_bucket").isin(buckets.map(Int.box): _*) &&
        col("token").isin(terms.map(s => s: Any): _*))
      .groupBy(keyCols: _*)
      .agg(
        sum(when(col("token") === terms.head, col("tf")).otherwise(0))
          .cast("int").as(s"tf_${terms.head}"),
        terms.tail.map(t =>
          sum(when(col("token") === t, col("tf")).otherwise(0))
            .cast("int").as(s"tf_$t")): _*)
    val score = weights.map { case (t, w) => col(s"tf_$t") * lit(w) }
      .reduce(_ + _)
    scored
      .withColumn("score", score)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(meta.idCol))
      .limit(k)
      .select((keyCols ++ terms.map(t => col(s"tf_$t")) :+ col("score")): _*)
  }

  private def writeMeta(spark: SparkSession, indexPath: String,
      meta: Meta): Unit = {
    val p = new Path(indexPath, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      (Seq(s"nBuckets=${meta.nBuckets}", s"textCol=${meta.textCol}",
        s"idCol=${meta.idCol}", s"carryCols=${meta.carryCols.mkString(",")}")
        .mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  def readMeta(spark: SparkSession, indexPath: String): Meta = {
    val p = new Path(indexPath, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val kv = text.linesIterator.filter(_.contains("="))
      .map { l => val Array(a, b) = l.split("=", 2); a -> b }.toMap
    Meta(kv("nBuckets").toInt, kv("textCol"), kv("idCol"),
      kv("carryCols").split(",").toSeq.filter(_.nonEmpty))
  }

  /** One inverted index per corpus directory, built on first use and
    * reused for every subsequent query against the same corpus — the
    * build is the fixture cost an indexed search system pays once at
    * ingest, never per query. Harnesses may call this eagerly so the
    * first timed query doesn't absorb the build. */
  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def indexFor(s: SparkSession, dir: String): String =
    indexCache.computeIfAbsent(dir, _ => {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-postings").toString + "/idx"
      build(graft.Tables.documents(s, dir), tmp, nBuckets = 16)
      tmp
    })

  /** Oracle-gated query: a weighted match probed against the persisted
    * per-corpus index ([[indexFor]] — built once, outside any query
    * timing). Returns the same rows [[Search.matchQuery]] answers by
    * scanning — on a whitespace-token corpus the two are value-identical,
    * so this shares its DuckDB oracle. Column order matches the scan
    * variant. */
  def searchPostingsQuery(s: SparkSession, dir: String): DataFrame = {
    val idx = indexFor(s, dir)
    matchQuery(s, idx, Seq("spark" -> 3, "join" -> 2, "stream" -> 1), k = 20)
      .select(col("doc_id"), col("lang"), col("tf_spark"), col("tf_join"),
        col("tf_stream"), col("score"))
  }
}
