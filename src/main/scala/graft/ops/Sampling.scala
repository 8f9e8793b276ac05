package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic stratified sampling — the corpus down-sampling operator
  * a training-data pipeline runs to hit per-source token budgets (an
  * LLM-pipeline extension beyond the reference surface; the reference's
  * only sampling is file-listing `list_sampling`, `_utils.py:709-726`).
  *
  * Method: a row is kept iff the first 8 hex chars of
  * `md5(stratum ':' key)` fall below `floor(rate × 2^32)` — a pure,
  * engine-portable predicate. Unlike `df.sample()`, the decision is a
  * function of the ROW, not of partitioning or RNG state: re-runs,
  * retries, and different cluster layouts all keep exactly the same
  * rows, and the same row is kept or dropped consistently across
  * derived datasets keyed the same way.
  *
  * Scale: a codegen'd map-side filter — no shuffle, no state, prunes at
  * full scan speed on 100 TB.
  */
object Sampling {

  /** Keep-predicate: md5-uniform in [0,1) per (stratum, key) < rate.
    * `rate` is clamped to [0, 1): 8 hex chars compare lexicographically
    * against the threshold, so rate=1 callers should skip the filter. */
  def keepPredicate(key: Column, stratum: Column, rate: Column): Column = {
    val threshold = lpad(lower(hex(floor(
      least(greatest(rate, lit(0.0)), lit(0.9999999997)) *
        lit(4294967296.0)).cast("bigint"))), 8, "0")
    substring(md5(concat_ws(":", stratum, key.cast("string"))), 1, 8) <
      threshold
  }

  /** Stratified sample with per-stratum rates (`default` for strata not
    * in the map). */
  def stratified(df: DataFrame, key: String, stratum: String,
      rates: Map[String, Double], default: Double): DataFrame = {
    val rate = rates.foldLeft(lit(default)) { case (acc, (s, r)) =>
      when(col(stratum) === s, lit(r)).otherwise(acc)
    }
    df.filter(keepPredicate(col(key), col(stratum), rate))
  }

  /** Oracle-gated instance: single-digit sources (src0–src9) sampled at
    * 60%, the long tail at 25% — the "downweight the big crawl, keep
    * the curated set" shape every data mix uses. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(keepPredicate(col("doc_id"), col("source"),
        when(length(col("source")) === 4, 0.6).otherwise(0.25)))
      .select(col("doc_id"), col("source"))

  /** 0.6 → 0x99999999, 0.25 → 0x40000000 (floor(rate × 2^32) in hex). */
  def stratifiedSampleOracle: String =
    """SELECT doc_id, source FROM documents
      |WHERE substring(md5(source || ':' || cast(doc_id AS varchar)), 1, 8)
      |  < CASE WHEN length(source) = 4 THEN '99999999' ELSE '40000000' END""".stripMargin

  /** Deterministic train/validation/test assignment — the split every
    * training pipeline needs pinned BEFORE experiments start: the same
    * md5 key-space as [[keepPredicate]] partitions documents
    * 90/5/5, so membership is a pure function of the key (stable
    * across re-runs, retries, repartitions, and engines), disjoint and
    * exhaustive by construction, and a codegen'd map-side projection —
    * no shuffle, no state. */
  def split(s: SparkSession, dir: String): DataFrame = {
    val h = substring(md5(concat_ws(":", lit("split"),
      col("doc_id").cast("string"))), 1, 8)
    // 0.90 → 0xe6666666, 0.95 → 0xf3333333 (floor(rate × 2^32) in hex)
    Tables.documents(s, dir).select(col("doc_id"), col("source"),
      when(h < "e6666666", "train")
        .when(h < "f3333333", "validation")
        .otherwise("test").as("split"))
  }

  def splitOracle: String =
    """SELECT doc_id, source,
      |  CASE WHEN h < 'e6666666' THEN 'train'
      |       WHEN h < 'f3333333' THEN 'validation'
      |       ELSE 'test' END AS split
      |FROM (
      |  SELECT doc_id, source,
      |    substring(md5('split:' || cast(doc_id AS varchar)), 1, 8) AS h
      |  FROM documents) t""".stripMargin
}
