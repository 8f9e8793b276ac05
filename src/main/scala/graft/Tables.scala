package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish testdata (TESTDATA.md).
  *
  * Every operator in this library takes the scale-factor directory as a
  * plain path; at cluster scale the same code reads `s3a://…` prefixes —
  * Spark's DataSource V2 parquet reader handles listing, partition
  * discovery, predicate pushdown and column pruning identically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** The events table's `ts` column has shipped with several physical
    * parquet encodings across testdata generations — TIMESTAMP(NANOS)
    * (which Spark's vectorized reader rejects outright unless read as raw
    * int64 via `spark.sql.legacy.parquet.nanosAsLong`), TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (Spark: TIMESTAMP_NTZ), and plain UTC
    * TIMESTAMP. Resolve the decode from the *loaded schema* instead of
    * baking in one expected unit — the same explicit unit-carrying the
    * reference does (`_data_types.py:335-345` `get_arrow_timestamp_unit`,
    * `s3/_read_parquet.py:341` `coerce_int96_timestamp_unit`):
    *  - LongType → int64 nanos; truncate to µs (the floor-division DuckDB
    *    applies casting TIMESTAMP_NS → TIMESTAMP, so both engines agree).
    *  - TIMESTAMP_NTZ → cast to session-TZ timestamp (session is UTC
    *    everywhere in this library, so wall-clock µs are preserved).
    *  - TIMESTAMP → already the canonical type.
    * Every downstream operator sees one canonical UTC TimestampType.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    normalizeTs(raw, "ts")
  }

  /** Schema-adaptive timestamp normalization (see [[events]]). Public so
    * specs can exercise every physical encoding directly.
    */
  def normalizeTs(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"$colName div 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalArgumentException(
          s"events.$colName: unsupported physical type $other — expected " +
            "int64 nanos, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` queries (the
    * Athena/Trino surface of the reference, SURVEY §2.3) can run against
    * them by name.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
