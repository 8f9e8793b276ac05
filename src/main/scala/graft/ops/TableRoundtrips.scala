package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.io.{DeltaLogReader, DeltaLogWriter, IcebergReader, IcebergWriter}

/** Oracle-gated end-to-end roundtrips through the REAL table formats:
  * seed a table from `customer`, run a partition-granular MERGE through
  * the format writer, read the final state back through the jar-free
  * protocol reader. The DuckDB oracle reconstructs the same final state
  * from the raw table — any divergence in the log (lost update, stale
  * file resurfacing, dropped partition) hash-mismatches. The same gate
  * shape as `kv_upsert_roundtrip`, pointed at the Delta and Iceberg
  * log machinery instead of the staged-commit dataset. */
object TableRoundtrips {

  private def seedAndMerge(s: SparkSession, dir: String)(
      create: DataFrame => Unit, merge: DataFrame => Unit): Unit = {
    val base = Tables.customer(s, dir)
      .filter(col("c_custkey") <= 50L)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    create(base)
    val src = Tables.customer(s, dir)
      .filter(col("c_custkey") >= 40L && col("c_custkey") <= 60L)
      .select(col("c_custkey"), col("c_mktsegment"),
        (col("c_acctbal") + lit(1000.0)).as("c_acctbal"))
    merge(src)
  }

  private val cols = Seq("c_custkey", "c_mktsegment", "c_acctbal")

  /** Real `_delta_log` commit + partition-granular MERGE + protocol read. */
  def deltaMergeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-delta-rt").toString + "/t"
    seedAndMerge(s, dir)(
      base => DeltaLogWriter.write(base, tmp,
        partitionBy = Seq("c_mktsegment")),
      src => DeltaLogWriter.merge(s, tmp, src, keys = Seq("c_custkey")))
    DeltaLogReader.read(s, tmp).select(cols.map(col): _*)
  }

  /** Real Iceberg metadata commit + partition-granular MERGE + spec read. */
  def icebergMergeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-iceberg-rt").toString + "/t"
    seedAndMerge(s, dir)(
      base => IcebergWriter.write(base, tmp,
        partitionBy = Seq("c_mktsegment")),
      src => IcebergWriter.merge(s, tmp, src, keys = Seq("c_custkey")))
    IcebergReader.read(s, tmp).select(cols.map(col): _*)
  }

  /** In-repo snapshot log (TxnLog) commit + snapshot-isolated MERGE +
    * versioned read — the same gate over the third transaction layer. */
  def txnMergeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-txn-rt").toString + "/t"
    seedAndMerge(s, dir)(
      base => graft.table.TxnLog.create(base, tmp,
        partitionBy = Seq("c_mktsegment")),
      src => graft.table.TxnLog.merge(s, tmp, src, keys = Seq("c_custkey")))
    graft.table.TxnLog.read(s, tmp).select(cols.map(col): _*)
  }

  def mergeRoundtripOracle: String =
    """SELECT c_custkey, c_mktsegment,
      |  CASE WHEN c_custkey >= 40 THEN c_acctbal + 1000.0 ELSE c_acctbal END
      |    AS c_acctbal
      |FROM customer WHERE c_custkey <= 60""".stripMargin
}
