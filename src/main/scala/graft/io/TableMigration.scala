package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.DateType

/** IN-PLACE table-format migration — the `CONVERT TO DELTA` /
  * `add_files` story between the two real formats: the source table's
  * live files register into a fresh target-format log with their
  * partition tuples carried over, and not one data byte is rewritten.
  * At 100 TB this is the difference between a metadata commit and a
  * multi-day copy job.
  *
  * Honest preconditions, loudly enforced: files hiding deleted rows
  * behind merge-on-read metadata (Delta deletion vectors, Iceberg
  * position/equality deletes) cannot be registered as-is — the deleted
  * rows would resurrect — so those tables compact first (OPTIMIZE /
  * rewrite_data_files, both zero-loss). Only identity partitioning maps
  * across (a transformed tuple is a derived value the target cannot
  * trust), and Delta column mapping's physical names have no Iceberg
  * translation here.
  */
object TableMigration {

  /** Delta → Iceberg: declare the table (identity spec from Delta's
    * partition columns), install a name mapping for the id-less files,
    * register every live file with its log-carried partition tuple. */
  def convertDeltaToIceberg(spark: SparkSession, deltaPath: String,
      icebergPath: String): IcebergWriter.Committed = {
    val snap = DeltaLogReader.snapshot(spark, deltaPath)
    require(snap.files.forall(_.deletionVector.isEmpty),
      s"$deltaPath carries deletion vectors — OPTIMIZE it first " +
        "(registering DV'd files would resurrect deleted rows)")
    require(snap.configuration
        .getOrElse("delta.columnMapping.mode", "none") == "none",
      s"$deltaPath is column-mapped; physical parquet names have no " +
        "Iceberg translation in this migration")
    require(!IcebergReader.isIcebergTable(spark, icebergPath),
      s"Iceberg table already exists at $icebergPath")
    IcebergWriter.createEmpty(spark, icebergPath, snap.schema,
      snap.partitionColumns)
    val root = new Path(deltaPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = snap.files.map(f =>
      fs.makeQualified(new Path(root, f.path)).toString -> f.partitionValues)
    IcebergWriter.registerFiles(spark, icebergPath, files)
  }

  /** UniForm-style MIRROR refresh: keep an Iceberg metadata mirror of a
    * LIVE Delta table current — Delta stays the writing format, Iceberg
    * readers see the same data files through their own metadata (the
    * Delta "universal format" idea, composed from the zero-rewrite
    * conversion). First call creates the mirror; later calls commit one
    * Iceberg snapshot whose file set is the Delta snapshot's live set.
    * Incremental at metadata cost: record counts for files the previous
    * mirror snapshot already registered are CARRIED, so each refresh
    * reads footers only for files new since last time — O(delta), not
    * O(table). Same honest preconditions as the conversion: deletion
    * vectors must be compacted away first (the real UniForm
    * restriction), no column mapping. `compactFirst=true` folds a DV'd
    * source through [[DeltaLogWriter.optimize]] before the refresh —
    * the integrated OPTIMIZE-then-refresh the default's error message
    * points at; the compaction rewrites ONLY DV-carrying files, so its
    * cost follows the deleted delta, not the table. */
  def refreshUniform(spark: SparkSession, deltaPath: String,
      icebergMirrorPath: String,
      compactFirst: Boolean = false): IcebergWriter.Committed = {
    if (!IcebergReader.isIcebergTable(spark, icebergMirrorPath))
      return convertDeltaToIceberg(spark, deltaPath, icebergMirrorPath)
    if (compactFirst && DeltaLogReader.snapshot(spark, deltaPath)
        .files.exists(_.deletionVector.isDefined))
      DeltaLogWriter.optimize(spark, deltaPath, dvOnly = true)
    val snap = DeltaLogReader.snapshot(spark, deltaPath)
    require(snap.files.forall(_.deletionVector.isEmpty),
      s"$deltaPath carries deletion vectors — OPTIMIZE before refreshing " +
        "the mirror (registering DV'd files would resurrect deleted " +
        "rows), or pass compactFirst=true")
    require(snap.configuration
        .getOrElse("delta.columnMapping.mode", "none") == "none",
      s"$deltaPath is column-mapped; physical parquet names have no " +
        "Iceberg translation in this mirror")
    val root = new Path(deltaPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prior = IcebergReader.snapshotOpt(spark, icebergMirrorPath)
      .map(_.files.map(f => f.path -> f.recordCount).toMap)
      .getOrElse(Map.empty)
    val files = snap.files.map(f =>
      fs.makeQualified(new Path(root, f.path)).toString -> f.partitionValues)
    IcebergWriter.registerFiles(spark, icebergMirrorPath, files,
      mode = "overwrite", knownCounts = prior)
  }

  /** Iceberg → Delta: one CONVERT commit registering the live files
    * under ABSOLUTE paths (protocol-sanctioned) with partition tuples
    * rendered to Delta's string form (date tuples as ISO dates). */
  def convertIcebergToDelta(spark: SparkSession, icebergPath: String,
      deltaPath: String): DeltaLogWriter.Committed = {
    val snap = IcebergReader.snapshot(spark, icebergPath)
    require(snap.deleteFiles.isEmpty && snap.dvFiles.isEmpty &&
        snap.equalityDeleteFiles.isEmpty,
      s"$icebergPath carries position/equality deletes — " +
        "rewrite_data_files first (registering them would resurrect " +
        "deleted rows)")
    val pfields = IcebergReader.partitionFields(spark, icebergPath)
    pfields.foreach(pf => require(pf.transform == "identity",
      s"only identity partitioning maps to Delta; table has " +
        s"${pf.transform}(${pf.source})"))
    val types = snap.schema.fields.map(f => f.name -> f.dataType).toMap
    def render(name: String, v: Any): Option[String] = Option(v).map {
      case i: java.lang.Integer if types.get(name).contains(DateType) =>
        java.time.LocalDate.ofEpochDay(i.longValue).toString
      case other => other.toString
    }
    val entries = snap.files.map { f =>
      (f.path,
        pfields.map(p =>
          p.name -> render(p.name, f.partition.getOrElse(p.name, null)))
          .toMap,
        f.sizeBytes)
    }
    DeltaLogWriter.registerExternalFiles(spark, deltaPath, snap.schema,
      pfields.map(_.name), entries)
  }
}
