package graft.io

import java.util.UUID
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Writes REAL Apache Iceberg tables — the format counterpart of
  * [[IcebergReader]], covering the reference's `athena.to_iceberg`
  * (`athena/_write_iceberg.py:411-714`) / `s3.to_iceberg`
  * (`s3/_s3_tables_iceberg.py:160-250`), which commit tables ANY Iceberg
  * reader can open. The spec (iceberg.apache.org/spec/, format-version 1)
  * is plain files and the Spark distribution ships avro, so no Iceberg
  * jar is needed:
  *
  *  - data files are ordinary parquet written by Spark under `data/`
  *    (hive-style partition directories, partition columns kept IN the
  *    files as identity-transform Iceberg tables require);
  *  - each commit writes one manifest avro (entries: status + `data_file`
  *    struct with path/format/partition/record-count/size), one
  *    manifest-list avro for the snapshot, and claims the next
  *    `metadata/vN.metadata.json` with create-exclusive — a losing
  *    writer re-reads the log and retries (optimistic concurrency);
  *  - `version-hint.text` tracks the current version (Hadoop catalog
  *    convention); readers that ignore it fall back to the highest vN.
  *
  * Scale: per-file record counts come from DISTRIBUTED parquet-footer
  * reads (metadata-only, never the data pages); the driver holds one
  * manifest row per file — the same cost every Iceberg committer pays.
  * MERGE is partition-granular: untouched data files are carried into
  * the new snapshot as status=EXISTING manifest entries (metadata only,
  * zero data rewrite), exactly how Iceberg's own copy-on-write commits
  * keep unrelated partitions free.
  */
object IcebergWriter {

  import IcebergTransforms.PartitionField

  private val mapper = new ObjectMapper()

  final case class Committed(snapshotId: Long, version: Long, numFiles: Int)

  private final case class FileInfo(path: String,
      partitionValues: Map[String, Option[String]], size: Long,
      recordCount: Long,
      lowerBounds: Map[Int, Array[Byte]] = Map.empty,
      upperBounds: Map[Int, Array[Byte]] = Map.empty,
      equalityIds: Seq[Int] = Nil,
      nullCounts: Map[Int, Long] = Map.empty,
      fileFormat: String = "PARQUET",
      // v3 deletion-vector triple (spec field-ids 143/144/145)
      referencedDataFile: Option[String] = None,
      contentOffset: Option[Long] = None,
      contentSizeBytes: Option[Long] = None,
      // v3 row lineage: explicit first_row_id for EXISTING carried files
      // (ADDED files are assigned by the commit); None = let the commit
      // assign (adds) or leave null (pre-lineage files)
      firstRowId: Option[Long] = None)

  /** `to_iceberg(df, path, mode=…)` in the real format. `partitionBy`
    * entries are transform specs: a bare column name (identity),
    * `day/month/year/hour(col)`, or `bucket(n, col)` — the call shapes
    * the reference accepts (`athena/_write_iceberg.py:269-281`). */
  /** `to_iceberg(df, path, mode=…)` in the real format.
    *
    * Appends evolve additively by default, mirroring the reference's
    * diff-and-ALTER flow (`athena/_write_iceberg.py:112-234`): new
    * incoming columns join the table schema as trailing nullable fields.
    * Field-ids stay stable because id assignment is positional over the
    * merged schema (table order first, new fields appended) and the
    * incoming frame is re-aligned to that order before writing — old
    * files resolve the new ids to null via the reader's snapshot-schema
    * scan. Retyping a column still raises. Evolution appends a NEW
    * entry to the metadata's `schemas` history (next schema-id, ids
    * never reused) and stamps each snapshot with the schema-id it was
    * written under — a time-travel read of a pre-evolution snapshot
    * resolves its own narrower schema, per spec. */
  def write(df: DataFrame, tablePath: String, mode: String = "append",
      partitionBy: Seq[String] = Nil,
      schemaEvolution: Boolean = true,
      toBranch: Option[String] = None): Committed = {
    val spark = df.sparkSession
    val exists = IcebergReader.isIcebergTable(spark, tablePath)
    require(toBranch.isEmpty || exists,
      s"cannot write branch ${toBranch.getOrElse("")} of a table that " +
        s"does not exist yet: $tablePath")
    mode match {
      case "append" | "overwrite" => ()
      case "error" | "errorifexists" =>
        if (exists) throw new IllegalArgumentException(
          s"Iceberg table already exists at $tablePath")
      case other =>
        throw new IllegalArgumentException(s"unsupported mode: $other")
    }
    val requested = partitionBy.map(IcebergTransforms.parse)
    // declared schema/partitioning come from the metadata, not a
    // snapshot — a created-but-never-written table (S3 Tables
    // `create_table`) has no snapshot yet but its declaration binds
    val declared =
      if (exists) Some(IcebergReader.tableInfo(spark, tablePath)._1) else None
    val declaredFields =
      if (exists) IcebergReader.partitionFields(spark, tablePath) else Nil
    val partFields =
      if (declaredFields.nonEmpty) declaredFields else requested
    if (exists && partitionBy.nonEmpty && declaredFields != requested)
      throw new IllegalArgumentException(
        s"partitionBy ${partitionBy.mkString(",")} != table's " +
          declaredFields.map(f => s"${f.transform}(${f.source})").mkString(","))
    var outSchema = df.schema
    var outDf = df
    declared.foreach { tblSchema =>
      if (mode == "append") {
        // branch writes never evolve the TABLE schema — the metadata's
        // current schema is shared with main, so a staged write that
        // widened it would leak into main before publish
        outSchema = SchemaMerge.mergeAppend(tblSchema, df.schema,
          evolve = schemaEvolution && toBranch.isEmpty, promote = true)
        outDf = SchemaMerge.alignTo(df, outSchema)
      }
    }
    val adds = writeDataFiles(outDf, tablePath, partFields)
    // append CARRIES the current snapshot's manifest files, re-read at
    // claim time inside the commit loop — a concurrent writer's manifests
    // survive a retry (the lost-update hazard of flattening the file list
    // as seen before the claim); overwrite replaces whatever is current.
    // Branch appends carry the BRANCH head's manifests instead (resolved
    // in the loop), and only the branch ref moves.
    commit(spark, tablePath, outSchema, partFields, adds, kept = Nil,
      operation = if (mode == "overwrite" && exists) "overwrite" else "append",
      carryCurrentManifests = mode == "append" && exists,
      expectedParent = None, branch = toBranch)
  }

  /** S3 Tables `create_table`: declare an EMPTY Iceberg table — schema
    * and partition spec in v1.metadata.json, no snapshot. The first
    * append commits against the declaration (schema-checked). */
  def createEmpty(spark: SparkSession, tablePath: String,
      schema: StructType, partitionBy: Seq[String] = Nil,
      formatVersion: Int = 1): Unit = {
    require(!IcebergReader.isIcebergTable(spark, tablePath),
      s"Iceberg table already exists at $tablePath")
    require(formatVersion >= 1 && formatVersion <= 3,
      s"unsupported format-version $formatVersion")
    val partFields = partitionBy.map(IcebergTransforms.parse)
    partFields.foreach(f => require(schema.fieldNames.contains(f.source),
      s"partition source column ${f.source} not in schema"))
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    fs.mkdirs(metaDir)
    val node = emptyMetadataJson(fs.makeQualified(root).toString, schema,
      partFields, System.currentTimeMillis(), formatVersion)
    if (!AtomicWrite.claim(fs, new Path(metaDir, "v1.metadata.json"),
        mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node)))
      throw new java.io.IOException(
        s"Iceberg table already being created at $tablePath")
    val hint = fs.create(new Path(metaDir, "version-hint.text"), true)
    try hint.write("1".getBytes("UTF-8")) finally hint.close()
  }

  /** Raised when a commit's parent snapshot is no longer current — the
    * caller's file arithmetic is stale and must re-resolve. */
  final class ConcurrentCommit(msg: String) extends RuntimeException(msg)

  private val MaxResolveRetries = 3

  /** Upsert by key — partition-granular: untouched files are carried as
    * EXISTING manifest entries, only touched partitions are rewritten.
    * Snapshot-isolated: the commit validates that the snapshot the merge
    * resolved against is still current; if another writer advanced the
    * table, the whole resolution re-runs against the new snapshot. */
  def merge(spark: SparkSession, tablePath: String, src: DataFrame,
      keys: Seq[String], matchNulls: Boolean = false): Committed = {
    var attempt = 0
    while (true) {
      try return mergeOnce(spark, tablePath, src, keys, matchNulls)
      catch {
        case _: ConcurrentCommit if attempt < MaxResolveRetries =>
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Key-match condition: plain `=` by default, `<=>` with `matchNulls`
    * — the reference's `merge_match_nulls` (IS NOT DISTINCT FROM joins,
    * `athena/_write_iceberg.py:297-393`). Without it a null-keyed row
    * never matches and duplicates on every upsert. */
  private def keyCond(l: DataFrame, r: DataFrame, keys: Seq[String],
      matchNulls: Boolean) =
    keys.map(k => if (matchNulls) l(k) <=> r(k) else l(k) === r(k))
      .reduce(_ && _)

  private def mergeOnce(spark: SparkSession, tablePath: String,
      src: DataFrame, keys: Seq[String], matchNulls: Boolean): Committed = {
    if (!IcebergReader.isIcebergTable(spark, tablePath))
      return write(src, tablePath, mode = "error")
    val snapOpt = IcebergReader.snapshotOpt(spark, tablePath)
    if (snapOpt.isEmpty) // created-but-empty table: upsert = insert all
      return write(src, tablePath, mode = "append")
    val snap = snapOpt.get
    checkNoEqualityDeletes(snap, tablePath, "merge")
    val current = IcebergReader.read(spark, tablePath)
    val srcAligned = src.select(snap.schema.fieldNames.map(col).toSeq: _*)
    val pfields = IcebergReader.partitionFields(spark, tablePath)
    val (touchedByKeys, keptRaw) =
      if (pfields.isEmpty) (snap.files, Nil)
      else {
        val srcKeys = srcAligned.select(keys.map(col): _*).distinct()
        val touched = touchedPartitions(spark, snap.schema, pfields,
          srcAligned.unionByName(
            current.join(broadcast(srcKeys),
              keyCond(current, srcKeys, keys, matchNulls), "left_semi")))
        // a file written under an OLDER partition spec has no tuple in
        // the current spec's terms: it always rewrites (carrying it as
        // EXISTING into this commit's current-spec manifest would
        // mislabel its partition values)
        snap.files.partition(f => f.specId != snap.defaultSpecId ||
          touched.contains(partitionTuple(pfields, f)))
      }
    // a kept file TARGETED by a live position delete cannot be carried as
    // a bare EXISTING entry (the delete manifests are not carried by this
    // rewrite commit — carrying the file alone would resurrect its
    // deleted rows); it is rewritten with the deletes applied instead
    val targeted = deleteTargetPaths(spark, snap)
    val (keptTargeted, keptFiles) =
      keptRaw.partition(f => targeted.contains(normPath(f.path)))
    val touchedFiles = touchedByKeys ++ keptTargeted
    val touchedScan =
      if (pfields.isEmpty) current
      else if (touchedFiles.isEmpty) current.limit(0)
      else deleteAwareScan(spark, snap, touchedFiles)
    val merged = touchedScan.join(srcAligned,
        keyCond(touchedScan, srcAligned, keys, matchNulls), "left_anti")
      .unionByName(srcAligned)
    val adds = writeDataFiles(merged, tablePath, pfields)
    commit(spark, tablePath, snap.schema, pfields, adds, keptFiles.map(asInfo),
      operation = "overwrite", carryCurrentManifests = false,
      expectedParent = Some(snap.snapshotId))
  }

  /** Rewrite paths (merge/delete-matched) drop the snapshot's delete
    * manifests, so they must materialize position deletes into the
    * rewritten files and refuse semantics they cannot materialize.
    * Equality deletes need the sequence-number join the READER implements
    * but a partition-granular rewrite cannot preserve — raise loudly
    * rather than resurrect rows (the round-5 advice's failure mode). */
  private def checkNoEqualityDeletes(snap: IcebergReader.Snapshot,
      tablePath: String, op: String): Unit =
    if (snap.equalityDeleteFiles.nonEmpty)
      throw new UnsupportedIcebergFeatureException(
        s"$op on $tablePath: table carries equality delete files " +
          s"(${snap.equalityDeleteFiles.map(_.path).mkString(", ")}); " +
          "rewriting it here would resurrect deleted rows")

  private def normPath(p: String): String =
    p.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")

  /** Normalized data-file paths any live position-delete file targets —
    * a distributed scan of the (small) delete files, one distinct path
    * per row back to the driver (manifest-scale). v3 deletion vectors
    * name their target in the MANIFEST (`referenced_data_file`), so
    * their contribution costs no scan at all. */
  private def deleteTargetPaths(spark: SparkSession,
      snap: IcebergReader.Snapshot): Set[String] = {
    val fromParquet =
      if (snap.deleteFiles.isEmpty) Set.empty[String]
      else spark.read.parquet(snap.deleteFiles.map(_.path): _*)
        .select(regexp_replace(col("file_path"),
          "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/").as("f"))
        .distinct().collect().map(_.getString(0)).toSet
    fromParquet ++
      snap.dvFiles.flatMap(_.referencedDataFile).map(normPath)
  }

  /** Scan of `files` with the snapshot's position deletes applied (the
    * reader's anti-join, restricted to the touched subset). */
  private def deleteAwareScan(spark: SparkSession,
      snap: IcebergReader.Snapshot,
      files: Seq[IcebergReader.DataFileEntry]): DataFrame = {
    val sub = snap.copy(files = files, equalityDeleteFiles = Nil)
    val scan =
      if (snap.deleteFiles.isEmpty && snap.dvFiles.isEmpty)
        IcebergReader.dataScan(spark, sub)
      else IcebergReader.applyDeletes(spark, sub)
    scan.select(snap.schema.fieldNames.map(col).toSeq: _*)
  }

  /** Distinct partition tuples of `rows`, rendered through Spark's own
    * cast-to-string so they compare equal to the hive-path-derived
    * manifest strings. JVM `toString` is NOT that rendering (e.g.
    * `java.sql.Timestamp` appends `.0`), which misclassified
    * timestamp/date partitions as untouched — transform columns are
    * evaluated and stringified IN Spark on both sides instead. */
  private def touchedPartitions(spark: SparkSession, schema: StructType,
      pfields: Seq[PartitionField],
      rows: DataFrame): Set[Seq[Option[String]]] = {
    val valCols = pfields.map(f =>
      IcebergTransforms.column(spark, f, schema(f.source).dataType)
        .cast(StringType).as(f.name))
    rows.select(valCols: _*).distinct().collect()
      .map(r => pfields.indices.map(i => Option(r.getString(i))).toSeq)
      .toSet
  }

  private def partitionTuple(pfields: Seq[PartitionField],
      f: IcebergReader.DataFileEntry): Seq[Option[String]] =
    pfields.map(ff => f.partition.get(ff.name).flatMap(Option(_)).map(_.toString))

  /** `athena.delete_from_iceberg_table`
    * (`athena/_write_iceberg.py:715-868`): remove rows whose key appears
    * in `keys` — partition-granular, same carry/rewrite split as
    * [[merge]]: untouched files become EXISTING manifest entries, only
    * partitions holding matched keys are rewritten. */
  def deleteMatched(spark: SparkSession, tablePath: String, keys: DataFrame,
      keyCols: Seq[String], matchNulls: Boolean = false): Committed = {
    var attempt = 0
    while (true) {
      try return deleteMatchedOnce(spark, tablePath, keys, keyCols, matchNulls)
      catch {
        case _: ConcurrentCommit if attempt < MaxResolveRetries =>
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def deleteMatchedOnce(spark: SparkSession, tablePath: String,
      keys: DataFrame, keyCols: Seq[String],
      matchNulls: Boolean): Committed = {
    require(IcebergReader.isIcebergTable(spark, tablePath),
      s"no Iceberg table at $tablePath")
    val snapOpt = IcebergReader.snapshotOpt(spark, tablePath)
    if (snapOpt.isEmpty) // nothing to delete from; no-op, no new snapshot
      return Committed(-1L, 0L, 0)
    val snap = snapOpt.get
    checkNoEqualityDeletes(snap, tablePath, "delete_from_iceberg_table")
    val current = IcebergReader.read(spark, tablePath)
    val keySet = keys.select(keyCols.map(col): _*).distinct()
    val pfields = IcebergReader.partitionFields(spark, tablePath)
    val (touchedByKeys, keptRaw) =
      if (pfields.isEmpty) (snap.files, Nil)
      else {
        val touched = touchedPartitions(spark, snap.schema, pfields,
          current.join(broadcast(keySet),
            keyCond(current, keySet, keyCols, matchNulls), "left_semi"))
        // old-spec files always rewrite (see merge) — their tuples are
        // not expressible in the current spec's manifest
        snap.files.partition(f => f.specId != snap.defaultSpecId ||
          touched.contains(partitionTuple(pfields, f)))
      }
    val targeted = deleteTargetPaths(spark, snap)
    val (keptTargeted, keptFiles) =
      keptRaw.partition(f => targeted.contains(normPath(f.path)))
    val touchedFiles = touchedByKeys ++ keptTargeted
    val remaining =
      if (touchedFiles.isEmpty) current.limit(0)
      else {
        val scan = deleteAwareScan(spark, snap, touchedFiles)
        scan.join(broadcast(keySet),
          keyCond(scan, keySet, keyCols, matchNulls), "left_anti")
      }
    val adds = writeDataFiles(remaining, tablePath, pfields)
    commit(spark, tablePath, snap.schema, pfields, adds, keptFiles.map(asInfo),
      operation = "delete", carryCurrentManifests = false,
      expectedParent = Some(snap.snapshotId))
  }

  /** `DELETE FROM … WHERE` by writing v2 POSITION-DELETE files — zero
    * data-file rewrite (iceberg spec §Position Delete Files; symmetry
    * with the Delta deletion-vector delete). The 100 TB delete shape:
    * only MATCHED (file, position) pairs shuffle (range-partitioned and
    * sorted by file_path, pos as the spec requires), the delete parquet
    * lands under `data/`, and one commit appends a content=1 delete
    * manifest while CARRYING every current manifest — untouched data
    * files and pages stay byte-identical. The commit upgrades the table
    * to format-version 2 (sequence numbers) the first time. Re-flagging
    * an already-deleted row is idempotent: the reader's (file, pos)
    * anti-join dedups. Snapshot-isolated like [[merge]]: a concurrent
    * rewrite invalidates matched positions, so the resolution re-runs. */
  def deleteWhere(spark: SparkSession, tablePath: String,
      predicate: org.apache.spark.sql.Column): Committed = {
    var attempt = 0
    while (true) {
      try return deleteWhereOnce(spark, tablePath, predicate)
      catch {
        case _: ConcurrentCommit if attempt < MaxResolveRetries =>
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** `UPDATE … SET … WHERE` as ONE zero-rewrite commit (Athena's
    * Iceberg UPDATE shape): the matched LIVE rows are re-written with
    * the assignments applied as new data files, and their old positions
    * are flagged in the SAME commit — position-delete files on v1/v2,
    * puffin deletion vectors on v3. Untouched files stay byte-identical;
    * cost follows the matched rows, never the table. Assignments are
    * (column → expression) pairs evaluated against the current row.
    * v3 row-lineage caveat (shared with [[rewriteDataFiles]]): the
    * REPLACEMENT rows land in fresh files and take fresh `_row_id`s —
    * preserving ids across a rewrite requires materialized lineage
    * columns, which this writer does not emit yet; pipelines keying on
    * `_row_id` should treat an UPDATE as delete+insert. */
  def updateWhere(spark: SparkSession, tablePath: String,
      predicate: org.apache.spark.sql.Column,
      assignments: Seq[(String, org.apache.spark.sql.Column)]): Committed = {
    require(assignments.nonEmpty, "UPDATE needs at least one assignment")
    var attempt = 0
    while (true) {
      try return deleteWhereOnce(spark, tablePath, predicate,
        Some(assignments))
      catch {
        case _: ConcurrentCommit if attempt < MaxResolveRetries =>
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The updated replacement rows of an UPDATE: the delete-applied
    * matched scan with the assignments projected in. */
  private def updatedRows(spark: SparkSession,
      snap: IcebergReader.Snapshot,
      predicate: org.apache.spark.sql.Column,
      assignments: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val asg = assignments.toMap
    asg.keys.foreach(c => require(snap.schema.fieldNames.contains(c),
      s"UPDATE assignment targets unknown column $c"))
    deleteAwareScan(spark, snap, snap.files)
      .filter(predicate)
      .select(snap.schema.fields.map { f =>
        asg.get(f.name).map(_.cast(f.dataType).as(f.name))
          .getOrElse(col(f.name))
      }.toSeq: _*)
  }

  private def deleteWhereOnce(spark: SparkSession, tablePath: String,
      predicate: org.apache.spark.sql.Column,
      updateAssignments: Option[Seq[(String, org.apache.spark.sql.Column)]] =
        None): Committed = {
    require(IcebergReader.isIcebergTable(spark, tablePath),
      s"no Iceberg table at $tablePath")
    val snapOpt = IcebergReader.snapshotOpt(spark, tablePath)
    if (snapOpt.isEmpty) return Committed(-1L, -1L, 0)
    val snap = snapOpt.get
    checkNoEqualityDeletes(snap, tablePath, "delete_where")
    if (snap.files.isEmpty) return Committed(snap.snapshotId, -1L, 0)
    // a v3 table deletes through DELETION VECTORS (position-delete FILES
    // must not be added to v3 tables, per spec)
    if (IcebergReader.formatVersion(spark, tablePath) >= 3)
      return deleteWhereDvOnce(spark, tablePath, predicate, snap,
        requireMatches = true, updateAssignments = updateAssignments)
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pfields = IcebergReader.partitionFields(spark, tablePath)
    // __file/__pos are attached inside the scan's branches (`_metadata`
    // does not resolve through a name-mapped union)
    val matched = IcebergReader.dataScan(spark, snap, withMeta = true)
      .filter(predicate)
      .select(
        // the spec's reserved field-ids for position-delete columns,
        // embedded so field-id-resolving readers open these files
        col("__file").as("file_path",
          new org.apache.spark.sql.types.MetadataBuilder()
            .putLong("parquet.field.id", 2147483546L).build()),
        col("__pos").cast("long").as("pos",
          new org.apache.spark.sql.types.MetadataBuilder()
            .putLong("parquet.field.id", 2147483545L).build()))
    val staging = new Path(root, s".iceberg-del-staging-${UUID.randomUUID()}")
    try {
      matched.repartitionByRange(col("file_path"), col("pos"))
        .sortWithinPartitions("file_path", "pos")
        .write.mode("overwrite").parquet(staging.toString)
      val parts = {
        val out = mutable.ArrayBuffer.empty[(String, Long)]
        val it = fs.listFiles(staging, true)
        while (it.hasNext) {
          val st = it.next()
          if (st.getPath.getName.endsWith(".parquet"))
            out += ((st.getPath.toString, st.getLen))
        }
        out.toSeq
      }
      val counts = recordCounts(spark, parts.map(_._1))
      val delFiles = parts.filter(p => counts.getOrElse(p._1, 0L) > 0L)
        .map { case (src, len) =>
          val dst = new Path(new Path(root, "data"),
            s"delete-${UUID.randomUUID()}.parquet")
          fs.mkdirs(dst.getParent)
          if (!fs.rename(new Path(src), dst))
            throw new java.io.IOException(s"rename $src -> $dst failed")
          FileInfo(fs.makeQualified(dst).toString, Map.empty, len,
            counts(src))
        }
      if (delFiles.isEmpty) return Committed(snap.snapshotId, -1L, 0)
      // UPDATE: the replacement rows land as new data files in the SAME
      // commit that flags the old positions — one atomic snapshot
      val adds = updateAssignments match {
        case None => Nil
        case Some(asg) => writeDataFiles(
          updatedRows(spark, snap, predicate, asg), tablePath, pfields)
      }
      commit(spark, tablePath, snap.schema, pfields, adds = adds,
        kept = Nil,
        operation = if (updateAssignments.isDefined) "overwrite" else "delete",
        carryCurrentManifests = true,
        expectedParent = Some(snap.snapshotId), deleteAdds = delFiles)
    } finally fs.delete(staging, true)
  }

  /** v3 `DELETE FROM … WHERE` via DELETION VECTORS (iceberg spec
    * "Deletion Vectors"): matched positions are UNIONED with every
    * previously deleted position (prior DVs and any pre-upgrade
    * position-delete parquet) and re-encoded as one puffin DV blob per
    * touched data file — preserving the v3 invariant of AT MOST ONE DV
    * per data file, with each new DV superseding the old. The commit
    * appends one delete manifest of DV entries
    * (`referenced_data_file`/`content_offset`/`content_size_in_bytes`,
    * field-ids 143/144/145), carries data and equality-delete manifests,
    * and DROPS replaced positional delete manifests.
    *
    * Scale shape: only (file, position) pairs shuffle (hash-partitioned
    * by file); each task encodes its files' bitmaps and writes ONE
    * puffin with one blob per file; the driver receives blob descriptors
    * only. Delete cost is O(matched + previously deleted), never
    * O(table). */
  private def deleteWhereDvOnce(spark: SparkSession, tablePath: String,
      predicate: org.apache.spark.sql.Column,
      snap: IcebergReader.Snapshot,
      requireMatches: Boolean,
      updateAssignments: Option[Seq[(String, org.apache.spark.sql.Column)]] =
        None): Committed = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pfields = IcebergReader.partitionFields(spark, tablePath)
    val strip = (c: org.apache.spark.sql.Column) =>
      regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
    val matched = IcebergReader.dataScan(spark, snap, withMeta = true)
      .filter(predicate)
      .select(strip(col("__file")).as("f"),
        col("__pos").cast("long").as("p"))
    val priorParquet =
      if (snap.deleteFiles.isEmpty) None
      else Some(spark.read.parquet(snap.deleteFiles.map(_.path): _*)
        .select(strip(col("file_path")).as("f"),
          col("pos").cast("long").as("p")))
    val priorDvs =
      if (snap.dvFiles.isEmpty) None
      else Some(IcebergReader.dvPositions(spark, snap.dvFiles)
        .select(col("__file").as("f"), col("__pos").as("p")))
    val all = (Seq(matched) ++ priorParquet ++ priorDvs)
      .reduce(_ unionByName _)
    // the predicted snapshot identity, stamped into the puffin blob
    // metadata; a concurrent commit invalidates it and the claim loop's
    // expectedParent check forces a full re-resolution
    val snapshotId = math.abs(UUID.randomUUID().getMostSignificantBits)
    val predictedSeq = {
      val metaDir = new Path(root, "metadata")
      logState(fs, metaDir)._2.flatMap(p =>
        Option(p._2.get("last-sequence-number")).map(_.asLong))
        .getOrElse(0L) + 1
    }
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val dataDir = fs.makeQualified(new Path(root, "data")).toString
    fs.mkdirs(new Path(root, "data"))
    import spark.implicits._
    val blobs = all
      .repartition(col("f")).sortWithinPartitions(col("f"), col("p"))
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val dvs = mutable.ArrayBuffer.empty[Puffin.DvBlob]
          var curFile: String = null
          var buckets = mutable.SortedMap.empty[Long, org.roaringbitmap.RoaringBitmap]
          def finish(): Unit = if (curFile != null) {
            val (bytes, card) =
              DeltaDeletionVectors.encodeBuckets(buckets.toSeq)
            dvs += Puffin.DvBlob(curFile, bytes, card)
          }
          it.foreach { row =>
            val f = row.getString(0)
            if (f != curFile) {
              finish()
              curFile = f
              buckets = mutable.SortedMap.empty
            }
            val pos = row.getLong(1)
            buckets.getOrElseUpdate(pos >>> 32,
              new org.roaringbitmap.RoaringBitmap())
              .add((pos & 0xffffffffL).toInt)
          }
          finish()
          if (dvs.isEmpty) Iterator.empty
          else {
            val p = new Path(dataDir,
              s"dv-${UUID.randomUUID()}.puffin")
            val located = Puffin.writeDvFile(confBc.value.value, p,
              dvs.toSeq, snapshotId, predictedSeq)
            val size = p.getFileSystem(confBc.value.value)
              .getFileStatus(p).getLen
            val cardOf = dvs.map(d => d.referencedDataFile -> d.cardinality).toMap
            located.iterator.map { case (ref, off, len) =>
              (ref, p.toString, off, len, cardOf(ref), size)
            }
          }
        }
      }.collect()
    if (blobs.isEmpty)
      return Committed(snap.snapshotId, -1L, 0)
    if (requireMatches) {
      // pure no-op only when nothing NEW matched and nothing converts:
      // identical DV state re-encoded would churn a snapshot
      val priorDeleted = snap.dvFiles.map(_.recordCount).sum +
        snap.deleteFiles.map(_.recordCount).sum
      val nowDeleted = blobs.map(_._5).sum
      if (nowDeleted == priorDeleted && snap.deleteFiles.isEmpty) {
        blobs.map(_._2).distinct.foreach(p => fs.delete(new Path(p), false))
        return Committed(snap.snapshotId, -1L, 0)
      }
    }
    val partOf: Map[String, Map[String, Option[String]]] =
      snap.files.map(f => normPath(f.path) ->
        f.partition.map { case (k, v) => k -> Option(v).map(_.toString) })
        .toMap
    val dvInfos = blobs.toSeq.map { case (ref, puffin, off, len, card, size) =>
      FileInfo(puffin, partOf.getOrElse(ref, Map.empty), size, card,
        fileFormat = "PUFFIN", referencedDataFile = Some(ref),
        contentOffset = Some(off), contentSizeBytes = Some(len))
    }
    val adds = updateAssignments match {
      case None => Nil
      case Some(asg) => writeDataFiles(
        updatedRows(spark, snap, predicate, asg), tablePath, pfields)
    }
    try commit(spark, tablePath, snap.schema, pfields, adds = adds,
      kept = Nil,
      operation = if (updateAssignments.isDefined) "overwrite" else "delete",
      carryCurrentManifests = true,
      expectedParent = Some(snap.snapshotId), deleteAdds = dvInfos,
      snapshotIdOverride = Some(snapshotId), minFormatVersion = 3,
      dropPosDeleteManifests = true)
    catch {
      case e: Throwable =>
        // the commit never published: the staged puffins AND the
        // UPDATE's freshly written replacement files are orphans
        (blobs.map(_._2).distinct ++ adds.map(_.path)).foreach(p =>
          try fs.delete(new Path(p), false) catch { case _: Exception => () })
        throw e
    }
  }

  /** `ALTER TABLE ADD COLUMN ... DEFAULT` (v3 spec "Default values"):
    * a metadata-only commit appending the field — with
    * `initial-default` (the value rows in PRE-EXISTING files read,
    * instead of null) and optionally `write-default` (the value appends
    * lacking the column fill in) — to a NEW schemas-history entry.
    * Existing data files are never touched; the reader's shape-grouped
    * scan restores the default as a typed literal exactly for files
    * that predate the column. Adding a REQUIRED column to a non-empty
    * table demands an initial-default, per spec. */
  def addColumn(spark: SparkSession, tablePath: String, name: String,
      dataType: DataType, initialDefault: Option[Any] = None,
      writeDefault: Option[Any] = None,
      required: Boolean = false): Unit = {
    require(IcebergReader.formatVersion(spark, tablePath) >= 3,
      "column defaults require format-version 3 (setFormatVersion first)")
    require(!required || initialDefault.isDefined ||
        IcebergReader.snapshotOpt(spark, tablePath).forall(_.files.isEmpty),
      s"adding REQUIRED column $name to existing rows needs an initial-default")
    require(dataType match {
      case _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType |
           _: StructType => false
      case _ => true
    }, s"addColumn supports primitive types only, not ${dataType.simpleString}" +
      " (nested types consume field-ids; evolve through an append instead)")
    def renderDefault(v: Any): com.fasterxml.jackson.databind.JsonNode =
      v match {
        case b: Boolean => mapper.getNodeFactory.booleanNode(b)
        case i: Int => mapper.getNodeFactory.numberNode(i)
        case l: Long => mapper.getNodeFactory.numberNode(l)
        case f: Float => mapper.getNodeFactory.numberNode(f.toDouble)
        case d: Double => mapper.getNodeFactory.numberNode(d)
        case s: String => mapper.getNodeFactory.textNode(s)
        case d: java.math.BigDecimal => mapper.getNodeFactory.numberNode(d)
        case other => throw new IllegalArgumentException(
          s"unsupported default value $other")
      }
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    var attempts = 0
    while (attempts < 20) {
      val (claimedMax, parsedOpt) = logState(fs, metaDir)
      val (_, meta) = parsedOpt.getOrElse(throw new IllegalStateException(
        s"no parseable Iceberg metadata at $tablePath"))
      val node = meta.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
        .asInstanceOf[ObjectNode]
      val curId = Option(node.get("current-schema-id")).map(_.asInt)
        .getOrElse(0)
      val schemas = IcebergReaderAccess.jsonArray(node.get("schemas"))
        .collect { case o: ObjectNode => o }
      val current = schemas.find(_.get("schema-id").asInt == curId)
        .getOrElse(throw new IllegalStateException("no current schema"))
      require(!IcebergReaderAccess.jsonArray(current.get("fields"))
          .exists(_.get("name").asText == name),
        s"column $name already exists in $tablePath")
      val newId = Option(node.get("last-column-id")).map(_.asInt)
        .getOrElse(0) + 1
      val fieldNode = mapper.createObjectNode()
      fieldNode.put("id", newId)
      fieldNode.put("name", name)
      fieldNode.put("required", required)
      fieldNode.set[com.fasterxml.jackson.databind.JsonNode]("type",
        icebergTypeJson(dataType,
          new java.util.concurrent.atomic.AtomicInteger(newId)))
      initialDefault.foreach(v =>
        fieldNode.set[com.fasterxml.jackson.databind.JsonNode](
          "initial-default", renderDefault(v)))
      writeDefault.orElse(initialDefault).foreach(v =>
        fieldNode.set[com.fasterxml.jackson.databind.JsonNode](
          "write-default", renderDefault(v)))
      val evolved = current.deepCopy()
      val newSchemaId = schemas.map(_.get("schema-id").asInt).max + 1
      evolved.put("schema-id", newSchemaId)
      evolved.get("fields").asInstanceOf[ArrayNode].add(fieldNode)
      node.get("schemas").asInstanceOf[ArrayNode].add(evolved)
      node.put("current-schema-id", newSchemaId)
      node.set[ObjectNode]("schema", evolved.deepCopy())
      node.put("last-column-id", newId)
      node.put("last-updated-ms", System.currentTimeMillis())
      val targetPath = new Path(metaDir, s"v${claimedMax + 1}.metadata.json")
      if (AtomicWrite.claim(fs, targetPath,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))) {
        writeHint(fs, metaDir, claimedMax + 1)
        return
      } else attempts += 1
    }
    throw new java.io.IOException(
      s"could not claim the add-column commit at $tablePath")
  }

  /** Upgrade a table's format version (only 2→3 / 1→3 supported). v3
    * requires positional delete state as DELETION VECTORS, so any
    * existing position-delete parquet converts in the upgrade commit
    * (one DV per targeted file); row lineage starts at
    * `next-row-id = 0` and existing manifests are re-stamped with
    * `first_row_id` lazily by the next commit's manifest-list rewrite
    * (explicitly, so external readers need no out-of-band state). A
    * v3 table keeps every v2 capability: equality-delete upserts,
    * rewrites, branches, spec evolution. */
  def setFormatVersion(spark: SparkSession, tablePath: String,
      version: Int): Unit = {
    require(version == 3,
      s"only upgrading to format-version 3 is supported, not $version")
    val fv = IcebergReader.formatVersion(spark, tablePath)
    if (fv >= 3) return
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    val snapOpt = IcebergReader.snapshotOpt(spark, tablePath)
    snapOpt.filter(_.deleteFiles.nonEmpty) match {
      case Some(snap) =>
        // conversion commit: all pos-delete parquet positions re-encode
        // as DVs; minFormatVersion=3 lifts the metadata in the same claim
        deleteWhereDvOnce(spark, tablePath, lit(false), snap,
          requireMatches = false)
        ()
      case None =>
        // metadata-only bump: format-version 3 + row-lineage bookkeeping
        var attempts = 0
        while (attempts < 20) {
          val (claimedMax, parsedOpt) = logState(fs, metaDir)
          val (_, meta) = parsedOpt.getOrElse(throw new IllegalStateException(
            s"no parseable Iceberg metadata at $tablePath"))
          val node = meta.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
            .asInstanceOf[ObjectNode]
          node.put("format-version", 3)
          if (!node.has("next-row-id")) node.put("next-row-id", 0L)
          node.put("last-updated-ms", System.currentTimeMillis())
          val targetPath = new Path(metaDir, s"v${claimedMax + 1}.metadata.json")
          if (AtomicWrite.claim(fs, targetPath,
              mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))) {
            writeHint(fs, metaDir, claimedMax + 1)
            return
          } else attempts += 1
        }
        throw new java.io.IOException(
          s"could not claim the format-version upgrade at $tablePath")
    }
  }

  /** `rewrite_data_files` — Iceberg's compaction: rewrite small files
    * toward `targetFileSizeBytes` and MATERIALIZE accumulated delete
    * files back into plain data files, completing the CDC lifecycle
    * ([[upsertByKey]]'s equality deletes and [[deleteWhere]]'s position
    * deletes stack until exactly this maintenance pass). Candidates are
    * every active file under the target size plus every file a position
    * delete targets; a table with live EQUALITY deletes rewrites in
    * full (an untouched file's rows could match any key). Candidates
    * rewrite through the sequence-ordered delete-applying scan into
    * ~ceil(bytes/target) files; untouched files carry as EXISTING
    * manifest entries; NO delete manifest survives the commit — after
    * compaction the read plan is a bare scan again. */
  def rewriteDataFiles(spark: SparkSession, tablePath: String,
      targetFileSizeBytes: Long = 128L * 1024 * 1024,
      sortBy: Seq[String] = Nil,
      zorderBy: Seq[String] = Nil): Committed = {
    require(sortBy.isEmpty || zorderBy.isEmpty,
      "sortBy (range clustering) and zorderBy are mutually exclusive")
    var attempt = 0
    while (true) {
      try return rewriteDataFilesOnce(spark, tablePath,
        targetFileSizeBytes, sortBy, zorderBy)
      catch {
        case _: ConcurrentCommit if attempt < MaxResolveRetries =>
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def rewriteDataFilesOnce(spark: SparkSession, tablePath: String,
      targetFileSizeBytes: Long, sortBy: Seq[String],
      zorderBy: Seq[String] = Nil): Committed = {
    require(IcebergReader.isIcebergTable(spark, tablePath),
      s"no Iceberg table at $tablePath")
    val snapOpt = IcebergReader.snapshotOpt(spark, tablePath)
    if (snapOpt.isEmpty || snapOpt.exists(_.files.isEmpty))
      return Committed(snapOpt.map(_.snapshotId).getOrElse(-1L), -1L, 0)
    val snap = snapOpt.get
    val hasEq = snap.equalityDeleteFiles.nonEmpty
    val posTargets = deleteTargetPaths(spark, snap)
    val candidates =
      if (hasEq) snap.files
      // old-spec files are compaction candidates regardless of size —
      // rewriting them migrates the table to one spec (the maintenance
      // pass Iceberg prescribes after partition evolution)
      else snap.files.filter(f => f.sizeBytes < targetFileSizeBytes ||
        posTargets.contains(normPath(f.path)) ||
        f.specId != snap.defaultSpecId)
    val worthIt = hasEq || posTargets.nonEmpty || candidates.size >= 2 ||
      candidates.exists(_.specId != snap.defaultSpecId)
    if (candidates.isEmpty || !worthIt)
      return Committed(snap.snapshotId, -1L, 0)
    val kept = {
      val c = candidates.map(f => normPath(f.path)).toSet
      snap.files.filterNot(f => c.contains(normPath(f.path)))
    }
    val pfields = IcebergReader.partitionFields(spark, tablePath)
    val sub = snap.copy(files = candidates)
    val rows =
      if (snap.deleteFiles.isEmpty && snap.dvFiles.isEmpty && !hasEq)
        IcebergReader.dataScan(spark, sub)
          .select(snap.schema.fieldNames.map(col).toSeq: _*)
      else IcebergReader.applyDeletes(spark, sub)
    val outFiles = math.max(1L,
      (candidates.map(_.sizeBytes).sum + targetFileSizeBytes - 1) /
        targetFileSizeBytes).toInt
    // `sortBy` clusters the rewrite by value range so each output file's
    // manifest lower/upper bounds are narrow — the bounds-based file
    // skipping then prunes most files on selective reads
    // `zorderBy` = multi-dimension Morton clustering (the Iceberg
    // rewrite action's `zorder` strategy): quantile cuts per dimension,
    // the shared codegen'd [[graft.expr.ZOrderKey]], range-partition +
    // sort on it — the manifest lower/upper bounds become narrow in ALL
    // clustered dimensions, so bounds-based skipping prunes whichever
    // dimension a predicate hits
    val shaped =
      if (zorderBy.nonEmpty) {
        val cuts = zorderBy.map { c =>
          rows.stat.approxQuantile(c,
            (1 until 256).map(_ / 256.0).toArray, 0.001).distinct.sorted
        }
        val key = graft.expr.ZOrderKey.key(rows.sparkSession, zorderBy.map(col), cuts)
        rows.withColumn("__zkey", key)
          .repartitionByRange(outFiles, col("__zkey"))
          .sortWithinPartitions(col("__zkey"))
          .drop("__zkey")
      } else if (sortBy.nonEmpty)
        rows.repartitionByRange(outFiles, sortBy.map(col): _*)
          .sortWithinPartitions(sortBy.map(col): _*)
      else rows.coalesce(outFiles)
    val adds = writeDataFiles(shaped, tablePath, pfields)
    val committed = commit(spark, tablePath, snap.schema, pfields, adds,
      kept.map(asInfo), operation = "replace",
      carryCurrentManifests = false,
      expectedParent = Some(snap.snapshotId))
    // a range-clustered rewrite DECLARES its layout (spec sort-orders)
    // so external engines can exploit it; z-order has no spec transform
    // and keeps the default order
    if (sortBy.nonEmpty) declareSortOrder(spark, tablePath, sortBy)
    committed
  }

  /** Zero-rewrite UPSERT via v2 EQUALITY-DELETE files — the Flink-CDC
    * commit shape (iceberg spec "Equality Delete Files"): ONE commit
    * appends the new rows as data files and one equality-delete file
    * whose rows are the distinct key tuples of `src`, with
    * `equality_ids` naming the key columns' schema field-ids. Old rows
    * with those keys disappear by the reader's sequence rule (a delete
    * at sequence N removes only rows of data files with sequence < N —
    * the rows added in this same commit survive). NOTHING is rewritten:
    * upsert cost is O(src), not O(touched partitions), which at 100 TB
    * is the difference between a streaming upsert and a table rewrite.
    * Reads absorb the deletes until a compacting rewrite; the rewrite
    * paths (merge/deleteMatched) detect live equality deletes and raise
    * rather than resurrect. `src` must be key-unique (precombine
    * upstream, as [[graft.table.MergeOps]] does) — duplicate keys in
    * one batch would both survive. `src` is evaluated twice (data files,
    * then the key tuples for the delete file); a nondeterministic
    * source (`rand()`, `uuid()`, an unseeded `shuffle()`) is detected
    * from the analyzed plan and pinned with `localCheckpoint()`
    * automatically — otherwise the delete keys could silently disagree
    * with the written rows (lost or resurrected rows). Deterministic
    * sources take the plain two-evaluation path, unchanged. */
  def upsertByKey(spark: SparkSession, tablePath: String, src: DataFrame,
      keys: Seq[String]): Committed = {
    // pin ONCE, outside the concurrency retry loop — retries then also
    // reuse the materialized batch instead of re-running the source
    val pinned =
      if (src.queryExecution.analyzed
            .exists(_.expressions.exists(e => !e.deterministic)))
        src.localCheckpoint()
      else src
    var attempt = 0
    while (true) {
      try return upsertByKeyOnce(spark, tablePath, pinned, keys)
      catch {
        case _: ConcurrentCommit if attempt < MaxResolveRetries =>
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def upsertByKeyOnce(spark: SparkSession, tablePath: String,
      src: DataFrame, keys: Seq[String]): Committed = {
    require(keys.nonEmpty, "upsertByKey needs at least one key column")
    keys.foreach(k => require(src.columns.contains(k),
      s"key column $k not in source"))
    require(IcebergReader.isIcebergTable(spark, tablePath),
      s"no Iceberg table at $tablePath")
    val snapOpt = IcebergReader.snapshotOpt(spark, tablePath)
    if (snapOpt.isEmpty || snapOpt.exists(_.files.isEmpty))
      return write(src, tablePath, mode = "append")
    val snap = snapOpt.get
    checkAppendSchema(snap.schema, src.schema)
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pfields = IcebergReader.partitionFields(spark, tablePath)
    val ids = topLevelFieldIds(snap.schema)
    val eqIds = keys.map(k => ids.getOrElse(k,
      throw new IllegalArgumentException(s"key $k not in table schema")))

    val adds = writeDataFiles(src, tablePath, pfields)
    // the equality-delete file: distinct key tuples, key columns only,
    // written distributed with the keys' field-ids embedded
    val keyDf = src.select(keys.map { k =>
      col(k).as(k, new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("parquet.field.id", ids(k).toLong).build())
    }.toSeq: _*).distinct()
    val staging = new Path(root, s".iceberg-eqdel-staging-${UUID.randomUUID()}")
    try {
      keyDf.write.mode("overwrite").parquet(staging.toString)
      val parts = {
        val out = mutable.ArrayBuffer.empty[(String, Long)]
        val it = fs.listFiles(staging, true)
        while (it.hasNext) {
          val st = it.next()
          if (st.getPath.getName.endsWith(".parquet"))
            out += ((st.getPath.toString, st.getLen))
        }
        out.toSeq
      }
      val counts = recordCounts(spark, parts.map(_._1))
      val delFiles = parts.filter(p => counts.getOrElse(p._1, 0L) > 0L)
        .map { case (srcPath, len) =>
          val dst = new Path(new Path(root, "data"),
            s"eqdelete-${UUID.randomUUID()}.parquet")
          fs.mkdirs(dst.getParent)
          if (!fs.rename(new Path(srcPath), dst))
            throw new java.io.IOException(s"rename $srcPath -> $dst failed")
          FileInfo(fs.makeQualified(dst).toString, Map.empty, len,
            counts(srcPath), equalityIds = eqIds)
        }
      commit(spark, tablePath, snap.schema, pfields, adds, kept = Nil,
        operation = "overwrite", carryCurrentManifests = true,
        expectedParent = Some(snap.snapshotId), deleteAdds = delFiles)
    } finally fs.delete(staging, true)
  }

  /** Create or move a named snapshot REF (spec v2 `refs` — `tag` pins a
    * snapshot for reproducible reads, `branch` names a movable head).
    * Defaults to tagging the current snapshot. A metadata-only commit
    * through the same create-exclusive claim loop as data commits, so
    * it composes with concurrent writers. Returns the tagged snapshot
    * id; [[IcebergReader.read]] resolves it via `asOfRef`. */
  def setRef(spark: SparkSession, tablePath: String, name: String,
      snapshotId: Option[Long] = None, refType: String = "tag"): Long = {
    require(refType == "tag" || refType == "branch",
      s"refType must be tag|branch, got $refType")
    require(name.nonEmpty, "ref name must be non-empty")
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    var attempts = 0
    while (attempts < 20) {
      val (claimedMax, parsedOpt) = logState(fs, metaDir)
      val (_, meta) = parsedOpt.getOrElse(throw new IllegalStateException(
        s"no parseable Iceberg metadata at $tablePath"))
      val known = IcebergReaderAccess.jsonArray(meta.get("snapshots"))
        .map(_.get("snapshot-id").asLong).toSet
      val target = snapshotId.orElse(
        Option(meta.get("current-snapshot-id")).map(_.asLong)
          .filter(_ >= 0)).getOrElse(throw new IllegalArgumentException(
        s"no snapshot to $refType at $tablePath"))
      require(known.contains(target),
        s"snapshot $target not in the log of $tablePath")
      val node = meta.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
        .asInstanceOf[ObjectNode]
      val refs =
        if (node.has("refs") && node.get("refs").isObject)
          node.get("refs").asInstanceOf[ObjectNode]
        else { val r = mapper.createObjectNode(); node.set[ObjectNode]("refs", r); r }
      val entry = mapper.createObjectNode()
      entry.put("snapshot-id", target)
      entry.put("type", refType)
      refs.set[ObjectNode](name, entry)
      node.put("last-updated-ms", System.currentTimeMillis())
      val targetPath = new Path(metaDir, s"v${claimedMax + 1}.metadata.json")
      if (AtomicWrite.claim(fs, targetPath,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))) {
        writeHint(fs, metaDir, claimedMax + 1)
        return target
      } else attempts += 1 // lost the claim
    }
    throw new java.io.IOException(
      s"could not claim a ref commit after $attempts attempts at $tablePath")
  }

  /** Iceberg's `rollback_to_snapshot`: make an earlier snapshot current
    * again with a metadata-only commit — the snapshot pointer moves, a
    * new snapshot-log entry records the rollback, and the `main` branch
    * ref (when present) follows. History is never rewritten: the
    * rolled-past snapshots stay in `snapshots` (time travel to them
    * still works) until `expireSnapshots` sweeps them. Same
    * create-exclusive claim loop as data commits, so it composes with
    * concurrent writers. */
  def rollbackTo(spark: SparkSession, tablePath: String,
      snapshotId: Long): Unit = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    var attempts = 0
    while (attempts < 20) {
      val (claimedMax, parsedOpt) = logState(fs, metaDir)
      val (_, meta) = parsedOpt.getOrElse(throw new IllegalStateException(
        s"no parseable Iceberg metadata at $tablePath"))
      val known = IcebergReaderAccess.jsonArray(meta.get("snapshots"))
        .map(_.get("snapshot-id").asLong).toSet
      require(known.contains(snapshotId),
        s"snapshot $snapshotId not in the log of $tablePath")
      val now = System.currentTimeMillis()
      val node = meta.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
        .asInstanceOf[ObjectNode]
      node.put("current-snapshot-id", snapshotId)
      val log =
        if (node.has("snapshot-log") && node.get("snapshot-log").isArray)
          node.get("snapshot-log").asInstanceOf[ArrayNode]
        else {
          val l = mapper.createArrayNode()
          node.set[ArrayNode]("snapshot-log", l); l
        }
      val entry = mapper.createObjectNode()
      entry.put("timestamp-ms", now)
      entry.put("snapshot-id", snapshotId)
      log.add(entry)
      if (node.has("refs") && node.get("refs").isObject) {
        val refs = node.get("refs").asInstanceOf[ObjectNode]
        if (refs.has("main") &&
            "branch" == Option(refs.get("main").get("type"))
              .map(_.asText).getOrElse("branch"))
          refs.get("main").asInstanceOf[ObjectNode]
            .put("snapshot-id", snapshotId)
      }
      node.put("last-updated-ms", now)
      val targetPath = new Path(metaDir, s"v${claimedMax + 1}.metadata.json")
      if (AtomicWrite.claim(fs, targetPath,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))) {
        writeHint(fs, metaDir, claimedMax + 1)
        return
      } else attempts += 1 // lost the claim
    }
    throw new java.io.IOException(
      s"could not claim a rollback commit after $attempts attempts at $tablePath")
  }

  /** Declare the table's ACTIVE sort order (spec `sort-orders` /
    * `default-sort-order-id`) — called after a `sortBy` rewrite so
    * external engines know the layout: an identity asc nulls-first
    * field per column, reusing an existing matching order's id or
    * appending with the next one. Metadata-only claim-loop commit. */
  def declareSortOrder(spark: SparkSession, tablePath: String,
      cols: Seq[String]): Int = {
    require(cols.nonEmpty, "declareSortOrder needs at least one column")
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    var attempts = 0
    while (attempts < 20) {
      val (claimedMax, parsedOpt) = logState(fs, metaDir)
      val (_, meta) = parsedOpt.getOrElse(throw new IllegalStateException(
        s"no parseable Iceberg metadata at $tablePath"))
      val curSchemaId = Option(meta.get("current-schema-id"))
        .map(_.asInt).getOrElse(0)
      val fieldsArr = IcebergReaderAccess.jsonArray(meta.get("schemas"))
        .find(s => Option(s.get("schema-id")).exists(_.asInt == curSchemaId))
        .orElse(Option(meta.get("schema")))
        .map(s => IcebergReaderAccess.jsonArray(s.get("fields")))
        .getOrElse(Seq.empty)
      val idOf = fieldsArr.map(f =>
        f.get("name").asText -> f.get("id").asInt).toMap
      val srcIds = cols.map(c => idOf.getOrElse(c,
        throw new IllegalArgumentException(
          s"sort column $c not in the current schema of $tablePath")))
      val node = meta.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
        .asInstanceOf[ObjectNode]
      val orders =
        if (node.has("sort-orders") && node.get("sort-orders").isArray)
          node.get("sort-orders").asInstanceOf[ArrayNode]
        else {
          val a = mapper.createArrayNode()
          node.set[ArrayNode]("sort-orders", a); a
        }
      def matches(o: com.fasterxml.jackson.databind.JsonNode): Boolean = {
        val fs0 = IcebergReaderAccess.jsonArray(o.get("fields"))
        fs0.size == srcIds.size && fs0.zip(srcIds).forall { case (f, id) =>
          f.get("source-id").asInt == id &&
            f.get("transform").asText == "identity" &&
            f.get("direction").asText == "asc"
        }
      }
      val existing = IcebergReaderAccess.jsonArray(node.get("sort-orders"))
        .find(matches).map(_.get("order-id").asInt)
      val orderId = existing.getOrElse {
        val next = IcebergReaderAccess.jsonArray(node.get("sort-orders"))
          .map(_.get("order-id").asInt).foldLeft(0)(math.max) + 1
        val o = mapper.createObjectNode()
        o.put("order-id", next)
        val fArr = mapper.createArrayNode()
        srcIds.foreach { id =>
          val f = mapper.createObjectNode()
          f.put("transform", "identity")
          f.put("source-id", id)
          f.put("direction", "asc")
          f.put("null-order", "nulls-first")
          fArr.add(f)
        }
        o.set[ArrayNode]("fields", fArr)
        orders.add(o)
        next
      }
      node.put("default-sort-order-id", orderId)
      node.put("last-updated-ms", System.currentTimeMillis())
      val targetPath = new Path(metaDir, s"v${claimedMax + 1}.metadata.json")
      if (AtomicWrite.claim(fs, targetPath,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))) {
        writeHint(fs, metaDir, claimedMax + 1)
        return orderId
      } else attempts += 1 // lost the claim
    }
    throw new java.io.IOException(
      s"could not claim a sort-order commit after $attempts attempts at $tablePath")
  }

  /** Remove a branch or tag ref — the ref-lifecycle closer: a dropped
    * WAP branch (or an abandoned audit) stops pinning its snapshots, so
    * the next [[expireSnapshots]] sweeps the staged files. Metadata-only
    * commit through the claim loop; dropping `main` or a missing ref
    * raises. */
  def dropRef(spark: SparkSession, tablePath: String,
      name: String): Unit = {
    require(name != "main", "cannot drop the main branch ref")
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    var attempts = 0
    while (attempts < 20) {
      val (claimedMax, parsedOpt) = logState(fs, metaDir)
      val (_, meta) = parsedOpt.getOrElse(throw new IllegalStateException(
        s"no parseable Iceberg metadata at $tablePath"))
      require(Option(meta.get("refs")).filter(_.isObject)
          .exists(_.has(name)),
        s"no ref '$name' in $tablePath")
      val node = meta.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
        .asInstanceOf[ObjectNode]
      node.get("refs").asInstanceOf[ObjectNode].remove(name)
      node.put("last-updated-ms", System.currentTimeMillis())
      val targetPath = new Path(metaDir, s"v${claimedMax + 1}.metadata.json")
      if (AtomicWrite.claim(fs, targetPath,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))) {
        writeHint(fs, metaDir, claimedMax + 1)
        return
      } else attempts += 1 // lost the claim
    }
    throw new java.io.IOException(
      s"could not claim a drop-ref commit after $attempts attempts at $tablePath")
  }

  /** PUBLISH a staged branch — Iceberg's `fast_forward(main, branch)`,
    * the second half of write-audit-publish: after auditing the branch
    * (`read(asOfRef = branch)`), one metadata-only commit moves
    * `current-snapshot-id` (and the `main` ref) to the branch head,
    * appending the snapshot-log entry main readers travel by. Requires
    * main's head to be an ANCESTOR of the branch head (walked over the
    * stamped `parent-snapshot-id` lineage) — a diverged main raises
    * instead of silently dropping its commits. The branch ref survives
    * the publish (matching the Java procedure); staged-but-never-
    * published snapshots stay pinned by their ref until the ref is
    * dropped and `expireSnapshots` sweeps them. */
  def fastForward(spark: SparkSession, tablePath: String,
      branch: String): Long = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    var attempts = 0
    while (attempts < 20) {
      val (claimedMax, parsedOpt) = logState(fs, metaDir)
      val (_, meta) = parsedOpt.getOrElse(throw new IllegalStateException(
        s"no parseable Iceberg metadata at $tablePath"))
      val target = Option(meta.get("refs")).filter(_.isObject)
        .flatMap(r => Option(r.get(branch)))
        .map(_.get("snapshot-id").asLong)
        .getOrElse(throw new IllegalArgumentException(
          s"no branch '$branch' in the refs of $tablePath"))
      val cur = Option(meta.get("current-snapshot-id")).map(_.asLong)
        .filter(_ >= 0)
      if (cur.contains(target)) return target // already published
      val parentOf: Map[Long, Option[Long]] =
        IcebergReaderAccess.jsonArray(meta.get("snapshots")).map(s =>
          s.get("snapshot-id").asLong ->
            Option(s.get("parent-snapshot-id")).filterNot(_.isNull)
              .map(_.asLong)).toMap
      // the branch chain from target back to main's head (exclusive) —
      // the fast-forward condition AND the history being published
      val chainBack = Iterator.iterate(Option(target))(
        _.flatMap(parentOf.get).flatten)
        .takeWhile(c => c.isDefined && c != cur).flatten.toSeq
      val reachedMain =
        cur.isEmpty || chainBack.lastOption.flatMap(parentOf.get)
          .flatten == cur
      require(reachedMain,
        s"cannot fast-forward $tablePath to branch '$branch': main " +
          s"(${cur.getOrElse(-1L)}) is not an ancestor of the branch " +
          s"head ($target) — main advanced since the branch forked; " +
          "rebase the branch")
      val now = System.currentTimeMillis()
      val node = meta.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
        .asInstanceOf[ObjectNode]
      node.put("current-snapshot-id", target)
      val log =
        if (node.has("snapshot-log") && node.get("snapshot-log").isArray)
          node.get("snapshot-log").asInstanceOf[ArrayNode]
        else {
          val l = mapper.createArrayNode()
          node.set[ArrayNode]("snapshot-log", l); l
        }
      // the WHOLE published chain lands in the log, oldest first — the
      // log is main's history, and incremental consumers walk it; an
      // entry for the head alone would make the staged snapshots
      // invisible to a log-ranged scan
      chainBack.reverse.foreach { id =>
        val entry = mapper.createObjectNode()
        entry.put("timestamp-ms", now)
        entry.put("snapshot-id", id)
        log.add(entry)
      }
      val refs = node.get("refs").asInstanceOf[ObjectNode]
      if (refs.has("main"))
        refs.get("main").asInstanceOf[ObjectNode]
          .put("snapshot-id", target)
      node.put("last-updated-ms", now)
      val targetPath = new Path(metaDir, s"v${claimedMax + 1}.metadata.json")
      if (AtomicWrite.claim(fs, targetPath,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))) {
        writeHint(fs, metaDir, claimedMax + 1)
        return target
      } else attempts += 1 // lost the claim
    }
    throw new java.io.IOException(
      s"could not claim a fast-forward commit after $attempts attempts " +
        s"at $tablePath")
  }

  /** Merge `props` into the table's `properties` map — a metadata-only
    * commit through the same create-exclusive claim loop as data
    * commits. The property every external engine cares about here is
    * `schema.name-mapping.default` (spec "Column Projection"), which
    * lets [[IcebergReader]] resolve data files written WITHOUT parquet
    * field-ids (imported via `add_files`-style registration) inside an
    * id-carrying table. */
  def setProperties(spark: SparkSession, tablePath: String,
      props: Map[String, String]): Unit = {
    require(props.nonEmpty, "no properties to set")
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    var attempts = 0
    while (attempts < 20) {
      val (claimedMax, parsedOpt) = logState(fs, metaDir)
      val (_, meta) = parsedOpt.getOrElse(throw new IllegalStateException(
        s"no parseable Iceberg metadata at $tablePath"))
      val node = meta.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
        .asInstanceOf[ObjectNode]
      val tgt =
        if (node.has("properties") && node.get("properties").isObject)
          node.get("properties").asInstanceOf[ObjectNode]
        else { val p = mapper.createObjectNode()
               node.set[ObjectNode]("properties", p); p }
      props.foreach { case (k, v) => tgt.put(k, v) }
      node.put("last-updated-ms", System.currentTimeMillis())
      val targetPath = new Path(metaDir, s"v${claimedMax + 1}.metadata.json")
      if (AtomicWrite.claim(fs, targetPath,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))) {
        writeHint(fs, metaDir, claimedMax + 1)
        return
      } else attempts += 1 // lost the claim
    }
    throw new java.io.IOException(
      s"could not claim a properties commit after $attempts attempts at $tablePath")
  }

  /** Rename a top-level column — a metadata-only commit that changes the
    * field's NAME while keeping its field-id, exactly the evolution
    * field-ids exist for: files written under the old name keep reading
    * correctly because resolution is by id (or, for id-less imported
    * files, through the name mapping, whose historical `names` list is
    * extended with the old name so those files keep resolving too). */
  def renameColumn(spark: SparkSession, tablePath: String,
      from: String, to: String): Unit = {
    require(from != to, "rename to the same name is a no-op")
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    var attempts = 0
    while (attempts < 20) {
      val (claimedMax, parsedOpt) = logState(fs, metaDir)
      val (_, meta) = parsedOpt.getOrElse(throw new IllegalStateException(
        s"no parseable Iceberg metadata at $tablePath"))
      val node = meta.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
        .asInstanceOf[ObjectNode]
      var renamedId = -1
      def renameIn(schemaNode: com.fasterxml.jackson.databind.JsonNode): Unit =
        IcebergReaderAccess.jsonArray(schemaNode.get("fields")).foreach { f =>
          if (f.get("name").asText == from) {
            renamedId = f.get("id").asInt
            f.asInstanceOf[ObjectNode].put("name", to)
          } else require(f.get("name").asText != to,
            s"column $to already exists in $tablePath")
        }
      Option(node.get("schema")).foreach(renameIn)
      Option(node.get("schemas"))
        .foreach(ss => IcebergReaderAccess.jsonArray(ss).foreach(renameIn))
      require(renamedId > 0, s"column $from not in the schema of $tablePath")
      // keep id-less imported files resolvable: the mapping entry for
      // this field keeps (or gains) the old name
      val propsNode = Option(node.get("properties")).filter(_.isObject)
        .map(_.asInstanceOf[ObjectNode])
      propsNode.flatMap(p =>
        Option(p.get("schema.name-mapping.default")).map(_.asText))
        .foreach { json =>
          val arr = mapper.readTree(json).asInstanceOf[ArrayNode]
          arr.elements().asScala.foreach { e =>
            if (Option(e.get("field-id")).exists(_.asInt == renamedId)) {
              val names = e.get("names").asInstanceOf[ArrayNode]
              val have = names.elements().asScala.map(_.asText).toSet
              if (!have.contains(from)) names.add(from)
            }
          }
          propsNode.get.put("schema.name-mapping.default",
            mapper.writeValueAsString(arr))
        }
      node.put("last-updated-ms", System.currentTimeMillis())
      val targetPath = new Path(metaDir, s"v${claimedMax + 1}.metadata.json")
      if (AtomicWrite.claim(fs, targetPath,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))) {
        writeHint(fs, metaDir, claimedMax + 1)
        return
      } else attempts += 1 // lost the claim
    }
    throw new java.io.IOException(
      s"could not claim a rename commit after $attempts attempts at $tablePath")
  }

  /** Evolve the table's partition spec (spec "Partition Evolution";
    * Athena's `ALTER TABLE … ADD/DROP PARTITION FIELD` surface): a
    * metadata-only commit that appends a new entry to `partition-specs`
    * and makes it the default. EXISTING data files are never rewritten —
    * they stay under the spec-id their manifests were committed with,
    * and the reader prunes each file under its OWN spec (a filter on a
    * newly-partitioned column keeps old-spec files; a filter on a
    * dropped partition column still prunes them). Subsequent appends lay
    * data out under the new spec. Partition field-ids are REUSED for
    * equivalent (transform, source) fields across history, as the spec
    * requires; new fields claim ids above `last-partition-id`.
    * Returns the now-default spec-id. */
  def updatePartitionSpec(spark: SparkSession, tablePath: String,
      partitionBy: Seq[String]): Int = {
    val requested = partitionBy.map(IcebergTransforms.parse)
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    var attempts = 0
    while (attempts < 20) {
      val (claimedMax, parsedOpt) = logState(fs, metaDir)
      val (_, meta) = parsedOpt.getOrElse(throw new IllegalStateException(
        s"no parseable Iceberg metadata at $tablePath"))
      val node = meta.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
        .asInstanceOf[ObjectNode]
      // source-ids from the CURRENT schema's field ids
      val curSchemaId = Option(node.get("current-schema-id"))
        .map(_.asInt).getOrElse(0)
      val schemaNode = Option(node.get("schemas"))
        .flatMap(ss => IcebergReaderAccess.jsonArray(ss)
          .find(s => Option(s.get("schema-id")).forall(_.asInt == curSchemaId)))
        .orElse(Option(node.get("schema")))
        .getOrElse(throw new IllegalStateException(
          s"no schema in Iceberg metadata at $tablePath"))
      val idByName: Map[String, Int] =
        IcebergReaderAccess.jsonArray(schemaNode.get("fields"))
          .map(f => f.get("name").asText -> f.get("id").asInt).toMap
      requested.foreach(pf => require(idByName.contains(pf.source),
        s"partition source column ${pf.source} not in schema of $tablePath"))
      // externally-written v1 metadata may carry only the singular
      // partition-spec — synthesize the history entry so the existing
      // files keep a spec to prune under
      val priorSpecs = {
        val arr = IcebergReaderAccess.jsonArray(node.get("partition-specs"))
          .collect { case o: ObjectNode => o }
        if (arr.nonEmpty) arr
        else Option(node.get("partition-spec")).filter(_.isArray).map { s =>
          val o = mapper.createObjectNode()
          o.put("spec-id",
            Option(node.get("default-spec-id")).map(_.asInt).getOrElse(0))
          o.set[ArrayNode]("fields",
            s.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
              .asInstanceOf[ArrayNode])
          Seq(o)
        }.getOrElse(Nil)
      }
      var lastPartId = Option(node.get("last-partition-id")).map(_.asInt)
        .getOrElse(999)
      // reuse partition field-ids for equivalent (transform, source-id)
      // fields anywhere in history (spec requirement)
      val knownIds: Map[(String, Int), Int] = priorSpecs.flatMap(s =>
        IcebergReaderAccess.jsonArray(s.get("fields")).map(f =>
          (Option(f.get("transform")).map(_.asText).getOrElse("identity"),
            f.get("source-id").asInt) -> f.get("field-id").asInt)).toMap
      val newFields = mapper.createArrayNode()
      requested.foreach { pf =>
        val srcId = idByName(pf.source)
        val fid = knownIds.getOrElse((pf.transform, srcId),
          { lastPartId += 1; lastPartId })
        val f = mapper.createObjectNode()
        f.put("name", pf.name)
        f.put("transform", pf.transform)
        f.put("source-id", srcId)
        f.put("field-id", fid)
        newFields.add(f)
      }
      val existing = priorSpecs.find(s =>
        specKey(s.get("fields")) == specKey(newFields))
      val curDefault = Option(node.get("default-spec-id")).map(_.asInt)
        .getOrElse(0)
      val newDefault = existing match {
        case Some(e) => e.get("spec-id").asInt
        case None =>
          val id = priorSpecs.map(_.get("spec-id").asInt)
            .foldLeft(-1)(math.max) + 1
          val entry = mapper.createObjectNode()
          entry.put("spec-id", id)
          entry.set[ArrayNode]("fields", newFields)
          val specs = mapper.createArrayNode()
          priorSpecs.foreach(specs.add)
          specs.add(entry)
          node.set[ArrayNode]("partition-specs", specs)
          id
      }
      if (newDefault == curDefault && existing.nonEmpty) return curDefault
      node.put("default-spec-id", newDefault)
      // v1 compat: the singular partition-spec mirrors the default
      val defaultFields = existing.map(_.get("fields")).getOrElse(newFields)
      node.set[ArrayNode]("partition-spec",
        defaultFields.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
          .asInstanceOf[ArrayNode])
      node.put("last-partition-id", lastPartId)
      node.put("last-updated-ms", System.currentTimeMillis())
      val targetPath = new Path(metaDir, s"v${claimedMax + 1}.metadata.json")
      if (AtomicWrite.claim(fs, targetPath,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))) {
        writeHint(fs, metaDir, claimedMax + 1)
        return newDefault
      } else attempts += 1 // lost the claim
    }
    throw new java.io.IOException(
      s"could not claim a partition-spec commit after $attempts attempts at $tablePath")
  }

  /** Register EXISTING parquet files as table data — the `add_files`
    * import shape (reference: pyiceberg `add_files` through
    * `s3/_s3_tables_iceberg.py`). The files are not rewritten, not
    * moved, and usually carry NO parquet field-ids, so this also
    * installs `schema.name-mapping.default` (current schema's id→name,
    * preserved by later renames) unless the table already has one —
    * without it the reader would have no way to resolve the imported
    * columns next to native id-carrying files. Unpartitioned tables
    * only (imported files carry no manifest partition tuple). */
  def addFiles(spark: SparkSession, tablePath: String,
      files: Seq[String]): Committed = {
    require(files.nonEmpty, "no files to add")
    require(IcebergReader.isIcebergTable(spark, tablePath),
      s"no Iceberg table at $tablePath")
    val pfields = IcebergReader.partitionFields(spark, tablePath)
    require(pfields.isEmpty,
      "add_files supports unpartitioned tables (imported files carry no partition tuple)")
    val (schema, _) = IcebergReader.tableInfo(spark, tablePath)
    if (!IcebergReader.snapshotOpt(spark, tablePath)
          .exists(_.properties.contains("schema.name-mapping.default")))
      setProperties(spark, tablePath,
        Map("schema.name-mapping.default" -> defaultNameMapping(schema)))
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val counts = recordCounts(spark, files)
    val adds = files.map { f =>
      val p = new Path(f)
      FileInfo(fs.makeQualified(p).toString, Map.empty,
        fs.getFileStatus(p).getLen, counts.getOrElse(f, 0L))
    }
    commit(spark, tablePath, schema, pfields, adds, kept = Nil,
      operation = "append", carryCurrentManifests = true,
      expectedParent = None)
  }

  /** [[addFiles]] generalized to PARTITIONED tables for callers that
    * know each file's partition tuple (the Delta→Iceberg migration path,
    * where the source log carries the tuples): register existing
    * parquet, tuples attached, without rewriting a byte. Identity
    * transforms only — a transformed spec's tuples are derived values a
    * registration cannot trust. */
  def registerFiles(spark: SparkSession, tablePath: String,
      files: Seq[(String, Map[String, Option[String]])],
      mode: String = "append",
      knownCounts: Map[String, Long] = Map.empty): Committed = {
    require(files.nonEmpty, "no files to register")
    require(mode == "append" || mode == "overwrite",
      s"registerFiles mode must be append|overwrite, not $mode")
    require(IcebergReader.isIcebergTable(spark, tablePath),
      s"no Iceberg table at $tablePath")
    val pfields = IcebergReader.partitionFields(spark, tablePath)
    pfields.foreach(pf => require(pf.transform == "identity",
      s"registerFiles supports identity partitioning only; " +
        s"table has ${pf.transform}(${pf.source})"))
    val pnames = pfields.map(_.name).toSet
    files.foreach { case (f, pv) => require(pv.keySet == pnames,
      s"file $f carries partition keys ${pv.keySet.mkString(",")} != " +
        s"table's ${pnames.mkString(",")}") }
    val (schema, _) = IcebergReader.tableInfo(spark, tablePath)
    if (!IcebergReader.snapshotOpt(spark, tablePath)
          .exists(_.properties.contains("schema.name-mapping.default")))
      setProperties(spark, tablePath,
        Map("schema.name-mapping.default" -> defaultNameMapping(schema)))
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // counts the caller already knows (an incremental mirror refresh
    // carries them from the previous snapshot) skip the footer sweep —
    // the refresh then reads footers only for files NEW since last time
    val unknown = files.map(_._1).filterNot(knownCounts.contains)
    val counts = knownCounts ++ recordCounts(spark, unknown)
    val adds = files.map { case (f, pv) =>
      val p = new Path(f)
      FileInfo(fs.makeQualified(p).toString, pv,
        fs.getFileStatus(p).getLen, counts.getOrElse(f, 0L))
    }
    commit(spark, tablePath, schema, pfields, adds, kept = Nil,
      operation = if (mode == "overwrite") "overwrite" else "append",
      carryCurrentManifests = mode == "append",
      expectedParent = None)
  }

  /** The spec's name-mapping JSON for the current schema: each field-id
    * maps to its current name (renames later EXTEND the names list).
    * Ids come from the same walk [[icebergSchemaJson]] performs, so the
    * mapping agrees with the metadata's schema document. */
  private def defaultNameMapping(schema: StructType): String = {
    val ids = topLevelFieldIds(schema)
    val arr = mapper.createArrayNode()
    schema.fields.foreach { f =>
      val e = mapper.createObjectNode()
      e.put("field-id", ids(f.name))
      e.set[ArrayNode]("names", mapper.createArrayNode().add(f.name))
      arr.add(e)
    }
    mapper.writeValueAsString(arr)
  }

  /** `expire_snapshots` + orphan-file cleanup — the maintenance every
    * long-lived Iceberg table needs (the reference defers to S3 Tables
    * auto-maintenance; this engine owns the table). Two phases:
    *
    *  1. COMMIT a new metadata version whose `snapshots`/`snapshot-log`
    *     keep only: the current snapshot, the newest `retainLast`, and
    *     every snapshot younger than `retentionMs` (claimed with the
    *     same create-exclusive loop as data commits, so it composes
    *     with concurrent writers);
    *  2. DELETE files no retained snapshot references — expired
    *     manifest lists, manifests, data/delete files, and orphans from
    *     crashed commits — plus superseded `vN.metadata.json` documents,
    *     all gated on a modification time older than `retentionMs` so a
    *     concurrent writer's just-staged files are never swept. The
    *     table tree is listed and deleted AS A JOB (the driver holds
    *     only the live set — O(retained files), the cost every Iceberg
    *     expire pays); retained snapshots' trees are walked driver-side
    *     at manifest scale.
    *
    * Returns deleted paths. Time travel to an expired snapshot raises
    * afterwards (it is gone from the log); retained reads are
    * untouched. */
  /** REWRITE MANIFESTS — Iceberg's metadata-compaction maintenance op
    * (the `rewrite_manifests` procedure): consolidate the current
    * snapshot's DATA manifests into one manifest per (partition-spec,
    * schema shape), committed as a `replace` snapshot that touches NO
    * data files. At 100 TB a table that has taken thousands of commits
    * carries thousands of manifests and every planning pass opens all
    * of them; after the rewrite a plan opens one (delete manifests are
    * carried unchanged — their entries must keep their own sequence
    * ordering anyway).
    *
    * The spec-subtle parts of moving entries between manifests:
    *  - merged entries become EXISTING (status 0) and keep their
    *    ORIGINAL `snapshot_id`, with EXPLICIT per-entry
    *    `sequence_number` / `file_sequence_number` (entry fields 3/4)
    *    written out — inherited values would re-bind to the NEW
    *    manifest's sequence number and change which position/equality
    *    deletes apply to which files;
    *  - v3 row lineage: a null `first_row_id` is MATERIALIZED from the
    *    source manifest's cumulative record_count walk before the move
    *    (DELETED entries consume ids in that walk too); a manifest
    *    whose lineage cannot be resolved is carried unmerged rather
    *    than guessed;
    *  - DELETED (status 2) entries drop — they exist for incremental
    *    consumption of PAST snapshots, which keep reading their own
    *    manifest lists;
    *  - each `data_file` record is carried under its source manifest's
    *    avro sub-schema byte-for-byte (grouping key = spec-id + schema
    *    + file metadata), so stats, bounds, equality ids and DV
    *    references survive whatever engine wrote them. */
  def rewriteManifests(spark: SparkSession, tablePath: String): Committed = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    val schema = IcebergReader.tableInfo(spark, tablePath)._1
    val pfields = IcebergReader.partitionFields(spark, tablePath)
    val lSchema = manifestListSchema
    val now = System.currentTimeMillis()
    val snapshotId = math.abs(UUID.randomUUID().getMostSignificantBits)
    def longValOf(v: Any): java.lang.Long = v match {
      case l: java.lang.Long => l
      case i: java.lang.Integer => Long.box(i.longValue)
      case _ => null
    }
    var attempts = 0
    while (attempts < 20) {
      val (claimedMax, parsed) = logState(fs, metaDir)
      val meta = parsed.map(_._2).getOrElse(
        throw new IllegalArgumentException(s"no Iceberg table at $tablePath"))
      val fv = Option(meta.get("format-version")).map(_.asInt).getOrElse(1)
      val priorSeq = Option(meta.get("last-sequence-number"))
        .map(_.asLong).getOrElse(0L)
      val seq = if (fv >= 2) Some(priorSeq + 1) else None
      val curSnap = Option(meta.get("current-snapshot-id"))
        .map(_.asLong).filter(_ >= 0)
      val listRecs = currentManifestRecords(spark, fs, root, meta)
      val (dataMfs, deleteMfs) =
        listRecs.partition(r => intValOf(r.get("content")) == 0)
      if (dataMfs.size <= 1)
        return Committed(curSnap.getOrElse(-1L), claimedMax, 0)

      final case class MEntry(dseq: java.lang.Long, fseq: java.lang.Long,
        esnap: java.lang.Long, df: GenericRecord)
      val merged = mutable.LinkedHashMap
        .empty[(Int, org.apache.avro.Schema, Map[String, String]),
          mutable.ArrayBuffer[MEntry]]
      val carriedUnmerged = mutable.ArrayBuffer.empty[GenericRecord]
      dataMfs.foreach { lr =>
        val mPath = IcebergReader.resolve(root,
          lr.get("manifest_path").toString)
        val (entries, fMeta) = IcebergReader.readAvroWithMeta(spark, mPath)
        if (entries.nonEmpty) {
          val dfSchema = entries.head.getSchema.getField("data_file").schema()
          val specId = intValOf(lr.get("partition_spec_id"))
          val mSeq = longValOf(lr.get("sequence_number"))
          val addedSnap = longValOf(lr.get("added_snapshot_id"))
          val listFri =
            if (lSchema.getField("first_row_id") == null) null
            else longValOf(lr.get("first_row_id"))
          val hasFriField = dfSchema.getField("first_row_id") != null
          def dfOf(e: GenericRecord) =
            e.get("data_file").asInstanceOf[GenericRecord]
          def isData(df: GenericRecord): Boolean =
            dfSchema.getField("content") == null ||
              intValOf(df.get("content")) == 0
          val needsFri = fv >= 3 && entries.exists { e =>
            val df = dfOf(e)
            isData(df) && (!hasFriField || df.get("first_row_id") == null)
          }
          if (needsFri && (listFri == null || !hasFriField)) {
            // lineage that cannot be materialized per-entry — either
            // un-stamped (pre-upgrade manifest before its lazy
            // re-stamp) or a v2-schema manifest whose data_file record
            // has no first_row_id field to make explicit: carry
            // unmerged, never guess or silently drop row ids
            carriedUnmerged += reencode(lSchema, lr)
          } else {
            var cursor: Long = if (listFri == null) 0L else listFri.longValue
            val buf = merged.getOrElseUpdate((specId, dfSchema, fMeta),
              mutable.ArrayBuffer.empty[MEntry])
            entries.foreach { e =>
              val df = dfOf(e)
              if (fv >= 3 && isData(df) && hasFriField &&
                  df.get("first_row_id") == null) {
                df.put("first_row_id", Long.box(cursor))
                cursor += (df.get("record_count") match {
                  case l: java.lang.Long => l.longValue
                  case i: java.lang.Integer => i.longValue
                  case _ => 0L
                })
              }
              if (intValOf(e.get("status")) != 2) {
                val eseq =
                  if (e.getSchema.getField("sequence_number") == null) null
                  else longValOf(e.get("sequence_number"))
                val efseq =
                  if (e.getSchema.getField("file_sequence_number") == null)
                    null
                  else longValOf(e.get("file_sequence_number"))
                val esnap = longValOf(e.get("snapshot_id"))
                // a v1-era manifest under a v2+ table carries no
                // sequence number — the spec's upgrade rule assigns
                // DATA SEQUENCE 0 to pre-upgrade files, and that must
                // become explicit here (inheriting the NEW manifest's
                // sequence would let later deletes skip these files)
                val inherited: java.lang.Long =
                  if (mSeq != null) mSeq else Long.box(0L)
                buf += MEntry(
                  if (eseq != null) eseq else inherited,
                  if (efseq != null) efseq else inherited,
                  if (esnap != null) esnap else addedSnap,
                  df)
              }
            }
          }
        }
      }

      var totalFiles = 0L
      val mergedList = merged.toSeq.zipWithIndex.map {
        case (((specId, dfSchema, fMeta), buf), i) =>
          val mSchema = new org.apache.avro.Schema.Parser().parse(
            s"""{"type":"record","name":"manifest_entry","fields":[
               |  {"name":"status","type":"int","field-id":0},
               |  {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
               |  {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
               |  {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
               |  {"name":"data_file","field-id":2,"type":${dfSchema.toString}}
               |]}""".stripMargin)
          val recs = buf.map { me =>
            val r = new GenericData.Record(mSchema)
            r.put("status", 0)
            r.put("snapshot_id", me.esnap)
            r.put("sequence_number", if (fv >= 2) me.dseq else null)
            r.put("file_sequence_number", if (fv >= 2) me.fseq else null)
            r.put("data_file", me.df)
            r
          }
          val p = new Path(metaDir, s"manifest-rw-$snapshotId-$attempts-$i.avro")
          val len = writeAvro(fs, p, mSchema, recs.toSeq, fMeta)
          val rows = buf.map(me => me.df.get("record_count") match {
            case l: java.lang.Long => l.longValue
            case n: java.lang.Integer => n.longValue
            case _ => 0L
          }).sum
          totalFiles += buf.size
          val mf = new GenericData.Record(lSchema)
          mf.put("manifest_path", fs.makeQualified(p).toString)
          mf.put("manifest_length", len)
          mf.put("partition_spec_id", specId)
          mf.put("content", 0)
          mf.put("sequence_number", seq.map(Long.box).orNull)
          val minSeq: java.lang.Long = {
            val seqs = buf.flatMap(me => Option(me.dseq)).map(_.longValue)
            if (seqs.isEmpty) seq.map(Long.box).orNull else Long.box(seqs.min)
          }
          mf.put("min_sequence_number",
            if (fv >= 2) minSeq else null)
          mf.put("added_snapshot_id", snapshotId)
          mf.put("added_data_files_count", 0)
          mf.put("existing_data_files_count", buf.size)
          mf.put("deleted_data_files_count", 0)
          mf.put("added_rows_count", 0L)
          mf.put("existing_rows_count", rows)
          // every entry carries an explicit first_row_id, so the merged
          // manifest needs no inheritance base
          mf.put("first_row_id", null)
          mf
      }
      val deleteCarried = deleteMfs.map(reencode(lSchema, _))
      val listPath = new Path(metaDir, s"snap-$snapshotId-$attempts.avro")
      writeAvro(fs, listPath, lSchema,
        mergedList ++ carriedUnmerged.toSeq ++ deleteCarried,
        Map("format-version" -> fv.toString,
          "snapshot-id" -> snapshotId.toString))
      val rowBase = Option(meta.get("next-row-id")).map(_.asLong).getOrElse(0L)
      val node = metadataJson(parsed.map(_._2),
        fs.makeQualified(root).toString, schema, pfields, snapshotId,
        fs.makeQualified(listPath).toString, "replace", now, fv, seq,
        firstRowId = if (fv >= 3) Some(rowBase) else None,
        nextRowId = if (fv >= 3) Some(rowBase) else None,
        summaryStats = Map(
          "manifests-replaced" ->
            (dataMfs.size - carriedUnmerged.size).toLong,
          "manifests-created" -> mergedList.size.toLong,
          "total-data-files" -> totalFiles))
      val version = claimedMax + 1
      val target = new Path(metaDir, s"v$version.metadata.json")
      if (AtomicWrite.claim(fs, target,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))) {
        writeHint(fs, metaDir, version)
        val (_, latest) = logState(fs, metaDir)
        val visible = latest.exists { case (_, m) =>
          IcebergReaderAccess.jsonArray(m.get("snapshots"))
            .exists(s => s.get("snapshot-id").asLong == snapshotId)
        }
        if (visible) return Committed(snapshotId, version, totalFiles.toInt)
        attempts += 1
      } else {
        // losing attempt: sweep EVERYTHING this attempt wrote — the
        // merged manifests too, not just the list (they are referenced
        // by nothing and no later cleanup would find them)
        fs.delete(listPath, false)
        mergedList.foreach(mf => fs.delete(
          new Path(mf.get("manifest_path").toString), false))
        attempts += 1
      }
    }
    throw new java.io.IOException(
      s"could not claim a manifest rewrite after $attempts attempts at $tablePath")
  }

  def expireSnapshots(spark: SparkSession, tablePath: String,
      retentionMs: Long = 7L * 24 * 3600 * 1000,
      retainLast: Int = 1): Seq[String] = {
    import spark.implicits._
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    val now = System.currentTimeMillis()
    var attempts = 0
    var done = false
    while (!done && attempts < 20) {
      val (claimedMax, parsedOpt) = logState(fs, metaDir)
      val (_, meta) = parsedOpt.getOrElse(throw new IllegalStateException(
        s"no parseable Iceberg metadata at $tablePath"))
      val snaps = IcebergReaderAccess.jsonArray(meta.get("snapshots"))
      val current = Option(meta.get("current-snapshot-id"))
        .map(_.asLong).getOrElse(-1L)
      // refs PIN their snapshots (real Iceberg expiry honors branch/tag
      // retention) — expiring a tagged snapshot would dangle the ref
      val refIds = Option(meta.get("refs")).toSeq
        .flatMap(r => r.elements().asScala.toSeq
          .map(_.get("snapshot-id").asLong))
      // retainLast / the retention window apply to snapshots REACHABLE
      // from current or a ref (real expiry's rule): an ORPHAN — a
      // dropped WAP branch's staged commits — must not ride the
      // newest-N slot just because it is recent. Tables whose snapshots
      // predate parent-snapshot-id stamping keep the conservative
      // everything-reachable reading.
      val parentOf: Map[Long, Option[Long]] = snaps.map(s =>
        s.get("snapshot-id").asLong ->
          Option(s.get("parent-snapshot-id")).filterNot(_.isNull)
            .map(_.asLong)).toMap
      val lineageKnown = snaps.size <= 1 ||
        snaps.exists(s => s.has("parent-snapshot-id"))
      val reachable: Set[Long] =
        if (!lineageKnown) parentOf.keySet
        else (refIds :+ current).filter(_ >= 0).flatMap { head =>
          Iterator.iterate(Option(head))(_.flatMap(parentOf.get).flatten)
            .takeWhile(_.isDefined).flatten.toSeq
        }.toSet
      val reachableSnaps = snaps.filter(s =>
        reachable.contains(s.get("snapshot-id").asLong))
      val keepIds = reachableSnaps.sortBy(-_.get("timestamp-ms").asLong)
        .take(math.max(retainLast, 1))
        .map(_.get("snapshot-id").asLong).toSet ++
        reachableSnaps
          .filter(_.get("timestamp-ms").asLong >= now - retentionMs)
          .map(_.get("snapshot-id").asLong) ++ refIds + current
      val expired = snaps.map(_.get("snapshot-id").asLong).toSet -- keepIds
      if (expired.isEmpty) done = true
      else {
        val node = meta.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
          .asInstanceOf[ObjectNode]
        val newSnaps = mapper.createArrayNode()
        snaps.filter(s => keepIds.contains(s.get("snapshot-id").asLong))
          .foreach(newSnaps.add)
        node.set[ArrayNode]("snapshots", newSnaps)
        val newLog = mapper.createArrayNode()
        IcebergReaderAccess.jsonArray(meta.get("snapshot-log"))
          .filter(e => keepIds.contains(e.get("snapshot-id").asLong))
          .foreach(newLog.add)
        node.set[ArrayNode]("snapshot-log", newLog)
        node.put("last-updated-ms", now)
        val target = new Path(metaDir, s"v${claimedMax + 1}.metadata.json")
        if (AtomicWrite.claim(fs, target,
            mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))) {
          writeHint(fs, metaDir, claimedMax + 1)
          done = true
        } else attempts += 1 // lost the claim
      }
    }
    // live set: every file any RETAINED snapshot references, walked from
    // the post-expire metadata
    val (currentVersion, parsed2) = logState(fs, metaDir)
    val meta2 = parsed2.getOrElse(throw new IllegalStateException(
      s"no parseable Iceberg metadata at $tablePath"))._2
    val live = mutable.Set.empty[String]
    IcebergReaderAccess.jsonArray(meta2.get("snapshots")).foreach { s =>
      val listPath = IcebergReader.resolve(root, s.get("manifest-list").asText)
      live += fs.makeQualified(listPath).toString
      IcebergReader.readAvro(spark, listPath).foreach { m =>
        val mp = IcebergReader.resolve(root, m.get("manifest_path").toString)
        val q = fs.makeQualified(mp).toString
        if (!live.contains(q)) {
          live += q
          IcebergReader.readAvro(spark, mp).foreach { e =>
            val df = e.get("data_file").asInstanceOf[GenericRecord]
            live += fs.makeQualified(
              IcebergReader.resolve(root, df.get("file_path").toString)).toString
          }
        }
      }
    }
    val cutoff = now - retentionMs
    val liveBc = spark.sparkContext.broadcast(live.toSet)
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val MetaFile = """v(\d+)\.metadata\.json""".r
    graft.io.DatasetReader.listObjects(spark, tablePath)
      .where(col("modified_ms") < cutoff)
      .select("path").as[String]
      .mapPartitions { it =>
        val conf = confBc.value.value
        val lv = liveBc.value
        it.filter { p =>
          val name = p.substring(p.lastIndexOf('/') + 1)
          // qualify listed paths exactly as the live set was built, so
          // authority-normalization differences never sweep a live file
          val pp = new Path(p)
          lazy val q = pp.getFileSystem(conf).makeQualified(pp).toString
          val dataOrManifest =
            (name.endsWith(".parquet") || name.endsWith(".avro") ||
              name.endsWith(".puffin")) &&
              !lv.contains(q)
          val staleMeta = name match {
            case MetaFile(v) => v.toLong < currentVersion
            case _ => false
          }
          dataOrManifest || staleMeta
        }.map { p =>
          val pp = new Path(p)
          pp.getFileSystem(conf).delete(pp, false)
          p
        }
      }.collect().toSeq
  }

  private def asInfo(f: IcebergReader.DataFileEntry): FileInfo =
    FileInfo(f.path,
      f.partition.map { case (k, v) => k -> Option(v).map(_.toString) },
      f.sizeBytes, f.recordCount, f.lowerBounds, f.upperBounds,
      nullCounts = f.nullCounts, fileFormat = f.fileFormat,
      referencedDataFile = f.referencedDataFile,
      contentOffset = f.contentOffset,
      contentSizeBytes = f.contentSizeBytes,
      // EXISTING carried files keep their effective first_row_id
      // explicitly (spec: carried entries must not be re-assigned)
      firstRowId = f.firstRowId)

  /** Append must not silently drop or retype columns (the reference's
    * schema check, `s3/_s3_tables_iceberg.py:200-219`). */
  private def checkAppendSchema(table: StructType, incoming: StructType): Unit = {
    val t = table.fields.map(f => f.name -> f.dataType).toMap
    incoming.fields.foreach { f =>
      t.get(f.name) match {
        case None => throw new IllegalArgumentException(
          s"append column ${f.name} not in table schema (use overwrite to evolve)")
        case Some(dt) if dt != f.dataType => throw new IllegalArgumentException(
          s"append column ${f.name}: ${f.dataType.simpleString} != table's ${dt.simpleString}")
        case _ => ()
      }
    }
  }

  // ---- data files --------------------------------------------------------

  /** Stage as parquet (partition values computed into hidden path
    * columns — the transform result for `day`/`bucket`/…, the column
    * itself for identity — so the real source columns stay IN the files,
    * as Iceberg requires), move under `data/`, and gather per-file stats
    * with distributed footer reads. */
  private def writeDataFiles(df: DataFrame, tablePath: String,
      partFields: Seq[PartitionField]): Seq[FileInfo] = {
    val spark = df.sparkSession
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(root, s".iceberg-staging-${UUID.randomUUID()}")
    val Pt = "__ipt_"
    try {
      // embed the table's field-ids in the parquet files (the spec
      // requires them of native writers; field-id-resolving readers —
      // ours included — need them for rename-safe column resolution).
      // The id assignment is the same positional scheme commit() writes
      // into the metadata JSON and the manifest bounds use.
      val ids = topLevelFieldIds(df.schema)
      val withIds = df.select(df.schema.fields.map { f =>
        ids.get(f.name).map { id =>
          col(f.name).as(f.name,
            new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
              .putLong("parquet.field.id", id.toLong).build())
        }.getOrElse(col(f.name))
      }.toSeq: _*)
      val dup = partFields.foldLeft(withIds)((d, f) => d.withColumn(
        Pt + f.name,
        IcebergTransforms.column(spark, f, df.schema(f.source).dataType)))
      val w = dup.write.mode("overwrite")
      (if (partFields.nonEmpty) w.partitionBy(partFields.map(Pt + _.name): _*)
       else w)
        .parquet(staging.toString)
      val stagingStr = fs.makeQualified(staging).toString
      val moved = mutable.ArrayBuffer.empty[(String, Long)]
      val it = fs.listFiles(staging, true)
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) {
          val rel = st.getPath.toString.stripPrefix(stagingStr)
            .stripPrefix("/").split('/')
            .map(seg => if (seg.startsWith(Pt)) seg.stripPrefix(Pt) else seg)
            .mkString("/")
          val dst = new Path(new Path(root, "data"), rel)
          fs.mkdirs(dst.getParent)
          if (!fs.rename(st.getPath, dst))
            throw new java.io.IOException(s"rename ${st.getPath} -> $dst failed")
          moved += ((fs.makeQualified(dst).toString, st.getLen))
        }
      }
      val stats = footerStats(spark, moved.map(_._1).toSeq)
      val idOf = topLevelFieldIds(df.schema)
      moved.map { case (path, size) =>
        val (cnt, lo, hi, nulls) = stats.getOrElse(path,
          (0L, Map.empty[String, Array[Byte]], Map.empty[String, Array[Byte]],
            Map.empty[String, Long]))
        FileInfo(path, partitionValuesOf(path), size, cnt,
          lo.flatMap { case (n, b) => idOf.get(n).map(_ -> b) },
          hi.flatMap { case (n, b) => idOf.get(n).map(_ -> b) },
          nullCounts =
            nulls.flatMap { case (n, c) => idOf.get(n).map(_ -> c) })
      }.toSeq
    } finally fs.delete(staging, true)
  }

  /** Per-file row counts from parquet footers, read ON EXECUTORS
    * (metadata-only; the driver receives one (path, count) pair per
    * file — manifest-scale by definition). */
  private def recordCounts(spark: SparkSession,
      paths: Seq[String]): Map[String, Long] = {
    if (paths.isEmpty) return Map.empty
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.createDataset(paths)
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(f), conf)
          val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try (f, rdr.getRecordCount)
          finally rdr.close()
        }
      }
      .collect().toMap
  }

  /** Top-level column name → Iceberg field-id, mirroring exactly the id
    * assignment [[icebergSchemaJson]] performs (each field takes the
    * next id, then its type consumes ids for nested elements). */
  private def topLevelFieldIds(schema: StructType): Map[String, Int] = {
    val ids = new java.util.concurrent.atomic.AtomicInteger(0)
    def consume(dt: DataType): Unit = dt match {
      case a: ArrayType => ids.incrementAndGet(); consume(a.elementType)
      case s: StructType => s.fields.foreach { f =>
        ids.incrementAndGet(); consume(f.dataType)
      }
      case m: MapType =>
        ids.incrementAndGet(); consume(m.keyType)
        ids.incrementAndGet(); consume(m.valueType)
      case _ => ()
    }
    schema.fields.map { f =>
      val id = ids.incrementAndGet()
      consume(f.dataType)
      f.name -> id
    }.toMap
  }

  /** Per-file (record count, lower bounds, upper bounds) from parquet
    * footers, read ON EXECUTORS — bounds as the spec's Appendix-D
    * single-value bytes keyed by top-level column NAME (mapped to
    * field-ids driver-side). Columns without safe stats (INT96, NaN
    * floats, decimals, nested) are omitted — bounds are per-column
    * optional. */
  private def footerStats(spark: SparkSession, paths: Seq[String])
      : Map[String, (Long, Map[String, Array[Byte]],
          Map[String, Array[Byte]], Map[String, Long])] = {
    if (paths.isEmpty) return Map.empty
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.createDataset(paths)
      .mapPartitions { it =>
        val conf = confBc.value.value
        it.map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(f), conf)
          val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val (lo, hi, nulls) = footerBounds(rdr)
            (f, (rdr.getRecordCount, lo, hi, nulls))
          } finally rdr.close()
        }
      }
      .collect().toMap
  }

  private def footerBounds(rdr: org.apache.parquet.hadoop.ParquetFileReader)
      : (Map[String, Array[Byte]], Map[String, Array[Byte]],
         Map[String, Long]) = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    def le(n: Int)(fill: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      fill(bb); bb.array()
    }
    // typed (comparable, encoded-bytes) of one chunk statistic; None
    // drops the column
    def render(tpe: org.apache.parquet.schema.PrimitiveType, v: Any,
        upper: Boolean): Option[(Any, Array[Byte])] = {
      val ann = tpe.getLogicalTypeAnnotation
      (tpe.getPrimitiveTypeName, v) match {
        case (INT32, i: java.lang.Integer) => ann match {
          case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => None
          case _ => Some((i.intValue, le(4)(_.putInt(i))))
        }
        case (INT64, l: java.lang.Long) => ann match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MICROS =>
                Some((l.longValue, le(8)(_.putLong(l))))
              case LogicalTypeAnnotation.TimeUnit.MILLIS =>
                // micros bound: floor for lower, +999 for upper so the
                // true microsecond values stay inside the interval
                val micros = l * 1000L + (if (upper) 999L else 0L)
                Some((micros, le(8)(_.putLong(micros))))
              case _ => None
            }
          case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => None
          case _ => Some((l.longValue, le(8)(_.putLong(l))))
        }
        case (FLOAT, f: java.lang.Float) =>
          if (f.isNaN || f.isInfinite) None
          else Some((f.floatValue, le(4)(_.putFloat(f))))
        case (DOUBLE, d: java.lang.Double) =>
          if (d.isNaN || d.isInfinite) None
          else Some((d.doubleValue, le(8)(_.putDouble(d))))
        case (BINARY, b: org.apache.parquet.io.api.Binary) => ann match {
          case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation =>
            val s = b.toStringUsingUTF8
            Some((s, s.getBytes("UTF-8")))
          case _ => None
        }
        case (BOOLEAN, b: java.lang.Boolean) =>
          Some((b.booleanValue, Array[Byte](if (b) 1 else 0)))
        case _ => None
      }
    }
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Int, y: Int) => x < y
      case (x: Long, y: Long) => x < y
      case (x: Float, y: Float) => x < y
      case (x: Double, y: Double) => x < y
      case (x: String, y: String) => x < y
      case (x: Boolean, y: Boolean) => !x && y
      case _ => false
    }
    val acc = mutable.LinkedHashMap
      .empty[String, ((Any, Array[Byte]), (Any, Array[Byte]))]
    val dropped = mutable.Set.empty[String]
    // per-column null totals (spec `null_value_counts`, field 110):
    // summed across chunks, dropped the moment any chunk lacks the
    // count — a partial sum would under-report and prune wrongly
    val nulls = mutable.LinkedHashMap.empty[String, Long]
    val nullsDropped = mutable.Set.empty[String]
    rdr.getFooter.getBlocks.asScala.foreach { b =>
      b.getColumns.asScala.foreach { c =>
        val path = c.getPath.toArray
        if (path.length == 1 && !nullsDropped.contains(path(0))) {
          val st0 = c.getStatistics
          if (st0 == null || st0.isEmpty || !st0.isNumNullsSet) {
            nullsDropped += path(0); nulls.remove(path(0))
          } else nulls(path(0)) =
            nulls.getOrElse(path(0), 0L) + st0.getNumNulls
        }
        if (path.length == 1 && !dropped.contains(path(0))) {
          val name = path(0)
          val st = c.getStatistics
          if (st == null || st.isEmpty) {
            // chunk carries NO stats: bounds would be wrong — drop column
            dropped += name; acc.remove(name)
          } else if (!st.hasNonNullValue) {
            () // all-null chunk: other chunks' bounds still hold
          } else {
            val tpe = c.getPrimitiveType
            (render(tpe, st.genericGetMin, upper = false),
              render(tpe, st.genericGetMax, upper = true)) match {
              case (Some(mn), Some(mx)) =>
                acc.get(name) match {
                  case Some((m0, x0)) =>
                    acc(name) = (if (lt(mn._1, m0._1)) mn else m0,
                      if (lt(x0._1, mx._1)) mx else x0)
                  case None => acc(name) = (mn, mx)
                }
              case _ => dropped += name; acc.remove(name)
            }
          }
        }
      }
    }
    (acc.map { case (n, (mn, _)) => n -> mn._2 }.toMap,
      acc.map { case (n, (_, mx)) => n -> mx._2 }.toMap,
      nulls.toMap)
  }

  /** `…/data/p=a/q=__HIVE_DEFAULT_PARTITION__/part….parquet` ⇒
    * {p→Some(a), q→None}. */
  private def partitionValuesOf(path: String): Map[String, Option[String]] =
    path.split('/').dropRight(1).filter(_.contains('=')).map { seg =>
      val Array(k, v) = seg.split("=", 2)
      k -> (if (v == "__HIVE_DEFAULT_PARTITION__") None
            else Some(unescapePathName(v)))
    }.toMap

  private def unescapePathName(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        try {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: Exception => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ---- commit ------------------------------------------------------------

  /** Write the commit's manifest, then claim the next vN.metadata.json.
    * `kept` are carried files flattened as EXISTING entries (merge/delete,
    * valid only against an unchanged parent — `expectedParent` enforces
    * that, raising [[ConcurrentCommit]] when the table advanced).
    * `carryCurrentManifests` (append) instead re-reads the CURRENT
    * snapshot's manifest list inside the claim loop and includes those
    * manifests in the new list, so a retry after losing the claim
    * carries the winner's files rather than resurrecting a stale view. */
  private def commit(spark: SparkSession, tablePath: String,
      schema: StructType, partFields: Seq[PartitionField],
      adds: Seq[FileInfo],
      kept: Seq[FileInfo], operation: String,
      carryCurrentManifests: Boolean,
      expectedParent: Option[Long],
      deleteAdds: Seq[FileInfo] = Nil,
      branch: Option[String] = None,
      snapshotIdOverride: Option[Long] = None,
      minFormatVersion: Int = 1,
      dropPosDeleteManifests: Boolean = false): Committed = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    fs.mkdirs(metaDir)
    val snapshotId = snapshotIdOverride.getOrElse(
      math.abs(UUID.randomUUID().getMostSignificantBits))
    val now = System.currentTimeMillis()

    // one DATA manifest per commit (ADDED entries + carried EXISTING
    // entries), plus — for delete commits — one DELETE manifest whose
    // data_file entries carry content=1/2 (spec field-id 134). The v3
    // fields (first_row_id + the deletion-vector triple) join the
    // schema only on v3 commits, keeping v1/v2 manifests byte-stable.
    val hasDvAdds = deleteAdds.exists(_.fileFormat == "PUFFIN")
    def buildSchema(v3: Boolean): org.apache.avro.Schema =
      manifestSchema(partFields.map(_.name),
        withContent = deleteAdds.nonEmpty, withV3Fields = v3 || hasDvAdds)
    def entry(mSchema: org.apache.avro.Schema, f: FileInfo, status: Int,
        content: Int, firstRowId: Option[Long]): GenericRecord = {
      val dfSchema = mSchema.getField("data_file").schema()
      val pSchema = dfSchema.getField("partition").schema()
      val part = new GenericData.Record(pSchema)
      partFields.foreach(pf =>
        part.put(pf.name, f.partitionValues.get(pf.name).flatten.orNull))
      val dataFile = new GenericData.Record(dfSchema)
      if (dfSchema.getField("content") != null)
        dataFile.put("content", content)
      if (f.equalityIds.nonEmpty) {
        val sf = dfSchema.getField("equality_ids")
        require(sf != null, "equality_ids field missing from manifest schema")
        val arrSchema = sf.schema().getTypes.get(1) // [null, array]
        val arr = new GenericData.Array[Integer](f.equalityIds.size, arrSchema)
        f.equalityIds.foreach(id => arr.add(Int.box(id)))
        dataFile.put("equality_ids", arr)
      }
      dataFile.put("file_path", f.path)
      dataFile.put("file_format", f.fileFormat)
      dataFile.put("partition", part)
      dataFile.put("record_count", f.recordCount)
      dataFile.put("file_size_in_bytes", f.size)
      if (dfSchema.getField("first_row_id") != null)
        dataFile.put("first_row_id", firstRowId.map(Long.box).orNull)
      if (dfSchema.getField("referenced_data_file") != null) {
        dataFile.put("referenced_data_file", f.referencedDataFile.orNull)
        dataFile.put("content_offset",
          f.contentOffset.map(Long.box).orNull)
        dataFile.put("content_size_in_bytes",
          f.contentSizeBytes.map(Long.box).orNull)
      }
      def boundsArray(field: String,
          bounds: Map[Int, Array[Byte]]): Unit = {
        val sf = dfSchema.getField(field)
        if (sf != null && bounds.nonEmpty) {
          val arrSchema = sf.schema().getTypes.get(1) // [null, array]
          val itemSchema = arrSchema.getElementType
          val arr = new GenericData.Array[GenericRecord](
            bounds.size, arrSchema)
          bounds.toSeq.sortBy(_._1).foreach { case (k, v) =>
            val kv = new GenericData.Record(itemSchema)
            kv.put("key", k)
            kv.put("value", java.nio.ByteBuffer.wrap(v))
            arr.add(kv)
          }
          dataFile.put(field, arr)
        }
      }
      boundsArray("lower_bounds", f.lowerBounds)
      boundsArray("upper_bounds", f.upperBounds)
      // same array-encoded int-keyed map shape, long-valued
      val ncField = dfSchema.getField("null_value_counts")
      if (ncField != null && f.nullCounts.nonEmpty) {
        val arrSchema = ncField.schema().getTypes.get(1)
        val itemSchema = arrSchema.getElementType
        val arr = new GenericData.Array[GenericRecord](
          f.nullCounts.size, arrSchema)
        f.nullCounts.toSeq.sortBy(_._1).foreach { case (k, v) =>
          val kv = new GenericData.Record(itemSchema)
          kv.put("key", k)
          kv.put("value", v)
          arr.add(kv)
        }
        dataFile.put("null_value_counts", arr)
      }
      val e = new GenericData.Record(mSchema)
      e.put("status", status)
      e.put("snapshot_id", snapshotId)
      e.put("data_file", dataFile)
      e
    }
    // spec-prescribed avro file metadata so field-id-driven readers can
    // resolve the manifest without our exact field names
    val schemaIds = new java.util.concurrent.atomic.AtomicInteger(0)
    def manifestMeta(content: String, fv: Int, specId: Int) = Map(
      "schema" -> mapper.writeValueAsString(icebergSchemaJson(schema, schemaIds)),
      "partition-spec" -> mapper.writeValueAsString(
        partitionSpecFields(schema, partFields)),
      "partition-spec-id" -> specId.toString,
      "content" -> content,
      "format-version" -> fv.toString)
    val needsV2 = deleteAdds.nonEmpty
    // a delete-only commit (position deletes carried beside untouched
    // manifests) writes no data manifest at all. The data manifest is
    // written INSIDE the claim loop (below) once the table's real
    // format version is resolved — labeling an append to an
    // already-v2 table `format-version=1` would be legal but
    // inconsistent with the metadata/manifest-list for external readers
    val hasDataManifest = !(adds.isEmpty && kept.isEmpty && deleteAdds.nonEmpty)
    // v3 row lineage: ADDED files take [rowBase, …); kept EXISTING files
    // without an explicit first_row_id (pre-lineage files carried into
    // our manifest) are assigned after them — leaving them null would
    // make the reader's inheritance walk overlap the adds' explicit ids.
    // Returns the entries and the next unassigned row id.
    def dataEntries(mSchema: org.apache.avro.Schema, v3: Boolean,
        rowBase: Long): (Seq[GenericRecord], Long) = {
      var cursor = rowBase
      def assign(f: FileInfo, status: Int): GenericRecord =
        if (!v3) entry(mSchema, f, status, 0, None)
        else f.firstRowId match {
          case Some(existing) => entry(mSchema, f, status, 0, Some(existing))
          case None =>
            val e = entry(mSchema, f, status, 0, Some(cursor))
            cursor += f.recordCount
            e
        }
      val es = adds.map(assign(_, 1)) ++ kept.map(assign(_, 0))
      (es, cursor)
    }
    var writtenDataKey: Option[(Int, Int, Long)] = None
    var dataManifestSlot: Option[(Path, Long, Long)] = None
    def dataManifest(fv: Int, specId: Int,
        rowBase: Long): Option[(Path, Long, Long)] = {
      if (hasDataManifest && !writtenDataKey.contains((fv, specId, rowBase))) {
        val p = new Path(metaDir, s"$snapshotId-m0.avro")
        if (writtenDataKey.nonEmpty) fs.delete(p, false)
        val mSchema = buildSchema(fv >= 3)
        val (es, nextRow) = dataEntries(mSchema, fv >= 3, rowBase)
        dataManifestSlot =
          Some((p, writeAvro(fs, p, mSchema, es,
            manifestMeta("data", fv, specId)), nextRow))
        writtenDataKey = Some((fv, specId, rowBase))
      }
      dataManifestSlot
    }
    var writtenDelKey: Option[(Int, Int)] = None
    var deleteManifestSlot: Option[(Path, Long)] = None
    def deleteManifest(fv: Int, specId: Int): Option[(Path, Long)] = {
      if (deleteAdds.nonEmpty && !writtenDelKey.contains((fv, specId))) {
        val p = new Path(metaDir, s"$snapshotId-m1.avro")
        if (writtenDelKey.nonEmpty) fs.delete(p, false)
        val mSchema = buildSchema(fv >= 3)
        deleteManifestSlot = Some(p -> writeAvro(fs, p, mSchema,
          deleteAdds.map(f =>
            entry(mSchema, f, 1,
              if (f.equalityIds.nonEmpty) 2 else 1, None)),
          manifestMeta("deletes", math.max(fv, 2), specId)))
        writtenDelKey = Some((fv, specId))
      }
      deleteManifestSlot
    }

    val lSchema = manifestListSchema
    def listEntry(path: Path, len: Long, content: Int, seq: Option[Long],
        nAdds: Int, nKept: Int, specId: Int,
        addedRows: Long = 0L, keptRows: Long = 0L,
        firstRowId: Option[Long] = None): GenericRecord = {
      val mf = new GenericData.Record(lSchema)
      mf.put("manifest_path", fs.makeQualified(path).toString)
      mf.put("manifest_length", len)
      mf.put("partition_spec_id", specId)
      mf.put("content", content)
      mf.put("sequence_number", seq.map(Long.box).orNull)
      mf.put("min_sequence_number", seq.map(Long.box).orNull)
      mf.put("added_snapshot_id", snapshotId)
      mf.put("added_data_files_count", nAdds)
      mf.put("existing_data_files_count", nKept)
      mf.put("deleted_data_files_count", 0)
      mf.put("added_rows_count", addedRows)
      mf.put("existing_rows_count", keptRows)
      mf.put("first_row_id", firstRowId.map(Long.box).orNull)
      mf
    }
    // does a carried content=1 manifest hold position-delete state (pos
    // parquet or puffin DVs)? Read once per manifest, manifest-scale.
    def holdsPositionDeletes(listRec: GenericRecord): Boolean = {
      val entries = IcebergReader.readAvro(spark,
        IcebergReader.resolve(root, listRec.get("manifest_path").toString))
      val kinds = entries.map { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        val hasEqIds = Option(df.getSchema.getField("equality_ids"))
          .flatMap(_ => Option(df.get("equality_ids"))).exists {
            case l: java.util.List[_] => !l.isEmpty
            case _ => false
          }
        !hasEqIds // true = positional (pos parquet or DV)
      }
      if (kinds.contains(true) && kinds.contains(false))
        throw new UnsupportedIcebergFeatureException(
          s"mixed position/equality delete manifest " +
            s"${listRec.get("manifest_path")} cannot be replaced by a " +
            "deletion-vector commit")
      kinds.contains(true)
    }

    // claim vN+1 with create-exclusive; manifest list is (re)built INSIDE
    // the loop so appends observe the manifests of whoever won a race
    var attempts = 0
    while (attempts < 20) {
      val (claimedMax, parsed) = logState(fs, metaDir)
      expectedParent.foreach { p =>
        val cur = parsed.flatMap(l =>
          Option(l._2.get("current-snapshot-id")).map(_.asLong))
        if (!cur.contains(p))
          throw new ConcurrentCommit(
            s"table advanced past snapshot $p (now $cur); re-resolve")
      }
      // format-version and sequence numbers are PRESERVED: appending to a
      // v2/v3 table must not downgrade its metadata (external readers use
      // last-sequence-number to order deletes against data)
      val priorFv = parsed.flatMap(p =>
        Option(p._2.get("format-version")).map(_.asInt)).getOrElse(1)
      val fv =
        if (math.max(priorFv, minFormatVersion) >= 3) 3
        else if (needsV2 || priorFv >= 2) 2
        else 1
      val priorSeq = parsed.flatMap(p =>
        Option(p._2.get("last-sequence-number")).map(_.asLong)).getOrElse(0L)
      val seq = if (fv >= 2) Some(priorSeq + 1) else None
      // v3 row lineage: this snapshot's first-row-id is the table's
      // next-row-id; explicit ids are assigned to our adds (and to kept
      // files lacking one), then to carried manifests missing a
      // first_row_id (the post-upgrade lazy re-stamp)
      val rowBase: Long = parsed.flatMap(p =>
        Option(p._2.get("next-row-id")).map(_.asLong)).getOrElse(0L)
      // the spec-id OUR manifests are written under — resolved against
      // the freshly-claimed metadata so an evolution landing between
      // retries is observed; carried manifests keep their own spec-ids
      // through reencode
      val specId = resolveSpecId(parsed.map(_._2), schema, partFields)
      // a branch commit builds on the BRANCH head's state (falling back
      // to the fork point — the current snapshot — when the branch does
      // not exist yet), and its parent is that head, not main's
      val branchHead: Option[Long] = branch.flatMap { b =>
        parsed.flatMap { case (_, meta) =>
          Option(meta.get("refs")).filter(_.isObject)
            .flatMap(r => Option(r.get(b)))
            .map(_.get("snapshot-id").asLong)
        }
      }
      val carried0: Seq[GenericRecord] =
        if (!carryCurrentManifests) Nil
        else parsed.toSeq.flatMap { case (_, meta) =>
          currentManifestRecords(spark, fs, root, meta, branchHead)
            .map(reencode(lSchema, _))
        }
      // a deletion-vector commit REPLACES all positional delete state:
      // the new DVs already union every prior deleted position, so
      // carried pos/DV delete manifests drop (the invariant is at most
      // one DV per data file); equality-delete manifests carry through
      val carried =
        if (!dropPosDeleteManifests) carried0
        else carried0.filterNot { r =>
          intValOf(r.get("content")) == 1 && holdsPositionDeletes(r)
        }
      val ourData = dataManifest(fv, specId, rowBase)
      val afterOurs: Long = ourData.map(_._3).getOrElse(rowBase)
      // post-upgrade lazy re-stamp: carried data manifests without a
      // first_row_id get one here, advancing the cursor by their row
      // counts (summed from the manifest when the counts are absent)
      var rowCursor = afterOurs
      if (fv >= 3) carried.foreach { r =>
        if (intValOf(r.get("content")) == 0 && r.get("first_row_id") == null) {
          r.put("first_row_id", Long.box(rowCursor))
          // advance by EXACTLY what the reader's inheritance walk will
          // consume: record_count of every NULL-first_row_id data entry
          // in the manifest, DELETED entries included (the declared
          // added/existing row counts exclude them and would
          // under-reserve, colliding _row_id ranges)
          val rows = IcebergReader.readAvro(spark, IcebergReader.resolve(root,
              r.get("manifest_path").toString))
            .map(e => e.get("data_file").asInstanceOf[GenericRecord])
            .filter { df =>
              val isData = intValOf(
                if (df.getSchema.getField("content") == null) null
                else df.get("content")) == 0
              val hasFri = df.getSchema.getField("first_row_id") != null &&
                df.get("first_row_id") != null
              isData && !hasFri
            }
            .map(df => df.get("record_count") match {
              case l: java.lang.Long => l.longValue
              case i: java.lang.Integer => i.longValue
              case _ => 0L
            }).sum
          rowCursor += rows
        }
      }
      val nextRowId = rowCursor
      val ours = ourData.toSeq.map { case (p, len, _) =>
        listEntry(p, len, 0, seq, adds.length, kept.length, specId,
          addedRows = adds.map(_.recordCount).sum,
          keptRows = kept.map(_.recordCount).sum,
          firstRowId = if (fv >= 3) Some(rowBase) else None)
      } ++ deleteManifest(fv, specId).toSeq.map { case (p, len) =>
        listEntry(p, len, 1, seq, deleteAdds.length, 0, specId,
          addedRows = deleteAdds.map(_.recordCount).sum)
      }
      val listPath = new Path(metaDir, s"snap-$snapshotId-$attempts.avro")
      writeAvro(fs, listPath, lSchema, ours ++ carried,
        Map("format-version" -> fv.toString,
          "snapshot-id" -> snapshotId.toString))
      val version = claimedMax + 1
      val node = metadataJson(parsed.map(_._2), fs.makeQualified(root).toString,
        schema, partFields, snapshotId,
        fs.makeQualified(listPath).toString, operation, now, fv, seq,
        branch, branchHead,
        firstRowId = if (fv >= 3) Some(rowBase) else None,
        nextRowId = if (fv >= 3) Some(nextRowId) else None,
        summaryStats = Map(
          "added-data-files" -> adds.length.toLong,
          "added-records" -> adds.map(_.recordCount).sum,
          "added-files-size" -> adds.map(_.size).sum,
          "added-delete-files" -> deleteAdds.length.toLong,
          "total-data-files" -> (adds.length + kept.length +
            (if (carryCurrentManifests)
               carried.map(c => Option(c.get("added_data_files_count"))
                 .collect { case i: java.lang.Integer => i.longValue
                            case l: java.lang.Long => l.longValue }
                 .getOrElse(0L) +
                 Option(c.get("existing_data_files_count"))
                 .collect { case i: java.lang.Integer => i.longValue
                            case l: java.lang.Long => l.longValue }
                 .getOrElse(0L)).sum
             else 0L))))
      val target = new Path(metaDir, s"v$version.metadata.json")
      if (AtomicWrite.claim(fs, target,
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))) {
        writeHint(fs, metaDir, version)
        // A writer paused between claiming vN and writing the body past
        // tornGraceMs has its claim SKIPPED by competitors — returning
        // success here without checking would acknowledge a dropped
        // commit. Verify our snapshot is in the visible chain; if a
        // competitor advanced past us without carrying it, retry the
        // whole claim (merge paths re-raise ConcurrentCommit upstream).
        val (_, latest) = logState(fs, metaDir)
        val visible = latest.exists { case (_, meta) =>
          IcebergReaderAccess.jsonArray(meta.get("snapshots"))
            .exists(s => s.get("snapshot-id").asLong == snapshotId)
        }
        if (visible) return Committed(snapshotId, version, adds.length)
        attempts += 1
      } else { // lost the claim; retry
        fs.delete(listPath, false)
        attempts += 1
      }
    }
    throw new java.io.IOException(
      s"could not claim an Iceberg commit after $attempts attempts at $tablePath")
  }

  /** Advance `version-hint.text` monotonically: a slow writer must not
    * regress the hint below a newer committed version. The hint is a
    * non-authoritative fast-forward pointer ([[IcebergReader]] resolves
    * by listing and skips torn claims), so the benign read-then-write
    * race here costs at most a lagging hint, never a wrong read. */
  private def writeHint(fs: FileSystem, metaDir: Path, version: Long): Unit = {
    val hintPath = new Path(metaDir, "version-hint.text")
    val existing =
      try {
        val in = fs.open(hintPath)
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        Some(text.trim.toLong)
      } catch { case _: Exception => None }
    if (existing.forall(_ < version)) {
      try {
        val out = fs.create(hintPath, true)
        try out.write(version.toString.getBytes("UTF-8")) finally out.close()
      } catch { case _: java.io.IOException => () } // advisory only
    }
  }

  /** The manifest-list records of `meta`'s current snapshot (empty for a
    * table with no current snapshot). */
  private def intValOf(v: Any): Int = v match {
    case i: java.lang.Integer => i.intValue
    case l: java.lang.Long => l.intValue
    case _ => 0
  }

  private def currentManifestRecords(spark: SparkSession, fs: FileSystem,
      root: Path, meta: com.fasterxml.jackson.databind.JsonNode,
      atSnapshot: Option[Long] = None): Seq[GenericRecord] = {
    val cur = atSnapshot.orElse(
      Option(meta.get("current-snapshot-id")).map(_.asLong).filter(_ >= 0))
      .getOrElse(return Nil)
    IcebergReaderAccess.jsonArray(meta.get("snapshots"))
      .find(_.get("snapshot-id").asLong == cur)
      .map(s => IcebergReader.readAvro(spark,
        IcebergReader.resolve(root, s.get("manifest-list").asText)))
      .getOrElse(Nil)
  }

  /** Re-encode a manifest-list record (possibly written by another engine
    * with a wider schema) onto this writer's field set. The v2 fields
    * (`content`, `sequence_number`, `min_sequence_number`) are CARRIED,
    * not dropped — flattening a delete manifest's content to 0 would
    * resurrect deleted rows on the next append. Fields absent from the
    * source's writer schema read through the schema guard (avro `get`
    * throws on unknown names). */
  private def reencode(lSchema: org.apache.avro.Schema,
      r: GenericRecord): GenericRecord = {
    val out = new GenericData.Record(lSchema)
    def raw(f: String): Any =
      if (r.getSchema.getField(f) == null) null else r.get(f)
    def longOf(f: String): Any = raw(f) match {
      case l: java.lang.Long => l
      case i: java.lang.Integer => i.longValue(): java.lang.Long
      case _ => null
    }
    def intOf(f: String, dflt: java.lang.Integer): Any = raw(f) match {
      case i: java.lang.Integer => i
      case l: java.lang.Long => l.intValue(): java.lang.Integer
      case _ => dflt
    }
    out.put("manifest_path", r.get("manifest_path").toString)
    out.put("manifest_length", longOf("manifest_length") match {
      case null => 0L: java.lang.Long
      case l => l
    })
    out.put("partition_spec_id", intOf("partition_spec_id", 0))
    out.put("content", intOf("content", 0))
    out.put("sequence_number", longOf("sequence_number"))
    out.put("min_sequence_number", longOf("min_sequence_number"))
    out.put("added_snapshot_id", longOf("added_snapshot_id"))
    out.put("added_data_files_count", intOf("added_data_files_count", null))
    out.put("existing_data_files_count",
      intOf("existing_data_files_count", null))
    out.put("deleted_data_files_count", intOf("deleted_data_files_count", null))
    // v3 row lineage: a carried manifest KEEPS its first_row_id (and the
    // row counts the assignment walk advances by); external manifests
    // may use the spec's alternate count field names
    out.put("added_rows_count", longOf("added_rows_count"))
    out.put("existing_rows_count", longOf("existing_rows_count"))
    out.put("first_row_id", longOf("first_row_id"))
    out
  }

  /** How long a claimed-but-unparseable metadata file is treated as an
    * in-flight writer (waited out) rather than a dead leftover. */
  private[io] var tornGraceMs = 10000L

  /** (highest CLAIMED version, latest PARSEABLE metadata). Metadata
    * publication is create-exclusive-then-write, so a concurrent reader
    * can observe a claimed file whose body has not landed (the torn
    * window). A young torn claim is an in-flight writer — wait for its
    * body; a stale one is a dead crash leftover — its STATE is skipped
    * (the writer never returned success, so nothing acknowledged is
    * lost) but its version number is never reused. Without this, a torn
    * read parses as an empty node and an append silently carries
    * nothing — the lost-update this method exists to prevent. */
  private def logState(fs: FileSystem, metaDir: Path)
      : (Long, Option[(Long, com.fasterxml.jackson.databind.JsonNode)]) = {
    val Meta = """v(\d+)\.metadata\.json""".r
    val deadline = System.currentTimeMillis() + tornGraceMs
    while (true) {
      if (!fs.exists(metaDir)) return (0L, None)
      val versions = fs.listStatus(metaDir).collect {
        case st if Meta.matches(st.getPath.getName) =>
          (Meta.findFirstMatchIn(st.getPath.getName).get.group(1).toLong, st)
      }.sortBy(-_._1)
      if (versions.isEmpty) return (0L, None)
      val claimedMax = versions.head._1
      var waitForInflight = false
      var parsed: Option[(Long, com.fasterxml.jackson.databind.JsonNode)] = None
      val it = versions.iterator
      while (it.hasNext && parsed.isEmpty && !waitForInflight) {
        val (v, st) = it.next()
        tryParse(fs, st.getPath) match {
          case Some(node) => parsed = Some(v -> node)
          case None =>
            val young = System.currentTimeMillis() -
              st.getModificationTime < tornGraceMs
            if (young && System.currentTimeMillis() < deadline)
              waitForInflight = true
            // else: stale torn claim — skip its state, keep its number
        }
      }
      if (waitForInflight) Thread.sleep(50L)
      else return (claimedMax, parsed)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Parse a metadata json; None when torn/incomplete (missing body or
    * not yet a full Iceberg metadata document). */
  private def tryParse(fs: FileSystem, p: Path)
      : Option[com.fasterxml.jackson.databind.JsonNode] =
    try {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val node = mapper.readTree(text)
      if (node != null && node.isObject && node.has("format-version"))
        Some(node)
      else None
    } catch { case _: Exception => None }

  /** Fields shared by every metadata document (identity, schema,
    * partition spec). */
  private def baseMetadata(
      prior: Option[com.fasterxml.jackson.databind.JsonNode],
      location: String, schema: StructType, partFields: Seq[PartitionField],
      now: Long, formatVersion: Int = 1): ObjectNode = {
    val node = mapper.createObjectNode()
    node.put("format-version", formatVersion)
    node.put("table-uuid", prior.flatMap(p =>
      Option(p.get("table-uuid")).map(_.asText))
      .getOrElse(UUID.randomUUID().toString))
    node.put("location", location)
    node.put("last-updated-ms", now)
    // spec `sort-orders` + `default-sort-order-id` (required fields in
    // v2 metadata): carried from the prior document; a new table
    // declares the unsorted order 0. A sorted rewrite declares its
    // identity order via [[declareSortOrder]].
    prior.flatMap(p => Option(p.get("sort-orders")).filter(_.isArray)) match {
      case Some(a) =>
        node.set[ObjectNode]("sort-orders",
          a.deepCopy[com.fasterxml.jackson.databind.JsonNode]())
        ()
      case None =>
        val arr = mapper.createArrayNode()
        val o = mapper.createObjectNode()
        o.put("order-id", 0)
        o.set[ObjectNode]("fields", mapper.createArrayNode())
        arr.add(o)
        node.set[ObjectNode]("sort-orders", arr)
        ()
    }
    node.put("default-sort-order-id", prior.flatMap(p =>
      Option(p.get("default-sort-order-id")).map(_.asInt)).getOrElse(0))
    val ids = new java.util.concurrent.atomic.AtomicInteger(0)
    val schemaNode = icebergSchemaJson(schema, ids)
    // Schema history (spec `schemas` + `current-schema-id`): additive
    // evolution APPENDS a new schema entry with the next schema-id so
    // pre-evolution snapshots keep resolving their own schema (the
    // reader already looks snapshots' schema-id up in this array).
    // Positional id assignment stays consistent along the evolution
    // path because the merged schema preserves table field order and
    // appends new fields — new columns take ids above the prior
    // last-column-id, never reusing one. A non-extending overwrite
    // REPLACES the history (ids would conflict across entries
    // otherwise) — the existing replace-world semantics.
    val priorSchemas: Seq[ObjectNode] = prior.toSeq.flatMap { p =>
      val arr = IcebergReaderAccess.jsonArray(p.get("schemas"))
        .collect { case o: ObjectNode => o.deepCopy() }
      if (arr.nonEmpty) arr
      else Option(p.get("schema")).collect { case o: ObjectNode =>
        val c = o.deepCopy(); if (!c.has("schema-id")) c.put("schema-id", 0); c
      }.toSeq
    }
    val priorCurrentId = prior.flatMap(p =>
      Option(p.get("current-schema-id")).map(_.asInt)).getOrElse(0)
    val priorCurrent = priorSchemas.find(_.get("schema-id").asInt == priorCurrentId)
    def fieldsOf(s: ObjectNode) = IcebergReaderAccess.jsonArray(s.get("fields"))
    val newFields = fieldsOf(schemaNode)
    // a prior field matches when identical OR legally promoted in place
    // (int→long, float→double, decimal precision widening — the spec's
    // in-history type evolution; ids/names/positions never change)
    def promotedType(a: String, b: String): Boolean =
      (a == "int" && b == "long") || (a == "float" && b == "double") ||
        (a.startsWith("decimal(") && b.startsWith("decimal(") && {
          def ps(s: String) = s.stripPrefix("decimal(").stripSuffix(")")
            .split(",").map(_.trim.toInt)
          val (pa, pb) = (ps(a), ps(b))
          pa(1) == pb(1) && pa(0) <= pb(0)
        })
    def compatible(prior: Seq[com.fasterxml.jackson.databind.JsonNode]): Boolean =
      prior.size <= newFields.size && prior.zip(newFields).forall {
        case (p, n) =>
          p.get("id") == n.get("id") && p.get("name") == n.get("name") &&
            p.get("required") == n.get("required") &&
            (p.get("type") == n.get("type") ||
              (p.get("type").isTextual && n.get("type").isTextual &&
                promotedType(p.get("type").asText, n.get("type").asText)))
      }
    val (schemasArr, currentId) = priorCurrent match {
      case Some(pc) if fieldsOf(pc) == newFields =>
        (priorSchemas, priorCurrentId) // unchanged schema: carry history
      case Some(pc) if compatible(fieldsOf(pc)) =>
        // additive extension / in-place promotion: new entry, history kept
        val newId = priorSchemas.map(_.get("schema-id").asInt).max + 1
        schemaNode.put("schema-id", newId)
        (priorSchemas :+ schemaNode, newId)
      case _ =>
        schemaNode.put("schema-id", 0)
        (Seq(schemaNode), 0)
    }
    // last-column-id is monotonic over the table's whole life
    node.put("last-column-id", math.max(ids.get(),
      prior.flatMap(p => Option(p.get("last-column-id")).map(_.asInt))
        .getOrElse(0)))
    val currentNode =
      schemasArr.find(_.get("schema-id").asInt == currentId).get
    node.set[ObjectNode]("schema", currentNode.deepCopy())
    val schemasJson = mapper.createArrayNode()
    schemasArr.foreach(schemasJson.add)
    node.set[ArrayNode]("schemas", schemasJson)
    node.put("current-schema-id", currentId)
    // Partition-spec history (spec `partition-specs` + `default-spec-id`):
    // a data commit writes under the table's CURRENT spec, so when the
    // committed partitioning matches a spec already in history (compared
    // on name/transform/source-id — field-ids belong to the history
    // entry), the whole array and default id carry forward; evolution
    // entries appended by [[updatePartitionSpec]] survive every data
    // commit. No match (fresh table, or overwrite re-declaring the
    // partitioning) replaces the history, like schemas.
    val specFields = partitionSpecFields(schema, partFields)
    val priorSpecs: Seq[ObjectNode] = prior.toSeq.flatMap(p =>
      IcebergReaderAccess.jsonArray(p.get("partition-specs"))
        .collect { case o: ObjectNode => o.deepCopy() })
    val matchedSpec = priorSpecs.find(s =>
      specKey(s.get("fields")) == specKey(specFields))
    matchedSpec match {
      case Some(m) =>
        val specsJson = mapper.createArrayNode()
        priorSpecs.foreach(specsJson.add)
        node.set[ArrayNode]("partition-spec",
          m.get("fields").deepCopy[com.fasterxml.jackson.databind.JsonNode]()
            .asInstanceOf[ArrayNode])
        node.set[ArrayNode]("partition-specs", specsJson)
        node.put("default-spec-id", m.get("spec-id").asInt)
      case None =>
        val spec = mapper.createObjectNode()
        spec.put("spec-id", 0)
        spec.set[ArrayNode]("fields", specFields)
        // v1 requires the SINGULAR partition-spec (a bare field array)
        // next to the newer partition-specs list — readers predating the
        // list resolve only the singular form
        node.set[ArrayNode]("partition-spec", specFields.deepCopy())
        node.set[ArrayNode]("partition-specs",
          mapper.createArrayNode().add(spec))
        node.put("default-spec-id", 0)
    }
    node.put("last-partition-id", math.max(
      1000 + partFields.length - 1,
      prior.flatMap(p => Option(p.get("last-partition-id")).map(_.asInt))
        .getOrElse(999)))
    // properties SURVIVE data commits (like refs) — wiping them would
    // silently drop schema.name-mapping.default and break id-less reads
    node.set[ObjectNode]("properties",
      prior.flatMap(p => Option(p.get("properties")).filter(_.isObject))
        .map(_.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
          .asInstanceOf[ObjectNode])
        .getOrElse(mapper.createObjectNode()))
    node
  }

  /** Identity of a partition spec for history matching: the
    * (name, transform, source-id) triple list — field-ids belong to the
    * history entry that first declared the field, not to the shape. */
  private def specKey(fields: com.fasterxml.jackson.databind.JsonNode)
      : Seq[(String, String, Int)] =
    IcebergReaderAccess.jsonArray(fields).map(f =>
      (f.get("name").asText,
        Option(f.get("transform")).map(_.asText).getOrElse("identity"),
        Option(f.get("source-id")).map(_.asInt).getOrElse(-1)))

  /** The spec-id this (schema, partFields) combination resolves to in
    * `prior`'s partition-spec history: the matching entry's id, or 0
    * when the history has no such spec (fresh table / redeclaring
    * overwrite, which resets the history to a single spec 0). */
  private def resolveSpecId(
      prior: Option[com.fasterxml.jackson.databind.JsonNode],
      schema: StructType, partFields: Seq[PartitionField]): Int =
    prior.flatMap { p =>
      val key = specKey(partitionSpecFields(schema, partFields))
      IcebergReaderAccess.jsonArray(p.get("partition-specs"))
        .find(s => specKey(s.get("fields")) == key)
        .map(_.get("spec-id").asInt)
    }.getOrElse(0)

  /** The partition-spec field array: name, transform string
    * (`identity`/`day`/`bucket[n]`/…), 1-based source-id into the
    * schema, and the 1000-based partition field-id the spec assigns. */
  private def partitionSpecFields(schema: StructType,
      partFields: Seq[PartitionField]): ArrayNode = {
    // source-id = the source column's ACTUAL schema field id (positional
    // only for flat schemas — nested fields consume ids in between), so
    // spec-history matching agrees with [[updatePartitionSpec]]'s
    // id-resolved entries
    val ids = topLevelFieldIds(schema)
    val specFields = mapper.createArrayNode()
    partFields.zipWithIndex.foreach { case (pf, i) =>
      val f = mapper.createObjectNode()
      f.put("name", pf.name)
      f.put("transform", pf.transform)
      f.put("source-id", ids.getOrElse(pf.source,
        schema.fieldNames.indexOf(pf.source) + 1))
      f.put("field-id", 1000 + i)
      specFields.add(f)
    }
    specFields
  }

  /** Initial metadata of an empty table (S3 Tables `create_table`): the
    * declared schema and partition spec, no snapshot yet. */
  private def emptyMetadataJson(location: String, schema: StructType,
      partFields: Seq[PartitionField], now: Long,
      formatVersion: Int = 1): ObjectNode = {
    val node = baseMetadata(None, location, schema, partFields, now,
      formatVersion)
    if (formatVersion >= 2) node.put("last-sequence-number", 0L)
    if (formatVersion >= 3) node.put("next-row-id", 0L)
    node.set[ArrayNode]("snapshots", mapper.createArrayNode())
    node.put("current-snapshot-id", -1L)
    node.set[ArrayNode]("snapshot-log", mapper.createArrayNode())
    node
  }

  /** Next metadata document: prior snapshots carried, the new one
    * appended and made current — or, for a BRANCH commit (spec `refs`;
    * the write-audit-publish staging pattern), appended with only the
    * branch ref moved: `current-snapshot-id`, the snapshot-log, and the
    * `main` ref are untouched, so main readers never see staged data
    * until [[IcebergWriter.fastForward]] publishes it. */
  private def metadataJson(
      prior: Option[com.fasterxml.jackson.databind.JsonNode],
      location: String, schema: StructType, partFields: Seq[PartitionField],
      snapshotId: Long, manifestList: String, operation: String,
      now: Long, formatVersion: Int = 1,
      sequenceNumber: Option[Long] = None,
      branch: Option[String] = None,
      branchParent: Option[Long] = None,
      firstRowId: Option[Long] = None,
      nextRowId: Option[Long] = None,
      summaryStats: Map[String, Long] = Map.empty): ObjectNode = {
    val node = baseMetadata(prior, location, schema, partFields, now,
      formatVersion)
    sequenceNumber.foreach(node.put("last-sequence-number", _))
    // v3 row lineage: next-row-id is required table metadata; the
    // committing snapshot records its assigned base as first-row-id
    nextRowId.foreach(node.put("next-row-id", _))
    val snaps = mapper.createArrayNode()
    prior.foreach(p => IcebergReaderAccess.jsonArray(p.get("snapshots"))
      .foreach(s => snaps.add(s)))
    val snap = mapper.createObjectNode()
    snap.put("snapshot-id", snapshotId)
    // spec's optional lineage field — incremental consumers (and this
    // reader's append scan) walk ancestry with it where available.
    // A branch commit's parent is the BRANCH head, not main's.
    val parent =
      if (branch.isDefined) branchParent.orElse(
        prior.flatMap(p => Option(p.get("current-snapshot-id")))
          .filterNot(_.isNull).map(_.asLong).filter(_ >= 0))
      else prior.flatMap(p => Option(p.get("current-snapshot-id")))
        .filterNot(_.isNull).map(_.asLong).filter(_ >= 0)
    parent.foreach(snap.put("parent-snapshot-id", _))
    snap.put("timestamp-ms", now)
    sequenceNumber.foreach(snap.put("sequence-number", _))
    firstRowId.foreach(snap.put("first-row-id", _))
    // stamp the snapshot with the schema it was written under, so
    // time-travel reads resolve the pre-evolution schema from history
    snap.put("schema-id", node.get("current-schema-id").asInt)
    val summary = mapper.createObjectNode()
    summary.put("operation", operation)
    // the metrics real Iceberg stamps on every snapshot (spec
    // "Snapshots" summary fields) — external engines and humans read
    // commit sizes here without touching a manifest
    summaryStats.toSeq.sortBy(_._1).foreach { case (k, v) =>
      summary.put(k, v.toString)
    }
    snap.set[ObjectNode]("summary", summary)
    snap.put("manifest-list", manifestList)
    snaps.add(snap)
    node.set[ArrayNode]("snapshots", snaps)
    branch match {
      case None =>
        node.put("current-snapshot-id", snapshotId)
        val log = mapper.createArrayNode()
        prior.foreach(p => IcebergReaderAccess.jsonArray(p.get("snapshot-log"))
          .foreach(s => log.add(s)))
        val logEntry = mapper.createObjectNode()
        logEntry.put("timestamp-ms", now)
        logEntry.put("snapshot-id", snapshotId)
        log.add(logEntry)
        node.set[ArrayNode]("snapshot-log", log)
        // refs (branches/tags) survive data commits; the main branch
        // (when present) follows the new snapshot
        prior.flatMap(p => Option(p.get("refs")).filter(_.isObject)).foreach {
          priorRefs =>
            val refs = priorRefs.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
              .asInstanceOf[ObjectNode]
            if (refs.has("main") &&
                "branch" == Option(refs.get("main").get("type"))
                  .map(_.asText).getOrElse("branch")) {
              val main = refs.get("main").asInstanceOf[ObjectNode]
              main.put("snapshot-id", snapshotId)
            }
            node.set[ObjectNode]("refs", refs)
        }
      case Some(b) =>
        // staged: main's pointer, history, and ref stay exactly as they
        // were; only the named branch advances to the new snapshot
        prior.flatMap(p => Option(p.get("current-snapshot-id")))
          .filterNot(_.isNull).map(_.asLong).filter(_ >= 0)
          .foreach(node.put("current-snapshot-id", _))
        val log = mapper.createArrayNode()
        prior.foreach(p => IcebergReaderAccess.jsonArray(p.get("snapshot-log"))
          .foreach(s => log.add(s)))
        node.set[ArrayNode]("snapshot-log", log)
        val refs = prior.flatMap(p =>
            Option(p.get("refs")).filter(_.isObject))
          .map(_.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
            .asInstanceOf[ObjectNode])
          .getOrElse(mapper.createObjectNode())
        val entry = mapper.createObjectNode()
        entry.put("snapshot-id", snapshotId)
        entry.put("type", "branch")
        refs.set[ObjectNode](b, entry)
        node.set[ObjectNode]("refs", refs)
    }
    node
  }

  // ---- Spark schema → Iceberg schema JSON (inverse of the reader) -------

  private def icebergSchemaJson(schema: StructType,
      ids: java.util.concurrent.atomic.AtomicInteger): ObjectNode = {
    val node = mapper.createObjectNode()
    node.put("type", "struct")
    val fields = mapper.createArrayNode()
    schema.fields.foreach { f =>
      val fn = mapper.createObjectNode()
      fn.put("id", ids.incrementAndGet())
      fn.put("name", f.name)
      fn.put("required", !f.nullable)
      fn.set[com.fasterxml.jackson.databind.JsonNode](
        "type", icebergTypeJson(f.dataType, ids))
      // v3 column defaults survive re-rendered schema history
      if (f.metadata.contains("iceberg.initial-default"))
        fn.set[com.fasterxml.jackson.databind.JsonNode]("initial-default",
          mapper.readTree(f.metadata.getString("iceberg.initial-default")))
      if (f.metadata.contains("iceberg.write-default"))
        fn.set[com.fasterxml.jackson.databind.JsonNode]("write-default",
          mapper.readTree(f.metadata.getString("iceberg.write-default")))
      fields.add(fn)
    }
    node.set[ArrayNode]("fields", fields)
    node
  }

  private def icebergTypeJson(dt: DataType,
      ids: java.util.concurrent.atomic.AtomicInteger)
      : com.fasterxml.jackson.databind.JsonNode = dt match {
    case BooleanType => mapper.getNodeFactory.textNode("boolean")
    case ByteType | ShortType | IntegerType =>
      mapper.getNodeFactory.textNode("int")
    case LongType => mapper.getNodeFactory.textNode("long")
    case FloatType => mapper.getNodeFactory.textNode("float")
    case DoubleType => mapper.getNodeFactory.textNode("double")
    case DateType => mapper.getNodeFactory.textNode("date")
    case TimestampNTZType => mapper.getNodeFactory.textNode("timestamp")
    case TimestampType => mapper.getNodeFactory.textNode("timestamptz")
    case StringType => mapper.getNodeFactory.textNode("string")
    case BinaryType => mapper.getNodeFactory.textNode("binary")
    case d: DecimalType =>
      mapper.getNodeFactory.textNode(s"decimal(${d.precision}, ${d.scale})")
    case a: ArrayType =>
      val n = mapper.createObjectNode()
      n.put("type", "list")
      n.put("element-id", ids.incrementAndGet())
      n.set[com.fasterxml.jackson.databind.JsonNode](
        "element", icebergTypeJson(a.elementType, ids))
      n.put("element-required", !a.containsNull)
      n
    case s: StructType => icebergSchemaJson(s, ids)
    case m: MapType =>
      val n = mapper.createObjectNode()
      n.put("type", "map")
      n.put("key-id", ids.incrementAndGet())
      n.set[com.fasterxml.jackson.databind.JsonNode](
        "key", icebergTypeJson(m.keyType, ids))
      n.put("value-id", ids.incrementAndGet())
      n.set[com.fasterxml.jackson.databind.JsonNode](
        "value", icebergTypeJson(m.valueType, ids))
      n.put("value-required", !m.valueContainsNull)
      n
    case other => throw new IllegalArgumentException(
      s"unsupported type for Iceberg: ${other.simpleString}")
  }

  // ---- avro --------------------------------------------------------------

  private def writeAvro(fs: FileSystem, path: Path,
      schema: org.apache.avro.Schema, records: Seq[GenericRecord],
      meta: Map[String, String] = Map.empty): Long = {
    val out = fs.create(path, false)
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    try {
      meta.foreach { case (k, v) => writer.setMeta(k, v) }
      writer.create(schema, out)
      records.foreach(writer.append)
    } finally writer.close() // closes the stream too
    fs.getFileStatus(path).getLen
  }

  /** Iceberg manifest-entry schema: the spec's field names AND field-ids
    * (status=0, snapshot_id=1, data_file=2; file_path=100,
    * file_format=101, partition=102, record_count=103,
    * file_size_in_bytes=104; partition fields 1000+i) over the stats
    * this writer tracks — spec-conformant readers resolve manifest
    * columns by field-id, not name. Partition values are carried as
    * nullable strings (hive-encoded transform results). */
  private def manifestSchema(partNames: Seq[String],
      withContent: Boolean = false,
      withV3Fields: Boolean = false): org.apache.avro.Schema = {
    val partFields = partNames.zipWithIndex.map { case (c, i) =>
      s"""{"name":${mapper.writeValueAsString(c)},"type":["null","string"],"default":null,"field-id":${1000 + i}}"""
    }.mkString(",")
    // v2 delete manifests distinguish position/equality delete files by
    // data_file.content (spec field-id 134); v1 manifests omit it
    // equality_ids (spec field-id 135, element 136): the schema field-ids
    // an equality-delete file's rows match on; null for data/pos-delete
    val contentField =
      if (withContent)
        """{"name":"content","type":"int","default":0,"field-id":134},
          |{"name":"equality_ids","field-id":135,"default":null,"type":["null",{"type":"array","items":"int","element-id":136}]},""".stripMargin
      else ""
    // v3 additions (spec data_file table): first_row_id=142 (row
    // lineage), and the deletion-vector triple referenced_data_file=143,
    // content_offset=144, content_size_in_bytes=145
    val v3Fields =
      if (withV3Fields)
        """,{"name":"first_row_id","type":["null","long"],"default":null,"field-id":142},
          |{"name":"referenced_data_file","type":["null","string"],"default":null,"field-id":143},
          |{"name":"content_offset","type":["null","long"],"default":null,"field-id":144},
          |{"name":"content_size_in_bytes","type":["null","long"],"default":null,"field-id":145}""".stripMargin
      else ""
    // lower/upper_bounds: int-keyed maps, encoded (as Iceberg does) as
    // arrays of key/value records with the spec's field-ids
    // null_value_counts (spec field-id 110, key 121 / value 122): per
    // field-id null totals — what lets a reader prune IS NULL / IS NOT
    // NULL predicates without opening a footer
    val boundsFields =
      """,{"name":"null_value_counts","field-id":110,"default":null,"type":["null",{"type":"array","logicalType":"map","items":{"type":"record","name":"k121_v122","fields":[{"name":"key","type":"int","field-id":121},{"name":"value","type":"long","field-id":122}]}}]},
        |{"name":"lower_bounds","field-id":125,"default":null,"type":["null",{"type":"array","logicalType":"map","items":{"type":"record","name":"k126_v127","fields":[{"name":"key","type":"int","field-id":126},{"name":"value","type":"bytes","field-id":127}]}}]},
        |{"name":"upper_bounds","field-id":128,"default":null,"type":["null",{"type":"array","logicalType":"map","items":{"type":"record","name":"k129_v130","fields":[{"name":"key","type":"int","field-id":129},{"name":"value","type":"bytes","field-id":130}]}}]}""".stripMargin
    new org.apache.avro.Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |  {"name":"status","type":"int","field-id":0},
         |  {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
         |  {"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
         |    $contentField
         |    {"name":"file_path","type":"string","field-id":100},
         |    {"name":"file_format","type":"string","field-id":101},
         |    {"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[$partFields]}},
         |    {"name":"record_count","type":"long","field-id":103},
         |    {"name":"file_size_in_bytes","type":"long","field-id":104}
         |    $boundsFields
         |    $v3Fields
         |  ]}}
         |]}""".stripMargin)
  }

  /** Manifest-list schema with the spec's field-ids (manifest_path=500,
    * manifest_length=501, partition_spec_id=502, added_snapshot_id=503,
    * added/existing/deleted counts 504-506) plus the v2 fields that
    * distinguish DATA from DELETE manifests and order them:
    * content=517 (0=data, 1=deletes), sequence_number=515,
    * min_sequence_number=516. v1 snapshots simply leave them at the
    * defaults — carrying a delete manifest through an append without
    * these fields would silently replay it as data. */
  private val manifestListSchema: org.apache.avro.Schema =
    new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |  {"name":"manifest_path","type":"string","field-id":500},
        |  {"name":"manifest_length","type":"long","field-id":501},
        |  {"name":"partition_spec_id","type":"int","field-id":502},
        |  {"name":"content","type":"int","default":0,"field-id":517},
        |  {"name":"sequence_number","type":["null","long"],"default":null,"field-id":515},
        |  {"name":"min_sequence_number","type":["null","long"],"default":null,"field-id":516},
        |  {"name":"added_snapshot_id","type":["null","long"],"default":null,"field-id":503},
        |  {"name":"added_data_files_count","type":["null","int"],"default":null,"field-id":504},
        |  {"name":"existing_data_files_count","type":["null","int"],"default":null,"field-id":505},
        |  {"name":"deleted_data_files_count","type":["null","int"],"default":null,"field-id":506},
        |  {"name":"added_rows_count","type":["null","long"],"default":null,"field-id":512},
        |  {"name":"existing_rows_count","type":["null","long"],"default":null,"field-id":513},
        |  {"name":"first_row_id","type":["null","long"],"default":null,"field-id":520}
        |]}""".stripMargin)
}

/** Reader internals the writer shares (json array walk). */
private[io] object IcebergReaderAccess {
  def jsonArray(n: com.fasterxml.jackson.databind.JsonNode)
      : Seq[com.fasterxml.jackson.databind.JsonNode] =
    if (n == null) Nil else (0 until n.size()).map(n.get)
}
