package graft.io

import scala.collection.mutable
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}

/** Read-only interop with REAL Delta Lake tables — the reference reads
  * tables other systems wrote (`s3/_read_deltalake.py:38-136`), and the
  * in-repo [[graft.table.TxnLog]] reproduces the *semantics* but not the
  * format. The Delta transaction log is plain files (the protocol is
  * public: delta.io PROTOCOL.md): `_delta_log/<20-digit>.json` holds one
  * JSON action per line (`metaData`, `add`, `remove`, `commitInfo`,
  * `protocol`), every 10th commit may be compacted into
  * `<version>.checkpoint.parquet`, and `_last_checkpoint` points at the
  * newest checkpoint — so a reader needs no format jar.
  *
  * Snapshot reconstruction: start from the newest checkpoint at or below
  * the requested version (falling back to version 0), replay the JSON
  * tail in order, last action per file path wins. Data files are then
  * read with the log's schema, partition columns re-attached from each
  * file's `partitionValues` (authoritative over directory names).
  *
  * Scale: the log itself is metadata — the driver materializes only the
  * active file list, the same cost every Delta reader pays; the data read
  * is a normal distributed parquet scan per partition-value group.
  */
object DeltaLogReader {

  final case class AddFile(path: String, partitionValues: Map[String, Option[String]])

  final case class Snapshot(
      version: Long,
      schema: StructType,
      partitionColumns: Seq[String],
      files: Seq[AddFile])

  final case class Commit(version: Long, timestampMs: Long, operation: String)

  private val mapper = new ObjectMapper()
  private val CommitFile = """(\d{20})\.json""".r
  private val CheckpointFile = """(\d{20})\.checkpoint\.parquet""".r

  /** Latest version present in the log, or -1 for an empty/absent log. */
  def latestVersion(spark: SparkSession, tablePath: String): Long = {
    val (commits, checkpoints) = logFiles(spark, tablePath)
    (commits.keys ++ checkpoints.keys).foldLeft(-1L)(math.max)
  }

  /** Reconstruct the snapshot at `asOfVersion` (default: latest). */
  def snapshot(spark: SparkSession, tablePath: String,
      asOfVersion: Option[Long] = None): Snapshot = {
    val (commits, checkpoints) = logFiles(spark, tablePath)
    require(commits.nonEmpty || checkpoints.nonEmpty,
      s"no Delta log under $tablePath/_delta_log")
    val latest = (commits.keys ++ checkpoints.keys).max
    val version = asOfVersion.getOrElse(latest)
    require(version <= latest, s"version $version > latest $latest")

    val ckptVersion = checkpoints.keys.filter(_ <= version).maxOption
    val active = mutable.LinkedHashMap.empty[String, AddFile]
    var schema: Option[StructType] = None
    var partCols: Seq[String] = Nil

    ckptVersion.foreach { cv =>
      // select only the three action structs so parquet column pruning
      // drops the stats/tags payloads real checkpoints carry
      val ckpt = spark.read.parquet(checkpoints(cv))
      val actionCols = ckpt.columns.filter(Set("metaData", "add", "remove"))
      val rows = ckpt.select(actionCols.map(col).toSeq: _*).collect()
      rows.foreach { r =>
        def struct(name: String) =
          if (!r.schema.fieldNames.contains(name)) None
          else Option(r.getAs[org.apache.spark.sql.Row](name))
        struct("metaData").foreach { m =>
          schema = Some(parseSchema(m.getAs[String]("schemaString")))
          partCols = m.getAs[scala.collection.Seq[String]]("partitionColumns").toSeq
        }
        struct("add").foreach { a =>
          val add = AddFile(a.getAs[String]("path"),
            Option(a.getAs[scala.collection.Map[String, String]]("partitionValues"))
              .map(_.toMap.map { case (k, v) => k -> Option(v) })
              .getOrElse(Map.empty))
          active(add.path) = add
        }
        struct("remove").foreach(rm => active.remove(rm.getAs[String]("path")))
      }
    }

    val tail = commits.keys.toSeq.sorted
      .filter(v => v <= version && ckptVersion.forall(v > _))
    // no checkpoint floor → the tail must reach back to commit 0
    require(ckptVersion.nonEmpty || tail.headOption.contains(0L),
      s"log tail starts at ${tail.headOption} with no checkpoint before it")
    tail.foreach { v =>
      readLines(spark, commits(v)).foreach { line =>
        val node = mapper.readTree(line)
        Option(node.get("metaData")).foreach { m =>
          schema = Some(parseSchema(m.get("schemaString").asText))
          partCols = jsonArray(m.get("partitionColumns")).map(_.asText)
        }
        Option(node.get("add")).foreach { a =>
          val pv = Option(a.get("partitionValues")).map { o =>
            val it = o.fields()
            val b = Map.newBuilder[String, Option[String]]
            while (it.hasNext) {
              val e = it.next()
              b += e.getKey -> (if (e.getValue.isNull) None
                else Some(e.getValue.asText))
            }
            b.result()
          }.getOrElse(Map.empty[String, Option[String]])
          val add = AddFile(decodePath(a.get("path").asText), pv)
          active(add.path) = add
        }
        Option(node.get("remove")).foreach(rm =>
          active.remove(decodePath(rm.get("path").asText)))
      }
    }
    Snapshot(version,
      schema.getOrElse(throw new IllegalStateException(
        s"no metaData action found replaying to version $version")),
      partCols, active.values.toSeq)
  }

  /** `read_deltalake(version=…)`: the snapshot as a DataFrame.
    *
    * Plan shape: ONE parquet scan over the whole active file list —
    * never a union of per-partition scans (10k partition tuples would
    * mean a 10k-node plan). The log's `partitionValues` (authoritative
    * over directory names) are re-attached by a broadcast join of the
    * tiny (file → values) manifest against `input_file_name()`: the
    * manifest is metadata-scale (one row per active file, the same list
    * the snapshot already materialized), so the join is a map-side
    * lookup, and the scan itself stays a single distributed node that
    * AQE/pushdown treat normally.
    */
  def read(spark: SparkSession, tablePath: String,
      asOfVersion: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, tablePath, asOfVersion)
    val dataSchema = StructType(
      snap.schema.fields.filterNot(f => snap.partitionColumns.contains(f.name)))
    if (snap.files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualified URIs so they compare equal to input_file_name()'s output
    val qualified = snap.files.map { f =>
      fs.makeQualified(new Path(root, f.path)).toUri.toString -> f
    }
    val base = spark.read.schema(dataSchema).parquet(qualified.map(_._1): _*)
    if (snap.partitionColumns.isEmpty)
      return base.select(snap.schema.fieldNames.map(col).toSeq: _*)
    val manifestSchema = StructType(
      org.apache.spark.sql.types.StructField("__file",
        org.apache.spark.sql.types.StringType, nullable = false) +:
        snap.partitionColumns.map(c => org.apache.spark.sql.types.StructField(
          c, org.apache.spark.sql.types.StringType, nullable = true)))
    val manifestRows = qualified.map { case (uri, f) =>
      org.apache.spark.sql.Row.fromSeq(
        uri +: snap.partitionColumns.map(c => f.partitionValues.get(c).flatten.orNull))
    }
    val manifest = spark.createDataFrame(
      spark.sparkContext.parallelize(manifestRows, 1), manifestSchema)
    base
      .withColumn("__file", org.apache.spark.sql.functions.input_file_name())
      .join(org.apache.spark.sql.functions.broadcast(manifest), Seq("__file"), "left")
      .select(snap.schema.fields.map { f =>
        if (snap.partitionColumns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else col(f.name)
      }.toSeq: _*)
  }

  /** Commit history (newest first) from the commitInfo actions. */
  def history(spark: SparkSession, tablePath: String): Seq[Commit] = {
    val (commits, _) = logFiles(spark, tablePath)
    commits.toSeq.sortBy(-_._1).map { case (v, path) =>
      val info = readLines(spark, path)
        .map(mapper.readTree).flatMap(n => Option(n.get("commitInfo")))
        .headOption
      Commit(v,
        info.flatMap(i => Option(i.get("timestamp"))).map(_.asLong).getOrElse(0L),
        info.flatMap(i => Option(i.get("operation"))).map(_.asText)
          .getOrElse("UNKNOWN"))
    }
  }

  private def parseSchema(schemaString: String): StructType =
    DataType.fromJson(schemaString).asInstanceOf[StructType]

  private def jsonArray(n: JsonNode): Seq[JsonNode] =
    if (n == null) Nil
    else (0 until n.size()).map(n.get)

  /** Delta add/remove paths are URI-encoded relative paths. */
  private def decodePath(p: String): String =
    if (p.contains('%')) new java.net.URI(p).getPath else p

  /** (version → commit json path, version → checkpoint parquet path). */
  private def logFiles(spark: SparkSession, tablePath: String)
      : (Map[Long, String], Map[Long, String]) = {
    val logDir = new Path(tablePath, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(logDir)) return (Map.empty, Map.empty)
    val entries = fs.listStatus(logDir).map(_.getPath)
    val commits = entries.collect {
      case p if CommitFile.matches(p.getName) =>
        p.getName.stripSuffix(".json").toLong -> p.toString
    }.toMap
    val checkpoints = entries.collect {
      case p if CheckpointFile.matches(p.getName) =>
        p.getName.stripSuffix(".checkpoint.parquet").toLong -> p.toString
    }.toMap
    (commits, checkpoints)
  }

  private def readLines(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    text.linesIterator.filter(_.trim.nonEmpty).toSeq
  }
}
