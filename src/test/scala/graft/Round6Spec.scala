package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{DeltaDeletionVectors, DeltaLogReader, DeltaLogWriter, IcebergReader, IcebergWriter, ScanFilter}

// V2-checkpoint fixture shapes (top-level so Spark can derive encoders)
case class V2Prot(minReaderVersion: Int, minWriterVersion: Int,
    readerFeatures: Seq[String], writerFeatures: Seq[String])
case class V2Meta(id: String, schemaString: String,
    partitionColumns: Seq[String])
case class V2Side(path: String, sizeInBytes: Long, modificationTime: Long)
case class V2ManifestRow(protocol: Option[V2Prot], metaData: Option[V2Meta],
    sidecar: Option[V2Side])
case class V2Add(path: String, partitionValues: Map[String, String],
    size: Long, modificationTime: Long, dataChange: Boolean)
case class V2SidecarRow(add: Option[V2Add])

/** Round-6 Delta write-path hardening: `deleteWhere` on column-mapped
  * tables (physical-name resolution), protocol-feature MERGING on the
  * DV upgrade (never stomping an existing reader-version-3 feature
  * set), real `add.size` on DV re-adds, spec-required `writerFeatures`
  * in checkpointed protocols, and the streaming (never-buffering)
  * sidecar write exercised with a >100k-row single-file delete. */
class Round6Spec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-r6").toString

  private def writeDataFile(tableDir: String, rel: String,
      df: DataFrame): Unit = {
    val stg = s"${tmp()}/stg"
    df.coalesce(1).write.parquet(stg)
    val fs = new Path(tableDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new Path(stg))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val dst = new Path(tableDir, rel)
    fs.mkdirs(dst.getParent)
    assert(fs.rename(part, dst))
  }

  private def writeCommit(tableDir: String, version: Long,
      actions: Seq[String]): Unit = {
    val dir = new java.io.File(s"$tableDir/_delta_log")
    dir.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(dir, f"$version%020d.json").toPath,
      actions.mkString("", "\n", "\n"))
  }

  private def schemaJson(schema: StructType): String =
    com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .writeValueAsString(schema.json)

  private def metaAction(schema: StructType, partCols: Seq[String],
      configuration: Map[String, String] = Map.empty): String = {
    val conf = configuration.map { case (k, v) => s""""$k":"$v"""" }
      .mkString("{", ",", "}")
    val parts = partCols.map(c => s""""$c"""").mkString("[", ",", "]")
    s"""{"metaData":{"id":"fx","format":{"provider":"parquet","options":{}},"schemaString":${schemaJson(schema)},"partitionColumns":$parts,"configuration":$conf}}"""
  }

  private def addAction(rel: String,
      pv: Map[String, String] = Map.empty, size: Long = 1L): String = {
    val pvs = pv.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    s"""{"add":{"path":"$rel","partitionValues":$pvs,"size":$size,"modificationTime":1,"dataChange":true}}"""
  }

  test("deleteWhere on a column-mapped table resolves physical names") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/tbl"
    def mapped(name: String, phys: String, id: Long, dt: DataType) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putLong("delta.columnMapping.id", id)
        .putString("delta.columnMapping.physicalName", phys).build())
    val schema = StructType(Seq(
      mapped("id", "col-aaa111", 1, LongType),
      mapped("v", "col-bbb222", 2, StringType),
      mapped("p", "col-ppp333", 3, StringType)))
    writeDataFile(dir, "p=x/f1.parquet",
      Seq((1L, "one"), (2L, "two"), (3L, "three"))
        .toDF("col-aaa111", "col-bbb222"))
    writeCommit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaAction(schema, Seq("p"),
        Map("delta.columnMapping.mode" -> "name",
          "delta.columnMapping.maxColumnId" -> "3")),
      addAction("p=x/f1.parquet", Map("col-ppp333" -> "x"))))
    // the predicate names LOGICAL columns (incl. the partition column);
    // a scan by logical names would read nulls and silently no-op
    val c = DeltaLogWriter.deleteWhere(spark, dir,
      col("id") === 2L && col("p") === "x")
    assert(c.numFiles == 1)
    assert(DeltaLogReader.read(spark, dir)
      .as[(Long, String, String)].collect().toSet ==
      Set((1L, "one", "x"), (3L, "three", "x")))
    // the upgrade crossed legacy (2,5) into table features: the implied
    // legacy features are enumerated, not dropped
    val p = DeltaLogReader.snapshot(spark, dir).protocol
    assert(p.minReaderVersion == 3 && p.minWriterVersion == 7)
    assert(p.readerFeatures.contains("columnMapping") &&
      p.readerFeatures.contains("deletionVectors"), p.toString)
    assert(p.writerFeatures.contains("columnMapping") &&
      p.writerFeatures.contains("deletionVectors") &&
      p.writerFeatures.contains("appendOnly"), p.toString)
  }

  test("deleteWhere upgrade merges an existing reader-version-3 feature set") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/tbl"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    writeDataFile(dir, "f1.parquet",
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    writeCommit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["timestampNtz","vacuumProtocolCheck"],"writerFeatures":["timestampNtz","domainMetadata"]}}""",
      metaAction(schema, Nil),
      addAction("f1.parquet")))
    DeltaLogWriter.deleteWhere(spark, dir, col("id") === 1L)
    val p = DeltaLogReader.snapshot(spark, dir).protocol
    assert(p.readerFeatures ==
      Set("timestampNtz", "vacuumProtocolCheck", "deletionVectors"),
      s"existing reader features must survive the upgrade: $p")
    assert(p.writerFeatures ==
      Set("timestampNtz", "domainMetadata", "deletionVectors"),
      s"existing writer features must survive the upgrade: $p")
    assert(DeltaLogReader.read(spark, dir).count() == 2)
  }

  test("DV re-add carries the data file's real size; checkpoint carries writerFeatures") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/tbl"
    DeltaLogWriter.write(
      (0L to 9L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    DeltaLogWriter.deleteWhere(spark, dir, col("id") === 0L)
    val snap = DeltaLogReader.snapshot(spark, dir)
    val f = snap.files.head
    val realLen = fs.getFileStatus(new Path(dir, f.path)).getLen
    assert(f.deletionVector.isDefined)
    assert(f.size == realLen,
      s"add.size must be the data file's byte size (${f.size} vs $realLen)")
    // drive to the v10 checkpoint and replay from it alone
    (2 to 10).foreach { i =>
      DeltaLogWriter.write(Seq((100L + i, "x")).toDF("id", "v"), dir)
    }
    val ckpt = new Path(s"$dir/_delta_log", f"${10L}%020d.checkpoint.parquet")
    assert(fs.exists(ckpt))
    // the spec requires writerFeatures whenever minWriterVersion=7 —
    // conformant engines reject the checkpoint protocol without it
    val protoRow = spark.read.parquet(ckpt.toString)
      .select("protocol.minWriterVersion", "protocol.writerFeatures")
      .where(col("protocol.minWriterVersion").isNotNull).collect().head
    assert(protoRow.getInt(0) == 7)
    assert(protoRow.getSeq[String](1).contains("deletionVectors"),
      s"checkpoint protocol must carry writerFeatures, got $protoRow")
    // checkpointed adds keep real sizes too
    (0L to 9L).foreach(v =>
      fs.delete(new Path(s"$dir/_delta_log", f"$v%020d.json"), false))
    val replayed = DeltaLogReader.snapshot(spark, dir)
    assert(replayed.files.find(_.deletionVector.isDefined).get.size == realLen)
    assert(replayed.protocol.writerFeatures.contains("deletionVectors"))
  }

  test("deleteWhere streams >100k matched rows of one file through the sidecar write") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/tbl"
    val n = 150000L
    DeltaLogWriter.write(
      spark.range(n).select(col("id"), (col("id") % 7).cast("string").as("v"))
        .coalesce(1), dir)
    assert(DeltaLogReader.snapshot(spark, dir).files.size == 1)
    val c = DeltaLogWriter.deleteWhere(spark, dir, col("id") < 120000L)
    assert(c.numFiles == 1)
    val f = DeltaLogReader.snapshot(spark, dir).files.head
    assert(f.deletionVector.exists(_.cardinality == 120000L),
      s"DV cardinality: ${f.deletionVector}")
    val left = DeltaLogReader.read(spark, dir).select("id").as[Long]
    assert(left.count() == n - 120000L)
    assert(left.agg(org.apache.spark.sql.functions.min("id"))
      .head().getLong(0) == 120000L)
    // a second delete merges with the big DV and still streams
    DeltaLogWriter.deleteWhere(spark, dir, col("id") >= 140000L)
    assert(DeltaLogReader.read(spark, dir).count() == 20000L)
  }

  test("delta v2 checkpoint: uuid manifest + sidecars replay; torn sidecars fall back") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/tbl"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    writeDataFile(dir, "f1.parquet", Seq((1L, "a")).toDF("id", "v"))
    writeDataFile(dir, "f2.parquet", Seq((2L, "b")).toDF("id", "v"))
    writeDataFile(dir, "f3.parquet", Seq((3L, "c")).toDF("id", "v"))
    writeCommit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""",
      metaAction(schema, Nil),
      addAction("f1.parquet"), addAction("f2.parquet")))
    writeCommit(dir, 1, Seq(addAction("f3.parquet"),
      """{"remove":{"path":"f1.parquet","deletionTimestamp":1,"dataChange":true}}"""))
    val expect = Set((2L, "b"), (3L, "c"))
    assert(DeltaLogReader.read(spark, dir)
      .as[(Long, String)].collect().toSet == expect)
    // V2 checkpoint at version 1: a uuid-named parquet MANIFEST holding
    // protocol + metaData + two `sidecar` actions; the add actions live
    // in `_delta_log/_sidecars/` parquet files
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(dir, "_delta_log")
    val sideDir = new Path(logDir, "_sidecars")
    fs.mkdirs(sideDir)
    def writeOneParquet[T <: Product : org.apache.spark.sql.Encoder](
        rows: Seq[T], dst: Path): Unit = {
      val stg = s"${tmp()}/stg"
      rows.toDS().coalesce(1).write.parquet(stg)
      val part = fs.listStatus(new Path(stg))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      assert(fs.rename(part, dst))
    }
    writeOneParquet(Seq(
      V2SidecarRow(Some(V2Add("f2.parquet", Map.empty, 1L, 1L, false)))),
      new Path(sideDir, "sc-1.parquet"))
    writeOneParquet(Seq(
      V2SidecarRow(Some(V2Add("f3.parquet", Map.empty, 1L, 1L, false)))),
      new Path(sideDir, "sc-2.parquet"))
    val uuid = java.util.UUID.randomUUID().toString
    writeOneParquet(Seq(
      V2ManifestRow(Some(V2Prot(3, 7, Seq("v2Checkpoint"), Seq("v2Checkpoint"))),
        None, None),
      V2ManifestRow(None, Some(V2Meta("fx", schema.json, Nil)), None),
      V2ManifestRow(None, None, Some(V2Side("sc-1.parquet", 1L, 1L))),
      V2ManifestRow(None, None, Some(V2Side("sc-2.parquet", 1L, 1L)))),
      new Path(logDir, f"${1L}%020d.checkpoint.$uuid.parquet"))
    // vacuum the json tail: replay must come from manifest + sidecars
    fs.delete(new Path(logDir, f"${0L}%020d.json"), false)
    fs.delete(new Path(logDir, f"${1L}%020d.json"), false)
    assert(DeltaLogReader.read(spark, dir)
      .as[(Long, String)].collect().toSet == expect,
      "v2 checkpoint + sidecars must replay to the same snapshot")
    assert(DeltaLogReader.snapshot(spark, dir).protocol
      .readerFeatures.contains("v2Checkpoint"))
    // torn publication: a missing sidecar must SKIP the checkpoint; with
    // no tail left that is a loud failure, not a half-replayed snapshot
    fs.delete(new Path(sideDir, "sc-2.parquet"), false)
    intercept[IllegalArgumentException] {
      DeltaLogReader.snapshot(spark, dir)
    }
  }

  test("iceberg deleteWhere: position-delete files, zero rewrite, v2 upgrade, append carry") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/tbl"
    IcebergWriter.write(
      (0L until 20L).map(i => (i, s"v$i", s"g${i % 2}")).toDF("id", "v", "g")
        .coalesce(1),
      dir, partitionBy = Seq("g"))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Map[String, Long] = {
      val out = Map.newBuilder[String, Long]
      val it = fs.listFiles(new Path(s"$dir/data"), true)
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet") &&
          !st.getPath.getName.startsWith("delete-"))
          out += st.getPath.toString -> st.getModificationTime
      }
      out.result()
    }
    val before = dataFiles()
    val c = IcebergWriter.deleteWhere(spark, dir, col("id") % 5 === 0)
    assert(c.version > 0)
    assert(dataFiles() == before, "data files must stay byte-identical")
    val snap = IcebergReader.snapshot(spark, dir)
    assert(snap.deleteFiles.nonEmpty, "a position-delete file must land")
    def ids(): Set[Long] =
      IcebergReader.read(spark, dir).select("id").as[Long].collect().toSet
    assert(ids() == (0L until 20L).toSet -- Set(0L, 5L, 10L, 15L))
    // the upgrade is format-version 2 with sequence numbers
    val metaDir = new Path(dir, "metadata")
    val latestMeta = fs.listStatus(metaDir).map(_.getPath)
      .filter(_.getName.endsWith(".metadata.json"))
      .maxBy(p => p.getName.stripSuffix(".metadata.json").stripPrefix("v").toLong)
    val metaTxt = {
      val in = fs.open(latestMeta)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    assert(metaTxt.contains("\"format-version\" : 2") ||
      metaTxt.contains("\"format-version\":2"), "metadata must be v2")
    assert(metaTxt.contains("last-sequence-number"))
    // APPEND must carry the delete manifests (content + sequence_number
    // survive the manifest-list re-encode)
    IcebergWriter.write(Seq((20L, "x", "g0")).toDF("id", "v", "g"), dir,
      mode = "append")
    assert(ids() == (0L until 21L).toSet -- Set(0L, 5L, 10L, 15L))
    // a second delete composes (two delete files, (file,pos) dedup)
    IcebergWriter.deleteWhere(spark, dir, col("id") === 1L)
    assert(ids() == (0L until 21L).toSet -- Set(0L, 1L, 5L, 10L, 15L))
    // merge on the deleted table: kept files TARGETED by deletes are
    // rewritten with deletes applied — nothing resurrects
    IcebergWriter.merge(spark, dir,
      Seq((2L, "V2", "g0")).toDF("id", "v", "g"), keys = Seq("id"))
    assert(ids() == (0L until 21L).toSet -- Set(0L, 1L, 5L, 10L, 15L))
    val merged = IcebergReader.read(spark, dir)
      .filter(col("id") === 2L).select("v").as[String].head()
    assert(merged == "V2")
    assert(IcebergReader.snapshot(spark, dir).deleteFiles.isEmpty,
      "merge materializes deletes and drops the stale delete files")
  }

  test("iceberg expire_snapshots: expired files deleted, retained snapshots intact") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/tbl"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def filesOnDisk(suffix: String): Set[String] = {
      val out = Set.newBuilder[String]
      val it = fs.listFiles(new Path(dir), true)
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(suffix)) out += st.getPath.toString
      }
      out.result()
    }
    // snapshot A: ids 0-4; snapshot B: OVERWRITE with 10-14 (A's files
    // become B-unreferenced); snapshot C: append 20
    IcebergWriter.write(
      (0L to 4L).map(i => (i, s"a$i")).toDF("id", "v").coalesce(1), dir)
    val snapA = IcebergReader.snapshot(spark, dir).snapshotId
    IcebergWriter.write(
      (10L to 14L).map(i => (i, s"b$i")).toDF("id", "v").coalesce(1), dir,
      mode = "overwrite")
    val snapB = IcebergReader.snapshot(spark, dir).snapshotId
    IcebergWriter.write(Seq((20L, "c")).toDF("id", "v"), dir, mode = "append")
    val parquetBefore = filesOnDisk(".parquet").size
    assert(IcebergReader.read(spark, dir, Some(snapA)).count() == 5)
    // retention window keeps everything young
    assert(IcebergWriter.expireSnapshots(spark, dir).isEmpty)
    assert(IcebergReader.read(spark, dir, Some(snapA)).count() == 5)
    // zero retention: only the current snapshot survives; A's data files
    // (referenced by nothing retained) and A/B's manifest lists go,
    // B's data files survive because the current snapshot carries them
    val deleted = IcebergWriter.expireSnapshots(spark, dir,
      retentionMs = 0L, retainLast = 1)
    assert(deleted.nonEmpty)
    assert(IcebergReader.read(spark, dir).select("id").as[Long]
      .collect().toSet == Set(10L, 11L, 12L, 13L, 14L, 20L),
      "current read must be untouched")
    intercept[IllegalArgumentException] {
      IcebergReader.read(spark, dir, Some(snapA))
    }
    intercept[IllegalArgumentException] {
      IcebergReader.read(spark, dir, Some(snapB))
    }
    assert(filesOnDisk(".parquet").size < parquetBefore,
      "expired snapshots' data files must be physically deleted")
    // a second expire finds nothing new to delete
    assert(IcebergWriter.expireSnapshots(spark, dir,
      retentionMs = 0L, retainLast = 1).isEmpty)
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(org.apache.spark.sql.functions.input_file_name().as("f"))
      .distinct().collect().map(_.getString(0)).toSet

  test("delta pruned read: partition filters scan only matched files") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/tbl"
    val wide = (0 until 50).map(i => (i.toLong, s"v$i", s"p${i % 5}"))
      .toDF("id", "v", "p")
    DeltaLogWriter.write(wide.repartition(2), dir, partitionBy = Seq("p"))
    val snap = DeltaLogReader.snapshot(spark, dir)
    val p2Files = snap.files.count(_.partitionValues.get("p").flatten.contains("p2"))
    assert(p2Files >= 1 && snap.files.size > p2Files)
    val pruned = DeltaLogReader.read(spark, dir,
      filters = Seq(ScanFilter("p", "=", "p2")))
    assert(scannedFiles(pruned).size == p2Files,
      s"expected only partition p2's $p2Files file(s) scanned")
    assert(pruned.select("id").as[Long].collect().toSet ==
      (0 until 50).filter(_ % 5 == 2).map(_.toLong).toSet)
    // `in` and null-safe exclusion semantics
    val two = DeltaLogReader.read(spark, dir,
      filters = Seq(ScanFilter("p", "in", Seq("p0", "p3"))))
    assert(two.select("p").distinct().as[String].collect().toSet ==
      Set("p0", "p3"))
  }

  test("delta pruned read: add-action stats skip files by min/max") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/tbl"
    // two appends → two files with disjoint id ranges; the writer's
    // footer-derived stats land in each add action
    DeltaLogWriter.write(
      (0L until 100L).map(i => (i, s"a$i")).toDF("id", "v").coalesce(1), dir)
    DeltaLogWriter.write(
      (100L until 200L).map(i => (i, s"b$i")).toDF("id", "v").coalesce(1),
      dir, mode = "append")
    val snap = DeltaLogReader.snapshot(spark, dir)
    assert(snap.files.size == 2 && snap.files.forall(_.stats.isDefined))
    val pruned = DeltaLogReader.read(spark, dir,
      filters = Seq(ScanFilter("id", "<", 50L)))
    assert(scannedFiles(pruned).size == 1,
      "id<50 must touch only the first file's id range")
    assert(pruned.count() == 50)
    // string column stats prune too
    val prunedStr = DeltaLogReader.read(spark, dir,
      filters = Seq(ScanFilter("v", "=", "b150")))
    assert(scannedFiles(prunedStr).size == 1)
    assert(prunedStr.select("id").as[Long].head() == 150L)
    // a filter no file can satisfy never builds a scan, still answers
    assert(DeltaLogReader.read(spark, dir,
      filters = Seq(ScanFilter("id", ">", 10000L))).count() == 0)
  }

  test("iceberg pruned read: manifest lower/upper bounds skip data-column files") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/tbl"
    // two appends → two files with disjoint id/v ranges; the writer puts
    // Appendix-D encoded bounds into each manifest entry
    IcebergWriter.write(
      (0L until 100L).map(i => (i, s"a$i")).toDF("id", "v").coalesce(1), dir)
    IcebergWriter.write(
      (100L until 200L).map(i => (i, s"b$i")).toDF("id", "v").coalesce(1),
      dir, mode = "append")
    val snap = IcebergReader.snapshot(spark, dir)
    assert(snap.files.size == 2)
    assert(snap.files.forall(f =>
      f.lowerBounds.nonEmpty && f.upperBounds.nonEmpty),
      "manifest entries must carry lower/upper bounds")
    // long-column range: only the first file's id interval matches
    val pruned = IcebergReader.read(spark, dir,
      filters = Seq(ScanFilter("id", "<", 50L)))
    assert(scannedFiles(pruned).size == 1,
      "id<50 must open only the first file")
    assert(pruned.count() == 50)
    // string-column equality prunes by the UTF-8 interval
    val byStr = IcebergReader.read(spark, dir,
      filters = Seq(ScanFilter("v", "=", "b150")))
    assert(scannedFiles(byStr).size == 1)
    assert(byStr.select("id").as[Long].head() == 150L)
    // an unsatisfiable range builds no scan at all and still answers
    assert(IcebergReader.read(spark, dir,
      filters = Seq(ScanFilter("id", ">=", 10000L))).count() == 0)
  }

  test("iceberg pruned read: identity and day-transform manifest pruning") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/tbl"
    val rows = (0 until 40).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"1995-03-${1 + i % 8}%02d 12:00:00"),
        s"g${i % 4}")
    }.toDF("id", "ts", "g")
    IcebergWriter.write(rows.repartition(2), dir,
      partitionBy = Seq("day(ts)", "g"))
    val all = IcebergReader.read(spark, dir)
    val allFiles = scannedFiles(all)
    // identity filter: only g=g1 files scanned
    val byG = IcebergReader.read(spark, dir,
      filters = Seq(ScanFilter("g", "=", "g1")))
    val gFiles = scannedFiles(byG)
    assert(gFiles.nonEmpty && gFiles.size < allFiles.size)
    assert(gFiles.forall(_.contains("g=g1")))
    assert(byG.select("id").as[Long].collect().toSet ==
      (0 until 40).filter(_ % 4 == 1).map(_.toLong).toSet)
    // day-transform range: files for days before 03-05 pruned
    val byDay = IcebergReader.read(spark, dir,
      filters = Seq(ScanFilter("ts", ">=", "1995-03-05 00:00:00")))
    val dayFiles = scannedFiles(byDay)
    assert(dayFiles.nonEmpty && dayFiles.size < allFiles.size)
    assert(dayFiles.forall(f => !f.contains("1995-03-01") &&
      !f.contains("1995-03-02") && !f.contains("1995-03-03") &&
      !f.contains("1995-03-04")))
    assert(byDay.count() ==
      all.filter(col("ts") >= "1995-03-05 00:00:00").count())
    // a two-sided range keeps only the boundary days (the `<` bound must
    // conservatively keep its own day — rows before midnight live there)
    val oneDay = IcebergReader.read(spark, dir, filters = Seq(
      ScanFilter("ts", ">=", "1995-03-06 00:00:00"),
      ScanFilter("ts", "<", "1995-03-07 00:00:00")))
    assert(scannedFiles(oneDay).forall(f =>
      f.contains("1995-03-06") || f.contains("1995-03-07")))
    assert(oneDay.count() == all.filter(col("ts").cast("date") === "1995-03-06").count())
  }
}
