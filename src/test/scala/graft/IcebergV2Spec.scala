package graft

import java.nio.file.Files
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{IcebergReader, UnsupportedIcebergFeatureException}

/** Iceberg format-version-2 interop: delete manifests are honored (the
  * round-4 verdict's second item — previously a v2 delete manifest was
  * replayed as data, resurrecting deleted rows). Fixtures are
  * hand-committed v2 metadata + avro manifests per iceberg.apache.org/spec. */
class IcebergV2Spec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-icev2").toString

  private val entrySchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int"},
      |  {"name":"snapshot_id","type":["null","long"],"default":null},
      |  {"name":"sequence_number","type":["null","long"],"default":null},
      |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |    {"name":"content","type":"int"},
      |    {"name":"file_path","type":"string"},
      |    {"name":"file_format","type":"string"},
      |    {"name":"partition","type":{"type":"record","name":"r102","fields":[]}},
      |    {"name":"record_count","type":"long"},
      |    {"name":"file_size_in_bytes","type":"long"},
      |    {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}
      |  ]}}
      |]}""".stripMargin)

  private val listSchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string"},
      |  {"name":"manifest_length","type":"long"},
      |  {"name":"partition_spec_id","type":"int"},
      |  {"name":"content","type":"int"},
      |  {"name":"sequence_number","type":["null","long"],"default":null},
      |  {"name":"added_snapshot_id","type":["null","long"],"default":null}
      |]}""".stripMargin)

  private def writeAvro(path: String, schema: org.apache.avro.Schema,
      records: Seq[GenericRecord]): Long = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    try {
      w.create(schema, new java.io.File(path))
      records.foreach(w.append)
    } finally w.close()
    new java.io.File(path).length()
  }

  private def entry(filePath: String, content: Int, rows: Long,
      eqIds: Seq[Int] = Nil): GenericRecord = {
    val df = new GenericData.Record(
      entrySchema.getField("data_file").schema())
    df.put("content", content)
    df.put("file_path", filePath)
    df.put("file_format", "PARQUET")
    df.put("partition", new GenericData.Record(
      df.getSchema.getField("partition").schema()))
    df.put("record_count", rows)
    df.put("file_size_in_bytes", 1L)
    if (eqIds.nonEmpty) {
      val arr = new java.util.ArrayList[Integer]()
      eqIds.foreach(i => arr.add(Int.box(i)))
      df.put("equality_ids", arr)
    }
    val e = new GenericData.Record(entrySchema)
    e.put("status", 1)
    e.put("snapshot_id", 100L)
    e.put("data_file", df)
    e
  }

  private def listEntry(manifestPath: String, len: Long,
      content: Int, seq: Long = 0L): GenericRecord = {
    val m = new GenericData.Record(listSchema)
    m.put("manifest_path", manifestPath)
    m.put("manifest_length", len)
    m.put("partition_spec_id", 0)
    m.put("content", content)
    if (seq > 0) m.put("sequence_number", seq)
    m.put("added_snapshot_id", 100L)
    m
  }

  /** Move a single-file Spark parquet write to `dst`; returns the plain
    * absolute path. */
  private def writeParquet(df: DataFrame, dst: String): String = {
    val stg = s"${tmp()}/stg"
    df.coalesce(1).write.parquet(stg)
    val fs = new Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new Path(stg))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(new Path(dst).getParent)
    assert(fs.rename(part, new Path(dst)))
    dst
  }

  private def metadataJson(dir: String, formatVersion: Int,
      manifestList: String): String =
    s"""{
       |  "format-version": $formatVersion,
       |  "table-uuid": "00000000-0000-0000-0000-000000000001",
       |  "location": "$dir",
       |  "last-updated-ms": 1,
       |  "last-column-id": 2,
       |  "schemas": [{"type":"struct","schema-id":0,"fields":[
       |    {"id":1,"name":"id","required":false,"type":"long"},
       |    {"id":2,"name":"v","required":false,"type":"string"}]}],
       |  "current-schema-id": 0,
       |  "partition-specs": [{"spec-id":0,"fields":[]}],
       |  "default-spec-id": 0,
       |  "properties": {},
       |  "snapshots": [{"snapshot-id":100,"timestamp-ms":1,"schema-id":0,
       |    "summary":{"operation":"append"},
       |    "manifest-list":"$manifestList"}],
       |  "current-snapshot-id": 100,
       |  "snapshot-log": []
       |}""".stripMargin

  /** A v2 table: two data files; optionally a position-delete or
    * equality-delete manifest. Returns the table dir. */
  private def fixture(withDeletes: Boolean, deleteContent: Int = 1,
      formatVersion: Int = 2): String = {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/tbl"
    new java.io.File(s"$dir/metadata").mkdirs()
    new java.io.File(s"$dir/data").mkdirs()
    val fA = writeParquet(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), s"$dir/data/fA.parquet")
    val fB = writeParquet(
      Seq((4L, "d"), (5L, "e"), (6L, "f")).toDF("id", "v"), s"$dir/data/fB.parquet")
    val dataManifest = s"$dir/metadata/m-data.avro"
    val dataLen = writeAvro(dataManifest, entrySchema,
      Seq(entry(fA, 0, 3L), entry(fB, 0, 3L)))
    val listEntries = mutable(dataManifest, dataLen, withDeletes, deleteContent, dir)
    val listPath = s"$dir/metadata/snap-100.avro"
    writeAvro(listPath, listSchema, listEntries)
    java.nio.file.Files.writeString(
      new java.io.File(s"$dir/metadata/v1.metadata.json").toPath,
      metadataJson(dir, formatVersion, listPath))
    java.nio.file.Files.writeString(
      new java.io.File(s"$dir/metadata/version-hint.text").toPath, "1")
    dir
  }

  private def mutable(dataManifest: String, dataLen: Long,
      withDeletes: Boolean, deleteContent: Int,
      dir: String): Seq[GenericRecord] = {
    val spark0 = spark
    import spark0.implicits._
    val base = Seq(listEntry(dataManifest, dataLen, 0))
    if (!withDeletes) return base
    // position-delete file: (file_path, pos) rows deleting fA row 0
    // (id 1) and fB row 2 (id 6)
    val delParquet = writeParquet(
      Seq((s"$dir/data/fA.parquet", 0L), (s"$dir/data/fB.parquet", 2L))
        .toDF("file_path", "pos"),
      s"$dir/data/del-1.parquet")
    val delManifest = s"$dir/metadata/m-del.avro"
    val delLen = writeAvro(delManifest, entrySchema,
      Seq(entry(delParquet, deleteContent, 2L)))
    base :+ listEntry(delManifest, delLen, 1)
  }

  test("v2 position deletes are applied as a row-position anti-join") {
    val spark0 = spark
    import spark0.implicits._
    val dir = fixture(withDeletes = true)
    val snap = IcebergReader.snapshot(spark, dir)
    assert(snap.files.length == 2 && snap.deleteFiles.length == 1)
    val got = IcebergReader.read(spark, dir)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(got == Set(2L, 3L, 4L, 5L))
  }

  test("v2 delete read plan: distributed delete-side scan, one data scan") {
    val dir = fixture(withDeletes = true)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(out) {
      IcebergReader.read(spark, dir).explain("formatted")
    }
    val plan = out.toString
    // exactly two parquet scans: the data file list and the delete file
    // list — both distributed, no driver-side materialization
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(plan).length
    assert(scans == 2, s"expected data + delete scans, got $scans:\n$plan")
    assert(plan.contains("LeftAnti"),
      "position-delete application is an anti-join")
  }

  test("v2 without delete manifests reads all rows") {
    val dir = fixture(withDeletes = false)
    assert(IcebergReader.read(spark, dir).count() == 6)
  }

  test("equality deletes without readable sequence numbers raise") {
    // applying an unsequenced equality delete would silently delete
    // nothing (or the wrong rows) — it must raise, never guess
    val dir = fixture(withDeletes = true, deleteContent = 2)
    val ex = intercept[UnsupportedIcebergFeatureException] {
      IcebergReader.read(spark, dir)
    }
    assert(ex.getMessage.contains("equality"))
  }

  test("equality deletes apply by sequence number — later re-inserts survive") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/tbl"
    new java.io.File(s"$dir/metadata").mkdirs()
    new java.io.File(s"$dir/data").mkdirs()
    // seq 1: (1,a) (2,b) (3,c); seq 2: equality-delete v='b';
    // seq 3: (5,b) re-inserted AFTER the delete — must survive
    val fA = writeParquet(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), s"$dir/data/fA.parquet")
    val fB = writeParquet(Seq((5L, "b")).toDF("id", "v"), s"$dir/data/fB.parquet")
    val del = writeParquet(Seq("b").toDF("v"), s"$dir/data/eq-del.parquet")
    val mA = s"$dir/metadata/m-a.avro"
    val lenA = writeAvro(mA, entrySchema, Seq(entry(fA, 0, 3L)))
    val mDel = s"$dir/metadata/m-del.avro"
    // equality_ids = [2]: field id 2 is "v" in the fixture schema
    val lenDel = writeAvro(mDel, entrySchema,
      Seq(entry(del, 2, 1L, eqIds = Seq(2))))
    val mB = s"$dir/metadata/m-b.avro"
    val lenB = writeAvro(mB, entrySchema, Seq(entry(fB, 0, 1L)))
    val listPath = s"$dir/metadata/snap-100.avro"
    writeAvro(listPath, listSchema, Seq(
      listEntry(mA, lenA, 0, seq = 1L),
      listEntry(mDel, lenDel, 1, seq = 2L),
      listEntry(mB, lenB, 0, seq = 3L)))
    java.nio.file.Files.writeString(
      new java.io.File(s"$dir/metadata/v1.metadata.json").toPath,
      metadataJson(dir, 2, listPath))
    java.nio.file.Files.writeString(
      new java.io.File(s"$dir/metadata/version-hint.text").toPath, "1")
    val snap = IcebergReader.snapshot(spark, dir)
    assert(snap.files.length == 2 && snap.equalityDeleteFiles.length == 1)
    assert(snap.files.map(f => f.path -> f.sequenceNumber).toMap
      .values.toSet == Set(1L, 3L))
    val got = IcebergReader.read(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (3L, "c"), (5L, "b")),
      "id 2 deleted at seq 2; id 5 added at seq 3 survives")
  }

  test("merge/delete on tables carrying delete files are delete-aware, not resurrecting") {
    val spark0 = spark
    import spark0.implicits._
    // position-delete table (ids 1 and 6 deleted): a merge must apply
    // the deletes to its rewrite scan — the round-5 advice's failure
    // mode was re-reading touched files raw and resurrecting both rows
    val dir = fixture(withDeletes = true)
    io.IcebergWriter.merge(spark, dir,
      Seq((2L, "B2"), (7L, "g")).toDF("id", "v"), keys = Seq("id"))
    val got = IcebergReader.read(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "B2"), (3L, "c"), (4L, "d"), (5L, "e"), (7L, "g")),
      s"deleted ids 1 and 6 must stay deleted through a merge: $got")
    assert(IcebergReader.snapshot(spark, dir).deleteFiles.isEmpty,
      "the rewrite materialized the deletes; stale delete files dropped")
    // equality-delete tables: the rewrite paths cannot preserve the
    // sequence-number semantics — they must raise, never guess
    val eqDir = fixture(withDeletes = true, deleteContent = 2)
    intercept[UnsupportedIcebergFeatureException] {
      io.IcebergWriter.merge(spark, eqDir,
        Seq((9L, "z")).toDF("id", "v"), keys = Seq("id"))
    }
    intercept[UnsupportedIcebergFeatureException] {
      io.IcebergWriter.deleteMatched(spark, eqDir,
        Seq(Tuple1(1L)).toDF("id"), keyCols = Seq("id"))
    }
  }

  test("format-version beyond 3 raises instead of guessing") {
    // v3 reads are supported (IcebergV3Spec); v4 does not exist yet and
    // must raise, never guess
    val dir = fixture(withDeletes = false, formatVersion = 4)
    intercept[UnsupportedIcebergFeatureException] {
      IcebergReader.read(spark, dir)
    }
  }
}
