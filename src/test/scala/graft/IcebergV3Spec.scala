package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{IcebergReader, IcebergWriter, Puffin}

/** Iceberg FORMAT-VERSION 3 (iceberg spec "Deletion Vectors" + "Row
  * Lineage" + puffin-spec): puffin-framed deletion vectors replacing
  * position-delete files, the at-most-one-DV-per-file invariant with
  * supersede-on-merge, v2→v3 upgrade converting existing pos-delete
  * parquet, compaction materializing DVs, and `_row_id` lineage
  * (explicit assignment + the manifest-list inheritance re-stamp).
  */
class IcebergV3Spec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-v3").toString

  private def conf = spark.sparkContext.hadoopConfiguration

  private def mkV3(dir: String, rows: Long = 100L): Unit = {
    val spark0 = spark
    import spark0.implicits._
    val df = (1L to rows).map(i => (i, s"row-$i", (i % 7).toInt))
      .toDF("id", "payload", "grp")
    IcebergWriter.createEmpty(spark, dir, df.schema, formatVersion = 3)
    IcebergWriter.write(df.coalesce(2), dir)
  }

  test("puffin container roundtrips and validates its CRC") {
    val dir = tmp()
    val p = new Path(dir, "t.puffin")
    val (bytes, card) = Puffin.encodePositions(Iterator(1L, 5L, 9L))
    val located = Puffin.writeDvFile(conf, p,
      Seq(Puffin.DvBlob("/data/f1.parquet", bytes, card)), 42L, 7L)
    assert(located.size == 1)
    val (ref, off, len) = located.head
    assert(ref == "/data/f1.parquet" && off == 4L)
    assert(Puffin.readDv(conf, p, off, len).toSeq == Seq(1L, 5L, 9L))
    val blobs = Puffin.readFooter(conf, p)
    assert(blobs.map(_.blobType) == Seq("deletion-vector-v1"))
    assert(blobs.head.properties("referenced-data-file") == "/data/f1.parquet")
    assert(blobs.head.properties("cardinality") == "3")
    assert(blobs.head.snapshotId == 42L && blobs.head.sequenceNumber == 7L)
    // corrupt one payload byte: the framed CRC must catch it
    val fs = p.getFileSystem(conf)
    val all = {
      val in = fs.open(p)
      try { val b = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
            in.readFully(b); b } finally in.close()
    }
    all(10) = (all(10) ^ 0x1).toByte
    val p2 = new Path(dir, "t2.puffin")
    val out = fs.create(p2); try out.write(all) finally out.close()
    assertThrows[IllegalArgumentException](Puffin.readDv(conf, p2, off, len))
  }

  test("v3 deleteWhere writes a puffin DV — zero data-file rewrite") {
    val dir = tmp()
    mkV3(dir)
    val fs = new Path(dir).getFileSystem(conf)
    val before = IcebergReader.snapshotOpt(spark, dir).get
    val mtimes = before.files.map(f =>
      f.path -> fs.getFileStatus(new Path(f.path)).getModificationTime).toMap
    IcebergWriter.deleteWhere(spark, dir, col("id") % 10 === 0)
    val snap = IcebergReader.snapshotOpt(spark, dir).get
    // data files untouched, no pos-delete parquet, DVs present
    assert(snap.files.map(_.path).toSet == before.files.map(_.path).toSet)
    snap.files.foreach(f => assert(
      fs.getFileStatus(new Path(f.path)).getModificationTime == mtimes(f.path)))
    assert(snap.deleteFiles.isEmpty)
    assert(snap.dvFiles.nonEmpty)
    assert(snap.dvFiles.forall(_.fileFormat == "PUFFIN"))
    assert(snap.dvFiles.forall(f => f.referencedDataFile.isDefined &&
      f.contentOffset.isDefined && f.contentSizeBytes.isDefined))
    val got = IcebergReader.read(spark, dir)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == (1L to 100L).filterNot(_ % 10 == 0).toSet)
    // $files reports the DVs as content=1 PUFFIN entries
    val files = IcebergReader.metadataTable(spark, dir, "$files")
    assert(files.filter(col("file_format") === "PUFFIN" &&
      col("content") === 1).count() == snap.dvFiles.size)
  }

  test("a second delete MERGES into one DV per file (supersede, union)") {
    val dir = tmp()
    mkV3(dir)
    IcebergWriter.deleteWhere(spark, dir, col("id") % 10 === 0)
    IcebergWriter.deleteWhere(spark, dir, col("id") % 7 === 0)
    val snap = IcebergReader.snapshotOpt(spark, dir).get
    // the v3 invariant: at most one DV per referenced data file
    val refs = snap.dvFiles.flatMap(_.referencedDataFile)
    assert(refs.distinct.size == refs.size)
    assert(snap.deleteFiles.isEmpty)
    val got = IcebergReader.read(spark, dir)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == (1L to 100L).filterNot(i => i % 10 == 0 || i % 7 == 0).toSet)
    // cardinality in the DV covers BOTH deletes (the old positions were
    // unioned in, not dropped)
    assert(snap.dvFiles.map(_.recordCount).sum ==
      (1L to 100L).count(i => i % 10 == 0 || i % 7 == 0))
  }

  test("upgrade converts existing position-delete parquet to DVs") {
    val dir = tmp()
    val spark0 = spark
    import spark0.implicits._
    val df = (1L to 80L).map(i => (i, s"v$i")).toDF("id", "v")
    IcebergWriter.write(df.coalesce(2), dir)
    IcebergWriter.deleteWhere(spark, dir, col("id") <= 10)  // v2 pos parquet
    val v2 = IcebergReader.snapshotOpt(spark, dir).get
    assert(v2.deleteFiles.nonEmpty && v2.dvFiles.isEmpty)
    IcebergWriter.setFormatVersion(spark, dir, 3)
    assert(IcebergReader.formatVersion(spark, dir) == 3)
    val v3 = IcebergReader.snapshotOpt(spark, dir).get
    assert(v3.deleteFiles.isEmpty && v3.dvFiles.nonEmpty)
    assert(IcebergReader.read(spark, dir).count() == 70)
    // a later delete keeps the DV-only state
    IcebergWriter.deleteWhere(spark, dir, col("id") === 15)
    val v3b = IcebergReader.snapshotOpt(spark, dir).get
    assert(v3b.deleteFiles.isEmpty)
    assert(IcebergReader.read(spark, dir).count() == 69)
  }

  test("rewrite_data_files materializes DVs back into plain data files") {
    val dir = tmp()
    mkV3(dir)
    IcebergWriter.deleteWhere(spark, dir, col("id") <= 20)
    IcebergWriter.rewriteDataFiles(spark, dir)
    val snap = IcebergReader.snapshotOpt(spark, dir).get
    assert(snap.dvFiles.isEmpty && snap.deleteFiles.isEmpty)
    val got = IcebergReader.read(spark, dir)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == (21L to 100L).toSet)
  }

  test("row lineage: appends assign disjoint _row_id ranges, stable across commits") {
    val dir = tmp()
    val spark0 = spark
    import spark0.implicits._
    val b1 = (1L to 50L).map(i => (i, s"a$i")).toDF("id", "v")
    IcebergWriter.createEmpty(spark, dir, b1.schema, formatVersion = 3)
    IcebergWriter.write(b1.coalesce(2), dir)
    val l1 = IcebergReader.readWithLineage(spark, dir)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(l1.values.toSet == (0L until 50L).toSet)
    IcebergWriter.write(Seq((51L, "b"), (52L, "b")).toDF("id", "v"), dir)
    val l2 = IcebergReader.readWithLineage(spark, dir)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    // old rows keep their ids; new rows take the next range
    assert((1L to 50L).forall(i => l2(i) == l1(i)))
    assert(Set(l2(51L), l2(52L)) == Set(50L, 51L))
    // next-row-id advanced past every assignment
    val meta = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$dir/metadata").listFiles()
        .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
        .maxBy(_.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt)
        .toPath))
    assert(meta.contains("\"next-row-id\" : 52"))
  }

  test("upgrade re-stamps pre-lineage manifests on the next commit") {
    val dir = tmp()
    val spark0 = spark
    import spark0.implicits._
    val b1 = (1L to 30L).map(i => (i, s"a$i")).toDF("id", "v")
    IcebergWriter.write(b1.coalesce(1), dir) // v1 table, no lineage
    IcebergWriter.setFormatVersion(spark, dir, 3)
    // metadata-only upgrade: the old manifest has no first_row_id yet
    assert(IcebergReader.snapshotOpt(spark, dir).get
      .files.forall(_.firstRowId.isEmpty))
    IcebergWriter.write(Seq((31L, "b")).toDF("id", "v"), dir)
    val lineage = IcebergReader.readWithLineage(spark, dir)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    // every row — pre-upgrade included — now has a distinct id
    assert(lineage.size == 31 && lineage.values.toSet.size == 31)
  }

  test("column defaults: initial-default fills pre-existence files, " +
      "write-default fills absent input, stored nulls stay null") {
    val dir = tmp()
    val spark0 = spark
    import spark0.implicits._
    val b1 = (1L to 10L).map(i => (i, s"a$i")).toDF("id", "v")
    IcebergWriter.createEmpty(spark, dir, b1.schema, formatVersion = 3)
    IcebergWriter.write(b1, dir)
    IcebergWriter.addColumn(spark, dir, "score",
      org.apache.spark.sql.types.IntegerType, initialDefault = Some(7))
    // pre-existing rows read the default, not null
    val r1 = IcebergReader.read(spark, dir)
      .select("id", "score").as[(Long, Int)].collect().toMap
    assert(r1.size == 10 && r1.values.forall(_ == 7))
    // explicit values (incl. a stored NULL) are never overridden
    val b2 = Seq((11L, "b", Some(3)), (12L, "b", None))
      .toDF("id", "v", "score")
    IcebergWriter.write(b2, dir)
    val r2 = IcebergReader.read(spark, dir)
      .select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    assert(r2(11L).contains(3) && r2(12L).isEmpty && r2(1L).contains(7))
    // an append LACKING the column fills the write-default
    IcebergWriter.write(Seq((13L, "c")).toDF("id", "v"), dir)
    val r3 = IcebergReader.read(spark, dir)
      .select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    assert(r3(13L).contains(7) && r3.size == 13)
    // guards: REQUIRED without a default on a non-empty table; pre-v3
    intercept[IllegalArgumentException] {
      IcebergWriter.addColumn(spark, dir, "must",
        org.apache.spark.sql.types.LongType, required = true)
    }
    val v1dir = tmp()
    IcebergWriter.write(b1, v1dir)
    intercept[IllegalArgumentException] {
      IcebergWriter.addColumn(spark, v1dir, "score",
        org.apache.spark.sql.types.IntegerType, initialDefault = Some(1))
    }
  }

  test("equality-delete upserts still work on a v3 table") {
    val dir = tmp()
    mkV3(dir, rows = 40L)
    val spark0 = spark
    import spark0.implicits._
    val src = Seq((1L, "UPDATED", 0), (41L, "NEW", 1))
      .toDF("id", "payload", "grp")
    IcebergWriter.upsertByKey(spark, dir, src, Seq("id"))
    val got = IcebergReader.read(spark, dir)
      .select("id", "payload").as[(Long, String)].collect().toMap
    assert(got(1L) == "UPDATED" && got(41L) == "NEW" && got.size == 41)
  }
}
