package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{DeltaLogReader, DeltaLogWriter}

/** Delta column-mapping WRITE path: rename without rewrite (upgrade to
  * mode=name), physical-name appends, schema evolution with fresh
  * mapping ids, mapped MERGE/OPTIMIZE, configuration surviving
  * checkpoints, and no protocol downgrade on later metaData commits.
  */
class DeltaColumnMappingSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-dcm").toString

  private def conf(dir: String): Map[String, String] =
    DeltaLogReader.snapshot(spark, dir).configuration

  test("renameColumn upgrades to mode=name and keeps old files readable") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), dir)
    DeltaLogWriter.renameColumn(spark, dir, "v", "amount")
    val snap = DeltaLogReader.snapshot(spark, dir)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "amount"))
    assert(conf(dir)("delta.columnMapping.mode") == "name")
    assert(conf(dir)("delta.columnMapping.maxColumnId") == "2")
    assert(snap.protocol.minReaderVersion == 2 &&
      snap.protocol.minWriterVersion == 5)
    // the renamed column keeps its original PHYSICAL name, so the
    // pre-rename parquet resolves without a rewrite
    val out = DeltaLogReader.read(spark, dir)
    assert(out.columns.toSeq == Seq("id", "amount"))
    assert(out.select(sum(col("amount"))).head.getDouble(0) == 30.0)
  }

  test("appends after a rename write PHYSICAL column names") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write(Seq((1L, 10.0)).toDF("id", "v"), dir)
    DeltaLogWriter.renameColumn(spark, dir, "v", "amount")
    DeltaLogWriter.write(Seq((2L, 20.0)).toDF("id", "amount"), dir)
    val out = DeltaLogReader.read(spark, dir)
    assert(out.count() == 2 &&
      out.select(sum(col("amount"))).head.getDouble(0) == 30.0)
    // every data file carries the physical name `v`, never `amount`
    val snap = DeltaLogReader.snapshot(spark, dir)
    snap.files.foreach { f =>
      val cols = spark.read.parquet(s"$dir/${f.path}").columns.toSet
      assert(cols == Set("id", "v"), s"${f.path}: $cols")
    }
  }

  test("schema evolution on a mapped table assigns fresh mapping ids") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write(Seq((1L, 10.0)).toDF("id", "v"), dir)
    DeltaLogWriter.renameColumn(spark, dir, "v", "amount")
    DeltaLogWriter.write(Seq((2L, 20.0, "x")).toDF("id", "amount", "tag"), dir)
    val snap = DeltaLogReader.snapshot(spark, dir)
    val tagField = snap.schema("tag")
    assert(tagField.metadata.getLong("delta.columnMapping.id") == 3L)
    val physName =
      tagField.metadata.getString("delta.columnMapping.physicalName")
    assert(physName.startsWith("col-"))
    assert(conf(dir)("delta.columnMapping.maxColumnId") == "3")
    val out = DeltaLogReader.read(spark, dir).orderBy("id").collect()
    assert(out.map(r => Option(r.getAs[String]("tag"))).toSeq ==
      Seq(None, Some("x"))) // old file reads the new column as null
  }

  test("merge on a mapped partitioned table stays partition-granular") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    val base = Seq((1L, "p1", 1.0), (2L, "p1", 2.0), (3L, "p2", 3.0))
      .toDF("id", "part", "v")
    DeltaLogWriter.write(base, dir, partitionBy = Seq("part"))
    DeltaLogWriter.renameColumn(spark, dir, "part", "region")
    val untouched = DeltaLogReader.snapshot(spark, dir).files
      .filter(_.partitionValues.values.flatten.toSet == Set("p2"))
      .map(_.path).toSet
    assert(untouched.nonEmpty)
    val src = Seq((2L, "p1", 22.0)).toDF("id", "region", "v")
    DeltaLogWriter.merge(spark, dir, src, Seq("id"))
    val snap = DeltaLogReader.snapshot(spark, dir)
    // the p2 partition's file survived the merge untouched
    assert(untouched.subsetOf(snap.files.map(_.path).toSet))
    val out = DeltaLogReader.read(spark, dir).orderBy("id").collect()
    assert(out.map(_.getDouble(2)).toSeq == Seq(1.0, 22.0, 3.0))
    assert(out.map(_.getString(1)).toSeq == Seq("p1", "p1", "p2"))
  }

  test("optimize compacts a mapped table and keeps physical names") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write(Seq((1L, 1.0)).toDF("id", "v"), dir)
    DeltaLogWriter.renameColumn(spark, dir, "v", "amount")
    DeltaLogWriter.write(Seq((2L, 2.0)).toDF("id", "amount"), dir)
    DeltaLogWriter.write(Seq((3L, 3.0)).toDF("id", "amount"), dir)
    val c = DeltaLogWriter.optimize(spark, dir)
    assert(c.numFiles == 1)
    val snap = DeltaLogReader.snapshot(spark, dir)
    assert(snap.files.length == 1)
    assert(spark.read.parquet(s"$dir/${snap.files.head.path}")
      .columns.toSet == Set("id", "v"))
    assert(DeltaLogReader.read(spark, dir)
      .select(sum(col("amount"))).head.getDouble(0) == 6.0)
  }

  test("configuration survives the checkpoint") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write(Seq((0L, 0.0)).toDF("id", "v"), dir) // v0
    DeltaLogWriter.renameColumn(spark, dir, "v", "amount")    // v1
    // v2..v10: cross the checkpoint interval with metaData-free appends
    (2 to 10).foreach(i =>
      DeltaLogWriter.write(Seq((i.toLong, i * 1.0)).toDF("id", "amount"), dir))
    val log = new java.io.File(dir, "_delta_log")
    assert(log.listFiles().exists(_.getName.endsWith(".checkpoint.parquet")))
    // replay from the checkpoint must retain the mapping mode
    assert(conf(dir)("delta.columnMapping.mode") == "name")
    assert(DeltaLogReader.read(spark, dir).count() == 10)
  }

  test("dropColumn hides the column; re-add never resurrects old values") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write(Seq((1L, 10.0, "secret")).toDF("id", "v", "note"),
      dir)
    DeltaLogWriter.dropColumn(spark, dir, "note")
    assert(DeltaLogReader.read(spark, dir).columns.toSeq == Seq("id", "v"))
    // re-adding `note` maps to a FRESH physical column: the old file's
    // dropped values stay invisible
    DeltaLogWriter.write(Seq((2L, 20.0, "fresh")).toDF("id", "v", "note"),
      dir)
    val out = DeltaLogReader.read(spark, dir).orderBy("id").collect()
    assert(out.map(r => Option(r.getAs[String]("note"))).toSeq ==
      Seq(None, Some("fresh")))
    val snap = DeltaLogReader.snapshot(spark, dir)
    assert(snap.schema("note").metadata
      .getString("delta.columnMapping.physicalName").startsWith("col-"))
    assert(snap.schema("note").metadata
      .getLong("delta.columnMapping.id") == 4L)
  }

  test("a later metaData commit never downgrades the protocol") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    DeltaLogWriter.write((1L to 50L).toDF("id").repartition(2), dir)
    DeltaLogWriter.deleteWhere(spark, dir, col("id") % 5 === 0) // DV: 3/7
    // schema evolution emits a metaData action — it must NOT re-declare
    // the baseline protocol over the DV one
    DeltaLogWriter.write(Seq((100L, "x")).toDF("id", "extra"), dir)
    val p = DeltaLogReader.snapshot(spark, dir).protocol
    assert(p.minReaderVersion == 3 && p.minWriterVersion == 7)
    assert(p.readerFeatures.contains("deletionVectors"))
    assert(DeltaLogReader.read(spark, dir).count() == 41)
  }
}
