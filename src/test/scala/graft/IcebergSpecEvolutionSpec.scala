package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{IcebergReader, IcebergWriter, TableFormats}

/** Partition-spec evolution (iceberg spec "Partition Evolution"):
  * metadata-only default-spec change, per-spec pruning of mixed-spec
  * snapshots, field-id reuse across history, survival through data
  * commits, old-spec rewrite on merge, and compaction migration.
  */
class IcebergSpecEvolutionSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String =
    Files.createTempDirectory("graft-specevo").toString

  private def mkTable(dir: String): Unit = {
    val spark0 = spark
    import spark0.implicits._
    val b1 = (1L to 60L).map(i => (i, if (i % 2 == 0) "a" else "b", i * 1.0))
      .toDF("id", "grp", "v").coalesce(1)
    IcebergWriter.write(b1, dir) // unpartitioned spec 0
    assert(TableFormats.updateIcebergPartitionSpec(spark, dir,
      Seq("grp")) == 1)
    val b2 = Seq((61L, "a", 61.0), (62L, "b", 62.0), (63L, "c", 63.0))
      .toDF("id", "grp", "v")
    IcebergWriter.write(b2, dir) // identity(grp) spec 1
  }

  test("evolution appends a spec; data commits preserve the history") {
    val dir = tmp()
    mkTable(dir)
    val specs = IcebergReader.partitionSpecsById(spark, dir)
    assert(specs.keySet == Set(0, 1))
    assert(specs(0).isEmpty)
    assert(specs(1).map(f => (f.transform, f.source)) ==
      Seq(("identity", "grp")))
    val snap = IcebergReader.snapshotOpt(spark, dir).get
    assert(snap.defaultSpecId == 1)
    // files report the spec their manifest was committed under
    assert(snap.files.map(_.specId).toSet == Set(0, 1))
  }

  test("mixed-spec read returns every row; filter is exact") {
    val dir = tmp()
    mkTable(dir)
    val all = IcebergReader.read(spark, dir)
    assert(all.count() == 63)
    val a = TableFormats.fromIcebergWhere(spark, dir, col("grp") === "a")
    assert(a.select(sum(col("id"))).head.getLong(0) ==
      (2L to 60L by 2).sum + 61L)
  }

  test("per-spec pruning: new-spec files prune, old-spec files keep") {
    val dir = tmp()
    mkTable(dir)
    // grp='a' scan: the single old-spec file (contains a rows) must be
    // read; of the three new-spec files only the grp=a one may be
    val scanned = TableFormats.fromIcebergWhere(spark, dir,
        col("grp") === "a")
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(scanned.length == 2, s"expected old file + one pruned-in new file, got ${scanned.mkString(", ")}")
    val snap = IcebergReader.snapshotOpt(spark, dir).get
    assert(snap.files.length == 4) // 1 old + 3 new (one per grp)
  }

  test("field-ids are reused for equivalent fields across history") {
    val dir = tmp()
    mkTable(dir)
    // widen the spec: (grp) -> (grp, id) — grp keeps its 1000 id
    assert(TableFormats.updateIcebergPartitionSpec(spark, dir,
      Seq("grp", "id")) == 2)
    val metaFile = new java.io.File(dir + "/metadata").listFiles()
      .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .maxBy(f => f.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt)
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(metaFile)
    def arr(n: com.fasterxml.jackson.databind.JsonNode) =
      (0 until n.size()).map(n.get)
    val specs = arr(meta.get("partition-specs"))
    assert(specs.map(_.get("spec-id").asInt) == Seq(0, 1, 2))
    val byName = arr(specs.find(_.get("spec-id").asInt == 2).get.get("fields"))
      .map(f => f.get("name").asText -> f.get("field-id").asInt).toMap
    assert(byName("grp") == 1000) // reused from spec 1
    assert(byName("id") == 1001)  // fresh, above last-partition-id
    assert(meta.get("last-partition-id").asInt == 1001)
    // evolving BACK to a historical spec reuses its id, appends nothing
    assert(TableFormats.updateIcebergPartitionSpec(spark, dir,
      Seq("grp")) == 1)
  }

  test("merge after evolution rewrites old-spec files into the new spec") {
    val dir = tmp()
    mkTable(dir)
    val spark0 = spark
    import spark0.implicits._
    // id=1 lives in the old unpartitioned file
    val src = Seq((1L, "b", 100.0)).toDF("id", "grp", "v")
    IcebergWriter.merge(spark, dir, src, Seq("id"))
    val snap = IcebergReader.snapshotOpt(spark, dir).get
    assert(snap.files.forall(_.specId == snap.defaultSpecId),
      "old-spec files must be rewritten, not carried into a new-spec manifest")
    val out = IcebergReader.read(spark, dir)
    assert(out.count() == 63)
    assert(out.where(col("id") === 1).select("v").head.getDouble(0) == 100.0)
  }

  test("rewrite_data_files migrates every file to the current spec") {
    val dir = tmp()
    mkTable(dir)
    IcebergWriter.rewriteDataFiles(spark, dir)
    val snap = IcebergReader.snapshotOpt(spark, dir).get
    assert(snap.files.nonEmpty &&
      snap.files.forall(_.specId == snap.defaultSpecId))
    assert(IcebergReader.read(spark, dir).count() == 63)
    // and the hive layout of the migrated files follows the new spec
    val aFiles = TableFormats.fromIcebergWhere(spark, dir,
        col("grp") === "c")
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(aFiles.forall(_.contains("grp=")), aFiles.mkString(", "))
  }

  test("evolving to UNPARTITIONED: old-spec files still prune by grp") {
    val dir = tmp()
    val spark0 = spark
    import spark0.implicits._
    val b1 = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "grp", "v")
    IcebergWriter.write(b1, dir, partitionBy = Seq("grp")) // spec 0
    assert(TableFormats.updateIcebergPartitionSpec(spark, dir, Nil) == 1)
    IcebergWriter.write(Seq((3L, "a", 3.0), (4L, "c", 4.0))
      .toDF("id", "grp", "v"), dir) // flat layout, spec 1
    val out = TableFormats.fromIcebergWhere(spark, dir, col("grp") === "a")
    assert(out.select(sum(col("id"))).head.getLong(0) == 4L)
    // grp='a' scan surfaces rows from BOTH specs: the spec-0 grp=a
    // file pruned in (grp=b pruned out) and the flat spec-1 file
    assert(out.select(input_file_name()).distinct().count() == 2)
    assert(TableFormats.fromIcebergWhere(spark, dir, col("grp") === "b")
      .select("id").head.getLong(0) == 2L)
  }

  test("time travel to a pre-evolution snapshot still reads") {
    val dir = tmp()
    mkTable(dir)
    val first = IcebergReader.history(spark, dir).map(_._1).last // oldest
    val old = IcebergReader.read(spark, dir, asOfSnapshotId = Some(first))
    assert(old.count() == 60)
  }
}
