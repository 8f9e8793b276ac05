package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{DeltaLogReader, DeltaLogWriter}

/** Delta ROW TRACKING (PROTOCOL.md "Row Tracking" + "Domain Metadata"):
  * enablement upgrades the protocol (rowTracking + domainMetadata,
  * feature range), every committed add is assigned a baseRowId range
  * above the delta.rowTracking high watermark, `_row_id` stays stable
  * under appends AND deletion-vector deletes, pre-enablement files
  * surface null until rewritten, and the state survives a V2
  * checkpoint with the commit tail swept. The Delta twin of Iceberg
  * v3 row lineage. */
class DeltaRowTrackingSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-rt").toString

  test("appends assign disjoint id ranges; watermark advances") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp() + "/t"
    DeltaLogWriter.write((1L to 40L).map(i => (i, s"a$i")).toDF("id", "v")
      .coalesce(1).sortWithinPartitions("id"), dir)
    DeltaLogWriter.enableRowTracking(spark, dir)
    val p = DeltaLogReader.snapshot(spark, dir).protocol
    assert(p.minWriterVersion == 7 &&
      Set("rowTracking", "domainMetadata").subsetOf(p.writerFeatures))
    // pre-enablement file: null ids (no backfill, per spec)
    assert(DeltaLogReader.readWithRowIds(spark, dir)
      .filter(col("_row_id").isNotNull).count() == 0)
    DeltaLogWriter.write((41L to 60L).map(i => (i, s"b$i")).toDF("id", "v")
      .coalesce(1).sortWithinPartitions("id"), dir)
    DeltaLogWriter.write((61L to 70L).map(i => (i, s"c$i")).toDF("id", "v")
      .coalesce(1).sortWithinPartitions("id"), dir)
    val rows = DeltaLogReader.readWithRowIds(spark, dir)
      .filter(col("_row_id").isNotNull)
      .select("id", "_row_id", "_row_commit_version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 30)
    assert(rows.map(_._2).toSet == (0L until 30L).toSet,
      "the two tracked appends take [0,20) and [20,30)")
    // each file's ids follow its commit; commit versions differ
    assert(rows.map(_._3).distinct.length == 2)
    val hwm = DeltaLogReader.snapshot(spark, dir)
      .domainMetadata("delta.rowTracking")
    assert(hwm.contains("\"rowIdHighWaterMark\":29"))
  }

  test("deletion-vector deletes keep surviving _row_id values stable") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp() + "/t"
    val df = (1L to 50L).map(i => (i, i * 2.0)).toDF("id", "v")
      .coalesce(1).sortWithinPartitions("id")
    DeltaLogWriter.write(df.limit(0), dir) // declare, then enable, then add
    DeltaLogWriter.enableRowTracking(spark, dir)
    DeltaLogWriter.write(df, dir)
    val before = DeltaLogReader.readWithRowIds(spark, dir)
      .select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before.size == 50 && before.values.toSet == (0L until 50L).toSet)
    DeltaLogWriter.deleteWhere(spark, dir, col("id") % 5 === 0)
    val after = DeltaLogReader.readWithRowIds(spark, dir)
      .select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.size == 40)
    // a DV never shifts the physical index: every survivor keeps its id
    after.foreach { case (id, rid) => assert(rid == before(id)) }
  }

  test("OPTIMIZE preserves _row_id via materialized lineage columns") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp() + "/t"
    val df = (1L to 40L).map(i => (i, s"p$i")).toDF("id", "v")
    DeltaLogWriter.write(df.limit(0), dir)
    DeltaLogWriter.enableRowTracking(spark, dir)
    // two small files + a DV delete: compaction candidates
    DeltaLogWriter.write(df.filter(col("id") <= 20L).coalesce(1)
      .sortWithinPartitions("id"), dir)
    DeltaLogWriter.write(df.filter(col("id") > 20L).coalesce(1)
      .sortWithinPartitions("id"), dir)
    DeltaLogWriter.deleteWhere(spark, dir, col("id") % 6 === 0)
    val before = DeltaLogReader.readWithRowIds(spark, dir)
      .select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    DeltaLogWriter.optimize(spark, dir)
    val snap = DeltaLogReader.snapshot(spark, dir)
    assert(snap.files.size == 1 && snap.files.forall(_.deletionVector.isEmpty),
      "compaction must fold the files and materialize the DV")
    val after = DeltaLogReader.readWithRowIds(spark, dir)
      .select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.size == before.size)
    // identity preserved THROUGH the rewrite (materialized column wins
    // over the compacted file's fresh baseRowId + position)
    after.foreach { case (id, rid) => assert(rid == before(id),
      s"row $id changed _row_id ${before(id)} -> $rid across OPTIMIZE") }
    // and a later DV delete still keeps the survivors stable
    DeltaLogWriter.deleteWhere(spark, dir, col("id") === 1L)
    val later = DeltaLogReader.readWithRowIds(spark, dir)
      .select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    later.foreach { case (id, rid) => assert(rid == before(id)) }
  }

  test("row-tracking state survives a V2 checkpoint with the tail swept") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp() + "/t"
    DeltaLogWriter.write((1L to 20L).map(i => (i, s"a$i")).toDF("id", "v")
      .coalesce(1), dir)
    DeltaLogWriter.enableRowTracking(spark, dir)
    DeltaLogWriter.write((21L to 30L).map(i => (i, s"b$i")).toDF("id", "v")
      .coalesce(1), dir)
    DeltaLogWriter.checkpointV2(spark, dir)
    DeltaLogWriter.cleanupMetadata(spark, dir, retentionMs = 0L)
    val snap = DeltaLogReader.snapshot(spark, dir)
    assert(snap.domainMetadata.get("delta.rowTracking")
      .exists(_.contains("\"rowIdHighWaterMark\":9")))
    val tracked = DeltaLogReader.readWithRowIds(spark, dir)
      .filter(col("_row_id").isNotNull).count()
    assert(tracked == 10)
    // the next append continues above the checkpointed watermark
    DeltaLogWriter.write(Seq((31L, "c")).toDF("id", "v"), dir)
    val ids = DeltaLogReader.readWithRowIds(spark, dir)
      .filter(col("_row_id").isNotNull)
      .select("_row_id").collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 11L).toSet)
  }
}
