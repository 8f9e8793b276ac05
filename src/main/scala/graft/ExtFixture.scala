package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{DeltaLogWriter, IcebergWriter}

/** Fixture generator for the EXTERNAL-reader check (`tools/extcheck.py`).
  *
  * Writes a battery of real Delta and Iceberg tables through the engine's
  * writers into `<outDir>/<name>/`, plus a ground-truth parquet dump of
  * each table's expected logical content at `<outDir>/expected/<name>/`.
  * The expected frames are computed DIRECTLY from the input data
  * (evolution/merge/delete semantics applied with plain DataFrame ops) —
  * never by reading the table back through the engine — so an
  * independent, shared-nothing reader (pure Python over duckdb/pyarrow)
  * can verify the on-disk format end to end: log/metadata replay,
  * checkpoint parquet, deletion-vector bitmaps, Avro manifests,
  * position/equality deletes, schema evolution, renames, promotions.
  *
  * Each table exercises one format feature the spec prescribes
  * (delta.io PROTOCOL.md / iceberg.apache.org spec); the external check
  * passing means a non-graft implementation of those specs reconstructs
  * the same rows.
  */
object ExtFixture {

  def main(args: Array[String]): Unit = {
    // ONE positional arg (outDir) — `ExtFixture <sfDir> <outDir>`, the
    // Verify-shaped invocation, would silently spray fixture tables
    // into the testdata directory. Reject it loudly.
    require(args.length <= 1,
      s"usage: graft.ExtFixture [outDir] — got ${args.length} args " +
        "(ExtFixture synthesizes its own data; it takes NO sfDir)")
    val outDir = args.headOption.getOrElse("/tmp/extfix")
    // refuse a directory that already holds parquet tables (a testdata
    // dir, a Verify output) — fixtures always go to a fresh/own dir
    val existing = new java.io.File(outDir).listFiles()
    if (existing != null) {
      val parquet = existing.filter(_.getName.endsWith(".parquet"))
      require(parquet.isEmpty,
        s"$outDir already contains parquet tables " +
          s"(${parquet.take(3).map(_.getName).mkString(", ")}…) — " +
          "refusing to write fixtures into it; pass a fresh directory")
    }
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    write(spark, outDir)
    spark.stop()
  }

  /** Generates every fixture table under `outDir`; returns the names. */
  def write(spark: SparkSession, outDir: String): Seq[String] = {
    import spark.implicits._

    def expected(name: String, df: DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/expected/$name")

    // -- delta_basic: partitioned appends + additive schema evolution ----
    val d1 = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "A", 30.0))
      .toDF("id", "flag", "val")
    val d2 = Seq((4L, "B", 40.0, "x"), (5L, "C", 50.0, "y"))
      .toDF("id", "flag", "val", "extra")
    DeltaLogWriter.write(d1, s"$outDir/delta_basic", partitionBy = Seq("flag"))
    DeltaLogWriter.write(d2, s"$outDir/delta_basic")
    expected("delta_basic",
      d1.withColumn("extra", lit(null).cast("string")).unionByName(d2))

    // -- delta_dv: deletion vectors from a zero-rewrite DELETE -----------
    val dv = (1L to 200L).toDF("id")
      .withColumn("payload", concat(lit("row-"), col("id")))
      .repartition(4)
    DeltaLogWriter.write(dv, s"$outDir/delta_dv")
    DeltaLogWriter.deleteWhere(spark, s"$outDir/delta_dv",
      col("id") % 7 === 0)
    expected("delta_dv", dv.where(col("id") % 7 =!= 0))

    // -- delta_ckpt: enough commits to cross the checkpoint interval -----
    // (v10 writes <v>.checkpoint.parquet + _last_checkpoint; the external
    // reader must replay checkpoint + tail, not just the JSON commits)
    val ckptBatches = (0 until 12).map { b =>
      ((b * 10L) until (b * 10L + 10L)).toDF("id")
        .withColumn("batch", lit(b))
    }
    ckptBatches.foreach(b => DeltaLogWriter.write(b, s"$outDir/delta_ckpt"))
    expected("delta_ckpt", ckptBatches.reduce(_ unionByName _))

    // -- delta_merge: upsert through the staged MERGE path ---------------
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0)).toDF("k", "name", "score")
    val upd = Seq((2L, "B2", 22.0), (5L, "e", 5.0)).toDF("k", "name", "score")
    DeltaLogWriter.write(base, s"$outDir/delta_merge")
    DeltaLogWriter.merge(spark, s"$outDir/delta_merge", upd, Seq("k"))
    expected("delta_merge",
      base.join(upd.select("k"), Seq("k"), "left_anti").unionByName(upd))

    // -- iceberg_basic: identity-partitioned appends + evolution ---------
    val i1 = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "A", 30.0))
      .toDF("id", "flag", "val")
    val i2 = Seq((4L, "B", 40.0, "x"), (5L, "C", 50.0, "y"))
      .toDF("id", "flag", "val", "extra")
    IcebergWriter.write(i1, s"$outDir/iceberg_basic", partitionBy = Seq("flag"))
    IcebergWriter.write(i2, s"$outDir/iceberg_basic")
    expected("iceberg_basic",
      i1.withColumn("extra", lit(null).cast("string")).unionByName(i2))

    // -- iceberg_posdel: zero-rewrite position deletes -------------------
    val ip = (1L to 150L).toDF("id")
      .withColumn("grp", (col("id") % 3).cast("string"))
      .repartition(3)
    IcebergWriter.write(ip, s"$outDir/iceberg_posdel")
    IcebergWriter.deleteWhere(spark, s"$outDir/iceberg_posdel",
      col("id") % 5 === 0)
    expected("iceberg_posdel", ip.where(col("id") % 5 =!= 0))

    // -- iceberg_eqdel: equality-delete upsert ---------------------------
    val ib = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "name", "score")
    val iu = Seq((2L, "B2", 22.0), (4L, "d", 4.0)).toDF("k", "name", "score")
    IcebergWriter.write(ib, s"$outDir/iceberg_eqdel")
    IcebergWriter.upsertByKey(spark, s"$outDir/iceberg_eqdel", iu, Seq("k"))
    expected("iceberg_eqdel",
      ib.join(iu.select("k"), Seq("k"), "left_anti").unionByName(iu))

    // -- iceberg_rename: column rename, then an append under the new name
    val ir = Seq((1L, 100.0), (2L, 200.0)).toDF("id", "val")
    IcebergWriter.write(ir, s"$outDir/iceberg_rename")
    IcebergWriter.renameColumn(spark, s"$outDir/iceberg_rename",
      "val", "amount")
    val ir2 = Seq((3L, 300.0)).toDF("id", "amount")
    IcebergWriter.write(ir2, s"$outDir/iceberg_rename")
    expected("iceberg_rename",
      ir.withColumnRenamed("val", "amount").unionByName(ir2))

    // -- iceberg_promote: int column promoted to long on append ----------
    val pr1 = Seq((1, 10), (2, 20)).toDF("id", "n")
    val pr2 = Seq((3L, 30L), (4L, 4000000000L)).toDF("id", "n")
    IcebergWriter.write(pr1, s"$outDir/iceberg_promote")
    IcebergWriter.write(pr2, s"$outDir/iceberg_promote")
    expected("iceberg_promote",
      pr1.select(col("id").cast("long"), col("n").cast("long"))
        .unionByName(pr2))

    // -- delta_rename: column-mapping rename, appends under physical names
    val dr1 = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "val")
    DeltaLogWriter.write(dr1, s"$outDir/delta_rename")
    DeltaLogWriter.renameColumn(spark, s"$outDir/delta_rename",
      "val", "amount")
    val dr2 = Seq((3L, 30.0, "x")).toDF("id", "amount", "tag")
    DeltaLogWriter.write(dr2, s"$outDir/delta_rename")
    expected("delta_rename",
      dr1.withColumnRenamed("val", "amount")
        .withColumn("tag", lit(null).cast("string")).unionByName(dr2))

    // -- iceberg_specevo: partition-spec evolution mid-table -------------
    // -- delta_v2ckpt: V2 checkpoint (uuid manifest + sidecars) is the
    // ONLY replay source — the pre-checkpoint commit JSON is retention-
    // swept, so a reader that cannot resolve sidecars reads nothing
    val v2a = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0),
      (4L, "c", 4.0)).toDF("id", "g", "v")
    DeltaLogWriter.write(v2a, s"$outDir/delta_v2ckpt", partitionBy = Seq("g"))
    DeltaLogWriter.write(Seq((5L, "b", 5.0)).toDF("id", "g", "v"),
      s"$outDir/delta_v2ckpt")
    DeltaLogWriter.deleteWhere(spark, s"$outDir/delta_v2ckpt",
      col("id") === 3L) // DV rides through the checkpoint
    DeltaLogWriter.checkpointV2(spark, s"$outDir/delta_v2ckpt",
      sidecarMaxActions = 2) // force multiple sidecars
    DeltaLogWriter.cleanupMetadata(spark, s"$outDir/delta_v2ckpt",
      retentionMs = 0L)
    expected("delta_v2ckpt",
      v2a.unionByName(Seq((5L, "b", 5.0)).toDF("id", "g", "v"))
        .where(col("id") =!= 3L))

    // -- delta_cdf: change-data-feed files readable without the engine --
    // v0 seed, v1 enable, v2 MERGE (cdc pre/post/insert), v3 partition
    // DELETE (cdc deletes). The external reader reconstructs the FEED
    // (not the final state) from the cdc actions + _change_data parquet.
    val cb = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
      .toDF("k", "g", "v")
    DeltaLogWriter.write(cb, s"$outDir/delta_cdf", partitionBy = Seq("g"))
    DeltaLogWriter.enableChangeDataFeed(spark, s"$outDir/delta_cdf")
    DeltaLogWriter.merge(spark, s"$outDir/delta_cdf",
      Seq((2L, "b", 22.0), (4L, "c", 4.0)).toDF("k", "g", "v"), Seq("k"))
    DeltaLogWriter.deleteWhere(spark, s"$outDir/delta_cdf", col("g") === "a")
    expected("delta_cdf",
      cb.withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(0L))
        .unionByName(Seq(
          (2L, "b", 2.0, "update_preimage", 2L),
          (2L, "b", 22.0, "update_postimage", 2L),
          (4L, "c", 4.0, "insert", 2L),
          (1L, "a", 1.0, "delete", 3L),
          (3L, "a", 3.0, "delete", 3L))
          .toDF("k", "g", "v", "_change_type", "_commit_version")))

    // -- delta_conv_src + iceberg_converted: zero-rewrite migration —
    // the Iceberg log must resolve the DELTA table's hive-layout files
    // through the name mapping AND fill the identity partition column
    // from the manifest tuple (spec "Column Projection" rule 1)
    val convRows = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5))
      .toDF("id", "g", "v")
    DeltaLogWriter.write(convRows.coalesce(1), s"$outDir/delta_conv_src",
      partitionBy = Seq("g"))
    io.TableMigration.convertDeltaToIceberg(spark,
      s"$outDir/delta_conv_src", s"$outDir/iceberg_converted")
    expected("delta_conv_src", convRows)
    expected("iceberg_converted", convRows)

    val se1 = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "grp", "v")
    IcebergWriter.write(se1, s"$outDir/iceberg_specevo")
    IcebergWriter.updatePartitionSpec(spark, s"$outDir/iceberg_specevo",
      Seq("grp"))
    val se2 = Seq((3L, "a", 3.0), (4L, "c", 4.0)).toDF("id", "grp", "v")
    IcebergWriter.write(se2, s"$outDir/iceberg_specevo")
    expected("iceberg_specevo", se1.unionByName(se2))

    // -- iceberg_v3dv: format-version 3 deletion vectors — two stacked
    // DELETEs, the second SUPERSEDING the first file-by-file (union in
    // one puffin blob per file). The external reader must locate each
    // DV by the manifest triple (referenced_data_file/content_offset/
    // content_size_in_bytes), verify the blob framing + CRC, and decode
    // the keyed portable bitmap — the v3 read path end-to-end.
    val v3 = (1L to 60L).map(i => (i, s"p-$i", (i % 3).toInt))
      .toDF("id", "payload", "grp")
    IcebergWriter.createEmpty(spark, s"$outDir/iceberg_v3dv", v3.schema,
      formatVersion = 3)
    IcebergWriter.write(v3.coalesce(2), s"$outDir/iceberg_v3dv")
    IcebergWriter.deleteWhere(spark, s"$outDir/iceberg_v3dv",
      col("id") % 10 === 0)
    IcebergWriter.deleteWhere(spark, s"$outDir/iceberg_v3dv",
      col("id") % 7 === 0)
    expected("iceberg_v3dv",
      v3.where(col("id") % 10 =!= 0 && col("id") % 7 =!= 0))

    // -- delta_clone: shallow clone — absolute-path adds referencing
    // the SOURCE's files (zero copies), the source's DV carried as an
    // absolute `p` descriptor, then an independent append to the clone
    val cs = (1L to 24L).map(i => (i, s"c-$i")).toDF("id", "v").coalesce(1)
    DeltaLogWriter.write(cs, s"$outDir/delta_clone_src")
    DeltaLogWriter.deleteWhere(spark, s"$outDir/delta_clone_src",
      col("id") % 6 === 0)
    DeltaLogWriter.shallowClone(spark, s"$outDir/delta_clone_src",
      s"$outDir/delta_clone")
    DeltaLogWriter.write(Seq((25L, "c-25")).toDF("id", "v"),
      s"$outDir/delta_clone")
    expected("delta_clone_src", cs.where(col("id") % 6 =!= 0))
    expected("delta_clone",
      cs.where(col("id") % 6 =!= 0)
        .unionByName(Seq((25L, "c-25")).toDF("id", "v")))

    // -- iceberg_v3lineage: v3 row lineage through the UPGRADE path —
    // the pre-v3 manifest has NO entry-level first_row_id, so the
    // external reader must run the spec's INHERITANCE walk (manifest
    // list first_row_id + record_count accumulation); the post-upgrade
    // append carries explicit ids; a DV delete must not shift survivors
    val lin = (1L to 25L).map(i => (i, s"L-$i")).toDF("id", "v")
      .coalesce(1).sortWithinPartitions("id")
    IcebergWriter.write(lin, s"$outDir/iceberg_v3lineage")
    IcebergWriter.setFormatVersion(spark, s"$outDir/iceberg_v3lineage", 3)
    IcebergWriter.write(
      Seq((26L, "L-26"), (27L, "L-27")).toDF("id", "v")
        .coalesce(1).sortWithinPartitions("id"),
      s"$outDir/iceberg_v3lineage")
    IcebergWriter.deleteWhere(spark, s"$outDir/iceberg_v3lineage",
      col("id") % 5 === 0)
    // id assignment order: the append commit's OWN adds take the base
    // range [0,2), the carried pre-v3 manifest is re-stamped after —
    // so batch 2 holds ids 0-1 and batch 1 ids 2-26 (disjoint explicit
    // ranges; the spec constrains uniqueness, not ordering)
    expected("iceberg_v3lineage",
      ((1L to 25L).map(i => (i, s"L-$i", i + 1)) ++
        Seq((26L, "L-26", 0L), (27L, "L-27", 1L)))
        .toDF("id", "v", "_row_id")
        .where(col("id") % 5 =!= 0))

    // -- delta_rowtrack: Row Tracking — baseRowId assignment on append,
    // stability under a DV delete; the external reader recomputes
    // _row_id = baseRowId + physical row index independently
    val rt = (1L to 40L).map(i => (i, s"r-$i")).toDF("id", "v")
      .coalesce(1).sortWithinPartitions("id")
    DeltaLogWriter.write(rt.limit(0), s"$outDir/delta_rowtrack")
    DeltaLogWriter.enableRowTracking(spark, s"$outDir/delta_rowtrack")
    DeltaLogWriter.write(rt, s"$outDir/delta_rowtrack")
    DeltaLogWriter.deleteWhere(spark, s"$outDir/delta_rowtrack",
      col("id") % 4 === 0)
    // compaction must PRESERVE ids through the materialized column
    DeltaLogWriter.write(Seq((41L, "r-41")).toDF("id", "v"),
      s"$outDir/delta_rowtrack")
    DeltaLogWriter.optimize(spark, s"$outDir/delta_rowtrack")
    expected("delta_rowtrack",
      rt.withColumn("_row_id", col("id") - 1)
        .where(col("id") % 4 =!= 0)
        .unionByName(Seq((41L, "r-41", 40L)).toDF("id", "v", "_row_id")))

    // -- iceberg_rwmanifest: rewrite_manifests metadata compaction —
    // three commits (append, eq-upsert, append) collapse their data
    // manifests into ONE; the external reader must honor the rewritten
    // entries' EXPLICIT per-entry sequence numbers (manifest-entry
    // field 3) or the eq-delete re-orders and resurrects the old row
    val rwm = Seq((1L, "old"), (2L, "keep")).toDF("k", "v")
    IcebergWriter.write(rwm, s"$outDir/iceberg_rwmanifest")
    IcebergWriter.upsertByKey(spark, s"$outDir/iceberg_rwmanifest",
      Seq((1L, "new")).toDF("k", "v"), keys = Seq("k"))
    IcebergWriter.write(Seq((3L, "later")).toDF("k", "v"),
      s"$outDir/iceberg_rwmanifest")
    IcebergWriter.rewriteManifests(spark, s"$outDir/iceberg_rwmanifest")
    expected("iceberg_rwmanifest",
      Seq((1L, "new"), (2L, "keep"), (3L, "later")).toDF("k", "v"))

    Seq("delta_basic", "delta_cdf", "delta_ckpt", "delta_conv_src",
      "delta_dv", "delta_merge", "delta_rename", "delta_v2ckpt",
      "iceberg_basic", "iceberg_converted", "iceberg_posdel",
      "iceberg_eqdel", "iceberg_rename", "iceberg_promote",
      "iceberg_specevo", "iceberg_v3dv", "iceberg_v3lineage",
      "iceberg_rwmanifest", "delta_rowtrack", "delta_clone_src",
      "delta_clone")
  }
}
