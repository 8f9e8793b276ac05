package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{DeltaLogReader, DeltaLogWriter, IcebergReader, IcebergWriter}
import graft.ops.Curation

/** Round-7 hardening: enforced upsert determinism, driver-bounded Delta
  * timestamp resolution, parameterized token-shard bucket width,
  * checkpoint writer-feature derivation, and data-manifest
  * format-version consistency on already-v2 Iceberg tables. */
class Round7Spec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-r7").toString

  private def df(rows: (Long, String, String)*): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("id", "v", "p")
  }

  test("upsertByKey pins a nondeterministic source: delete keys match written rows") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x"), (2L, "b", "y")), dir, mode = "error")
    // keys are RANDOM but row-unique (disjoint million-ranges per row) —
    // without the localCheckpoint pin the second evaluation of src would
    // draw different keys and the equality-delete file would disagree
    // with the data files (silent row loss / survival)
    val src = spark.range(5).select(
      (col("id") * 1000000L + (rand() * 999999).cast("long") + 10L).as("id"),
      lit("n").as("v"), lit("x").as("p"))
    IcebergWriter.upsertByKey(spark, dir, src, keys = Seq("id"))
    val snap = IcebergReader.snapshot(spark, dir)
    val written = IcebergReader.read(spark, dir)
      .select("id").collect().map(_.getLong(0)).toSet -- Set(1L, 2L)
    assert(written.size == 5)
    val delIds = spark.read
      .parquet(snap.equalityDeleteFiles.map(_.path): _*)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(delIds == written,
      "equality-delete keys must match the rows the same commit wrote")
    // and a deterministic source still round-trips exactly
    IcebergWriter.upsertByKey(spark, dir, df((1L, "a2", "x")), Seq("id"))
    val m = IcebergReader.read(spark, dir).select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "a2" && m(2L) == "b")
  }

  test("tokenShards: shard assignment invariant to bucket prefix width") {
    val budget = 64L
    val p2 = Curation.tokenShards(spark, sf, budget).cache()
    try {
      val p3 = Curation.tokenShards(spark, sf, budget, prefixLen = 3)
      assert(p2.except(p3).count() == 0 && p3.except(p2).count() == 0,
        "buckets are contiguous ranges of the same global order, so the " +
          "prefix width must not change any shard id")
      val p1 = Curation.tokenShards(spark, sf, budget, prefixLen = 1)
      assert(p2.except(p1).count() == 0 && p1.except(p2).count() == 0)
    } finally p2.unpersist()
    intercept[IllegalArgumentException] {
      Curation.tokenShards(spark, sf, budget, prefixLen = 0)
    }
    // the bucket-total collect is 16^prefixLen rows: 5+ would leave
    // "driver-side metadata" unbounded (16^8 ≈ 4.3e9 rows), so the
    // guard caps at 4 (65 536 buckets — enough for 100 TB)
    intercept[IllegalArgumentException] {
      Curation.tokenShards(spark, sf, budget, prefixLen = 5)
    }
  }

  test("delta timestamp resolution reads O(commits) lines, not O(log bytes)") {
    val dir = tmp()
    val logDir = new java.io.File(dir, "_delta_log")
    logDir.mkdirs()
    // synthetic 1k-commit log, each commit 1 commitInfo line + 100 adds:
    // resolution must scan ONE line per commit, not slurp 101k lines
    val nCommits = 1000
    val baseTs = 1000000L
    (0 until nCommits).foreach { v =>
      val sb = new StringBuilder
      sb.append(s"""{"commitInfo":{"timestamp":${baseTs + v * 1000L},"operation":"WRITE"}}""").append('\n')
      (0 until 100).foreach { i =>
        sb.append(s"""{"add":{"path":"part-$v-$i.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}""").append('\n')
      }
      java.nio.file.Files.write(
        new java.io.File(logDir, f"$v%020d.json").toPath,
        sb.toString.getBytes("UTF-8"))
    }
    assert(DeltaLogReader.versionAtTimestamp(spark, dir,
      baseTs + 500 * 1000L + 1) == 500L)
    assert(DeltaLogReader.versionAtTimestamp(spark, dir,
      baseTs + (nCommits - 1) * 1000L) == (nCommits - 1).toLong)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    (0 until nCommits by 137).foreach { v =>
      val (ts, scanned) = DeltaLogReader.commitInfoTimestamp(fs,
        new java.io.File(logDir, f"$v%020d.json").toString)
      assert(ts.contains(baseTs + v * 1000L))
      assert(scanned == 1L, s"commit $v: scanned $scanned lines, want 1")
    }
  }

  test("checkpoint writerFeatures fallback: legacy + reader-writer, not a readerFeatures copy") {
    val dir = tmp()
    DeltaLogWriter.write(df((1L, "a", "x")), dir)
    // hand the table a protocol an external writer could leave behind:
    // table-features writer version with readerFeatures only (malformed
    // per spec — the checkpoint must repair, not copy readerFeatures)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val v0 = new Path(dir, f"_delta_log/${0L}%020d.json")
    val txt = new String(
      org.apache.commons.io.IOUtils.toByteArray(fs.open(v0)), "UTF-8")
    val upgraded = txt.replaceAll(
      """\{"protocol":\{[^}]*\}\}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}""")
    assert(upgraded != txt, "v0 must carry a protocol line to rewrite")
    val out = fs.create(v0, true)
    out.write(upgraded.getBytes("UTF-8")); out.close()
    // ten appends roll the version to 10 -> checkpoint
    (1 to 10).foreach(i =>
      DeltaLogWriter.write(df((i + 10L, "b", "x")), dir, mode = "append"))
    val ckpt = s"$dir/_delta_log/${"%020d".format(10)}.checkpoint.parquet"
    val proto = spark.read.parquet(ckpt)
      .where(col("protocol").isNotNull)
      .select("protocol.writerFeatures").collect()
    assert(proto.length == 1)
    val feats = proto.head.getSeq[String](0).toSet
    // legacy writer features implied by the pre-features versions plus
    // the reader-writer feature actually present — NOT just a copy of
    // readerFeatures (which a future reader-only feature would poison)
    assert(feats.contains("appendOnly") && feats.contains("invariants"),
      s"legacy writer features missing from $feats")
    assert(feats.contains("deletionVectors"))
    // the table still reads, checkpointed protocol intact
    assert(DeltaLogReader.read(spark, dir).count() == 11)
  }

  test("delta metadata retention: log bounded below the checkpoint floor") {
    val dir = tmp()
    DeltaLogWriter.write(df((0L, "a", "x")), dir)
    (1 to 12).foreach(i =>
      DeltaLogWriter.write(df((i.toLong, "b", "x")), dir, mode = "append"))
    val logDir = new java.io.File(dir, "_delta_log")
    def commitVersions: Set[Long] = logDir.listFiles().map(_.getName)
      .collect { case n if n.matches("""\d{20}\.json""") =>
        n.stripSuffix(".json").toLong }.toSet
    assert(commitVersions == (0L to 12L).toSet)
    // inside the (default 30-day) retention window nothing is swept
    assert(DeltaLogWriter.cleanupMetadata(spark, dir).isEmpty)
    assert(commitVersions == (0L to 12L).toSet)
    Thread.sleep(50)
    val deleted = DeltaLogWriter.cleanupMetadata(spark, dir, retentionMs = 0L)
    assert(deleted.nonEmpty)
    // commits below the version-10 checkpoint floor are gone; the
    // checkpoint and its pointer survive
    assert(commitVersions == (10L to 12L).toSet)
    assert(new java.io.File(logDir,
      f"${10L}%020d.checkpoint.parquet").exists())
    assert(new java.io.File(logDir, "_last_checkpoint").exists())
    // reads at and above the floor replay exactly as before
    assert(DeltaLogReader.read(spark, dir).count() == 13)
    assert(DeltaLogReader.snapshot(spark, dir, Some(10L)).files.length == 11)
    assert(DeltaLogReader.snapshot(spark, dir, Some(12L)).files.length == 13)
    // history below the floor raises loudly, never guesses
    intercept[IllegalArgumentException] {
      DeltaLogReader.snapshot(spark, dir, Some(5L))
    }
    // second sweep finds nothing (idempotent)
    assert(DeltaLogWriter.cleanupMetadata(spark, dir, retentionMs = 0L).isEmpty)
  }

  test("delta metadata retention protects sidecars of retained v2 checkpoints") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp() + "/tbl"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def writeDataFile(rel: String, rows: DataFrame): Unit = {
      val stg = tmp() + "/stg"
      rows.coalesce(1).write.parquet(stg)
      val part = fs.listStatus(new Path(stg))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      val dst = new Path(dir, rel)
      fs.mkdirs(dst.getParent)
      assert(fs.rename(part, dst))
    }
    def writeCommit(version: Long, actions: Seq[String]): Unit =
      java.nio.file.Files.writeString(
        new java.io.File(s"$dir/_delta_log", f"$version%020d.json").toPath,
        actions.mkString("", "\n", "\n"))
    def add(rel: String) =
      s"""{"add":{"path":"$rel","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""
    (1 to 4).foreach(i =>
      writeDataFile(s"f$i.parquet", Seq((i.toLong, s"v$i")).toDF("id", "v")))
    new java.io.File(s"$dir/_delta_log").mkdirs()
    val schemaStr = com.fasterxml.jackson.databind.json.JsonMapper.builder()
      .build().writeValueAsString(schema.json)
    writeCommit(0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""",
      s"""{"metaData":{"id":"fx","format":{"provider":"parquet","options":{}},"schemaString":$schemaStr,"partitionColumns":[],"configuration":{}}}""",
      add("f1.parquet"), add("f2.parquet")))
    writeCommit(1, Seq(add("f3.parquet")))
    // v2 checkpoint at version 1: uuid manifest + two sidecars, plus an
    // ORPHAN sidecar nothing references
    val logDir = new Path(dir, "_delta_log")
    val sideDir = new Path(logDir, "_sidecars")
    fs.mkdirs(sideDir)
    def writeOneParquet[T <: Product : org.apache.spark.sql.Encoder](
        rows: Seq[T], dst: Path): Unit = {
      val stg = tmp() + "/stg"
      rows.toDS().coalesce(1).write.parquet(stg)
      val part = fs.listStatus(new Path(stg))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      assert(fs.rename(part, dst))
    }
    writeOneParquet(Seq(
      V2SidecarRow(Some(V2Add("f1.parquet", Map.empty, 1L, 1L, false))),
      V2SidecarRow(Some(V2Add("f2.parquet", Map.empty, 1L, 1L, false)))),
      new Path(sideDir, "sc-1.parquet"))
    writeOneParquet(Seq(
      V2SidecarRow(Some(V2Add("f3.parquet", Map.empty, 1L, 1L, false)))),
      new Path(sideDir, "sc-2.parquet"))
    writeOneParquet(Seq(
      V2SidecarRow(Some(V2Add("f9.parquet", Map.empty, 1L, 1L, false)))),
      new Path(sideDir, "sc-orphan.parquet"))
    val uuid = java.util.UUID.randomUUID().toString
    writeOneParquet(Seq(
      V2ManifestRow(Some(V2Prot(3, 7, Seq("v2Checkpoint"), Seq("v2Checkpoint"))),
        None, None),
      V2ManifestRow(None, Some(V2Meta("fx", schema.json, Nil)), None),
      V2ManifestRow(None, None, Some(V2Side("sc-1.parquet", 1L, 1L))),
      V2ManifestRow(None, None, Some(V2Side("sc-2.parquet", 1L, 1L)))),
      new Path(logDir, f"${1L}%020d.checkpoint.$uuid.parquet"))
    writeCommit(2, Seq(add("f4.parquet")))
    Thread.sleep(50)
    val deleted = DeltaLogWriter.cleanupMetadata(spark, dir, retentionMs = 0L)
    // commit 0 (below the v1 checkpoint floor) and the orphan sidecar
    // are swept; the referenced sidecars and the manifest survive
    assert(deleted.exists(_.endsWith(f"${0L}%020d.json")))
    assert(deleted.exists(_.endsWith("sc-orphan.parquet")))
    assert(fs.exists(new Path(sideDir, "sc-1.parquet")))
    assert(fs.exists(new Path(sideDir, "sc-2.parquet")))
    assert(fs.exists(new Path(logDir,
      f"${1L}%020d.checkpoint.$uuid.parquet")))
    assert(!fs.exists(new Path(logDir, f"${0L}%020d.json")))
    // replay = v2 checkpoint (via its protected sidecars) + commit 2
    assert(DeltaLogReader.read(spark, dir)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "v1"), (2L, "v2"), (3L, "v3"), (4L, "v4")))
    intercept[IllegalArgumentException] {
      DeltaLogReader.snapshot(spark, dir, Some(0L))
    }
  }

  test("iceberg: append to an already-v2 table labels its data manifest v2") {
    val dir = tmp()
    IcebergWriter.write(df((1L, "a", "x"), (2L, "b", "y")), dir, mode = "error")
    // the eq-delete upsert upgrades the table to format-version 2
    IcebergWriter.upsertByKey(spark, dir, df((2L, "b2", "y")), Seq("id"))
    // a plain append (no delete files) must still label its data
    // manifest format-version=2 — manifest headers and metadata agree
    IcebergWriter.write(df((3L, "c", "x")), dir, mode = "append")
    val metaDir = new java.io.File(s"$dir/metadata")
    val newest = metaDir.listFiles().filter(_.getName.endsWith("-m0.avro"))
      .maxBy(_.lastModified())
    val reader = new org.apache.avro.file.DataFileReader[Any](newest,
      new org.apache.avro.generic.GenericDatumReader[Any]())
    try assert(reader.getMetaString("format-version") == "2")
    finally reader.close()
    val m = IcebergReader.read(spark, dir).select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }
}
