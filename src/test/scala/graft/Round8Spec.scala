package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 hardening: schema-adaptive events timestamp decoding (the
  * round-7 regression — testdata regenerated `events.ts` from INT64
  * nanos to native TIMESTAMP(MICROS, NTZ) and the adapter baked in the
  * nanos decode), additive schema evolution on real-format appends, and
  * null-safe MERGE keys.
  */
class Round8Spec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-r8").toString

  // ---- Tables.events: every physical encoding of ts ----------------------

  /** One canonical instant, expressed in all three physical encodings the
    * testdata generator has shipped. 2026-01-02T03:04:05.123456 UTC. */
  private val micros = 1767323045123456L

  test("normalizeTs: int64-nanos encoding decodes to truncated micros") {
    val dir = tmp() + "/ev_nanos"
    val spark0 = spark
    import spark0.implicits._
    // plain INT64 column holding nanos (what nanosAsLong gives for
    // parquet TIMESTAMP(NANOS)); 789 extra nanos must floor away
    Seq(micros * 1000L + 789L).toDF("ts").write.parquet(dir)
    val out = Tables.normalizeTs(spark.read.parquet(dir), "ts")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("normalizeTs: TIMESTAMP_NTZ encoding casts losslessly (UTC session)") {
    val dir = tmp() + "/ev_ntz"
    val spark0 = spark
    import spark0.implicits._
    Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.parquet(dir)
    val raw = spark.read.parquet(dir)
    assert(raw.schema("ts").dataType == TimestampNTZType)
    val out = Tables.normalizeTs(raw, "ts")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("normalizeTs: native TIMESTAMP passes through unchanged") {
    val dir = tmp() + "/ev_utc"
    val spark0 = spark
    import spark0.implicits._
    Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).as("ts")).write.parquet(dir)
    val out = Tables.normalizeTs(spark.read.parquet(dir), "ts")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("normalizeTs: unsupported physical type raises, not silently wrong") {
    val spark0 = spark
    import spark0.implicits._
    val bad = Seq("2026-01-02").toDF("ts")
    val e = intercept[IllegalArgumentException](Tables.normalizeTs(bad, "ts"))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("Tables.events reads the current testdata and ts is TimestampType") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() > 0)
    // a real query over ts must analyze (the exact round-7 failure mode)
    val windows = ev.groupBy(window(col("ts"), "1 hour")).count()
    assert(windows.count() > 0)
  }

  // ---- additive schema evolution on real-format appends -------------------

  import graft.io.{DeltaLogReader, DeltaLogWriter, IcebergReader, IcebergWriter}

  private def idv(rows: (Long, String)*): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("id", "v")
  }

  private def idvx(rows: (Long, String, Double)*): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("id", "v", "score")
  }

  test("delta append evolves additively: old files read new column as null") {
    val dir = tmp() + "/t"
    DeltaLogWriter.write(idv(1L -> "a", 2L -> "b"), dir, mode = "error")
    DeltaLogWriter.write(idvx((3L, "c", 0.5)), dir, mode = "append")
    val out = DeltaLogReader.read(spark, dir)
    assert(out.schema.fieldNames.toSeq == Seq("id", "v", "score"))
    val byId = out.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(byId == Map(1L -> None, 2L -> None, 3L -> Some(0.5)))
    // subset-column append must NOT narrow the declared schema back
    DeltaLogWriter.write(idv(4L -> "d"), dir, mode = "append")
    assert(DeltaLogReader.snapshot(spark, dir).schema.fieldNames.toSeq ==
      Seq("id", "v", "score"))
    assert(DeltaLogReader.read(spark, dir).count() == 4)
  }

  test("delta append: retype raises; schemaEvolution=false raises on new col") {
    val dir = tmp() + "/t"
    DeltaLogWriter.write(idv(1L -> "a"), dir, mode = "error")
    val spark0 = spark
    import spark0.implicits._
    val retyped = Seq((2L, 7)).toDF("id", "v")
    val e1 = intercept[IllegalArgumentException](
      DeltaLogWriter.write(retyped, dir, mode = "append"))
    assert(e1.getMessage.contains("!="))
    val e2 = intercept[IllegalArgumentException](
      DeltaLogWriter.write(idvx((2L, "b", 1.0)), dir, mode = "append",
        schemaEvolution = false))
    assert(e2.getMessage.contains("schemaEvolution=false"))
  }

  test("iceberg append evolves additively with stable field ids") {
    val dir = tmp() + "/t"
    IcebergWriter.write(idv(1L -> "a", 2L -> "b"), dir, mode = "error")
    IcebergWriter.write(idvx((3L, "c", 0.5)), dir, mode = "append")
    val out = IcebergReader.read(spark, dir)
    assert(out.schema.fieldNames.toSeq == Seq("id", "v", "score"))
    val byId = out.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(byId == Map(1L -> None, 2L -> None, 3L -> Some(0.5)))
    // merged schema: existing columns keep ids 1,2; the new one takes 3
    val (schema, _) = IcebergReader.tableInfo(spark, dir)
    assert(schema.fieldNames.toSeq == Seq("id", "v", "score"))
    // an out-of-order append re-aligns to the table's field order, so
    // positional stats/ids cannot silently shift
    val reordered = idvx((4L, "d", 2.5)).select("score", "id", "v")
    IcebergWriter.write(reordered, dir, mode = "append")
    val again = IcebergReader.read(spark, dir)
    assert(again.schema.fieldNames.toSeq == Seq("id", "v", "score"))
    assert(again.filter(col("id") === 4L).head.getDouble(2) == 2.5)
  }

  test("iceberg evolution keeps schema history: time travel resolves the old schema") {
    val dir = tmp() + "/t"
    IcebergWriter.write(idv(1L -> "a"), dir, mode = "error")
    val preEvolution = IcebergReader.snapshot(spark, dir).snapshotId
    IcebergWriter.write(idvx((2L, "b", 0.5)), dir, mode = "append")
    // metadata carries BOTH schemas; the new snapshot is stamped with
    // the new schema-id, the old one keeps resolving schema-id 0
    def latestMeta() = {
      val files = new java.io.File(dir, "metadata").listFiles()
        .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      val f = files.maxBy(
        _.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt)
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
    }
    val meta = latestMeta()
    assert(meta.get("schemas").size == 2)
    assert(meta.get("current-schema-id").asInt == 1)
    assert(meta.get("last-column-id").asInt == 3)
    val oldRead = IcebergReader.read(spark, dir, Some(preEvolution))
    assert(oldRead.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(IcebergReader.read(spark, dir).schema.fieldNames.toSeq ==
      Seq("id", "v", "score"))
    // an identical-schema append reuses the current entry, no growth
    IcebergWriter.write(idvx((3L, "c", 1.5)), dir, mode = "append")
    assert(latestMeta().get("schemas").size == 2)
  }

  test("iceberg append promotes int->long (spec widening), history kept") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp() + "/t"
    IcebergWriter.write(Seq((1, "a")).toDF("n", "v"), dir, mode = "error")
    assert(IcebergReader.read(spark, dir).schema("n").dataType == IntegerType)
    val preEvolution = IcebergReader.snapshot(spark, dir).snapshotId
    // wider incoming promotes the table column in place
    IcebergWriter.write(Seq((5000000000L, "b")).toDF("n", "v"), dir)
    val out = IcebergReader.read(spark, dir)
    assert(out.schema("n").dataType == LongType)
    assert(out.select("n").as[Long].collect().toSet == Set(1L, 5000000000L))
    // stats pruning still works across the promotion (old 4-byte bounds)
    val pruned = IcebergReader.readWhere(spark, dir, col("n") > 4000000000L)
    assert(pruned.count() == 1)
    // promotion keeps schema history: the old snapshot reads as int
    val old = IcebergReader.read(spark, dir, Some(preEvolution))
    assert(old.schema("n").dataType == IntegerType)
    // narrower incoming up-casts, schema unchanged
    IcebergWriter.write(Seq((7, "c")).toDF("n", "v"), dir)
    assert(IcebergReader.read(spark, dir).schema("n").dataType == LongType)
    assert(IcebergReader.read(spark, dir).count() == 3)
  }

  test("delta append: narrower incoming up-casts; wider still raises") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp() + "/t"
    DeltaLogWriter.write(Seq((1L, "a")).toDF("n", "v"), dir, mode = "error")
    DeltaLogWriter.write(Seq((2, "b")).toDF("n", "v"), dir) // int into long
    val out = DeltaLogReader.read(spark, dir)
    assert(out.schema("n").dataType == LongType)
    assert(out.select("n").as[Long].collect().toSet == Set(1L, 2L))
    val dir2 = tmp() + "/t2"
    DeltaLogWriter.write(Seq((1, "a")).toDF("n", "v"), dir2, mode = "error")
    intercept[IllegalArgumentException] { // long into int: no widening
      DeltaLogWriter.write(Seq((5000000000L, "b")).toDF("n", "v"), dir2)
    }
  }

  test("iceberg append: retype raises") {
    val dir = tmp() + "/t"
    IcebergWriter.write(idv(1L -> "a"), dir, mode = "error")
    val spark0 = spark
    import spark0.implicits._
    val retyped = Seq((2L, 7)).toDF("id", "v")
    val e = intercept[IllegalArgumentException](
      IcebergWriter.write(retyped, dir, mode = "append"))
    assert(e.getMessage.contains("!="))
  }

  // ---- null-safe MERGE keys ----------------------------------------------

  private def nullKeyed(rows: (java.lang.Long, String)*): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("id", "v")
  }

  test("MergeOps.upsert matchNulls: null-keyed row upserts exactly once") {
    val dir = tmp()
    graft.io.DatasetWriter.toParquet(
      nullKeyed((Long.box(1L), "a"), (null, "n0")), dir,
      mode = graft.io.DatasetWriter.Overwrite)
    // default: the null key never matches -> duplicates (documented)
    table.MergeOps.upsert(spark, dir, nullKeyed((null, "n1")), Seq("id"))
    val dup = spark.read.parquet(dir)
    assert(dup.filter(col("id").isNull).count() == 2)
    // matchNulls=true: <=> join replaces BOTH accumulated null rows
    table.MergeOps.upsert(spark, dir, nullKeyed((null, "n2")), Seq("id"),
      matchNulls = true)
    val out = spark.read.parquet(dir)
    assert(out.filter(col("id").isNull).count() == 1)
    assert(out.filter(col("id").isNull).head.getString(1) == "n2")
    assert(out.filter(col("id") === 1L).count() == 1)
  }

  test("delta merge matchNulls upserts the null key once") {
    val dir = tmp() + "/t"
    DeltaLogWriter.write(nullKeyed((Long.box(1L), "a"), (null, "n0")), dir, mode = "error")
    DeltaLogWriter.merge(spark, dir, nullKeyed((null, "n1")), Seq("id"),
      matchNulls = true)
    val out = DeltaLogReader.read(spark, dir)
    assert(out.count() == 2)
    assert(out.filter(col("id").isNull).head.getString(1) == "n1")
  }

  test("iceberg merge matchNulls upserts the null key once") {
    val dir = tmp() + "/t"
    IcebergWriter.write(nullKeyed((Long.box(1L), "a"), (null, "n0")), dir, mode = "error")
    IcebergWriter.merge(spark, dir, nullKeyed((null, "n1")), Seq("id"),
      matchNulls = true)
    val out = IcebergReader.read(spark, dir)
    assert(out.count() == 2)
    assert(out.filter(col("id").isNull).head.getString(1) == "n1")
    // and deleteMatched with a null key removes it
    IcebergWriter.deleteMatched(spark, dir, nullKeyed((null, "x")).select("id"),
      Seq("id"), matchNulls = true)
    assert(IcebergReader.read(spark, dir).count() == 1)
  }

  // ---- codec hardening ----------------------------------------------------

  test("decodeWav: 8-bit unsigned WAV measures correct rms/peak") {
    import graft.multimodal.Codecs
    // hand-built RIFF: 8-bit unsigned mono PCM, 4 samples. Unsigned bytes
    // 128±d map to signed d/128; full-scale 255/0 -> ~±1.0
    val samples: Array[Int] = Array(128, 255, 0, 128) // silence, +max, -max, silence
    val dataLen = samples.length
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(8000) // rate, byte rate
      .putShort(1).putShort(8) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.put(s.toByte))
    val info = Codecs.decodeWav(buf.array()).get
    assert(info.sampleRate == 8000 && info.channels == 1 && info.nFrames == 4)
    // peak must be ~full scale; the pre-fix short-reading of byte pairs
    // produced garbage near zero or far over 1.0
    assert(info.peak > 0.95f && info.peak <= 1.01f)
    // rms of {0, +1, -1, 0} = sqrt(2/4) ~ 0.707
    assert(math.abs(info.rms - 0.707f) < 0.02f)
  }

  test("decodeImage: declared-dimension bomb returns None without decoding") {
    import graft.multimodal.Codecs
    // take a real 4x4 PNG and patch IHDR width/height to 100000x100000
    // (declared 10G pixels, payload unchanged), fixing the chunk CRC
    val good = Codecs.encodePng(4, 4)((_, _) => 0x00112233)
    val bomb = good.clone()
    def putInt(off: Int, v: Int): Unit = {
      bomb(off) = (v >>> 24).toByte; bomb(off + 1) = (v >>> 16).toByte
      bomb(off + 2) = (v >>> 8).toByte; bomb(off + 3) = v.toByte
    }
    putInt(16, 100000) // IHDR width (chunk data starts at offset 16)
    putInt(20, 100000) // IHDR height
    val crc = new java.util.zip.CRC32()
    crc.update(bomb, 12, 4 + 13) // chunk type + IHDR payload
    putInt(12 + 4 + 13, crc.getValue.toInt)
    assert(Codecs.decodeImage(bomb).isEmpty)
    assert(Codecs.resizeImage(bomb, 16).isEmpty)
    // and the un-patched original still decodes
    assert(Codecs.decodeImage(good).exists(i => i.width == 4 && i.height == 4))
  }

  test("partitioned upsert keeps unmatched rows of a null-valued partition") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    // partition p=null holds TWO rows; upserting one of them used to
    // overwrite the whole null partition with only the matched row
    val tgt = Seq((1L, "a", Option("x")), (2L, "b", Option.empty[String]),
      (3L, "c", Option.empty[String])).toDF("id", "v", "p")
    graft.io.DatasetWriter.toParquet(tgt, dir,
      mode = graft.io.DatasetWriter.Overwrite, partitionCols = Seq("p"))
    val src = Seq((2L, "B", Option.empty[String])).toDF("id", "v", "p")
    table.MergeOps.upsert(spark, dir, src, Seq("id"), partitionCols = Seq("p"))
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  // ---- connected-components dedup ----------------------------------------

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val spark0 = spark
    import spark0.implicits._
    ops.Dedup.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("connectedComponents: chain folds transitively to one min label") {
    // a signature-key groupBy can never merge this shape: consecutive
    // links are similar, the endpoints are not
    val labels = ccOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(labels == Map(2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("connectedComponents: separate components keep separate labels") {
    val labels = ccOf(Seq((10L, 7L), (7L, 12L), (20L, 21L), (30L, 30L)))
    // (30,30) self-loop is dropped; 30 simply never appears
    assert(labels == Map(10L -> 7L, 12L -> 7L, 21L -> 20L))
  }

  test("connectedComponents: worst-case descending chain converges") {
    // a long path given in the order that maximizes star rounds
    val n = 64L
    val labels = ccOf((1L until n).map(i => (i + 1, i)))
    assert(labels == (2L to n).map(_ -> 1L).toMap)
  }

  test("ccDedup: labels agree with a driver-side union-find at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val got = ops.Dedup.ccDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent reference: collect the same verified LSH edges and
    // union-find them on the driver (corpus is test-sized)
    graft.expr.ArrayMatchCount.register(spark)
    val docs = Tables.documents(spark, sf)
    val edges = ops.Dedup.minhashLsh(spark, sf)
      .where(round(col("est_jaccard") * 12) >= 8)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val want = ids.map(id => id -> find(id)).toMap
    assert(got == want)
  }
}
