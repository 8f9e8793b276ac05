package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.IcebergBucketImpl
import graft.io.{IcebergReader, IcebergTransforms, IcebergWriter}

/** Iceberg partition transforms on write: bucket (murmur3 per the spec,
  * NOT the Athena hash), day/month/year/hour, and the hint/interop
  * hardening from the round-4 advice (monotonic version-hint, avro
  * field-ids). */
class IcebergTransformSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String =
    Files.createTempDirectory("graft-icet").toString + "/t"

  test("murmur3 bucket hash matches the Iceberg spec's Appendix B vectors") {
    assert(IcebergBucketImpl.hashLong(34L) == 2017239379)
    assert(IcebergBucketImpl.hashBytes(
      "iceberg".getBytes("UTF-8")) == 1210000089)
    // date 2017-11-16 = 17486 days; timestamp 2017-11-16T22:31:08 UTC
    assert(IcebergBucketImpl.hashLong(17486L) == -653330422)
    assert(IcebergBucketImpl.hashLong(1510871468000000L) == -2047944441)
  }

  test("transform spec parsing") {
    import IcebergTransforms._
    assert(parse("c") == PartitionField("c", "identity", "c"))
    assert(parse("day(ts)") == PartitionField("ts_day", "day", "ts"))
    assert(parse("bucket(16, id)") == PartitionField("id_bucket", "bucket[16]", "id"))
    assert(parse("month(ts)") == PartitionField("ts_month", "month", "ts"))
  }

  test("bucket(4,id) table: layout, roundtrip, declared spec binds appends") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    val df = (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v")
    IcebergWriter.write(df, dir, partitionBy = Seq("bucket(4, id)"))
    // partition dirs are the spec's bucket ids: (hash & MaxValue) % 4
    val dirs = new java.io.File(s"$dir/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.subsetOf((0 until 4).map(b => s"id_bucket=$b").toSet)
      && dirs.size > 1)
    val expected = (1L to 40L)
      .groupBy(i => (IcebergBucketImpl.hashLong(i) & Int.MaxValue) % 4)
    expected.foreach { case (b, ids) =>
      val inDir = spark.read.parquet(s"$dir/data/id_bucket=$b")
        .select("id").as[Long].collect().toSet
      assert(inDir == ids.toSet, s"bucket $b")
    }
    assert(IcebergReader.read(spark, dir).count() == 40)
    // append without partitionBy inherits the declared bucket spec
    IcebergWriter.write(Seq((41L, "v41")).toDF("id", "v"), dir)
    assert(IcebergReader.read(spark, dir).count() == 41)
    val fields = IcebergReader.partitionFields(spark, dir)
    assert(fields ==
      Seq(IcebergTransforms.PartitionField("id_bucket", "bucket[4]", "id")))
  }

  test("day(ts) table: date-rendered partitions, merge touches only matched days") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    val base = Seq(
      (1L, "2024-03-01 10:00:00", "a"),
      (2L, "2024-03-01 23:59:59", "b"),
      (3L, "2024-03-02 00:00:01", "c"),
      (4L, "2024-03-03 12:00:00", "d"))
      .toDF("id", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    IcebergWriter.write(base, dir, partitionBy = Seq("day(ts)"))
    val dirs = new java.io.File(s"$dir/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("ts_day=2024-03-01", "ts_day=2024-03-02",
      "ts_day=2024-03-03"))
    val before = IcebergReader.snapshot(spark, dir)
    // merge rows on 2024-03-01 only
    val src = Seq((2L, "2024-03-01 23:59:59", "B2"))
      .toDF("id", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    IcebergWriter.merge(spark, dir, src, keys = Seq("id"))
    val after = IcebergReader.snapshot(spark, dir)
    val untouchedBefore = before.files
      .filter(f => f.partition.get("ts_day").exists(_ != "2024-03-01"))
      .map(_.path).toSet
    assert(untouchedBefore.nonEmpty &&
      untouchedBefore.subsetOf(after.files.map(_.path).toSet),
      "untouched day partitions must be carried, not rewritten")
    val got = IcebergReader.read(spark, dir)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "B2", 3L -> "c", 4L -> "d"))
  }

  test("month/year/hour transform columns compute UTC-periods") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq("2024-03-15 07:45:00").toDF("ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    def valOf(spec: String): Int = {
      val f = IcebergTransforms.parse(spec)
      df.select(IcebergTransforms.column(spark, f,
        org.apache.spark.sql.types.TimestampType).cast("int"))
        .as[Int].head()
    }
    assert(valOf("year(ts)") == 54) // 2024 - 1970
    assert(valOf("month(ts)") == 54 * 12 + 2)
    // 2024-03-15 is 19797 days from epoch (19723 at 2024-01-01 + 31 + 29 + 14)
    assert(valOf("hour(ts)") == 19797 * 24 + 7)
  }

  test("a stale or regressed version-hint cannot mislead the reader") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    IcebergWriter.write(Seq((2L, "b")).toDF("id", "v"), dir)
    // sabotage the hint backwards — reader must resolve by listing
    java.nio.file.Files.writeString(
      new java.io.File(s"$dir/metadata/version-hint.text").toPath, "1")
    assert(IcebergReader.read(spark, dir).count() == 2)
    // the next commit restores a monotonic hint
    IcebergWriter.write(Seq((3L, "c")).toDF("id", "v"), dir)
    val hint = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$dir/metadata/version-hint.text").toPath), "UTF-8").trim
    assert(hint.toLong >= 3L)
    assert(IcebergReader.read(spark, dir).count() == 3)
  }

  test("manifest avro schemas carry the spec's field-ids") {
    val spark0 = spark
    import spark0.implicits._
    val dir = tmp()
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "v"), dir,
      partitionBy = Seq("v"))
    val snap = IcebergReader.snapshot(spark, dir)
    val metaDir = new java.io.File(s"$dir/metadata")
    val manifest = metaDir.listFiles().find(_.getName.endsWith("-m0.avro")).get
    val reader = new org.apache.avro.file.DataFileReader[Any](manifest,
      new org.apache.avro.generic.GenericDatumReader[Any]())
    try {
      val sch = reader.getSchema
      assert(sch.getField("status").getObjectProp("field-id") == 0)
      assert(sch.getField("data_file").getObjectProp("field-id") == 2)
      val dfSchema = sch.getField("data_file").schema()
      assert(dfSchema.getField("file_path").getObjectProp("field-id") == 100)
      assert(dfSchema.getField("partition").getObjectProp("field-id") == 102)
      assert(reader.getMetaString("partition-spec") != null)
      assert(reader.getMetaString("schema") != null)
    } finally reader.close()
    // metadata.json exposes the singular v1 partition-spec field
    val metaJson = new String(java.nio.file.Files.readAllBytes(
      metaDir.listFiles().filter(_.getName.endsWith(".metadata.json"))
        .maxBy(_.getName).toPath), "UTF-8")
    assert(metaJson.contains("\"partition-spec\""))
    assert(snap.files.nonEmpty)
  }
}
