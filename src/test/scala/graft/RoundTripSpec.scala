package graft

import java.nio.file.Files
import java.sql.{Date, Timestamp}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{DatasetReader, DatasetWriter}

/** FIXTURES §1/§2: the canonical mixed-type frame (reference
  * `tests/_utils.py:120-186` get_df / get_df_list) round-tripped through
  * the dataset writer/reader with exact schema + value assertions — the
  * `ensure_data_types` oracle re-expressed on Spark types.
  */
class RoundTripSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-rt").toString

  private val mixedSchema = StructType(Seq(
    StructField("iint8", ByteType), StructField("iint16", ShortType),
    StructField("iint32", IntegerType), StructField("iint64", LongType),
    StructField("float", FloatType), StructField("ddouble", DoubleType),
    StructField("decimal", DecimalType(3, 2)),
    StructField("string", StringType),
    StructField("date", DateType), StructField("timestamp", TimestampType),
    StructField("bool", BooleanType), StructField("binary", BinaryType),
    StructField("list", ArrayType(LongType)),
    StructField("list_list", ArrayType(ArrayType(LongType))),
    StructField("par0", LongType), StructField("par1", StringType)))

  /** Every column nullable with at least one null (except partitions),
    * mirroring get_df. */
  private def mixedRows = Seq(
    Row(1.toByte, 1.toShort, 1, 1L, 0.0f, 0.0,
      new java.math.BigDecimal("1.99"), "foo",
      Date.valueOf("2020-01-01"), Timestamp.valueOf("2020-01-01 00:00:00"),
      true, "0".getBytes, Seq(1L, 2L), Seq(Seq(1L, 2L), Seq(3L)),
      1L, "a"),
    Row(null, null, null, null, null, null, null, null, null, null, null,
      null, null, null, 1L, "b"),
    Row(2.toByte, 2.toShort, 2, 2L, 1.1f, 1.1,
      new java.math.BigDecimal("1.90"), "boo",
      Date.valueOf("2020-01-02"), Timestamp.valueOf("2020-01-02 00:00:01"),
      false, "1".getBytes, Seq(3L, 4L), Seq(Seq(4L)), 2L, "b"))

  private def mixedDf = spark.createDataFrame(
    spark.sparkContext.parallelize(mixedRows), mixedSchema)

  test("parquet dataset round-trip preserves every type exactly") {
    val dir = tmp()
    DatasetWriter.toParquet(mixedDf, dir, mode = DatasetWriter.Overwrite,
      partitionCols = Seq("par0", "par1"))
    val back = DatasetReader.readParquet(spark, dir)
    // partition values come back through Spark's path-value inference:
    // par0=1 re-attaches as int (the reference re-attaches as categorical
    // strings — both are directory-metadata recoveries, documented choice)
    val expectedTypes = mixedSchema.fields.map(f => f.name -> f.dataType).toMap
      .updated("par0", IntegerType)
    back.schema.fields.foreach { f =>
      assert(f.dataType == expectedTypes(f.name),
        s"${f.name}: ${f.dataType} != ${expectedTypes(f.name)}")
    }
    assert(back.count() == 3)
    // value fidelity on the non-null row
    val r = back.filter(col("string") === "foo").head()
    assert(r.getAs[Byte]("iint8") == 1.toByte)
    assert(r.getAs[java.math.BigDecimal]("decimal")
      .compareTo(new java.math.BigDecimal("1.99")) == 0)
    assert(r.getAs[Timestamp]("timestamp") ==
      Timestamp.valueOf("2020-01-01 00:00:00"))
    assert(new String(r.getAs[Array[Byte]]("binary")) == "0")
    assert(r.getAs[scala.collection.Seq[scala.collection.Seq[Long]]]("list_list")
      == Seq(Seq(1L, 2L), Seq(3L)))
    // null row keeps nulls
    val n = back.filter(col("par1") === "b" && col("string").isNull).head()
    assert(n.isNullAt(n.fieldIndex("iint64")))
    assert(n.isNullAt(n.fieldIndex("timestamp")))
  }

  test("csv round-trip coerces like the reference csv path") {
    // ensure_data_types_csv analogue: csv drops exact types; read back
    // with an explicit schema restores the declared dtypes
    val dir = tmp()
    val subset = mixedDf.select("iint32", "ddouble", "string", "date",
      "timestamp", "bool")
    DatasetWriter.toCsv(subset, dir, mode = DatasetWriter.Overwrite)
    val schema = StructType(Seq(
      StructField("iint32", IntegerType), StructField("ddouble", DoubleType),
      StructField("string", StringType), StructField("date", DateType),
      StructField("timestamp", TimestampType), StructField("bool", BooleanType)))
    val back = DatasetReader.readCsv(spark, dir, schema = Some(schema))
    assert(back.schema == schema)
    assert(back.count() == 3)
    assert(back.filter(col("string") === "foo").head()
      .getAs[Date]("date") == Date.valueOf("2020-01-01"))
  }

  test("json lines round-trip with explicit schema") {
    val dir = tmp()
    val subset = mixedDf.select("iint64", "ddouble", "string", "list")
    DatasetWriter.toJson(subset, dir, mode = DatasetWriter.Overwrite)
    val schema = StructType(Seq(
      StructField("iint64", LongType), StructField("ddouble", DoubleType),
      StructField("string", StringType),
      StructField("list", ArrayType(LongType))))
    val back = DatasetReader.readJson(spark, dir, schema = Some(schema))
    assert(back.schema == schema)
    assert(back.filter(col("string") === "boo").head()
      .getAs[scala.collection.Seq[Long]]("list") == Seq(3L, 4L))
  }

  test("orc round-trip preserves core types") {
    val dir = tmp()
    val subset = mixedDf.select("iint32", "iint64", "ddouble", "decimal",
      "string", "timestamp", "bool", "list")
    DatasetWriter.toOrc(subset, dir, mode = DatasetWriter.Overwrite)
    val back = spark.read.orc(dir)
    assert(back.schema.fields.map(f => f.name -> f.dataType).toMap ==
      subset.schema.fields.map(f => f.name -> f.dataType).toMap)
    assert(back.count() == 3)
  }

  test("partition transforms derive day/month/bucket columns") {
    val dir = tmp()
    val ev = Tables.events(spark, sf).limit(500)
    val withDay = DatasetWriter.withPartitionTransform(ev, "day(ts)")
    assert(withDay.columns.contains("ts_day"))
    DatasetWriter.toParquet(withDay, dir, mode = DatasetWriter.Overwrite,
      partitionCols = Seq("ts_day"))
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.matches("ts_day=\\d{4}-\\d{2}-\\d{2}")))

    val withBucket = DatasetWriter.withPartitionTransform(
      Tables.customer(spark, sf), "bucket(8, c_custkey)")
    assert(withBucket.columns.contains("c_custkey_bucket"))
    val buckets = withBucket.select("c_custkey_bucket").distinct()
      .collect().map(_.getInt(0))
    assert(buckets.forall(b => b >= 0 && b < 8))

    val withYear = DatasetWriter.withPartitionTransform(
      Tables.orders(spark, sf), "year(o_orderdate)")
    assert(withYear.columns.contains("o_orderdate_year"))
  }

  test("chunked read yields bounded batches covering all rows") {
    val chunks = DatasetReader
      .readParquetChunked(spark, s"$sf/customer.parquet", chunkRows = 64)
      .toSeq
    assert(chunks.forall(_.size <= 64))
    assert(chunks.map(_.size).sum ==
      Tables.customer(spark, sf).count())
  }
}
