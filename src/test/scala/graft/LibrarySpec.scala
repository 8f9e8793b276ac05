package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.{AthenaBucketHash, AthenaHashImpl}
import graft.io.{DatasetReader, DatasetWriter}
import graft.sql.SqlEngine
import graft.types.AthenaTypes
import graft.catalog.{Catalog => GCatalog}

/** Library-layer specs: bucket-hash bit-compatibility against vectors
  * computed from the reference algorithm (`s3/_write_dataset.py:21-73`),
  * type-mapping bijection, dataset write modes/layout, SQL formatter +
  * cache, catalog DDL.
  */
class LibrarySpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String =
    Files.createTempDirectory("graft-test").toString

  // (numBuckets, values, expected bucket) — generated from the published
  // reference algorithm; mixed int/string/bool, int32 overflow, negatives
  private val bucketVectors: Seq[(Int, Seq[Any], Int)] = Seq(
    (4, Seq(0L), 0), (4, Seq(1L), 1), (4, Seq(7L), 3), (4, Seq(-1L), 0),
    (4, Seq(-42L), 1), (4, Seq(2147483647L), 3), (4, Seq(-2147483648L), 3),
    (8, Seq(1099511627899L), 3), (8, Seq(-1099511627783L), 6),
    (8, Seq(9223372036854775807L), 0), (8, Seq(-9223372036854775808L), 0),
    (4, Seq("foo"), 2), (4, Seq("bar"), 3), (4, Seq(""), 0),
    (16, Seq("athena-compatible"), 14), (4, Seq("héllo"), 1),
    (2, Seq(true), 1), (2, Seq(false), 0),
    (8, Seq(7L, "foo"), 7), (8, Seq("foo", 7L), 1),
    (16, Seq(1L, "a", true), 1), (32, Seq(123456789L, "xyz"), 4))

  test("athena bucket hash matches reference vectors (interpreted eval)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    bucketVectors.foreach { case (n, values, expected) =>
      val lits = values.map {
        case s: String => Literal(UTF8String.fromString(s), StringType)
        case l: Long => Literal(l, LongType)
        case b: Boolean => Literal(b, BooleanType)
      }
      val h = AthenaBucketHash(lits).eval(null).asInstanceOf[Long]
      assert((h % n) == expected, s"bucket($n, $values)")
    }
  }

  test("athena bucket hash matches reference vectors (codegen path)") {
    val spark0 = spark
    import spark0.implicits._
    AthenaBucketHash.register(spark)
    // long + string + bool composite through a real dataframe plan
    val df = Seq((7L, "foo", true), (123456789L, "xyz", false))
      .toDF("i", "s", "b")
    val got = df.select(
      pmod(call_function("athena_bucket_hash", col("i"), col("s")), lit(8L))
        .as("b1")).collect().map(_.getLong(0))
    assert(got.head == 7L) // (8, [7, 'foo']) -> 7 from the vector table
  }

  test("bucketed dataset write produces athena-layout files") {
    val dir = tmp()
    val df = Tables.customer(spark, sf)
    DatasetWriter.toParquet(df, dir,
      mode = DatasetWriter.Overwrite,
      bucketing = Some(DatasetWriter.BucketingInfo(Seq("c_custkey"), 4)))
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName)
    assert(files.nonEmpty)
    assert(files.forall(_.matches(".*_bucket-\\d{5}\\.snappy\\.parquet")),
      files.mkString(","))
    assert(files.map(_.replaceAll(".*_bucket-", "").take(5).toInt).distinct
      .forall(_ < 4))
    // round-trip: all rows survive
    assert(spark.read.parquet(dir).count() == df.count())
    // layout invariant: every row in file _bucket-K hashes to bucket K
    AthenaBucketHash.register(spark)
    val withFile = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .withColumn("expected",
        pmod(call_function("athena_bucket_hash", col("c_custkey")), lit(4L)))
      .withColumn("actual",
        regexp_extract(col("f"), "_bucket-(\\d{5})", 1).cast("long"))
    assert(withFile.filter(col("expected") =!= col("actual")).count() == 0)
  }

  test("bucket-pruned read touches only the probe key's bucket files") {
    val dir = tmp()
    val cust = Tables.customer(spark, sf)
    DatasetWriter.toParquet(cust, dir, mode = DatasetWriter.Overwrite,
      bucketing = Some(DatasetWriter.BucketingInfo(Seq("c_custkey"), 4)))
    val probe = cust.select("c_custkey").head().getLong(0)
    val got = DatasetReader.readBucketed(spark, dir,
      Seq("c_custkey"), 4, Seq(probe))
    assert(got.count() == 1)
    assert(got.head().getAs[Long]("c_custkey") == probe)
    // pruning really happened: the scan saw only one bucket's file(s)
    val scanned = got.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
    assert(scanned.forall(_.matches(".*_bucket-\\d{5}.*")))
    assert(scanned.map(_.replaceAll(".*_bucket-", "").take(5)).distinct.length == 1)
  }

  test("schema-evolution read: mergeSchema unions evolved file schemas") {
    val dir = tmp()
    val spark0 = spark
    import spark0.implicits._
    DatasetWriter.toParquet(Seq((1L, "a")).toDF("id", "v"), dir,
      mode = DatasetWriter.Overwrite)
    DatasetWriter.toParquet(Seq((2L, "b", 3.5)).toDF("id", "v", "score"),
      dir, mode = DatasetWriter.Append)
    val merged = DatasetReader.readParquet(spark, dir, mergeSchema = true)
    assert(merged.columns.toSet == Set("id", "v", "score"))
    assert(merged.filter(col("id") === 1L).head().isNullAt(
      merged.columns.indexOf("score")))
  }

  test("overwrite_partitions replaces only matched partitions") {
    val dir = tmp()
    val spark0 = spark
    import spark0.implicits._
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "p")
    DatasetWriter.toParquet(v1, dir, mode = DatasetWriter.Overwrite,
      partitionCols = Seq("p"))
    // overwrite partition b only, leave a and c untouched
    val v2 = Seq((20L, "b")).toDF("id", "p")
    DatasetWriter.toParquet(v2, dir, mode = DatasetWriter.OverwritePartitions,
      partitionCols = Seq("p"))
    val got = spark.read.option("basePath", dir).parquet(dir)
      .select("id", "p").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (20L, "b"), (3L, "c")))
  }

  test("append with schema_evolution=false rejects type changes") {
    val dir = tmp()
    val spark0 = spark
    import spark0.implicits._
    DatasetWriter.toParquet(Seq((1L, "x")).toDF("id", "v"), dir,
      mode = DatasetWriter.Overwrite)
    val bad = Seq((2L, 3.14)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      DatasetWriter.toParquet(bad, dir, mode = DatasetWriter.Append,
        schemaEvolution = false)
    }
  }

  test("maxRowsByFile splits output files") {
    val dir = tmp()
    DatasetWriter.toParquet(
      Tables.customer(spark, sf).repartition(1), dir,
      mode = DatasetWriter.Overwrite, maxRowsByFile = Some(100L))
    val files = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files > 1)
  }

  test("athena type mapping round-trips nested types") {
    val cases = Seq(
      "tinyint", "smallint", "int", "bigint", "float", "double", "boolean",
      "string", "binary", "date", "timestamp", "decimal(3,2)",
      "array<bigint>", "array<array<bigint>>", "map<string,int>",
      "struct<a:int,b:string>", "struct<a:array<struct<b:double>>>",
      "map<string,struct<x:int,y:array<double>>>")
    cases.foreach { ddl =>
      val dt = AthenaTypes.fromAthena(ddl)
      val back = AthenaTypes.toAthena(dt)
      assert(AthenaTypes.fromAthena(back) == dt, s"$ddl -> $dt -> $back")
    }
    intercept[IllegalArgumentException](AthenaTypes.fromAthena("uint64"))
    intercept[IllegalArgumentException](AthenaTypes.toAthena(NullType))
  }

  test("schema round-trips through athena DDL with partition split") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("p", StringType)))
    val (data, parts) = AthenaTypes.schemaToAthena(schema, Seq("p"))
    assert(data == Seq("a" -> "bigint", "b" -> "string"))
    assert(parts == Seq("p" -> "string"))
  }

  test("sanitizeColumns normalizes and dedups names") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1, 2, 3)).toDF("My Col", "my-col", "ok")
    val out = AthenaTypes.sanitizeColumns(df)
    assert(out.columns.toSeq == Seq("my_col", "my_col_1", "ok"))
  }

  test("sql formatter renders typed literals") {
    assert(SqlEngine.renderLiteral(null) == "NULL")
    assert(SqlEngine.renderLiteral("o'brien") == "'o''brien'")
    assert(SqlEngine.renderLiteral(true) == "TRUE")
    assert(SqlEngine.renderLiteral(Seq(1, 2)) == "array(1, 2)")
    assert(SqlEngine.renderLiteral(BigDecimal("1.90")) == "1.90BD")
    val sql = SqlEngine.formatSql(
      "SELECT * FROM t WHERE a = :a AND b = :ab",
      Map("a" -> 1, "ab" -> "x"))
    assert(sql == "SELECT * FROM t WHERE a = 1 AND b = 'x'")
  }

  test("query cache hits on normalized sql") {
    Tables.registerAll(spark, sf)
    val cache = SqlEngine.cacheFor(spark)
    cache.clear()
    val a = SqlEngine.readSqlQuery(spark,
      "SELECT count(*) AS n FROM lineitem", useCache = true)
    val b = SqlEngine.readSqlQuery(spark,
      "select   count(*) as n from lineitem;", useCache = true)
    assert(cache.size == 1)
    assert(a.head().getLong(0) == b.head().getLong(0))
    cache.clear()
  }

  test("fwf reader projects fixed-width fields") {
    val dir = tmp()
    Files.write(java.nio.file.Paths.get(dir, "data.txt"),
      java.util.Arrays.asList("alice  30x", "bob    41y"))
    val df = DatasetReader.readFwf(spark, dir,
      Seq(("name", 0, 7), ("age", 7, 2), ("flag", 9, 1)))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSet == Set(("alice", "30", "x"), ("bob", "41", "y")))
  }

  test("callback partition filter prunes directories before read") {
    val dir = tmp()
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "p")
    DatasetWriter.toParquet(df, dir, mode = DatasetWriter.Overwrite,
      partitionCols = Seq("p"))
    val pruned = DatasetReader.readParquetPartitionFilter(spark, dir,
      parts => parts("p") != "b")
    assert(pruned.select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("pathGlobFilter and modifiedAfter options filter files at read") {
    val dir = tmp()
    val spark0 = spark
    import spark0.implicits._
    Seq((1L, "keep")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(dir)
    // a non-parquet decoy the glob must exclude
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "notes.txt"), "not data")
    val got = DatasetReader.readParquet(spark, dir,
      options = Map("pathGlobFilter" -> "*.parquet"))
    assert(got.count() == 1)
    // excluding every file requires an explicit schema (nothing to infer)
    val none = DatasetReader.readParquet(spark, dir,
      schema = Some(StructType(Seq(StructField("id", LongType),
        StructField("v", StringType)))),
      options = Map("pathGlobFilter" -> "*.parquet",
        "modifiedAfter" -> "2100-01-01T00:00:00"))
    assert(none.count() == 0)
  }

  test("orc metadata inference separates partition columns") {
    val dir = tmp()
    val spark0 = spark
    import spark0.implicits._
    Seq((1L, 2.0, "a")).toDF("id", "v", "p")
      .write.partitionBy("p").mode("overwrite").orc(dir)
    val (data, parts) = DatasetReader.readMetadata(spark, dir, "orc")
    assert(data.fieldNames.toSet == Set("id", "v"))
    assert(parts.fieldNames.toSet == Set("p"))
  }

  test("parquet metadata inference separates partition columns") {
    val dir = tmp()
    val spark0 = spark
    import spark0.implicits._
    DatasetWriter.toParquet(Seq((1L, 2.0, "a")).toDF("id", "v", "p"), dir,
      mode = DatasetWriter.Overwrite, partitionCols = Seq("p"))
    val (data, parts) = DatasetReader.readParquetMetadata(spark, dir)
    assert(data.fieldNames.toSet == Set("id", "v"))
    assert(parts.fieldNames.toSet == Set("p"))
  }

  test("catalog: create table, add partitions, repair, properties") {
    val dir = tmp()
    val spark0 = spark
    import spark0.implicits._
    DatasetWriter.toParquet(Seq((1L, "a"), (2L, "b")).toDF("id", "p"), dir,
      mode = DatasetWriter.Overwrite, partitionCols = Seq("p"))
    GCatalog.createDatabase(spark, "graft_test")
    GCatalog.createParquetTable(spark, "graft_test.t1", dir,
      columns = Seq("id" -> "bigint"), partitionCols = Seq("p" -> "string"))
    GCatalog.repairTable(spark, "graft_test.t1")
    assert(spark.table("graft_test.t1").count() == 2)
    assert(GCatalog.getPartitions(spark, "graft_test.t1").count() == 2)
    assert(GCatalog.getTableTypes(spark, "graft_test.t1") ==
      Map("id" -> "bigint", "p" -> "string"))
    GCatalog.upsertTableParameters(spark, "graft_test.t1",
      Map("graft.stage" -> "gold"))
    assert(GCatalog.getTableParameters(spark, "graft_test.t1")
      .get("graft.stage").contains("gold"))
    GCatalog.deleteTable(spark, "graft_test.t1")
    GCatalog.deleteDatabase(spark, "graft_test")
  }
}
