package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Management/transfer surfaces added in round 4: vector bucket + index
  * metadata (`s3/_vectors/_mgmt.py:42-290`), real-format Iceberg DELETE
  * (`athena/_write_iceberg.py:715-868`), and the warehouse bulk-transfer
  * wrappers (`redshift/_write.py` copy / `_read.py` unload). */
class MgmtSurfaceSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-mgmt").toString

  test("vector bucket/index lifecycle: create, list, get, dimension gate, delete") {
    val spark0 = spark
    import spark0.implicits._
    val parent = tmp()
    val bucket = s"$parent/vb"
    intercept[IllegalArgumentException] { // index needs a bucket first
      ops.VectorStore.createVectorIndex(spark, bucket, "idx", 4)
    }
    ops.VectorStore.createVectorBucket(spark, bucket)
    assert(ops.VectorStore.isVectorBucket(spark, bucket))
    assert(ops.VectorStore.listVectorBuckets(spark, parent) == Seq("vb"))
    ops.VectorStore.createVectorIndex(spark, bucket, "idx", dimension = 4,
      distanceMetric = "cosine", nonFilterableMetadataKeys = Seq("raw"))
    assert(ops.VectorStore.listVectorIndexes(spark, bucket) == Seq("idx"))
    val meta = ops.VectorStore.getVectorIndex(spark, bucket, "idx")
    assert(meta.dimension == 4 && meta.distanceMetric == "cosine" &&
      meta.nonFilterableMetadataKeys == Seq("raw"))
    // put validates the embedding width against the declared dimension
    val good = Seq(("a", Seq(1f, 0f, 0f, 0f)), ("b", Seq(0f, 1f, 0f, 0f)))
      .toDF("key", "embedding")
    assert(ops.VectorStore.putVectorsIndexed(good, bucket, "idx") == 2)
    val bad = Seq(("c", Seq(1f, 0f))).toDF("key", "embedding")
    intercept[IllegalArgumentException] {
      ops.VectorStore.putVectorsIndexed(bad, bucket, "idx")
    }
    // non-empty bucket delete is rejected; empty delete succeeds
    intercept[IllegalArgumentException] {
      ops.VectorStore.deleteVectorBucket(spark, bucket)
    }
    ops.VectorStore.deleteVectorIndex(spark, bucket, "idx")
    ops.VectorStore.deleteVectorBucket(spark, bucket)
    assert(ops.VectorStore.listVectorBuckets(spark, parent).isEmpty)
  }

  test("iceberg deleteMatched: partition-granular, untouched files carried") {
    val spark0 = spark
    import spark0.implicits._
    val dir = s"${tmp()}/t"
    io.IcebergWriter.write(
      Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"), (4L, "d", "y"))
        .toDF("id", "v", "p"),
      dir, partitionBy = Seq("p"))
    val before = io.IcebergReader.snapshot(spark, dir)
    io.IcebergWriter.deleteMatched(spark, dir,
      Seq(2L).toDF("id"), keyCols = Seq("id"))
    val now = io.IcebergReader.read(spark, dir)
      .as[(Long, String, String)].collect().toSet
    assert(now == Set((1L, "a", "x"), (3L, "c", "z"), (4L, "d", "y")))
    val after = io.IcebergReader.snapshot(spark, dir)
    assert(after.operation == "delete")
    // x and z partitions keep their exact data files
    val keptBefore = before.files.filterNot(_.path.contains("p=y"))
      .map(_.path).toSet
    val keptAfter = after.files.filterNot(_.path.contains("p=y"))
      .map(_.path).toSet
    assert(keptBefore == keptAfter)
    // deleting a key that hits nothing leaves the table unchanged
    io.IcebergWriter.deleteMatched(spark, dir,
      Seq(99L).toDF("id"), keyCols = Seq("id"))
    assert(io.IcebergReader.read(spark, dir).count() == 3)
  }

  test("s3 tables: bucket/namespace lifecycle + empty-table declaration") {
    val spark0 = spark
    import spark0.implicits._
    val bucket = s"${tmp()}/tb"
    intercept[IllegalArgumentException] { // namespace needs a bucket
      io.S3Tables.createNamespace(spark, bucket, "ns")
    }
    io.S3Tables.createTableBucket(spark, bucket)
    io.S3Tables.createNamespace(spark, bucket, "ns")
    assert(io.S3Tables.listNamespaces(spark, bucket) == Seq("ns"))
    val schema = Seq((1L, "a", "x")).toDF("id", "v", "p").schema
    io.S3Tables.createTable(spark, bucket, "ns", "t", schema,
      partitionBy = Seq("p"))
    assert(io.S3Tables.listTables(spark, bucket, "ns") == Seq("t"))
    // created-but-empty: reads back zero rows WITH the declared schema
    val empty = io.S3Tables.fromIceberg(spark, bucket, "ns", "t")
    assert(empty.count() == 0 && empty.schema.fieldNames.toSeq ==
      Seq("id", "v", "p"))
    // first append commits against the declaration (schema-checked,
    // declared partitioning applied); merge into empty inserts all
    io.S3Tables.toIceberg(Seq((1L, "a", "x"), (2L, "b", "y"))
      .toDF("id", "v", "p"), bucket, "ns", "t")
    intercept[IllegalArgumentException] { // retype vs declaration raises
      io.S3Tables.toIceberg(Seq(("s", 9))
        .toDF("id", "v"), bucket, "ns", "t")
    }
    val snap = io.IcebergReader.snapshot(spark, s"$bucket/ns/t")
    assert(snap.partitionColumns == Seq("p"),
      "declared partitioning binds the first write")
    assert(io.S3Tables.fromIceberg(spark, bucket, "ns", "t")
      .as[(Long, String, String)].collect().toSet ==
      Set((1L, "a", "x"), (2L, "b", "y")))
    // deletes are gated bottom-up
    intercept[IllegalArgumentException] {
      io.S3Tables.deleteNamespace(spark, bucket, "ns")
    }
    io.S3Tables.deleteTable(spark, bucket, "ns", "t")
    io.S3Tables.deleteNamespace(spark, bucket, "ns")
    io.S3Tables.deleteTableBucket(spark, bucket)
  }

  test("warehouse copy/unload wrappers round-trip through jdbc") {
    val spark0 = spark
    import spark0.implicits._
    val url = "jdbc:derby:memory:graftcopy;create=true"
    val staging = tmp()
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "tag", "v")
    jdbc.JdbcOps.copy(df, s"$staging/stage1", url, "copied",
      mode = "overwrite")
    assert(jdbc.JdbcOps.readSqlTable(spark, url, "copied").count() == 3)
    // copy upsert mode: matched key replaced, new key inserted
    val delta = Seq((2L, "B", 9.9), (4L, "d", 4.5)).toDF("id", "tag", "v")
    jdbc.JdbcOps.copy(delta, s"$staging/stage2", url, "copied",
      mode = "upsert", upsertKeys = Seq("id"))
    val rows = jdbc.JdbcOps.readSqlTable(spark, url, "copied")
      .as[(Long, String, Double)].collect().toSet
    assert(rows == Set((1L, "a", 1.5), (2L, "B", 9.9), (3L, "c", 3.5),
      (4L, "d", 4.5)))
    // unload: query → partitioned files → distributed read-back
    val out = s"$staging/unloaded"
    val back = jdbc.JdbcOps.unload(spark, url,
      """SELECT "id", "tag" FROM copied WHERE "id" <= 2""", out,
      partitionBy = Seq("tag"))
    assert(back.select("id").as[Long].collect().toSet == Set(1L, 2L))
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("tag=")))
  }

  test("queryVectors honors the distance metric and the metadata filter") {
    val spark0 = spark
    import spark0.implicits._
    val store = Files.createTempDirectory("graft-vq").toString + "/s"
    // a=(10,0): cosine-identical to q=(1,0) but far; b=(0.9,0.1): close
    // but angled — the two metrics must rank them OPPOSITELY
    val rows = Seq(
      ("a", Seq(10f, 0f), "x"),
      ("b", Seq(0.9f, 0.1f), "y"))
      .toDF("key", "embedding", "tag")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    ops.VectorStore.putVectors(rows, store)
    val q = Array(1f, 0f)
    def top(metric: String) =
      ops.VectorStore.queryVectors(spark, store, q, k = 1,
        metric = Some(metric))
        .select("key").collect().head.getString(0)
    assert(top("cosine") == "a")
    assert(top("euclidean") == "b")
    // cosine reports the conventional DISTANCE: 1 - sim, 0 = identical
    val d = ops.VectorStore.queryVectors(spark, store, q, k = 1,
      metric = Some("cosine")).select("distance").head.getDouble(0)
    assert(math.abs(d) < 1e-12)
    // metadata filter applies BEFORE ranking
    val filtered = ops.VectorStore.queryVectors(spark, store, q, k = 1,
      metric = Some("cosine"), filter = Some(Map("tag" -> Map("$eq" -> "y"))))
      .select("key").collect().head.getString(0)
    assert(filtered == "b")
    intercept[IllegalArgumentException] {
      ops.VectorStore.queryVectors(spark, store, q,
        metric = Some("manhattan"))
    }
    // dimension mismatch raises instead of silently truncating
    intercept[IllegalArgumentException] {
      ops.VectorStore.queryVectors(spark, store, Array(1f))
    }
    // with an index descriptor beside the data, the DECLARED metric is
    // the default (the reference honors the index's distance_metric)
    ops.VectorStore.createVectorBucket(spark,
      new java.io.File(store).getParent)
    ops.VectorStore.createVectorIndex(spark,
      new java.io.File(store).getParent, new java.io.File(store).getName,
      dimension = 2, distanceMetric = "euclidean")
    val viaIndex = ops.VectorStore.queryVectors(spark, store, q, k = 1)
      .select("key").collect().head.getString(0)
    assert(viaIndex == "b")
  }
}
