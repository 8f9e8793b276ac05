package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{DeltaLogReader, DeltaLogWriter}

/** Shallow CLONE: zero-copy fork referencing the source's files by
  * absolute path — content equality through deletion vectors, carried
  * protocol/config/row-tracking state, independent evolution, and
  * clone-side vacuum never sweeping source files. */
class DeltaCloneSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft-clone").toString

  test("clone carries content, DVs, protocol, and row-tracking state") {
    val spark0 = spark
    import spark0.implicits._
    val (src, dst) = (tmp() + "/src", tmp() + "/dst")
    val df = (1L to 30L).map(i => (i, s"v$i")).toDF("id", "v")
    DeltaLogWriter.write(df.limit(0), src)
    DeltaLogWriter.enableRowTracking(spark, src)
    DeltaLogWriter.write(df.coalesce(1).sortWithinPartitions("id"), src)
    DeltaLogWriter.deleteWhere(spark, src, col("id") % 5 === 0)
    val srcRows = DeltaLogReader.readWithRowIds(spark, src)
      .select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    DeltaLogWriter.shallowClone(spark, src, dst)
    // zero data files under the clone tree
    val fs = new Path(dst).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def parquetUnder(p: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      val it = fs.listFiles(new Path(p), true)
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet") &&
            !st.getPath.toString.contains("_delta_log"))
          out += st.getPath.toString
      }
      out.result()
    }
    assert(parquetUnder(dst).isEmpty, "shallow clone must copy no data")
    // identical content INCLUDING deletion vectors and row ids
    val cloneRows = DeltaLogReader.readWithRowIds(spark, dst)
      .select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cloneRows == srcRows)
    val cp = DeltaLogReader.snapshot(spark, dst)
    val sp = DeltaLogReader.snapshot(spark, src)
    assert(cp.protocol == sp.protocol)
    assert(cp.domainMetadata == sp.domainMetadata)

    // independent evolution: clone append + delete do not touch src
    DeltaLogWriter.write(Seq((31L, "c31")).toDF("id", "v"), dst)
    DeltaLogWriter.deleteWhere(spark, dst, col("id") === 1L)
    assert(DeltaLogReader.read(spark, dst).count() == 24)
    assert(DeltaLogReader.read(spark, src).count() == 24 + 1 - 1,
      "source content unchanged by clone writes")
    assert(DeltaLogReader.readWithRowIds(spark, src)
      .select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == srcRows)

    // clone-side vacuum sweeps only the CLONE tree: the source's data
    // files (referenced absolutely) survive a zero-retention vacuum
    DeltaLogWriter.vacuum(spark, dst, retentionMs = 0L)
    assert(DeltaLogReader.read(spark, src).count() == 24)
    assert(DeltaLogReader.read(spark, dst).count() == 24)
  }
}
