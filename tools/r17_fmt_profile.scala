// Per-step profile of the most expensive fmt_* lifecycles (r17 verdict
// item #2): replicates the TableRoundtrips bodies with a stopwatch per
// DML step, so the ledger can say WHERE each entry's seconds go
// (seed write, each DML commit, the protocol read-back) before any
// commit-path change is attempted.
//
// Run (idle machine):
//   ROUNDS=2 spark-shell --master local[32] --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.adaptive.enabled=true \
//     --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/r17_fmt_profile.scala
import org.apache.spark.sql.functions._
import graft.Tables
import graft.io.{DeltaLogReader, DeltaLogWriter, IcebergReader, IcebergWriter}

val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val rounds = sys.env.getOrElse("ROUNDS", "2").toInt
Tables.names.foreach { n =>
  try {
    val df = if (n == "events") Tables.events(spark, dir)
             else Tables.load(spark, dir, n)
    df.count()
  } catch { case _: Throwable => }
}
def step(name: String)(body: => Unit): Unit = {
  val t0 = System.nanoTime()
  body
  println(f"[fmtprof]   $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
}

for (r <- 1 to rounds) {
  println(s"[fmtprof] === round $r ===")

  // ---- fmt_sql_dml ----
  {
    val root = graft.session.Scratch.dir("r17prof-sqldml")
    val tmp = root + "/t"
    val t0 = System.nanoTime()
    val base = Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 60L)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    step("sqldml.seed")(IcebergWriter.write(base, tmp))
    val reg = Map("t" -> tmp)
    step("sqldml.update")(graft.sql.TableDml.execute(spark,
      "UPDATE t SET c_acctbal = c_acctbal + 100 WHERE c_custkey <= 10", reg))
    step("sqldml.delete")(graft.sql.TableDml.execute(spark,
      "DELETE FROM t WHERE c_custkey % 9 = 0", reg))
    Tables.customer(spark, dir)
      .filter(col("c_custkey") > 60L && col("c_custkey") <= 65L)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .createOrReplaceTempView("sqldml_src")
    step("sqldml.merge1")(graft.sql.TableDml.execute(spark,
      """MERGE INTO t USING (SELECT * FROM sqldml_src) s ON t.c_custkey = s.c_custkey
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin, reg))
    Tables.customer(spark, dir)
      .filter((col("c_custkey") >= 1L && col("c_custkey") <= 3L) ||
        (col("c_custkey") > 65L && col("c_custkey") <= 70L))
      .select(col("c_custkey"), col("c_mktsegment"),
        (col("c_acctbal") + 500).as("c_acctbal"))
      .createOrReplaceTempView("sqldml_src2")
    step("sqldml.merge2")(graft.sql.TableDml.execute(spark,
      """
        |            MERGE INTO "t" target
        |            USING "sqldml_src2" source
        |            ON (target."c_custkey" = source."c_custkey")
        |            WHEN MATCHED THEN
        |                UPDATE SET "c_custkey" = source."c_custkey", "c_mktsegment" = source."c_mktsegment", "c_acctbal" = source."c_acctbal"
        |            WHEN NOT MATCHED THEN
        |                INSERT ("c_custkey", "c_mktsegment", "c_acctbal")
        |                VALUES (source."c_custkey", source."c_mktsegment", source."c_acctbal")
        |        """.stripMargin, reg))
    Tables.customer(spark, dir).filter(col("c_custkey") === 50L)
      .select(col("c_custkey"))
      .createOrReplaceTempView("sqldml_del")
    step("sqldml.delete2")(graft.sql.TableDml.execute(spark,
      "DELETE FROM t WHERE EXISTS " +
        "(SELECT 1 FROM sqldml_del s WHERE s.c_custkey = t.c_custkey)", reg))
    step("sqldml.readback")(
      IcebergReader.read(spark, tmp)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .queryExecution.toRdd.count())
    println(f"[fmtprof] fmt_sql_dml total ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }

  // ---- fmt_delta_cdf ----
  {
    val root = graft.session.Scratch.dir("r17prof-cdf")
    val tmp = root + "/t"
    val t0 = System.nanoTime()
    val base = Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 50L)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    step("cdf.seed")(DeltaLogWriter.write(base, tmp,
      partitionBy = Seq("c_mktsegment")))
    step("cdf.enable")(DeltaLogWriter.enableChangeDataFeed(spark, tmp))
    val src = Tables.customer(spark, dir)
      .filter(col("c_custkey") >= 40L && col("c_custkey") <= 60L)
      .select(col("c_custkey"), col("c_mktsegment"),
        (col("c_acctbal") + lit(1000.0)).as("c_acctbal"))
    step("cdf.merge")(DeltaLogWriter.merge(spark, tmp, src,
      keys = Seq("c_custkey")))
    step("cdf.delete")(DeltaLogWriter.deleteWhere(spark, tmp,
      col("c_mktsegment") === "BUILDING"))
    step("cdf.changes-read")(
      DeltaLogReader.changes(spark, tmp, 0L)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          col("_change_type"), col("_commit_version"))
        .queryExecution.toRdd.count())
    println(f"[fmtprof] fmt_delta_cdf total ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }

  // ---- fmt_iceberg_rewrite ----
  {
    val root = graft.session.Scratch.dir("r17prof-icerw")
    val tmp = root + "/t"
    val t0 = System.nanoTime()
    val base = Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 50L)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    step("icerw.seed")(IcebergWriter.write(base, tmp,
      partitionBy = Seq("c_mktsegment")))
    val src = Tables.customer(spark, dir)
      .filter(col("c_custkey") >= 40L && col("c_custkey") <= 60L)
      .select(col("c_custkey"), col("c_mktsegment"),
        (col("c_acctbal") + lit(1000.0)).as("c_acctbal"))
    step("icerw.upsert")(IcebergWriter.upsertByKey(spark, tmp, src,
      keys = Seq("c_custkey")))
    step("icerw.rewrite")(IcebergWriter.rewriteDataFiles(spark, tmp))
    step("icerw.readback")(
      IcebergReader.read(spark, tmp)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .queryExecution.toRdd.count())
    println(f"[fmtprof] fmt_iceberg_rewrite total ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }

  // ---- fmt_iceberg_day_roundtrip ----
  {
    val root = graft.session.Scratch.dir("r17prof-iceday")
    val tmp = root + "/t"
    val t0 = System.nanoTime()
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderdate").between("1995-03-01", "1995-03-10"))
      .select(col("o_orderkey"),
        col("o_orderdate").cast("timestamp").as("o_ts"), col("o_totalprice"))
    step("iceday.seed")(IcebergWriter.write(base, tmp,
      partitionBy = Seq("day(o_ts)")))
    val src = Tables.orders(spark, dir)
      .filter(col("o_orderdate").between("1995-03-05", "1995-03-07"))
      .select(col("o_orderkey"),
        col("o_orderdate").cast("timestamp").as("o_ts"),
        (col("o_totalprice") + lit(100.0)).as("o_totalprice"))
    step("iceday.merge")(IcebergWriter.merge(spark, tmp, src,
      keys = Seq("o_orderkey")))
    step("iceday.readback")(
      IcebergReader.read(spark, tmp)
        .select(col("o_orderkey"), col("o_ts"), col("o_totalprice"))
        .queryExecution.toRdd.count())
    println(f"[fmtprof] fmt_iceberg_day total ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }
}
System.exit(0)
