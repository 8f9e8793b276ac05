package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from an existing one by replicating
  * every fact table N× with per-replica key offsets, keeping the
  * foreign-key graph consistent (dimension tables `region`/`nation` are
  * fixed-size and copied as-is, like TPC-H itself scales). Used to
  * produce the sf1 (10× sf0.1) dataset for the scale-curve sweep in
  * BASELINE.md — the generator the driver ships stops at sf0.1.
  * Usage: runMain graft.ScaleUp [factor] [srcDir] [outDir]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val src = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    // NOT Scratch.dir: the whole point is a dataset that OUTLIVES this
    // JVM (the next spark-shell sweep reads it); Scratch's shutdown
    // hook would delete it at exit
    val out = args.drop(2).headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-sfup").toString)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // key offset per replica — far above any base-table key
    val Off = 100000000L

    def copy(name: String): Unit =
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$out/$name.parquet")

    def rep(name: String, keyCols: Seq[String],
        extra: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame
          = identity): Unit = {
      val df = spark.read.parquet(s"$src/$name.parquet")
      val r = spark.range(factor.toLong).crossJoin(df)
      val shifted = keyCols.foldLeft(r)((d, k) =>
        d.withColumn(k, col(k) + col("id") * Off))
      extra(shifted).drop("id")
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }

    copy("region")
    copy("nation")
    rep("customer", Seq("c_custkey"))
    rep("supplier", Seq("s_suppkey"))
    rep("part", Seq("p_partkey"))
    rep("orders", Seq("o_orderkey", "o_custkey"))
    rep("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    rep("events", Seq("event_id", "user_id"))
    // documents get a replica token so exact fingerprints differ while
    // the near-dup structure is preserved (same recipe as ScaleProbe)
    rep("documents", Seq("doc_id"),
      _.withColumn("text", concat(col("text"), lit(" rep"), col("id"))))
    rep("embeddings", Seq("vec_id"))
    println(s"scaled ${factor}x $src -> $out")
    spark.stop()
  }
}
