// Decompose q32_topk_native's scale curve (round-13 verdict #2:
// 0.51 s -> 6.16 s at 10x data, expected ~linear). Stages timed
// separately at sf0.1 / sf1 / sf10:
//   scan   - parquet scan of the 4 columns, toRdd.count
//   shuffle- scan + hash repartition on l_suppkey (the exec's
//            required distribution), toRdd.count
//   topk   - the full operator
// Run (idle):
//   spark-shell --master local[32] --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/topk_profile.scala > /tmp/topk_profile.log 2>&1
import org.apache.spark.sql.functions._

def timeIt(label: String)(f: => Long): Unit = {
  val s = System.nanoTime; val n = f
  println(f"[topk] $label ${(System.nanoTime - s) / 1e9}%.2f s ($n rows)")
}

for ((dir, tag) <- Seq(("/root/testdata/sf0.1", "sf0.1"),
    ("/tmp/sf1", "sf1"), ("/tmp/sf10", "sf10"))) {
  val li = graft.Tables.lineitem(spark, dir)
    .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice"))
  timeIt(s"$tag scan")(li.queryExecution.toRdd.count())
  timeIt(s"$tag shuffle")(
    li.repartition(col("l_suppkey")).queryExecution.toRdd.count())
  for (round <- 1 to 2)
    timeIt(s"$tag topk r$round")(graft.plans.TopKPerKey(
      li, keys = Seq("l_suppkey"),
      order = Seq(graft.plans.TopKPerKey.Ord.desc("l_extendedprice"),
        graft.plans.TopKPerKey.Ord("l_orderkey"),
        graft.plans.TopKPerKey.Ord("l_linenumber")),
      k = 3).queryExecution.toRdd.count())
}
System.exit(0)
