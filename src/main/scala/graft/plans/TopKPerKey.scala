package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator extension (survey preference (c): LogicalPlan + Strategy
  * + SparkPlan via SparkSessionExtensions): per-key top-k without the
  * window-function plan's per-partition FULL SORT.
  *
  * `row_number().over(partitionBy(k).orderBy(o)) <= n` — the idiom the
  * reference's pushdown engines run for "top n per group" — costs one
  * shuffle + a complete sort of every partition. This operator keeps a
  * bounded heap per key instead: one shuffle on the keys, O(rows · log k)
  * per partition, state bounded by (distinct keys in partition) × k rows
  * — the difference between sorting 100 TB and heap-scanning it.
  *
  * The ordering must be total (include a tiebreak) for deterministic
  * results — same requirement the differential oracle puts on the window
  * idiom.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering: Ordering[InternalRow] =
        GenerateOrdering.generate(sortOrder, childOutput)
      // per key: a bounded "worst-first" heap of the best k rows seen
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      val worstFirst: java.util.Comparator[InternalRow] = ordering.reverse
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) {
          heap.add(row.copy())
        } else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h =>
        // emit in the declared order (heap is worst-first)
        h.toArray(new Array[InternalRow](h.size())).sorted(ordering).iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

object TopKPerKeyStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** `SparkSession.builder().withExtensions(new GraftExtensions)` — or
  * `TopKPerKey.install(spark)` on a live session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
}

object TopKPerKey {

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy

  /** Sort-order spec: column name + direction. */
  final case class Ord(name: String, ascending: Boolean = true)
  object Ord {
    def desc(name: String): Ord = Ord(name, ascending = false)
  }

  /** Top `k` rows per `keys` group under a TOTAL `order` (include a
    * tiebreak column). */
  def apply(df: DataFrame, keys: Seq[String], order: Seq[Ord], k: Int)
      : DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val plan = GraftBridge.analyzed(df)
    def attr(name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
    val keyExprs = keys.map(attr)
    val orderExprs = order.map { o =>
      SortOrder(attr(o.name),
        if (o.ascending) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    GraftBridge.ofRows(spark, TopKPerKeyNode(keyExprs, orderExprs, k, plan))
  }
}
