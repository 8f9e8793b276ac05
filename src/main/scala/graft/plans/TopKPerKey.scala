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
  * shuffle of EVERY row + a complete sort of every partition. This
  * operator keeps a bounded heap per key instead, in two phases like a
  * hash aggregate: an adaptive map-side partial pass on the scan
  * partitioning, then one key-clustered final pass — O(rows · log k)
  * total, state bounded by (distinct keys in partition) × k rows, and
  * when rows/key is large the exchange carries ≤ k·keys·partitions
  * rows instead of the table. Measured (BASELINE.md round 14):
  * 0.50/1.47/5.68 s at sf0.1/sf1/sf10 vs the window idiom's 14.8 s at
  * sf1 (10×) — the difference between sorting (and shuffling) 100 TB
  * and heap-scanning it.
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

/** `partial = true` is the map-side combine (round 14): the same
  * bounded-heap pass runs on the child's existing partitioning BEFORE
  * the exchange, so at most k rows per (input partition, key) ever
  * shuffle — for a table with many rows per key that cuts shuffle
  * volume by ~rows/(k·keys·partitions), the same reason hash
  * aggregation ships partial_sum. Correct because top-k under a total
  * order distributes over union: topk(A ∪ B) = topk(topk(A) ∪
  * topk(B)), and a pass-through row can only ADD candidates the final
  * pass filters.
  *
  * The partial pass is ADAPTIVE, like partial hash aggregation's
  * skip-on-high-cardinality: every [[TopKPerKeyExec.CheckAt]] rows it
  * compares the WINDOW's newly-retained rows to the window's row count
  * — when the current stretch of the partition holds so many distinct
  * keys that the heaps barely filter (ratio > 1/2), it emits its state
  * and streams the remaining rows through untouched, avoiding the
  * per-row copy + hashmap churn that made a blind partial pass SLOWER
  * at 100k keys × few-rows-per-key (measured: sf10 topk 5.2 s
  * one-phase, 8.6 s blind two-phase, 5.0 s adaptive; sf1 3.3 → 1.9 s
  * where the filter bites — tools/topk_profile.scala). The check is
  * per-window, not one-shot, so key-CLUSTERED input (sorted files)
  * whose first window sees few keys still bails once the key stream
  * moves to the high-cardinality stretch (r14 ADVICE). */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial)
      org.apache.spark.sql.catalyst.plans.physical
        .UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    val isPartial = partial
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering: Ordering[InternalRow] =
        GenerateOrdering.generate(sortOrder, childOutput)
      // per key: a bounded "worst-first" heap of the best k rows seen
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      val worstFirst: java.util.Comparator[InternalRow] = ordering.reverse
      var processed = 0L
      var retained = 0L
      def insert(row: InternalRow): Unit = {
        processed += 1
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) {
          heap.add(row.copy())
          retained += 1
        } else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      def emitState(): Iterator[InternalRow] =
        heaps.values().iterator().asScala.flatMap { h =>
          if (isPartial) h.iterator().asScala // order restored finally
          else
            // emit in the declared order (heap is worst-first)
            h.toArray(new Array[InternalRow](h.size()))
              .sorted(ordering).iterator
        }
      if (isPartial) {
        // adaptive windows: judge heap-filter vs pass-through on EACH
        // CheckAt-row window's own reduction, not once on the first —
        // a one-shot decision locks heap mode on key-clustered input
        // (sorted files) whose early window sees few keys, then pays
        // the per-row copy + hashmap churn for the rest of a
        // high-cardinality partition once the key stream moves on.
        // The window-local ratio (newly retained rows / window rows)
        // reacts to the clustered shape within one window.
        var bail = false
        while (iter.hasNext && !bail) {
          val startP = processed; val startR = retained
          while (iter.hasNext &&
              processed - startP < TopKPerKeyExec.CheckAt)
            insert(iter.next())
          bail = (retained - startR) * 2 > (processed - startP)
        }
        if (iter.hasNext) emitState() ++ iter // stop copying rows
        else emitState()
      } else {
        iter.foreach(insert)
        emitState()
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

object TopKPerKeyExec {
  /** Adaptivity checkpoint for the partial pass: after this many rows
    * a partition decides heap-filter vs pass-through. Large enough to
    * see real reduction at 10k-key cardinality, small enough that the
    * sample's own hashmap stays cache-friendly. */
  val CheckAt: Long = 1L << 16
}

object TopKPerKeyStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      // two-phase, like partial aggregation: map-side bounded heaps on
      // the scan partitioning, then the key-clustered final pass —
      // the exchange between them (inserted by EnsureRequirements)
      // carries at most k rows per (partition, key)
      TopKPerKeyExec(keys, order, k,
        TopKPerKeyExec(keys, order, k, planLater(child), partial = true)
      ) :: Nil
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
