package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.execution.SparkStrategy

/** Whole-operator extension (build-plan tier (c)): per-key top-k as a custom
  * LogicalPlan + Strategy + SparkPlan pair.
  *
  * The Window formulation (`row_number().over(partitionBy(key).orderBy(ord))
  * <= k`) must fully sort every partition of every key group before ranking.
  * This operator instead keeps a bounded k-element heap per key: a PARTIAL
  * stage reduces each input partition to ≤k candidate rows per key before the
  * shuffle (the only rows that can survive globally), and a FINAL stage after
  * hash-partitioning re-heaps the candidates — O(n log k) work, shuffle
  * traffic of candidates only, no full sort anywhere. The same
  * partial/final shape as HashAggregate, applied to order statistics.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan, maxPartialKeys: Int = TopK.defaultMaxPartialKeys)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child, maxPartialKeys) =>
      val partial = TopKPerKeyExec(keys, order, k,
        org.apache.spark.sql.execution.PlanLater(child), partial = true, maxPartialKeys)
      TopKPerKeyExec(keys, order, k, partial, partial = false, maxPartialKeys) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan, partial: Boolean,
    maxPartialKeys: Int = TopK.defaultMaxPartialKeys) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val schema = child.output
    val limit = k
    // The FINAL stage must reduce every key it receives (capping it would
    // drop rows); its memory is bounded by k × keys-per-final-partition,
    // the same envelope as a final HashAggregate. Only the PARTIAL stage,
    // which sees the full unpartitioned key stream, caps its map.
    val keyCap = if (partial) maxPartialKeys else Int.MaxValue
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val ord = GenerateOrdering.generate(sortOrder, schema)
      // per key: a max-heap (by sort position) of the best k rows — the head
      // is the worst survivor and is evicted when something better arrives
      val heaps = new scala.collection.mutable.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      // Overflow rows (key not tracked, map at capacity) PASS THROUGH
      // unreduced instead of growing the map: correctness is unaffected —
      // the final stage still reduces them — only the partial's reduction
      // ratio degrades past the cap. Pass-through is lazy (flatMap), so
      // overflow never buffers; the heap dump appends once input exhausts
      // (Iterator.++'s second operand is by-name).
      val processed = it.flatMap { row =>
        val key = keyProj(row)
        // probe with the reused row; copy the key only on first insert (the
        // common case is a hash hit — no per-row allocation)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < limit) heap.enqueue(row.copy())
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
            Iterator.empty
          case None if heaps.size < keyCap =>
            val h = new scala.collection.mutable.PriorityQueue[InternalRow]()(ord)
            heaps.put(key.copy(), h)
            h.enqueue(row.copy())
            Iterator.empty
          case None => Iterator.single(row)
        }
      }
      processed ++ heaps.valuesIterator.flatMap(_.toSeq.sorted(ord).iterator)
    }
  }
}

object TopK {

  /** Partial-stage key-map cap: past this many tracked keys per input
    * partition, further keys stream through unreduced. Budget ≈
    * cap × k × rowBytes per TASK (each partition holds its own map):
    * 262 144 keys × k=10 × ~100 B ≈ 250 MB — inside a typical executor
    * task slot. Raise/lower per workload via the [[perKey]] overload. */
  val defaultMaxPartialKeys: Int = 1 << 18

  /** Best-k rows per key under `orderBy` (ascending semantics of the given
    * SortOrder columns — pass `col.desc` for largest-first). Registers the
    * planning strategy on the session idempotently. */
  def perKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame =
    perKey(df, keyCols, orderBy, k, defaultMaxPartialKeys)

  /** As [[perKey]], with an explicit partial-stage key cap. */
  def perKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column], k: Int,
      maxPartialKeys: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    // also covered when GraftExtensions injected the strategy at session
    // build; synchronize the read-modify-write on extraStrategies
    TopK.synchronized {
      val registered = spark.sessionState.planner.strategies.contains(TopKPerKeyStrategy) ||
        spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)
      if (!registered)
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val keys = keyCols.map(c => bridge.eagerExpression(df(c)))
    val order = orderBy.map(c => bridge.eagerExpression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    bridge.ofRows(spark,
      TopKPerKeyNode(keys, order, k, bridge.logicalPlan(df), maxPartialKeys))
  }
}
