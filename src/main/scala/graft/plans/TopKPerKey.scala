package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator stack (SURVEY prompt preference (c)): top-k rows
  * per key WITHOUT a per-partition sort.
  *
  * Spark expresses per-key top-k as `row_number().over(Window.partitionBy
  * (keys).orderBy(ord))` + filter — which sorts every partition: O(n log n)
  * per partition and materializes full sorted runs. For small k this
  * operator keeps a bounded k-element heap per key instead: O(n log k),
  * no sort buffers, no spill pressure — the difference between "sort 100 TB"
  * and "stream 100 TB through fixed-size state".
  *
  * Pieces: [[TopKPerKeyNode]] (logical), [[TopKStrategy]] (planner rule),
  * [[TopKPerKeyExec]] (physical, declares a ClusteredDistribution so
  * Catalyst inserts the single hash shuffle), wired via
  * `spark.experimental.extraStrategies` or [[graft.plans.GraftExtensions]].
  */
case class TopKPerKeyNode(keys: Seq[Expression], ord: Expression, k: Int,
    descending: Boolean, child: LogicalPlan) extends UnaryNode {
  require(k > 0)
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

class TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, ord, k, desc, child) =>
      TopKPerKeyExec(keys, ord, k, desc, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], ord: Expression, k: Int,
    descending: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  // one hash shuffle on the keys — Catalyst inserts the exchange
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val ordExpr = ord
    val kk = k
    val desc = descending
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val boundOrd = BindReferences.bindReference(ordExpr, childOutput)
      val baseOrdering = TypeUtils.getInterpretedOrdering(ordExpr.dataType)
      // heap root = the currently-worst retained row, so `better than root`
      // decides eviction; for top-k-largest the worst is the smallest
      val worstFirst: Ordering[(Any, UnsafeRow)] =
        if (desc) Ordering.by[(Any, UnsafeRow), Any](_._1)(baseOrdering.asInstanceOf[Ordering[Any]]).reverse
        else Ordering.by[(Any, UnsafeRow), Any](_._1)(baseOrdering.asInstanceOf[Ordering[Any]])
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[(Any, UnsafeRow)]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[(Any, UnsafeRow)](worstFirst)
          heaps.put(key.copy(), heap)
        }
        val v = boundOrd.eval(row)
        if (v != null) {
          if (heap.size < kk) {
            heap.enqueue((v, row.asInstanceOf[UnsafeRow].copy()))
          } else {
            val worst = heap.head._1
            val better = if (desc) baseOrdering.asInstanceOf[Ordering[Any]].compare(v, worst) > 0
                         else baseOrdering.asInstanceOf[Ordering[Any]].compare(v, worst) < 0
            if (better) { heap.dequeue(); heap.enqueue((v, row.asInstanceOf[UnsafeRow].copy())) }
          }
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values().forEach { h => h.foreach { case (_, r) => out += r } }
      out.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
