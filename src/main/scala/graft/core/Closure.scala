package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive closure over dependency edges (SURVEY §7.2): the reference
  * walks multilevel view dependencies with repeated catalog queries
  * (`/root/reference/Migration/migration.py:684-692,777-786,853-861`).
  *
  * Spark shape: iterative self-join to a fixpoint with `localCheckpoint()`
  * per iteration — truncating the lineage keeps the plan from growing
  * exponentially across iterations (each round would otherwise embed the
  * whole previous plan). Converges in O(log depth) rounds with
  * path-doubling; catalog-sized inputs make every round a broadcast join.
  */
object Closure {

  /** All (descendant, ancestor) pairs reachable over (child, parent) edges. */
  def transitiveClosure(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    val base = edges.select(col("child"), col("parent")).distinct()
    var closure = base.localCheckpoint()
    var lastCount = closure.count()
    var i = 0
    var grown = true
    while (grown && i < maxIters) {
      // path doubling: closure ∪ (closure ⋈ closure)
      val next = closure
        .unionByName(
          closure.as("a").join(closure.as("b"), col("a.parent") === col("b.child"))
            .select(col("a.child").as("child"), col("b.parent").as("parent")))
        .distinct()
        .localCheckpoint()
      val n = next.count()
      grown = n != lastCount
      lastCount = n
      closure = next
      i += 1
    }
    closure
  }
}
