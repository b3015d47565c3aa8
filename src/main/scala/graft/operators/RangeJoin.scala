package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join — Spark plans a bare range predicate (`r.t BETWEEN l.t-w AND
  * l.t`) as a BroadcastNestedLoopJoin: O(|L|·|R|) and a driver-sized
  * broadcast. This is the bucketed formulation (custom-op family (a):
  * composed from existing ops): quantize time into fixed `windowUs`-wide
  * buckets, give each right row its one bucket, have each left row probe
  * the (at most two) buckets its window can overlap, equi-join on the
  * bucket id, then apply the exact range filter. The join is a hash
  * shuffle on bucket ids — distributes like any equi-join, cost
  * |L|·2 + |R| rows through the exchange plus only genuine near-misses
  * evaluated by the residual filter. No duplicate pairs are produced:
  * each right row owns exactly one bucket, and a left row's probe buckets
  * are distinct.
  */
object RangeJoin {

  /** All (left ++ right) pairs with
    * `rightTimeUs ∈ [leftTimeUs - windowUs, leftTimeUs)` (recency window,
    * end-exclusive). Column names must be disjoint across the inputs.
    * Times are epoch micros (`unix_micros`). */
  def recentPairs(left: DataFrame, right: DataFrame,
      leftTimeUs: String, rightTimeUs: String, windowUs: Long): DataFrame = {
    require(windowUs > 0)
    val r = right.withColumn("__bkt", floor(col(rightTimeUs) / windowUs))
    val l = left.withColumn("__bkt",
      explode(sequence(
        floor((col(leftTimeUs) - windowUs) / windowUs),
        floor((col(leftTimeUs) - 1) / windowUs))))
    l.join(r, Seq("__bkt"))
      .filter(col(rightTimeUs) >= col(leftTimeUs) - windowUs &&
        col(rightTimeUs) < col(leftTimeUs))
      .drop("__bkt")
  }
}
