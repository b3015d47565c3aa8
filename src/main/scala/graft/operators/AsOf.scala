package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively (builder-prompt custom-op
  * family (a): composed from existing ops, no custom exec needed).
  *
  * For each left row, attach the payload of the single most recent right
  * row with the same key and rightTime ≤ leftTime (inclusive). The
  * formulation is the scalable union-window one:
  *
  *   tag both sides → unionByName (missing columns null-filled) →
  *   Window.partitionBy(key).orderBy(time, side) running
  *   `last(payload, ignoreNulls)` → keep left rows.
  *
  * One hash shuffle on the key, bounded per-group state, no
  * per-row range probe and no nested-loop/range join — at 100 TB this
  * behaves like any keyed window, while the naive `l.t >= r.t` join is a
  * BroadcastNestedLoop. Right rows sort BEFORE left rows at equal
  * timestamps (side 0 < 1), which is what makes the bound inclusive.
  *
  * Right should be unique per (key, time) — pre-aggregate otherwise
  * (ties at identical timestamps would be resolved by input order).
  */
object AsOf {

  /** @param payloadCols right-side columns carried onto matching left rows
    * @return left rows (all original columns) + payloadCols (null when no
    *         right row is at or before the left row's time) */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    val lTagged = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val rTagged = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      struct(payloadCols.map(col): _*).as("__p"))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val payloadOut = payloadCols.map(c => col(s"__asof.$c").as(c))
    joined.select(left.columns.toIndexedSeq.map(col) ++ payloadOut: _*)
  }
}
