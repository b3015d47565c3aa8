package graft.core

import org.apache.spark.sql.DataFrame

/** Materialization policy for reused corpus-derived intermediates (shingle
  * tables, LSH bucket tables, SRP signatures, PQ training samples).
  *
  * `localCheckpoint` is the right tool at bench/gate tiers: it truncates
  * lineage and materializes to executor-local storage with zero external
  * IO. But it is NOT fault-tolerant — a block evicted under memory
  * pressure recomputes through a lineage whose parent shuffle the
  * ContextCleaner may have already released, and the read dies with
  * `FileNotFoundException: shuffle_N_.data` (measured: the first sf100
  * bench JVM died exactly this way — 21.5 GB tier, 48 GiB heap, evicted
  * checkpoint blocks recomputing after a periodic-GC shuffle cleanup).
  * Reliable `checkpoint()` writes self-contained files to the checkpoint
  * dir: nothing to recompute, no lineage, immune to both eviction and
  * shuffle GC, at the price of one extra write+read of the staged frame.
  *
  * So the choice is a SIZE POLICY, the same shape as
  * [[Engine.stateStoreProvider]]: tiers whose staged intermediates are
  * comfortably inside the heap stay on `localCheckpoint` (fast, and
  * eviction can't happen); tiers big enough to evict switch to durable
  * checkpoints. [[Engine.session]] keys the flag on tier bytes vs heap and
  * sets the checkpoint dir; `SPARK_GRAFT_STAGE=durable|local` overrides
  * for A/B probes. Checkpoint files of dereferenced frames are reclaimed
  * by the cleaner (`spark.cleaner.referenceTracking.cleanCheckpoints`) —
  * safe for reliable checkpoints because the files are self-contained, so
  * a clean can never strand a *live* reader the way shuffle cleanup can.
  *
  * Catalog-sized intermediates (`Closure`, `OptionAudit` — bounded by
  * schema object count, not corpus rows) stay on plain `localCheckpoint`:
  * they cannot meaningfully evict.
  */
object Stage {

  /** Test hook: executed-plan strings of every frame staged while
    * `spark.graft.capturePlans` was true. Lineage truncation deliberately
    * hides staged subtrees from the final query plan, which also hides
    * them from PlanSpec's scale-property guards (candidate-pruning
    * semi-joins, broadcast shapes) — the guards read this capture
    * instead. Never populated outside tests. */
  val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def apply(df: DataFrame): DataFrame = {
    if (df.sparkSession.conf.getOption("spark.graft.capturePlans").contains("true"))
      captured.add(df.queryExecution.executedPlan.toString)
    if (df.sparkSession.conf.getOption("spark.graft.durableStage").contains("true"))
      df.checkpoint()
    else df.localCheckpoint()
  }

  implicit class Staged(private val df: DataFrame) extends AnyVal {
    /** Policy-selected lineage-truncating materialization — use instead of
      * `localCheckpoint()` for any corpus-proportional reused frame. */
    def stage(): DataFrame = Stage(df)
  }
}
