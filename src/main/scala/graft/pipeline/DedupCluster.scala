package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Stage.Staged

/** Near-duplicate clustering: connected components over the pair graph,
  * so each duplicate group keeps one representative (the min id) — the step
  * that turns pair detection into an actual corpus dedup.
  *
  * Distributed label propagation: every node starts labeled with its own
  * id; each round replaces a node's label with the min over itself and its
  * neighbors; converges in O(component diameter) rounds. `localCheckpoint`
  * truncates lineage per round (same discipline as [[graft.core.Closure]]).
  * Near-dup graphs are overwhelmingly tiny components (pairs/triples), so
  * convergence is 2-3 rounds at any corpus size.
  */
object DedupCluster {

  /** (member, cluster_rep) for every node in `pairs` (id_a, id_b). */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("s"), col("id_b").as("t"))
      .unionByName(pairs.select(col("id_b").as("s"), col("id_a").as("t")))
      .distinct()
      .stage()
    var labels = edges.select(col("s").as("id")).distinct()
      .withColumn("rep", col("id"))
      .stage()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborReps = edges.join(labels, edges("t") === labels("id"))
        .select(edges("s").as("id"), col("rep"))
      val next = labels.select(col("id"), col("rep"))
        .unionByName(neighborReps)
        .groupBy("id").agg(min("rep").as("rep"))
        .stage()
      converged = next.join(labels.withColumnRenamed("rep", "old"), Seq("id"))
        .filter(col("rep") =!= col("old")).isEmpty
      labels = next
      i += 1
    }
    labels.select(col("id").as("member"), col("rep").as("cluster_rep"))
  }

  /** Full dedup: drop every near-dup member that is not its cluster's
    * representative. */
  def dropNearDuplicates(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val toDrop = connectedComponents(pairs)
      .filter(col("member") =!= col("cluster_rep"))
      .select(col("member").as(idCol))
    docs.join(toDrop, Seq(idCol), "left_anti")
  }
}
