package graft

/** Physical-plan regression guards: the scale properties the engine relies
  * on (pushdown, pruning, broadcast, no cartesian blowups) asserted against
  * the actual executed plans, so a refactor can't silently trade them away.
  */
class PlanSpec extends SparkTestBase {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q1: shipdate filter is pushed into the parquet scan") {
    val p = planOf("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "filter not pushed to scan")
  }

  test("q1: scan is column-pruned (no join keys read for an aggregation)") {
    val p = planOf("q1_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"unpruned scan: $readSchema")
    assert(readSchema.contains("l_quantity"))
  }

  test("j1/q5: dimension joins broadcast; no sort-merge at this scale") {
    assert(planOf("j1_equi_join").contains("BroadcastHashJoin"))
    val q5 = planOf("q5_local_revenue")
    assert(q5.contains("BroadcastHashJoin"))
    assert(!q5.contains("CartesianProduct"))
  }

  test("d2 minhash LSH: candidate join is an equi-join, not a cross product") {
    val p = planOf("d2_minhash_lsh")
    assert(!p.contains("CartesianProduct"),
      "LSH candidate generation degenerated into a cartesian product")
  }

  test("d2 LSH verify: shingle self-join inputs are candidate-pruned (semi-joins)") {
    // the Jaccard-verify stage must semi-join the shingle table to the LSH
    // candidate ids BEFORE the set aggregation — otherwise the verify pays
    // the all-pairs cost LSH exists to avoid. The doc-set subtree is
    // lineage-truncated (staged) since round 15, so the semi-join lives in
    // a STAGED subtree's plan, not the final one — read the Stage capture.
    spark.conf.set("spark.graft.capturePlans", "true")
    try {
      graft.core.Stage.captured.clear()
      val p = planOf("d2_minhash_lsh")
      val staged = new scala.collection.mutable.StringBuilder(p)
      graft.core.Stage.captured.forEach(s => staged.append('\n').append(s))
      assert(staged.toString.contains("LeftSemi"),
        "verify stage is not candidate-pruned")
    } finally {
      spark.conf.set("spark.graft.capturePlans", "false")
      graft.core.Stage.captured.clear()
    }
  }

  test("d5 embedding near-dup: banded-SRP equi-join, no nested-loop blowup") {
    // nested-loop joins are allowed ONLY against constant-size plan
    // fragments (the broadcast hyperplane Range) — never between two scans
    // of the data. The pair-forming join must be an equi-join.
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val exec = SparkEntry.queries("d5_embedding_near_dup")(spark, sfDir)
      .queryExecution.executedPlan
    val plan = exec match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    assert(!plan.toString.contains("CartesianProduct"), "cartesian in d5")
    plan.foreach {
      case j: BroadcastNestedLoopJoinExec =>
        val buildSide = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
          case _ => j.left
        }
        val s = buildSide.toString
        assert(s.contains("Range (") && !s.contains("FileScan"),
          s"nested-loop join broadcasts a data table:\n$s")
      case _ =>
    }
  }

  test("no hinted broadcast of SF-scaling tables (customer/supplier/part)") {
    // hints override autoBroadcastJoinThreshold, so a hinted broadcast of a
    // table that grows with scale factor is a driver OOM at 100x. Assert on
    // the analyzed plan's hints: only fixed-size dims (nation/region) may be
    // hinted. AQE remains free to broadcast anything at runtime.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    for (q <- Seq("q3_shipping_priority", "q5_local_revenue", "q10_returned_items",
        "q14_revenue_share", "q18_large_orders", "q19_disjunctive",
        "j2_fact_dim_join", "j7_key_join", "j11_exclusion_join")) {
      val analyzed = SparkEntry.queries(q)(spark, sfDir).queryExecution.analyzed
      analyzed.foreach {
        case h: ResolvedHint =>
          val leaves = h.child.collectLeaves().map(_.toString).mkString("\n")
          for (t <- Seq("customer", "supplier", "part.parquet", "lineitem", "orders"))
            assert(!leaves.contains(t), s"$q: hinted broadcast of scaling table $t")
        case _ =>
      }
    }
  }

  test("w2 running sum: no global unpartitioned window over the events table") {
    // the two-phase prefix sum may only run an unpartitioned window over the
    // per-bucket totals (n/4096 rows), never over the full row stream
    val analyzed = SparkEntry.queries("w2_running_segment_id")(spark, sfDir)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, Aggregate}
    analyzed.foreach {
      case w: LWindow if w.partitionSpec.isEmpty =>
        // the only unpartitioned window must sit above the bucket aggregate
        assert(w.collectFirst { case a: Aggregate => a }.nonEmpty,
          "global window runs over raw events rows, not bucket totals")
      case _ =>
    }
  }

  test("q7/q8/aj1: no cartesian or data-table nested loops in the new shapes") {
    for (q <- Seq("q7_volume_shipping", "q8_market_share", "q13_custdist",
        "q15_top_supplier", "q22_prospects")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian")
    }
    // the as-of join must be a keyed window, not any kind of join
    val aj = planOf("aj1_asof_join")
    assert(!aj.contains("BroadcastNestedLoopJoin") && !aj.contains("CartesianProduct"))
    assert(aj.contains("Window") || aj.contains("RunningWindowFunction"),
      "as-of join lost its window formulation")
  }

  test("sim2 IVF: probed read is partition-pruned at the source") {
    // the query path must consume the PERSISTED index: the corpus scan has
    // the probed cells as PartitionFilters (directory pruning), not a data
    // filter over a full scan — at 100 TB this is the entire point of IVF
    import graft.pipeline.Similarity
    import org.apache.spark.sql.functions.col
    val e = graft.core.Tables.load(spark, sfDir, "embeddings")
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_plan").toString + "/ivf"
    Similarity.ivfBuild(e, "embedding", "label", idx)
    // nprobe=2 of the 10 label cells: the scan must list only those 2
    val plan = Similarity.ivfTopK(spark, idx, e.filter(col("vec_id") < 3),
      "vec_id", "embedding", "label", k = 3, nprobe = 2)
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(l =>
      l.contains("PartitionFilters: [") && !l.contains("PartitionFilters: []"))
    assert(scanLine.exists(_.contains("label")),
      s"probed corpus read is not partition-pruned:\n$plan")
  }

  test("sim6 IVF-PQ: probed codes read is partition-pruned; no cartesian") {
    // the codes cache is cell-partitioned beside the index, so the ADC
    // stage's scan must carry the probed cells as PartitionFilters —
    // 8-byte codes or not, an unpruned codes scan is still a full corpus
    // read at 100 TB
    val p = planOf("sim6_ivfpq")
    assert(!p.contains("CartesianProduct"), "cartesian in the IVF-PQ path")
    assert(p.linesIterator.exists(_.contains("PartitionFilters: [cell")),
      s"codes read not partition-pruned:\n${p.take(4000)}")
    assert(p.linesIterator.exists(_.contains("PartitionFilters: [label")),
      "index corpus read not partition-pruned")
  }

  test("p9: multi-predicate conjunction reaches the scan") {
    // plan toString truncates long filter lists — assert on the stable prefix
    val p = planOf("p9_conjunction")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), IsNotNull(l_linestatus)"),
      "conjunction not pushed")
  }

  test("Bench.maskPlan removes session artifacts but keeps plan structure") {
    // the drift sources observed across sessions: scan file paths, the IVF
    // cache dir's content-keyed hash, and raw exprIds inside a DPP
    // SubqueryAdaptiveBroadcast's uncanonicalized build plan — exprId
    // masking is SCOPED to those subquery lines (main-tree ids are already
    // normalized by canonicalization and stay visible)
    val a = Bench.maskPlan(
      "FileScan parquet [v#0] Location: InMemoryFileIndex(1 paths)[file:/tmp/graft_ivf_cache/sim2-aaaa1111/ivf]\n" +
        "SubqueryAdaptiveBroadcast dpp, [0], true, Project [query_id#161L]")
    val b = Bench.maskPlan(
      "FileScan parquet [v#0] Location: InMemoryFileIndex(1 paths)[file:/tmp/graft_ivf_cache/sim2-bbbb2222/ivf]\n" +
        "SubqueryAdaptiveBroadcast dpp, [0], true, Project [query_id#116L]")
    assert(a == b, s"masked plans must agree:\n$a\n$b")
    // a REAL plan change must still flip the masked string
    assert(Bench.maskPlan("BroadcastHashJoin [k#1]") !=
      Bench.maskPlan("SortMergeJoin [k#1]"))
  }

  test("Bench.maskPlan keeps literal content distinguishable") {
    // the old blanket #\d+ mask also swallowed plan-meaningful LITERALS:
    // 'Brand#1' vs 'Brand#2' in a Filter/PushedFilters line hashed
    // identically, so a literal-only query change was misattributed as
    // "environment". Outside DPP subquery lines, #N tokens must survive.
    val f1 = Bench.maskPlan("Filter (isnotnull(p_brand#0) AND (p_brand#0 = Brand#1))")
    val f2 = Bench.maskPlan("Filter (isnotnull(p_brand#0) AND (p_brand#0 = Brand#2))")
    assert(f1 != f2, "literal-only change must flip the masked plan")
    // ...while the same literal inside a DPP line is sacrificed to the
    // exprId mask (narrow, documented cost of scoping by line)
    val d1 = Bench.maskPlan("   SubqueryAdaptiveBroadcast dpp, Project [k#42L]")
    val d2 = Bench.maskPlan("   SubqueryAdaptiveBroadcast dpp, Project [k#77L]")
    assert(d1 == d2, "DPP-line exprIds must still be masked")
  }
}
