package graft

import org.apache.spark.sql.functions._

import graft.core.{Catalog, Tables}
import graft.load.Loader
import graft.queries.Inventory

class EngineSpec extends SparkTestBase {

  test("STATIC_WIDTHS stays in sync with Catalog.widthOf over live schemas") {
    Tables.names.foreach { n =>
      val w = Catalog.rowWidth(Tables.load(spark, sfDir, n).schema)
      assert(Inventory.STATIC_WIDTHS(n) == w, s"width drift for $n")
    }
  }

  test("table inventory lists every table with positive size") {
    val inv = Catalog.tableInventory(spark, sfDir).collect()
    assert(inv.length == Tables.names.length)
    assert(inv.forall(_.getLong(1) > 0))
    assert(inv.forall(r => r.getLong(2) > r.getLong(1))) // bytes > rows
  }

  test("load verify promotes on match and rolls back on mismatch") {
    val base = java.nio.file.Files.createTempDirectory("graft_load_spec").toString
    val nation = Tables.load(spark, sfDir, "nation")
    val ok = Loader.loadVerified(nation, nation.count(), s"$base/good")
    assert(ok.ok && ok.loaded == ok.expected)
    assert(new java.io.File(s"$base/good").exists)
    // mismatch: wrong expected count → staged data discarded, no final dir
    val bad = Loader.loadVerified(nation, nation.count() + 1, s"$base/bad")
    assert(!bad.ok)
    assert(!new java.io.File(s"$base/bad").exists)
    assert(!new java.io.File(s"$base/bad.staging").exists)
  }

  test("resume reconciliation is an anti-join over checkpoint state") {
    import spark.implicits._
    val listed = Seq("a", "b", "c", "d").toDF("t")
    val done = Seq("b", "d").toDF("t")
    val pending = graft.extract.Extract.pendingWork(listed, done, "t")
      .collect().map(_.getString(0)).sorted
    assert(pending.sameElements(Array("a", "c")))
  }

  test("ragged rule-list source parses 4/3/2-field lines (S5)") {
    val (rules, replaces) = graft.rewrite.RuleSource.parse(Seq(
      "# comment line",
      "ALTER TABLE,COMMENT,FOREIGN KEY,REFERENCES",
      "CREATE INDEX,COMMENT,HNG",
      "EXTERNAL NAME,COMMENT",
      "CREATE EXISTING TABLE,COMMENT,NULL,NULL",
      "DBA,HDLADMIN",
      ""))
    assert(rules.size == 4)
    assert(rules.head == graft.rewrite.Rewriter.Rule(
      "ALTER TABLE", Some("FOREIGN KEY"), Some("REFERENCES"), "alter table"))
    assert(rules(3).pat1.isEmpty && rules(3).pat2.isEmpty) // NULL placeholders
    assert(replaces == Seq(graft.rewrite.Rewriter.Replace("DBA", "HDLADMIN")))
  }

  test("extract manifest carries the completeness sentinel (S11/O5)") {
    val out = java.nio.file.Files.createTempDirectory("graft_manifest").toString
    val n = graft.extract.Extract.extractGzipCsv(
      Tables.load(spark, sfDir, "nation"), out, numFiles = 2)
    val m = graft.extract.Extract.readManifest(spark, out).collect()(0)
    assert(m.getAs[Boolean]("complete"))
    assert(m.getAs[Long]("rows") == n)
    assert(m.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("files").nonEmpty)
    // manifest is invisible to the data reader (underscore-prefixed)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == n)
  }

  test("identity assignment is dense, unique, and order-stable") {
    val df = Tables.load(spark, sfDir, "customer").orderBy("c_custkey")
    val withId = graft.core.Identity.assign(df, "rid", startAt = 100L)
    val ids = withId.select("rid").collect().map(_.getLong(0)).sorted
    assert(ids.head == 100L && ids.last == 100L + df.count() - 1)
    assert(ids.distinct.length == ids.length)
  }

  test("salted join equals the plain join (skew mitigation is lossless)") {
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_partkey")
    val part = Tables.load(spark, sfDir, "part").select("p_partkey", "p_brand")
    val plain = li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = graft.core.Salting.saltedJoin(li, part, "l_partkey", "p_partkey", salt = 8)
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("approximate distinct stays within 5% of exact (sketch surface)") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val exact = li.select("l_orderkey").distinct().count().toDouble
    val approx = li.agg(
      org.apache.spark.sql.functions.approx_count_distinct(col("l_orderkey"), 0.01))
      .collect()(0).getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.03)
  }

  test("stream feed chunking is gated on the state-store regime") {
    import graft.core.Engine
    // in-memory regime (state fits a quarter heap): single-batch replay —
    // chunking there only multiplies per-batch commit cost (measured:
    // sf10 st6 40.8 s chunked vs 27.1 s single-batch)
    assert(Engine.streamFeedChunks(sfDir, joinBuffered = true,
      maxHeapBytes = Long.MaxValue) == 1)
    // RocksDB regime (projected state over a quarter heap): join-buffered
    // state chunks (≥2 so the watermark advances at all, capped at 16)…
    val chunked = Engine.streamFeedChunks(sfDir, joinBuffered = true,
      maxHeapBytes = 1L)
    assert(chunked >= 2 && chunked <= 16)
    // …but keyed-merge state (sessions, aggs) never does: every batch
    // rewrites the keys it touches (measured: sf100 st5 368 s chunked vs
    // 140 s single-batch, rows_updated 185.9M vs 98.5M)
    assert(Engine.streamFeedChunks(sfDir, joinBuffered = false,
      maxHeapBytes = 1L) == 1)
    // the two policies key on the SAME projection: whenever the provider
    // says in-memory, the feed must be single-batch
    assert(Engine.stateStoreProvider(sfDir, Long.MaxValue) == Engine.HdfsStateStore)
    assert(Engine.stateStoreProvider(sfDir, 1L) == Engine.RocksDbStateStore)
  }

  test("flagship entry returns rows on the smoke tier") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("durable-stage policy projects staged footprint with a multiplier") {
    assume(sys.env.get("SPARK_GRAFT_STAGE").isEmpty)
    val bytes = graft.core.Engine.dataBytes(sfDir)
    assert(bytes > 0)
    // staged footprint = bytes × 4; durable exactly when that crosses
    // heap/2 — so a heap of 7× tier bytes is over the line (4 > 3.5)...
    assert(graft.core.Engine.durableStagePolicy(sfDir, maxHeapBytes = bytes * 7))
    // ...and 9× is under it (4 < 4.5). The multiplier is the fix for the
    // sf100 postmortem: tier bytes alone sat below heap/2 while the staged
    // intermediates still evicted.
    assert(!graft.core.Engine.durableStagePolicy(sfDir, maxHeapBytes = bytes * 9))
  }

  test("session reuse does not flip the durable-stage policy mid-run") {
    val before = spark.conf.getOption("spark.graft.durableStage")
    try {
      // simulate a live session running under the durable policy...
      spark.conf.set("spark.graft.durableStage", "true")
      // ...then a second caller asks for a session keyed on a tiny tier
      // (whose policy would be "local"): getOrCreate reuses, and the
      // staging policy must stay what the session was created with
      val s2 = graft.core.Engine.session("graft-reuse-test", dataDir = Some(sfDir))
      assert(s2.conf.get("spark.graft.durableStage") == "true")
    } finally before match {
      case Some(v) => spark.conf.set("spark.graft.durableStage", v)
      case None => spark.conf.unset("spark.graft.durableStage")
    }
  }

  test("gatedBroadcast hints under the budget and passes through over it") {
    val df = spark.range(10).toDF("id")
    val hinted = graft.core.Engine.gatedBroadcast(df, estimatedBytes = 1L << 20)
    assert(hinted.queryExecution.logical.collectFirst {
      case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }.nonEmpty, "under-budget side must carry a broadcast hint")
    // over budget: the SAME frame comes back unhinted (q5's supplier path —
    // the join degrades to shuffled/AQE-chosen instead of a driver-built
    // multi-GB relation at a big tier)
    val big = graft.core.Engine.gatedBroadcast(df, estimatedBytes = 1L << 20,
      budget = 0L)
    assert(big.queryExecution.logical eq df.queryExecution.logical,
      "over-budget side must pass through unhinted")
  }

  test("every oracle name is a declared query and every query runs") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    assert(qs.size == SparkEntry.allDefs.size) // no name collisions
  }
}
