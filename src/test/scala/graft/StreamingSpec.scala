package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.core.Tables
import graft.streaming.EventStream

class StreamingSpec extends SparkTestBase {

  test("streaming tumbling-window agg matches the batch window agg") {
    val stream = EventStream.windowedCounts(EventStream.readStream(spark, sfDir))
    val q = stream.writeStream
      .format("memory").queryName("win_out")
      .outputMode(OutputMode.Complete())
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("win_out")
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch)
  }

  test("flatMapGroupsWithState sessionization matches the batch w3 semantics") {
    val stream = EventStream.sessionize(EventStream.readStream(spark, sfDir))
    val q = stream.writeStream
      .format("memory").queryName("sess_out")
      .outputMode("update")
      .start()
    try q.processAllAvailable() finally q.stop()
    // update mode: last emitted row per user is the final state
    val got = spark.table("sess_out").groupBy("user_id")
      .agg(max("n_sessions").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch oracle: same gap rule via lag window (the w3 query's logic)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_us")
    val exp = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev", lag("ts_us", 1).over(w))
      .withColumn("ns", when(col("prev").isNull ||
        col("ts_us") - col("prev") > 3600L * 1000000, 1).otherwise(0))
      .groupBy("user_id").agg(sum("ns").cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("stream-static enrichment join matches the batch join") {
    val stream = EventStream.enrichedCountsByNation(
      EventStream.readStream(spark, sfDir),
      Tables.load(spark, sfDir, "customer"),
      Tables.load(spark, sfDir, "nation"))
    val q = stream.writeStream
      .format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Complete())
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("enrich_out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = Tables.load(spark, sfDir, "events")
      .join(Tables.load(spark, sfDir, "customer"), col("user_id") === col("c_custkey"))
      .join(Tables.load(spark, sfDir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp && got.nonEmpty)
  }

  test("streaming session_window finalizes on the watermark and matches batch") {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    // session windows stream in APPEND only: a session emits exactly once,
    // when the watermark proves no event can extend it. Stream from a temp
    // dir so a far-future punctuation event can advance the watermark past
    // every real session in a second micro-batch — the emit-once-final
    // contract, not just a snapshot compare.
    val dir = Files.createTempDirectory("graft_sesswin")
    Files.copy(Paths.get(s"$sfDir/events.parquet"), dir.resolve("events.parquet"))
    // EventStream.readStream probes the file's actual ts encoding; the
    // punctuation row below must be written with the SAME encoding so the
    // second micro-batch parses under the declared stream schema.
    val tsType = spark.read.parquet(dir.resolve("events.parquet").toString)
      .schema("ts").dataType
    // glob "*.parquet": the punctuation append below lands as part-files,
    // which the default events.parquet-only filter would never see.
    val raw = EventStream.readStream(spark, dir.toString, glob = "*.parquet")
    val q = EventStream.sessionWindowStats(raw).writeStream
      .format("memory").queryName("sess_win_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val maxUs = Tables.load(spark, sfDir, "events")
        .agg(max(unix_micros(col("ts")))).head().getLong(0)
      val punctUs = maxUs + 10L * 86400 * 1000000
      Seq((0L, punctUs, 999999L, "punct", 0.0, "{}"))
        .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
        .withColumn("ts", tsType match {
          case org.apache.spark.sql.types.LongType => col("ts_us") * 1000L
          case t => timestamp_micros(col("ts_us")).cast(t)
        })
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_win_out")
      .filter(col("user_id") =!= 999999L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("stream-stream interval join matches the batch join (bounded state)") {
    val pairs = EventStream.sameUserRecentPairs(
      EventStream.readStream(spark, sfDir), EventStream.readStream(spark, sfDir))
    val q = pairs.writeStream
      .format("memory").queryName("ss_join_out")
      .outputMode(OutputMode.Append())
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ss_join_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.load(spark, sfDir, "events").select("event_id", "user_id", "ts")
    val b = ev.select(col("event_id").as("prior_event_id"),
      col("user_id").as("b_user_id"), col("ts").as("b_ts"))
    val batch = ev.join(b,
        col("user_id") === col("b_user_id") &&
          col("prior_event_id") =!= col("event_id") &&
          col("b_ts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
          col("b_ts") <= col("ts"))
      .select("event_id", "prior_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("checkpointed foreachBatch resumes without reprocessing (resume analog)") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val processed = new java.util.concurrent.atomic.AtomicLong(0)
    def runOnce(): Unit = {
      val q = EventStream.readStream(spark, sfDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          processed.addAndGet(batch.count())
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    val afterFirst = processed.get()
    assert(afterFirst == Tables.load(spark, sfDir, "events").count())
    // restart against the same checkpoint: static source unchanged →
    // nothing reprocessed (the control-file resume invariant, streaming form)
    runOnce()
    assert(processed.get() == afterFirst)
  }

  test("watermarked distinct-user stream dedupes within state bounds") {
    val stream = EventStream.distinctUsersPerWindow(EventStream.readStream(spark, sfDir))
    val q = stream.writeStream
      .format("memory").queryName("du_out")
      .outputMode(OutputMode.Complete())
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("du_out").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = Tables.load(spark, sfDir, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("streaming ingest-dedup admits exactly the batch anti-join set (stateless)") {
    import graft.streaming.DocStream
    val corpus = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 3 === 0)
    val stream = DocStream.ingestDedup(DocStream.readStream(spark, sfDir)
        .filter(col("doc_id") % 3 =!= 0), corpus)
    // stateless op → Append mode, no watermark required
    val q = stream.writeStream
      .format("memory").queryName("ingest_out")
      .outputMode(OutputMode.Append())
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(q.lastProgress.stateOperators.isEmpty) // the stateless contract
    val got = spark.table("ingest_out").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val exp = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 3 =!= 0)
      .withColumn("fp", graft.pipeline.TextOps.fingerprint(col("text")))
      .join(corpus.select(
        graft.pipeline.TextOps.fingerprint(col("text")).as("fp")).distinct(),
        Seq("fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == exp && got.nonEmpty)
  }

  test("time-ordered chunked feed matches the single-batch stream results") {
    // The chunked feed exists so the watermark advances (and state evicts)
    // between micro-batches at scale; because chunks are time-ordered no
    // row is ever late, so the OUTPUT must be identical to the one-batch
    // replay — for both stateful shapes the bench measures over it.
    import org.apache.spark.sql.DataFrame
    val feed = EventStream.timeOrderedFeed(spark, sfDir,
      s"${sys.props("java.io.tmpdir")}/graft_test_feed", 3)

    def run(df: DataFrame, name: String): Set[String] = {
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name).collect().map(_.mkString("|")).toSet
    }

    val joinSingle = run(EventStream.sameUserRecentPairs(
      EventStream.readStream(spark, sfDir),
      EventStream.readStream(spark, sfDir)), "cf_join_single")
    val joinChunked = run(EventStream.sameUserRecentPairs(
      EventStream.readFeedStream(spark, feed),
      EventStream.readFeedStream(spark, feed)), "cf_join_chunked")
    assert(joinChunked == joinSingle && joinSingle.nonEmpty)

    val sessSingle = run(EventStream.sessionWindowStats(
      EventStream.readStream(spark, sfDir)), "cf_sess_single")
    val sessChunked = run(EventStream.sessionWindowStats(
      EventStream.readFeedStream(spark, feed)), "cf_sess_chunked")
    assert(sessChunked == sessSingle && sessSingle.nonEmpty)
  }

  test("ingest-dedup broadcast hint is budget-gated, not unconditional") {
    import graft.streaming.DocStream
    val docs = Tables.load(spark, sfDir, "documents")
    val feed = docs.filter(col("doc_id") % 3 =!= 0)
    val corpus = docs.filter(col("doc_id") % 3 === 0)
    // within budget (smoke-tier corpus, default budget): hinted broadcast
    val hinted = DocStream.ingestDedup(feed, corpus)
      .queryExecution.executedPlan.toString
    assert(hinted.contains("BroadcastHashJoin") && hinted.contains("LeftAnti"))
    // over budget (budget forced to 0 — the stand-in for a corpus whose
    // fingerprint set exceeds the broadcast build-side limit): the hint
    // must be OMITTED so the anti-join plans shuffled instead of dying at
    // Spark's 8 GB broadcast ceiling mid-stream. Auto-broadcast is disabled
    // for this half only — at the smoke tier Catalyst's own stats are tiny
    // and would re-broadcast, where a genuinely over-budget corpus's stats
    // are over the threshold too; the property under test is that NO HINT
    // forces a broadcast once the budget says no.
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val shuffled = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      DocStream.ingestDedup(feed, corpus, broadcastBudgetBytes = 0L)
        .queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    assert(!shuffled.contains("BroadcastHashJoin"))
    assert(shuffled.contains("SortMergeJoin") || shuffled.contains("ShuffledHashJoin"))
    // and the two strategies admit the same set (strategy, not semantics)
    assert(DocStream.ingestDedup(feed, corpus, 0L).count() ==
      DocStream.ingestDedup(feed, corpus).count())
  }
}
