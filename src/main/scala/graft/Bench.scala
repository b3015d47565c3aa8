package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline query set on SPARK_GRAFT_SF_DIR,
  * writes the full record to `bench_out.json`, and prints a COMPACT one-line
  * JSON summary (no rep_times/plan_sha — the full line was several KB and
  * log tail-capture front-truncated it; the file is the complete artifact). After an untimed smoke-scale warm-up, each
  * query runs SPARK_GRAFT_BENCH_REPS times (default 3) at the bench scale
  * and reports the per-query MINIMUM — single cold runs of sub-1.5 s
  * queries swing ±20% on JVM/GC noise, which made round-over-round
  * comparison unattributable. Results are materialized via count() of the
  * final plan.
  *
  * Contended-box detection: a rep spread wider than [[NoisyRatio]] (max/min
  * over the reps of one query) is the signature of environment interference,
  * not code — rep 2 fast while reps 1/3 are 50× slower can't be a plan
  * property. Such queries re-run one extra batch of reps (appended, min
  * still wins) and any query whose spread STAYS pathological is named in the
  * `"noisy"` output field, so a poisoned artifact says so instead of lying.
  */
object Bench {

  /** Max/min rep-time ratio beyond which a query's timing is considered
    * environment-poisoned and re-measured. */
  val NoisyRatio = 5.0

  /** Mask run-specific artifacts out of a canonicalized plan string so its
    * hash is stable across sessions and machines: scan Locations embed
    * absolute paths (the IVF/PQ cache dirs embed a content-keyed hash, and
    * tmp/warehouse paths differ per host), and localCheckpoint scans print
    * the session-scoped RDD id (`Scan ExistingRDD[...]` arguments). A
    * changed sha then means a REAL plan change, which is the one thing the
    * fingerprint exists to attribute. */
  private[graft] def maskPlan(plan: String): String =
    plan
      // Exchange/Subquery nodes print their plan_id — a SESSION-GLOBAL
      // counter, so any variation in what ran earlier in the session
      // (index-cache hit vs build, a noisy re-run batch, feed chunking)
      // shifts every later query's ids. This is what made q21/d5 appear in
      // `plan_changed` on EVERY bench run since r13: their canonicalized
      // plans keep a user-repartition Exchange line that prints the id.
      // Masked (r16) — node type, partitioning, and width stay visible.
      .replaceAll("""\[plan_id=\d+\]""", "[plan_id=N]")
      // InMemoryFileIndex(1 paths)[file:/tmp/...] and any file:/ URI token
      .replaceAll("""InMemoryFileIndex\([^)]*\)\[[^\]]*\]""", "InMemoryFileIndex[MASKED]")
      .replaceAll("""file:/[^\s\]),]*""", "file:MASKED")
      // absolute fs paths outside a file: URI (e.g. PartitionPath logs)
      .replaceAll("""(?<=[\[\s(,])/(?:tmp|root|home)/[^\s\]),]*""", "/MASKED")
      // expression ids: canonicalization normalizes them in the main tree
      // (sequential, deterministic — left VISIBLE so a real attribute change
      // flips the sha), but a SubqueryAdaptiveBroadcast (DPP) embeds its
      // build plan UNcanonicalized, where raw exprIds are session-allocation
      // order — pure noise. Mask #NNN ONLY on those subquery lines: a
      // blanket mask also swallowed plan-meaningful literals like 'Brand#1'
      // in Filter/PushedFilters text, so a literal-only filter change left
      // the sha unchanged — the exact misattribution the fingerprint exists
      // to prevent (PlanSpec pins both properties).
      .split("\n", -1).map { line =>
        if (line.contains("SubqueryAdaptiveBroadcast") ||
            line.contains("SubqueryBroadcast") ||
            line.contains("dynamicpruning"))
          line.replaceAll("""#\d+""", "#N")
        else line
      }.mkString("\n")
      // canonicalization renders a commutative AND of PartitionFilters as
      // multicommutativeop(...) with operand order that varies BY JVM (it
      // sorts on hashCodes), and the scan line truncates the list so the
      // operands can't be re-sorted here — mask the operand list (the
      // clause's PRESENCE still distinguishes a pruned from an unpruned
      // scan; PushedFilters/ReadSchema stay visible)
      .replaceAll("""multicommutativeop\([^\n]*?(?=, PushedFilters: |, ReadSchema: |\n|$)""",
        "multicommutativeop(MASKED)")

  /** Other live graft JVMs on this box (main-class names), self excluded —
    * a concurrent JVM contention-poisons every timing in this run (round
    * 14: the sf0.1 round bench overlapped an sf100 streaming chunk and all
    * 22 entries read 1.2–1.8× slow with zero plan changes). The bench
    * STAMPS rather than refuses — a driver-scheduled round bench must
    * produce an artifact — so a poisoned recording says so in-band
    * (`"concurrent"` field) instead of masquerading as a regression.
    * /proc scan, zero dependencies; returns empty on non-Linux. */
  private def concurrentGraftJvms(): Seq[String] = try {
    val self = ProcessHandle.current().pid()
    val dir = new java.io.File("/proc")
    if (!dir.isDirectory) Seq.empty
    else dir.listFiles().toSeq
      .filter(f => f.getName.forall(_.isDigit) && f.getName.toLong != self)
      .flatMap { f =>
        try {
          val cmd = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(f.getPath, "cmdline")),
            java.nio.charset.StandardCharsets.UTF_8).split('\u0000')
          if (cmd.headOption.exists(_.contains("java")))
            cmd.find(a => a.startsWith("graft.") && !a.contains("=")).toSeq
          else Seq.empty
        } catch { case _: Throwable => Seq.empty }
      }
  } catch { case _: Throwable => Seq.empty }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // sampled at start AND end of the run: a poisoner present at either
    // edge (or both) is named in the artifact's "concurrent" field
    val concurrentAtStart = concurrentGraftJvms()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // Shuffle width is POLICY now, not a knob: derived from the tier's
    // input bytes (Engine.shuffleWidth — one partition per 16 MB of input,
    // floored at cores), because the sf10 probe measured d2 spill-bound at
    // 23x/decade when width was pinned to core count vs 10x/decade
    // (linear) when width scaled with data; see SCALE.md.
    // SPARK_GRAFT_SHUFFLE remains an explicit A/B override for probes.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      graft.core.Engine.shuffleWidth(sfDir, cpus.toInt).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the bench tiers are SINGLE parquet files; without sub-file splits
      // every scan (and the partial agg riding it) is one task, which
      // serializes the map side exactly where a real cluster would fan out
      // over row groups. 16m keeps the sf1 probe's 120 MB lineitem at ~8
      // scan partitions; the library default (128m) stays untouched — at
      // 100 TB files arrive pre-split and bigger tasks are correct.
      .config("spark.sql.files.maxPartitionBytes", "16m")
      // aggressive periodic GC so the ContextCleaner actually releases
      // finished queries' shuffle files: at a large bench heap (sf100 runs
      // 64g) ordinary GC pressure is too low to ever collect the shuffle
      // references, the cleaner never fires, and tens of GB of dead
      // shuffle data accumulate until the disk fills — measured: the first
      // sf100 attempt died ENOSPC mid-warmup with ~50 GB of orphaned
      // shuffle dirs. Long-lived real deployments run exactly this knob.
      // 1min after the THIRD sf100 attempt: the GC can only reclaim DEAD
      // shuffle, and at a 5 GB/min production rate a 2min dwell stacks one
      // rep's garbage under the next rep's live writes.
      // SPARK_GRAFT_GC_INTERVAL: scratch-pressure override for the scale
      // tiers. d2's sf100 recording produced dead shuffle at ~6 GB/min
      // while the PREVIOUS execution's ~30 GB corpse was still inside the
      // 1min reclaim lag - the disk bottomed at 204 MB and 143 tasks took
      // ENOSPC before the cleaner caught up. 20s reclaim lag is the
      // difference between riding the dwell curve and falling off it.
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_GC_INTERVAL", "1min"))
      // single-JVM local mode: an executor heartbeat is a self-ping, and
      // "losing" the only executor to a missed one is fatal chaos, not
      // fault tolerance. The sf100 fourth attempt died exactly so: a 149s
      // stop-the-world full GC (the periodic System.gc() at a 64g heap,
      // see run_tool.sh's ExplicitGCInvokesConcurrent) crossed the 120s
      // default and HeartbeatReceiver removed the driver-executor. A
      // cluster deployment keeps the defaults - there a dead-silent
      // executor really is lost.
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      // tier-keyed codec + compressed checkpoints, same policy (and
      // rationale) as Engine.session / Engine.ioCodec: attempt 3 died
      // ENOSPC under q21's ~3x-lineitem live lz4 shuffle+spill plus 8 GB
      // of uncompressed durable-Stage checkpoint blocks on the ~94 GB
      // volume; zstd above the tier threshold, lz4 below it (where its
      // per-stream constants are a measured 3x wall regression).
      .config("spark.io.compression.codec", graft.core.Engine.ioCodec(sfDir))
      .config("spark.checkpoint.compress", "true")
      // stateful streaming entries run on the POLICY state store
      // (Engine.stateStoreProvider): in-memory while projected state fits
      // the heap, RocksDB above that — measured constants in SCALE.md
      .config("spark.sql.streaming.stateStore.providerClass",
        graft.core.Engine.stateStoreProvider(sfDir))
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      .config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows",
        "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // staging policy (core.Stage): Bench builds its own session (bench-
    // specific knobs above), so it must apply the durable-stage policy
    // itself — the second sf100 attempt died in the localCheckpoint
    // eviction-vs-shuffle-GC race precisely because the round-13 policy
    // lived only in Engine.session and Bench never set the flag
    graft.core.Engine.applyDurableStage(spark,
      graft.core.Engine.durableStagePolicy(sfDir))
    val fns = SparkEntry.queries
    // optional name filter (dev loop / scale probes — e.g. BENCH_sf10 runs
    // only the subquadratic set, leaving out the quadratic-by-spec d5 and
    // the documented-regime d4); the driver never sets it → full set
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    // untimed warm-up, two passes: the smoke scale first (JIT, codegen
    // cache, parquet footer readers), then ONE pass at the bench tier
    // itself so build-once artifacts (IVF/PQ index caches) are built
    // OUTSIDE the timed reps — otherwise rep 1 carries a one-time index
    // build, the min still lands on steady state but the rep spread trips
    // the contention guard for what is really amortized-build cost
    // SPARK_GRAFT_SKIP_TIER_WARMUP: at the big scale tiers a warm-up
    // execution of a 10-minute query buys <2% JIT effect but leaves a
    // corpse of dead shuffle that dwells into rep 1's disk budget — at
    // sf100 that dwell is what ENOSPC'd d2. The smoke-scale pass (JIT,
    // codegen, footer readers) always runs; index-backed entries (sim2,
    // sim6) build their caches lazily on rep 1 instead, visible in the
    // rep spread, which at multi-minute reps stays far under NoisyRatio.
    val skipTierWarmup = sys.env.contains("SPARK_GRAFT_SKIP_TIER_WARMUP")
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    // index-build audit (r16, VERDICT #9): the build-once IVF/PQ caches are
    // (re)built during the UNTIMED tier warm-up, so the timed reps measure
    // probe latency — report that warm-up wall per index-backed entry so
    // the amortization stays auditable per run (a large value = this run
    // paid the build; a small one = cache hit; absent = tier warm-up
    // skipped, the build lands visibly in rep 1's rep_times instead).
    val indexBacked = Set("sim2_ivf_knn", "sim6_ivfpq")
    val indexBuildSecs = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    (if (skipTierWarmup) Seq(warmupDir) else Seq(warmupDir, sfDir)).foreach { dir =>
      queries.Headline.benchNames.filter(keep).foreach { name =>
        val t0 = System.nanoTime()
        try { fns(name)(spark, dir).count() }
        catch { case _: Throwable => () }
        if (dir == sfDir && indexBacked(name))
          indexBuildSecs(name) = (System.nanoTime() - t0) / 1e9
      }
    }
    // a failed query reports null and is EXCLUDED from the total instead of
    // skewing it with a partial/negative wall time
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    def timeReps(name: String, n: Int): Seq[Double] = (1 to n).flatMap { _ =>
      val t0 = System.nanoTime()
      try { fns(name)(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch { case _: Throwable => None }
    }
    def spread(ts: Seq[Double]): Double =
      if (ts.size < 2 || ts.min <= 0) 1.0 else ts.max / ts.min
    val firstPass: Seq[(String, Seq[Double])] =
      queries.Headline.benchNames.filter(keep).map(name => name -> timeReps(name, reps))
    // contended-box guard: one extra batch for pathological spreads; the
    // appended reps keep the evidence (rep_times shows both batches). The
    // noisy VERDICT comes from the RE-RUN batch alone — spread over the
    // combined list is ≥ the first batch's by construction (superset max /
    // subset min), so the old combined test could never clear a query the
    // re-run batch measured tightly, contradicting the "named only if
    // spread STAYS pathological" contract.
    val results: Seq[(String, Seq[Double], Boolean)] = firstPass.map { case (name, ts) =>
      if (spread(ts) > NoisyRatio) {
        val rerun = timeReps(name, reps)
        (name, ts ++ rerun, spread(rerun) > NoisyRatio)
      } else (name, ts, false)
    }
    // streaming throughput evidence: the two stateful shapes whose bounded-
    // state claims were otherwise correctness-gated only — native session
    // windows and the stream-stream interval join — timed END-TO-END
    // (readStream → stateful op → noop sink, processAllAvailable) over the
    // bench tier's events feed, same reps/min discipline as the batch set.
    // The noop sink keeps the measurement about state machinery, not
    // driver-side result collection.
    import graft.streaming.EventStream
    // No catch: a broken events load must fail the bench run loudly, not
    // read as "0 events/sec" (in round 10 that masked a decode regression
    // as a throughput collapse).
    val eventsRows = graft.core.Tables.load(spark, sfDir, "events").count()
    // stateful ops read the conf at planning: narrow the width to the
    // streaming policy (state-commit IO is per-partition-fixed — see
    // Engine.streamShuffleWidth) for the stream entries, restore after
    val streamWidth = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      graft.core.Engine.streamShuffleWidth(sfDir, cpus.toInt).toString)
    spark.conf.set("spark.sql.shuffle.partitions", streamWidth)
    // per-entry state-store evidence from the last completed run: which
    // provider the policy chose, summed state-commit time, peak state
    // memory, rows updated — so the artifact shows WHAT the state machinery
    // cost, not just the wall time it rode in
    val streamStateInfo = scala.collection.mutable.Map.empty[String, String]
    def streamOnce(name: String,
        build: () => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        val q = build().writeStream.format("noop")
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .start()
        try q.processAllAvailable() finally q.stop()
        val ops = q.recentProgress.flatMap(p =>
          Option(p.stateOperators).getOrElse(Array.empty))
        if (ops.nonEmpty) {
          val provider =
            if (spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
              .contains("RocksDB")) "rocksdb" else "memory"
          streamStateInfo(name) =
            s""""$name":{"provider":"$provider","commit_ms":${ops.map(_.commitTimeMs).sum},""" +
            s""""mem_bytes":${ops.map(_.memoryUsedBytes).max},""" +
            s""""rows_updated":${ops.map(_.numRowsUpdated).sum}}"""
        }
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case _: Throwable => None }
    }
    // Feed shape: the JOIN-BUFFERED entry (st6) replays a time-ordered
    // multi-file feed when the chunking policy says state depth is the
    // bottleneck (RocksDB regime only — see Engine.streamFeedChunks for
    // both measured directions); the KEYED-MERGE entry (st5) always
    // replays single-batch, which measured faster at every tier. Prep is
    // reported separately (`stream_feed`), not folded into the per-query
    // wall: a live feed arrives time-ordered for free.
    val feedChunks = sys.env.get("SPARK_GRAFT_FEED_CHUNKS").map(_.toInt)
      .getOrElse(graft.core.Engine.streamFeedChunks(sfDir, joinBuffered = true))
    val (feedDir, feedPrepSec): (Option[String], Double) =
      if (feedChunks > 1 && keep("st6_stream_interval_join")) {
        val t0 = System.nanoTime()
        val dir = EventStream.timeOrderedFeed(spark, sfDir,
          s"${sys.props("java.io.tmpdir")}/graft_stream_feed", feedChunks)
        (Some(dir), (System.nanoTime() - t0) / 1e9)
      } else (None, 0.0)
    def joinSrc(): org.apache.spark.sql.DataFrame =
      feedDir.map(EventStream.readFeedStream(spark, _))
        .getOrElse(EventStream.readStream(spark, sfDir))
    val streamDefs: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "st5_stream_session_window" ->
        (() => EventStream.sessionWindowStats(EventStream.readStream(spark, sfDir))),
      "st6_stream_interval_join" ->
        (() => EventStream.sameUserRecentPairs(joinSrc(), joinSrc())))
    // streams run one batch of reps (no re-run pass): noisy = that spread
    val streamResults: Seq[(String, Seq[Double], Boolean)] =
      streamDefs.filter(d => keep(d._1)).map { case (n, b) =>
        val ts = (1 to reps).flatMap(_ => streamOnce(n, b))
        (n, ts, spread(ts) > NoisyRatio)
      }
    spark.conf.set("spark.sql.shuffle.partitions", shuffle)
    val streamEps = streamResults.collect { case (n, ts, _) if ts.nonEmpty =>
      "\"" + n + "\":" + (eventsRows / ts.min).toLong
    }.mkString("{", ",", "}")
    val all = results ++ streamResults
    val noisy = all.collect {
      case (name, _, isNoisy) if isNoisy => "\"" + name + "\""
    }.mkString("[", ",", "]")
    // per-query physical-plan fingerprint: md5 of the CANONICALIZED plan
    // (expression-id-free) with run-local artifacts masked (scan paths,
    // checkpoint RDD args — see maskPlan), so plan drift across rounds is
    // machine-attributable: an unchanged plan_sha with a changed time is
    // environment; a changed plan_sha is a real plan change. This is
    // planning work only for most queries, but index-backed ones (sim2,
    // sim6) run their small probe/build jobs while constructing the frame.
    val planShaPairs: Seq[(String, String)] =
      queries.Headline.benchNames.filter(keep).map { name =>
        val sha = try {
          val plan = maskPlan(fns(name)(spark, sfDir).queryExecution.executedPlan
            .canonicalized.toString)
          java.security.MessageDigest.getInstance("MD5")
            .digest(plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            .take(6).map(b => f"$b%02x").mkString
        } catch { case _: Throwable => "error" }
        name -> sha
      }
    val planSha = planShaPairs.map { case (n, s) => "\"" + n + "\":\"" + s + "\"" }
      .mkString("{", ",", "}")
    // plan-regression gate: diff each fingerprint against the committed
    // per-tier baseline (`bench_plans.json` in cwd) and name every changed
    // plan in the output, so plan drift is machine-flagged the round it
    // happens instead of hand-noted rounds later (PLANS.md history). Keyed
    // by tier basename because tiers plan differently (derived shuffle
    // width, AQE stats) — a scale-probe run must not read as "every plan
    // changed", nor may it clobber the sf0.1 baseline the driver's
    // round-end run diffs against. Only queries present in both runs can
    // "change"; first-run / newly-added queries aren't drift. Fingerprints
    // are masked per maskPlan, so a flip here is a REAL plan change, not a
    // path or session artifact. The baseline updates in place each run:
    // committing it alongside the round's code is what arms the next
    // round's diff.
    val tierKey = new java.io.File(sfDir).getName
    val plansPath = java.nio.file.Paths.get("bench_plans.json")
    val prevPlansTxt: String = try {
      new String(java.nio.file.Files.readAllBytes(plansPath),
        java.nio.charset.StandardCharsets.UTF_8)
    } catch { case _: Throwable => "{}" }
    val tierRe = ("\"" + java.util.regex.Pattern.quote(tierKey) + "\":\\{([^}]*)\\}").r
    val prevShas: Map[String, String] =
      tierRe.findFirstMatchIn(prevPlansTxt).map(_.group(1))
        .map { body =>
          """"([^"]+)":"([^"]+)"""".r.findAllMatchIn(body)
            .map(g => g.group(1) -> g.group(2)).toMap
        }.getOrElse(Map.empty)
    val planChanged = planShaPairs.collect {
      case (n, s) if prevShas.get(n).exists(_ != s) => "\"" + n + "\""
    }.mkString("[", ",", "]")
    // write back this tier's fingerprints, preserving the other tiers' maps
    // AND this tier's entries for queries outside the current name filter —
    // a SPARK_GRAFT_BENCH_ONLY probe must refresh only what it measured,
    // not clobber the full-set baseline down to its subset
    try {
      val otherTiers = """"([^"]+)":(\{[^}]*\})""".r.findAllMatchIn(prevPlansTxt)
        .map(g => g.group(1) -> g.group(2)).toMap - tierKey
      val tierMerged = (prevShas ++ planShaPairs.toMap).toSeq.sortBy(_._1)
        .map { case (n, s) => "\"" + n + "\":\"" + s + "\"" }.mkString("{", ",", "}")
      val merged = (otherTiers + (tierKey -> tierMerged)).toSeq.sortBy(_._1)
        .map { case (t, m) => "\"" + t + "\":" + m }.mkString("{", ",", "}")
      java.nio.file.Files.write(plansPath,
        (merged + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    // headline stays min-of-reps; rep_times persists EVERY rep so a
    // round-over-round swing is attributable (did the reps agree, or did
    // one environmental outlier poison the min?)
    def fmt(d: Double): String = BigDecimal(d)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = all.map { case (k, ts, _) =>
      "\"" + k + "\":" + (if (ts.nonEmpty) fmt(ts.min) else "null")
    }.mkString("{", ",", "}")
    val repTimes = all.map { case (k, ts, _) =>
      "\"" + k + "\":[" + ts.mkString(",") + "]"
    }.mkString("{", ",", "}")
    // the headline total stays the BATCH query set (comparable round over
    // round); the streaming micro-bench reports its own total beside the
    // per-entry times and events/s
    val total = results.filter(_._2.nonEmpty).map(_._2.min).sum
    val streamTotal = streamResults.filter(_._2.nonEmpty).map(_._2.min).sum
    val failed = all.collect { case (k, ts, _) if ts.isEmpty => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val streamState = streamDefs.map(_._1).flatMap(streamStateInfo.get)
      .mkString("{", ",", "}")
    val concurrent = (concurrentAtStart ++ concurrentGraftJvms()).distinct
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val indexBuild = indexBuildSecs
      .map { case (n, t) => "\"" + n + "\":" + fmt(t) }.mkString("{", ",", "}")
    val head = s""""metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"noisy":$noisy,"stream_total_sec":${fmt(streamTotal)},"stream_events_per_sec":$streamEps,"stream_state":$streamState,"stream_feed":{"chunks":$feedChunks,"prep_sec":${fmt(feedPrepSec)}},"index_build_sec":$indexBuild,"failed":$failed,"plan_changed":$planChanged,"concurrent":$concurrent,"reps":$reps,"shuffle":$shuffle,"sf":"$sfDir""""
    val full = s"""{$head,"rep_times":$repTimes,"plan_sha":$planSha}"""
    // capture-proof artifact first, THEN the stdout line the driver tails.
    // The stdout line is the COMPACT form — totals, per-query min, noisy /
    // failed — WITHOUT rep_times/plan_sha: the full line is several KB and
    // the driver's tail-capture front-truncated it two rounds running
    // ("parsed": null); the ~1 KB summary always survives, and the full
    // record lives in bench_out.json.
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    println(s"""{$head,"detail":"bench_out.json"}""")
    spark.stop()
  }
}
