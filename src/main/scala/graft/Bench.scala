package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline query set on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. After an untimed smoke-scale warm-up, each query
  * runs SPARK_GRAFT_BENCH_REPS times (default 2) at the bench scale and
  * reports the per-query MINIMUM — single cold runs of sub-1.5 s queries
  * swing ±20% on JVM/GC noise, which made round-over-round comparison
  * unattributable. Results are materialized via count() of the final plan. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fns = SparkEntry.queries
    // untimed warm-up at the smoke scale: JIT, codegen cache, parquet
    // footer readers — so timings measure the queries, not JVM cold start
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    queries.Headline.benchNames.foreach { name =>
      try { fns(name)(spark, warmupDir).count() }
      catch { case _: Throwable => () }
    }
    // a failed query reports null and is EXCLUDED from the total instead of
    // skewing it with a partial/negative wall time
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val results: Seq[(String, Seq[Double])] = queries.Headline.benchNames.map { name =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fns(name)(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }
      name -> times
    }
    // per-query physical-plan fingerprint: md5 of the CANONICALIZED plan
    // (expression-id-free), so plan drift across rounds is
    // machine-attributable — an unchanged plan_sha with a changed time is
    // environment; a changed plan_sha is a real plan change. Planning only,
    // no execution.
    val planSha = queries.Headline.benchNames.map { name =>
      val sha = try {
        val plan = fns(name)(spark, sfDir).queryExecution.executedPlan
          .canonicalized.toString
        java.security.MessageDigest.getInstance("MD5")
          .digest(plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .take(6).map(b => f"$b%02x").mkString
      } catch { case _: Throwable => "error" }
      "\"" + name + "\":\"" + sha + "\""
    }.mkString("{", ",", "}")
    // headline stays min-of-reps; rep_times persists EVERY rep so a
    // round-over-round swing is attributable (did the reps agree, or did
    // one environmental outlier poison the min?) — the r04→r05 q3/q5 jump
    // was undiagnosable precisely because only the min survived
    val qs = results.map { case (k, ts) =>
      "\"" + k + "\":" + (if (ts.nonEmpty) ts.min.toString else "null")
    }.mkString("{", ",", "}")
    val repTimes = results.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results.filter(_._2.nonEmpty).map(_._2.min).sum
    val failed = results.collect { case (k, ts) if ts.isEmpty => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rep_times":$repTimes,"plan_sha":$planSha,"failed":$failed,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
