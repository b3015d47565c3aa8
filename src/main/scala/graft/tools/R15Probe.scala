package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Stage.Staged
import graft.core.Tables
import graft.functions.Portable

/** Round-15 optimization probe: phase-level wall attribution for the
  * expensive bench pipeline entries (d2/d4/d8/sim6) under the exact bench
  * geometry, so optimization targets the measured phase instead of the
  * guessed one. Dev tool only — never on a driver path. */
object R15Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      graft.core.Engine.shuffleWidth(sfDir, cpus.toInt).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[r15] $tag%-36s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    val which = if (args.isEmpty) Set("d2", "d4", "d8", "warm") else args.toSet

    // one warm pass over the involved tables so JIT/footers don't pollute
    if (which("warm")) {
      val docs = Tables.load(spark, sfDir, "documents")
      timed("warm: docs count")(docs.count())
      timed("warm: d2 full")(graft.pipeline.Dedup.minhashLshPairs(
        docs, "doc_id", "text", threshold = 0.8).count())
      timed("warm: d4 full")(graft.pipeline.Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", threshold = 0.7, shingleN = 3).count())
    }

    if (which("d2")) {
      val docs = Tables.load(spark, sfDir, "documents")
      // replicate minhashLshPairs phase by phase
      val sh = timed("d2: shingle table stage") {
        graft.pipeline.TextOps.shingleTable(docs, "doc_id", "text", 3)
          .select(col("id"), Portable.hash60(col("s")).as("h"))
          .repartition(col("id")).stage()
      }
      println(s"[r15] d2 shingle rows=${timed("d2: shingle count")(sh.count())}")
      val b = timed("d2: bucket table stage") {
        bucketsOf(sh, 96, 4).stage()
      }
      println(s"[r15] d2 bucket rows=${timed("d2: bucket count")(b.count())}")
      val cand = timed("d2: candidate join stage") {
        b.as("x").join(b.as("y"),
            col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
              col("x.id") < col("y.id"))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
          .distinct()
          .stage()
      }
      println(s"[r15] d2 cand rows=${timed("d2: cand count")(cand.count())}")
      timed("d2: verify") {
        verify(sh, cand, 0.8).count()
      }
      timed("d2: FULL (2nd)") {
        graft.pipeline.Dedup.minhashLshPairs(docs, "doc_id", "text",
          threshold = 0.8).count()
      }
    }

    if (which("d4")) {
      val docs = Tables.load(spark, sfDir, "documents")
      import org.apache.spark.sql.expressions.Window
      val threshold = 0.7
      val sh = timed("d4: shingle table stage") {
        graft.pipeline.TextOps.shingleTable(docs, "doc_id", "text", 3)
          .select(col("id"), Portable.hash60(col("s")).as("h"))
          .repartition(col("id")).stage()
      }
      println(s"[r15] d4 shingle rows=${sh.count()}")
      val prefix = timed("d4: prefix stage") {
        val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
        val docFreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
        sh.join(docFreq, Seq("h"))
          .withColumn("rank",
            row_number().over(Window.partitionBy("id").orderBy("df", "h")))
          .join(sizes, Seq("id"))
          .filter(col("rank") <= col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)
          .select("id", "h", "n", "rank")
          .stage()
      }
      println(s"[r15] d4 prefix rows=${prefix.count()}")
      val minOverlap =
        ceil(lit(threshold / (1 + threshold)) * (col("a.n") + col("b.n")) - lit(1e-9))
      val cand = timed("d4: candidate join stage") {
        prefix.as("a").join(prefix.as("b"),
            col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
              least(col("a.n"), col("b.n")) >=
                lit(threshold) * greatest(col("a.n"), col("b.n")) &&
              lit(1) + least(col("a.n") - col("a.rank"), col("b.n") - col("b.rank")) >=
                minOverlap)
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .distinct()
          .stage()
      }
      println(s"[r15] d4 cand rows=${cand.count()}")
      timed("d4: verify") {
        verify(sh, cand, threshold).count()
      }
      timed("d4: FULL (2nd)") {
        graft.pipeline.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          threshold = threshold, shingleN = 3).count()
      }
    }

    if (which("d8")) {
      val emb = Tables.load(spark, sfDir, "embeddings")
      val corpus = graft.queries.Pipeline.plantedNearDupCorpus(emb)
      val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count() + 50
      val r = graft.pipeline.Similarity.rForCorpus(n, threshold = 0.98, numBands = 32)
      println(s"[r15] d8 n=$n r=$r")
      timed("d8: FULL (1st)") {
        graft.SparkEntry.queries("d8_near_dup_tight")(spark, sfDir).count()
      }
      val banded = timed("d8: banded sig stage") {
        val nplanes = r * 32
        val pl = graft.pipeline.Similarity.planesLit(nplanes)
        val bits = transform(sequence(lit(0), lit(nplanes - 1)),
          p => when(graft.pipeline.Similarity.dot(col("v"), element_at(pl, p + 1)) > 0, 1L)
            .otherwise(0L))
        corpus.select(col("vec_id").as("id"), col("v"))
          .repartition(col("id"))
          .select(col("id"), bits.as("bits"))
          .select(col("id"), posexplode(
            transform(sequence(lit(0), lit(31)), b =>
              aggregate(sequence(lit(r - 1), lit(0), lit(-1)), lit(0L),
                (acc, i) => acc * 2 + element_at(col("bits"), b * r + i + 1)))))
          .toDF("id", "band", "bucket")
          .stage()
      }
      println(s"[r15] d8 banded rows=${banded.count()}")
      timed("d8: cand self-join+distinct") {
        banded.as("x").join(banded.as("y"),
            col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
              col("x.id") < col("y.id"))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
          .distinct()
          .count()
      }
      timed("d8: FULL (2nd)") {
        graft.SparkEntry.queries("d8_near_dup_tight")(spark, sfDir).count()
      }
    }

    // HYPOTHESIS A: skip .stage() entirely (one job, rely on AQE exchange
    // reuse for the self-join / multi-consumer subtrees)
    if (which("nostage")) {
      val docs = Tables.load(spark, sfDir, "documents")
      def d2nostage(spread: Boolean): Long = {
        val base = if (spread) docs.repartition(col("doc_id")) else docs
        val sh = graft.pipeline.TextOps.shingleTable(base, "doc_id", "text", 3)
          .select(col("id"), Portable.hash60(col("s")).as("h"))
        val b = bucketsOf(sh, 96, 4)
        val cand = b.as("x").join(b.as("y"),
            col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
              col("x.id") < col("y.id"))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
          .distinct()
        verifyNoStage(sh, cand, 0.8).count()
      }
      timed("d2 nostage (1st)")(println(d2nostage(false)))
      timed("d2 nostage (2nd)")(println(d2nostage(false)))
      timed("d2 nostage+spread (1st)")(println(d2nostage(true)))
      timed("d2 nostage+spread (2nd)")(println(d2nostage(true)))
      // HYPOTHESIS B: keep staging, but spread the DOCS before tokenize
      def d2spread(): Long = {
        val sh = graft.pipeline.TextOps
          .shingleTable(docs.repartition(col("doc_id")), "doc_id", "text", 3)
          .select(col("id"), Portable.hash60(col("s")).as("h"))
          .stage()
        val b = bucketsOf(sh, 96, 4).stage()
        val cand = b.as("x").join(b.as("y"),
            col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
              col("x.id") < col("y.id"))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
          .distinct()
          .stage()
        verify(sh, cand, 0.8).count()
      }
      timed("d2 staged+spread (1st)")(println(d2spread()))
      timed("d2 staged+spread (2nd)")(println(d2spread()))
    }

    // coalescing A/B: how much of the serialization is AQE's byte-based
    // partition coalescing (minPartitionSize floor) on CPU-dense stages
    if (which("coalesce")) {
      val docs = Tables.load(spark, sfDir, "documents")
      def runAll(tag: String): Unit = {
        Seq("d2" -> (() => graft.pipeline.Dedup.minhashLshPairs(
              docs, "doc_id", "text", threshold = 0.8).count()),
            "d4" -> (() => graft.pipeline.Dedup.ngramJaccardPairs(
              docs, "doc_id", "text", threshold = 0.7, shingleN = 3).count()),
            "d8" -> (() => graft.SparkEntry.queries("d8_near_dup_tight")(spark, sfDir).count()),
            "d5" -> (() => graft.SparkEntry.queries("d5_embedding_near_dup")(spark, sfDir).count()),
            "sim6" -> (() => graft.SparkEntry.queries("sim6_ivfpq")(spark, sfDir).count())
        ).foreach { case (n, f) =>
          val ts = (1 to 2).map { _ =>
            val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
          }
          println(f"[r15] $tag $n min=${ts.min}%6.2f reps=${ts.map(t => f"$t%.2f").mkString(",")}")
        }
      }
      runAll("base   ")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      runAll("min64k ")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      runAll("nocoal ")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    }

    // listener attribution: wall vs summed task time, job/stage/task counts
    if (which("listen")) {
      val docs = Tables.load(spark, sfDir, "documents")
      @volatile var jobs = 0
      @volatile var stages = 0
      @volatile var tasks = 0
      @volatile var taskMs = 0L
      @volatile var gcMs = 0L
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
        override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stages += 1
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks += 1
          if (t.taskInfo != null) taskMs += t.taskInfo.duration
          if (t.taskMetrics != null) gcMs += t.taskMetrics.jvmGCTime
        }
      }
      def attributed(tag: String)(f: => Unit): Unit = {
        jobs = 0; stages = 0; tasks = 0; taskMs = 0L; gcMs = 0L
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime()
        f
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let listener drain
        spark.sparkContext.removeSparkListener(l)
        println(f"[r15] $tag%-20s wall=$wall%6.2f s jobs=$jobs stages=$stages " +
          f"tasks=$tasks taskSum=${taskMs / 1e3}%6.2f s gc=${gcMs / 1e3}%5.2f s")
      }
      attributed("d2 listen") {
        graft.pipeline.Dedup.minhashLshPairs(docs, "doc_id", "text",
          threshold = 0.8).count()
      }
      attributed("d4 listen") {
        graft.pipeline.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          threshold = 0.7, shingleN = 3).count()
      }
      attributed("d8 listen") {
        graft.SparkEntry.queries("d8_near_dup_tight")(spark, sfDir).count()
      }
      attributed("sim6 listen") {
        graft.SparkEntry.queries("sim6_ivfpq")(spark, sfDir).count()
      }
      attributed("d5 listen") {
        graft.SparkEntry.queries("d5_embedding_near_dup")(spark, sfDir).count()
      }
      attributed("q5 listen") {
        graft.SparkEntry.queries("q5_local_revenue")(spark, sfDir).count()
      }
    }

    // explicit-width repartition before staging: AQE cannot coalesce a
    // user repartition with explicit N, so staged frames stay parallel
    if (which("d2w")) {
      val docs = Tables.load(spark, sfDir, "documents")
      val w = spark.sessionState.conf.numShufflePartitions
      def d2wide(): Long = {
        val sh = graft.pipeline.TextOps.shingleTable(docs, "doc_id", "text", 3)
          .select(col("id"), Portable.hash60(col("s")).as("h"))
          .repartition(w, col("id")).stage()
        val b = bucketsOf(sh, 96, 4).stage()
        val cand = b.as("x").join(b.as("y"),
            col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
              col("x.id") < col("y.id"))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
          .distinct()
          .stage()
        verify(sh, cand, 0.8).count()
      }
      (1 to 3).foreach(i => timed(s"d2 explicit-width $i")(println(d2wide())))
      (1 to 2).foreach(i => timed(s"d2 current $i")(
        graft.pipeline.Dedup.minhashLshPairs(docs, "doc_id", "text",
          threshold = 0.8).count()))
    }

    if (which("stream")) {
      import graft.streaming.EventStream
      def once(tag: String, build: () => org.apache.spark.sql.DataFrame): Unit = {
        spark.conf.set("spark.sql.shuffle.partitions",
          graft.core.Engine.streamShuffleWidth(sfDir, cpus.toInt).toString)
        val t0 = System.nanoTime()
        val q = build().writeStream.format("noop")
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .start()
        val t1 = System.nanoTime()
        try q.processAllAvailable() finally q.stop()
        val t2 = System.nanoTime()
        println(f"[r15] $tag start=${(t1 - t0) / 1e9}%5.2f run=${(t2 - t1) / 1e9}%5.2f")
        q.recentProgress.foreach { p =>
          println(s"[r15]   batch=${p.batchId} durationMs=${p.durationMs}")
        }
        spark.conf.set("spark.sql.shuffle.partitions", shuffle)
      }
      (1 to 2).foreach { i =>
        once(s"st5($i)", () => EventStream.sessionWindowStats(
          EventStream.readStream(spark, sfDir)))
        once(s"st6($i)", () => EventStream.sameUserRecentPairs(
          EventStream.readStream(spark, sfDir), EventStream.readStream(spark, sfDir)))
      }
    }

    if (which("micro")) {
      val docs = Tables.load(spark, sfDir, "documents")
      (1 to 3).foreach(i => timed(s"micro: empty job $i")(
        spark.range(1000).count()))
      (1 to 3).foreach(i => timed(s"micro: 32-task shuffle job $i")(
        spark.range(1000000).repartition(32).count()))
      val sh = graft.pipeline.TextOps.shingleTable(docs, "doc_id", "text", 3)
        .select(col("id"), Portable.hash60(col("s")).as("h"))
        .repartition(col("id")).stage()
      (1 to 2).foreach(i => timed(s"micro: sh count $i")(sh.count()))
      val shNo = graft.pipeline.TextOps.shingleTable(docs, "doc_id", "text", 3)
        .select(col("id"), Portable.hash60(col("s")).as("h"))
      (1 to 2).foreach(i => timed(s"micro: sh compute-only $i")(shNo.count()))
      (1 to 2).foreach(i => timed(s"micro: sh stage-job $i")(
        graft.pipeline.TextOps.shingleTable(docs, "doc_id", "text", 3)
          .select(col("id"), Portable.hash60(col("s")).as("h"))
          .repartition(col("id")).stage().count()))
      val wide = {
        val prime = 2147483647L
        val rnd = new scala.util.Random(0x9e3779b9L)
        val consts = (0 until 96).map { p =>
          (p, rnd.nextLong(prime - 1) + 1, rnd.nextLong(prime - 1) + 1, rnd.nextLong(prime))
        }
        val aggs = consts.map { case (p, pa, pb, pc) =>
          min((lit(pa) * col("hi") + lit(pb) * col("lo") + lit(pc)) % prime).as(s"mh$p")
        }
        sh.select(col("id"), (col("h") % (1L << 30)).as("lo"),
            shiftright(col("h"), 30).as("hi"))
          .groupBy("id").agg(aggs.head, aggs.tail: _*)
      }
      (1 to 2).foreach(i => timed(s"micro: wide agg compute $i")(wide.count()))
      (1 to 2).foreach(i => timed(s"micro: buckets compute $i")(
        bucketsOf(sh, 96, 4).count()))
      (1 to 2).foreach(i => timed(s"micro: buckets stage $i")(
        bucketsOf(sh, 96, 4).stage().count()))
    }

    if (which("sim6")) {
      (1 to 2).foreach { i =>
        timed(s"sim6: FULL ($i)") {
          graft.SparkEntry.queries("sim6_ivfpq")(spark, sfDir).count()
        }
      }
    }

    if (which("sim6p")) {
      import graft.pipeline.{Pq, Similarity}
      import graft.queries.Pipeline.{cachedIvfDir, plantedQueries}
      val e = Tables.load(spark, sfDir, "embeddings")
      val idx = Similarity.ivfBuildCached(e, "embedding", "label",
        cachedIvfDir(sfDir, "sim2", "cellCol=label"))
      val ed = e.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val base = cachedIvfDir(sfDir, "sim6",
        s"pq,m=8,k=16,iters=2,cellCol=label,pqv${Pq.PqBuildVersion}")
      val books = timed("sim6p: books")(Pq.trainCodebooksCached(ed, "vec_id", "v",
        m = 8, k = 16, iters = 2, dim = 64, base + "_books", spark))
      val codesPath = timed("sim6p: codes cache")(Pq.encodeCellsCached(spark, idx,
        "vec_id", "embedding", "label", books, m = 8, dim = 64, base + "_cellcodes"))
      val planted = plantedQueries(e)
        .select(col("vec_id"), transform(col("v"), x => x.cast("float")).as("embedding"))
      timed("sim6p: centroids read")(Similarity.readCentroids(spark, idx).count())
      val cent = Similarity.readCentroids(spark, idx).withColumnRenamed("label", "cell")
      val q = planted.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .withColumn("qn", Similarity.norm(col("qv")))
      val probed = Pq.probedCells(cent, q, nprobe = 4)
      timed("sim6p: probe+collect")(println(
        probed.select("cell").distinct().collect().mkString(",")))
      val codes = spark.read.parquet(codesPath)
      println(s"[r15] sim6p codes rows=${timed("sim6p: codes count")(codes.count())}")
      timed("sim6p: ivfPqTopK full")(Pq.ivfPqTopK(spark, idx, books, planted,
        "vec_id", "embedding", "label", m = 8, dim = 64, k = 5, nprobe = 4,
        shortlist = 25, codesPath = Some(codesPath)).count())
      timed("sim6p: ivfPqTopK again")(Pq.ivfPqTopK(spark, idx, books, planted,
        "vec_id", "embedding", "label", m = 8, dim = 64, k = 5, nprobe = 4,
        shortlist = 25, codesPath = Some(codesPath)).count())
      // bisect inside the query path: ADC join volume, ADC+window, rerank
      val lutQ = q.select(col("query_id").as("vec_id"),
        transform(col("qv"), x => x.cast("double")).as("__v"))
      val probedJ = probed.join(
        Pq.probedLutsForProbe(lutQ, books, "vec_id", "__v", 8, 64), Seq("query_id"))
      val codesCells = codes.select(col("vec_id").as("neighbor_id"), col("codes"), col("cell"))
      val joined = codesCells.join(probedJ, Seq("cell"))
        .filter(col("neighbor_id") =!= col("query_id"))
      println(s"[r15] sim6p scored rows=${timed("sim6p: join only")(joined.count())}")
      val adc = Pq.adcScoreForProbe(joined)
      timed("sim6p: join+ADC")(adc.count())
      import org.apache.spark.sql.expressions.Window
      timed("sim6p: join+ADC+window") {
        adc.withColumn("srank", row_number().over(
          Window.partitionBy("query_id").orderBy(desc("adc_cosine"), asc("neighbor_id"))))
          .filter(col("srank") <= 25).count()
      }
    }
    spark.stop()
  }

  // local copies of Dedup's private helpers (banding + verify) so the probe
  // can phase-time them without widening Dedup's API
  private def bucketsOf(sh: DataFrame, numPerm: Int, rowsPerBand: Int): DataFrame = {
    val prime = 2147483647L
    val rnd = new scala.util.Random(0x9e3779b9L)
    val consts = (0 until numPerm).map { p =>
      (p, rnd.nextLong(prime - 1) + 1, rnd.nextLong(prime - 1) + 1, rnd.nextLong(prime))
    }
    val aggs = consts.map { case (p, pa, pb, pc) =>
      min((lit(pa) * col("hi") + lit(pb) * col("lo") + lit(pc)) % prime).as(s"mh$p")
    }
    val wide = sh.select(col("id"), (col("h") % (1L << 30)).as("lo"),
        shiftright(col("h"), 30).as("hi"))
      .groupBy("id").agg(aggs.head, aggs.tail: _*)
    val bands = (0 until numPerm / rowsPerBand).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until rowsPerBand).map(s => col(s"mh${b * rowsPerBand + s}")): _*).as("sig"))
    }
    wide.select(col("id"), explode(array(bands: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  private def verifyNoStage(sh: DataFrame, cand: DataFrame, threshold: Double): DataFrame = {
    val candIds = cand.select(col("id_a").as("id"))
      .unionByName(cand.select(col("id_b").as("id")))
      .distinct()
    val docSets = sh
      .join(candIds, Seq("id"), "left_semi")
      .groupBy("id")
      .agg(collect_list(col("h")).as("set"), count(lit(1)).as("n"))
    cand
      .join(docSets.select(col("id").as("id_a"), col("set").as("sa"), col("n").as("na")),
        Seq("id_a"))
      .join(docSets.select(col("id").as("id_b"), col("set").as("sb"), col("n").as("nb")),
        Seq("id_b"))
      .withColumn("c", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .filter(col("c") / (col("na") + col("nb") - col("c")) >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("c") / (col("na") + col("nb") - col("c")), 4).as("jaccard"))
  }

  private def verify(sh: DataFrame, cand: DataFrame, threshold: Double): DataFrame = {
    val candIds = cand.select(col("id_a").as("id"))
      .unionByName(cand.select(col("id_b").as("id")))
      .distinct()
    val docSets = sh
      .join(candIds, Seq("id"), "left_semi")
      .groupBy("id")
      .agg(collect_list(col("h")).as("set"), count(lit(1)).as("n"))
      .stage()
    cand
      .join(docSets.select(col("id").as("id_a"), col("set").as("sa"), col("n").as("na")),
        Seq("id_a"))
      .join(docSets.select(col("id").as("id_b"), col("set").as("sb"), col("n").as("nb")),
        Seq("id_b"))
      .withColumn("c", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .filter(col("c") / (col("na") + col("nb") - col("c")) >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("c") / (col("na") + col("nb") - col("c")), 4).as("jaccard"))
  }
}
