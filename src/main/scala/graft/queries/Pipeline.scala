package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.pipeline.{Dedup, Mix, Multimodal, Pq, Similarity, TextAnalysis}

/** Training-data pipeline operators (dedup / similarity / text analysis /
  * multimodal / streaming-window), each with a DuckDB oracle that replays the
  * same deterministic math (md5-derived hashes, double folds rounded before
  * ranking — see the pipeline package docs).
  */
object Pipeline {

  // Shared oracle fragment: distinct word n-gram shingles per doc.
  private def shingleCte(n: Int): String = {
    val concatExpr = (0 until n).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    s"""tok AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id,
       |  unnest(list_transform(generate_series(1, greatest(len(w)-${n - 1}, 0)),
       |                        i -> $concatExpr)) AS s FROM tok)""".stripMargin
  }

  private def jaccardOracle(n: Int, threshold: Double): String =
    s"""WITH ${shingleCte(n)},
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT id_a, id_b, round(c / (na.n + nb.n - c), 4) AS jaccard
       |FROM inter JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
       |WHERE c / (na.n + nb.n - c) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  private val fingerprintSql =
    "CAST(('0x' || substr(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 15)) AS BIGINT)"

  // Deterministic per-(corpus, params, build version) index location so
  // repeated invocations — Verify, Bench warm-up + reps — reuse the
  // build-once index instead of rebuilding it each call. The key folds in
  // the CANONICAL corpus path, a cheap content fingerprint of the embeddings
  // table (file names + sizes — no data read, and deliberately NO mtimes: a
  // content-identical regeneration must reuse the index, not orphan it),
  // the index params, and the builder code version: changed data at the
  // same path, a param tweak, or a builder change each produce a NEW key,
  // so a stale on-disk index can never silently serve across rounds.
  //
  // Eviction: cache dirs are named `<tag>-<tier>-<key>` where tier is the
  // corpus dir's basename (sf0.001 / sf0.01 / sf0.1 legitimately coexist —
  // Bench warms up on the smoke tier then runs the bench tier). When a key
  // is computed, SIBLING generations of the same tag+tier with a different
  // key are stale by construction (same corpus path, changed content or
  // params) and are swept, so the cache holds at most one generation per
  // (tag, tier) instead of accumulating one per testdata touch.
  private[graft] def cachedIvfDir(sfDir: String, tag: String,
      params: String): String = {
    val canonical = new java.io.File(sfDir).getCanonicalPath
    val tier = new java.io.File(canonical).getName
    val table = new java.io.File(canonical, "embeddings.parquet")
    val content =
      if (table.isDirectory)
        table.listFiles().sortBy(_.getName)
          .map(f => s"${f.getName}:${f.length}").mkString(",")
      else s"${table.length}"
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$canonical|$content|$params|v${Similarity.IvfBuildVersion}"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
    val root = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_ivf_cache")
    val current = s"$tag-$tier-$key"
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName != current &&
        (d.getName.startsWith(s"$tag-$tier-") ||
          // pre-tiered naming (<tag>-<16 hex>): every such generation is
          // orphaned by the rename — sweep them on first contact
          d.getName.matches(s"\\Q$tag\\E-[0-9a-f]{16}")) &&
        // a RECENTLY-touched sibling may be a concurrent JVM's in-flight
        // build (a probe beside Bench, or testdata regenerated mid-run) —
        // deleting it out from under an active read fails that run; leave
        // anything younger than an hour, it gets swept on a later contact
        d.lastModified < System.currentTimeMillis() - 3600L * 1000)
      .foreach(deleteRecursively)
    s"${root.getPath}/$current/ivf"
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }

  /** Compressed-text-bytes threshold above which t5 stages its tf
    * projection (one corpus scan instead of two): measured crossover
    * between 0.6 MB (staging regresses, fixed localCheckpoint cost) and
    * 5.5 MB (staging wins 33%) — see the t5 def. */
  private[graft] val TfStageTierBytes = 2L << 20

  /** The d8 fixture corpus: embeddings (as double vectors, column `v`) plus
    * a planted near-duplicate of each vec_id < 50 — id offset +10000, first
    * component nudged +0.05. Deterministic, so DuckDB replays it exactly. */
  private[graft] def plantedNearDupCorpus(
      emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val base = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    base.unionByName(
      base.filter(col("vec_id") < 50)
        .select((col("vec_id") + 10000).as("vec_id"),
          concat(array(col("v")(0) + 0.05), slice(col("v"), 2, 63)).as("v")))
  }

  /** The planted HALF of [[plantedNearDupCorpus]] alone — the 50 nudged
    * copies (ids 10000+x) as a QUERY set over the unmodified corpus; each
    * sits at cosine ≥ 0.9987 to its original x while the tightest natural
    * pair is ≤ 0.61, so any ANN path worth its name must return x for
    * query 10000+x. Deterministic, so DuckDB replays the census. */
  private[graft] def plantedQueries(
      emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .filter(col("vec_id") < 50)
      .select((col("vec_id") + 10000).as("vec_id"),
        concat(array(col("v")(0) + 0.05), slice(col("v"), 2, 63)).as("v"))

  // Brute-force top-k cosine oracle over a query-id predicate.
  private def knnOracle(queryPred: String, k: Int): String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |           FROM embeddings),
       |n AS (SELECT vec_id, v,
       |        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
       |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |        round(list_sum(list_transform(generate_series(1, 64), i -> q.v[i] * c.v[i]))
       |              / (q.nrm * c.nrm), 6) AS cosine
       |      FROM n q JOIN n c ON c.vec_id != q.vec_id WHERE $queryPred),
       |r AS (SELECT query_id, neighbor_id, cosine,
       |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
       |      FROM p)
       |SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------- dedup
    QueryDef(
      "d1_dedup_exact",
      s"""SELECT count(*) AS n_rows, count(DISTINCT $fingerprintSql) AS n_distinct,
         | count(*) - count(DISTINCT $fingerprintSql) AS n_dupes FROM documents""".stripMargin) {
      (s, dir) => Dedup.exactStats(Tables.load(s, dir, "documents"), "text")
    },

    QueryDef(
      "d2_minhash_lsh",
      jaccardOracle(n = 3, threshold = 0.8)) { (s, dir) =>
      Dedup.minhashLshPairs(Tables.load(s, dir, "documents"), "doc_id", "text",
          threshold = 0.8)
        .withColumnRenamed("id_a", "id_a")
        .orderBy("id_a", "id_b")
    },

    QueryDef(
      "d3_simhash",
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |            FROM documents),
        |th AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS h FROM tok),
        |bits AS (SELECT doc_id, b,
        |           sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS wt
        |         FROM th, (SELECT unnest(generate_series(0, 31)) AS b) GROUP BY 1, 2),
        |sig AS (SELECT doc_id,
        |          CAST(sum(CASE WHEN wt > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
        |        FROM bits GROUP BY 1)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Dedup.simhashPairs(Tables.load(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .orderBy("id_a", "id_b")
    },

    // Exact AllPairs Jaccard, gated in the regime prefix filtering is FOR:
    // 3-gram shingles at t=0.7, where prefixes are short and rare-first
    // ordering keeps hot shingles out of the join (a strict superset of
    // d2's >=0.8 pair set, so the result is never trivially empty). The
    // mid-threshold regime (2-grams, t=0.5 — near-quadratic whatever the
    // filter stack; see Dedup.ngramJaccardPairs' measured cost note) stays
    // exactness-proven by PipelineSpec at t in {0.3, 0.5, 0.8} on a
    // deliberately hot-shingled corpus.
    QueryDef(
      "d4_ngram_jaccard",
      jaccardOracle(n = 3, threshold = 0.7)) { (s, dir) =>
      Dedup.ngramJaccardPairs(Tables.load(s, dir, "documents"), "doc_id", "text",
          threshold = 0.7, shingleN = 3)
        .orderBy("id_a", "id_b")
    },

    // Embedding-cosine near-dup pairs at a fixed LOOSE threshold (0.4).
    // Exact recall in this regime is inherently Θ(n²) on dense vectors —
    // the round-5 banded-SRP config that kept recall exact was measured to
    // be near-all-pairs (p≈0.98 collision for uncorrelated pairs), i.e. it
    // paid the quadratic join AND 256 projections per vector on top. The
    // headline now runs Similarity.exactCosinePairs: the same exact result
    // through a blocked self-join that distributes the unavoidable n²/2
    // comparisons as ONE hash-partitioned equi-join with no projection
    // preamble. The TIGHT-threshold pruning regime is d8's path.
    QueryDef(
      "d5_embedding_near_dup",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |        list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i]))
        |          / (a.nrm * b.nrm) AS cs
        |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(cs, 6) AS cosine FROM p
        |WHERE cs >= 0.4 ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Similarity.exactCosinePairs(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.4)
        .select(col("id_a"), col("id_b"), round(col("cs"), 6).as("cosine"))
        .orderBy("id_a", "id_b")
    },

    // d8: the PRUNING-regime near-dup pass — banded SRP at r=8 bits × 32
    // bands over a corpus with deterministically planted near-duplicates
    // (each vec_id < 50 gets a copy at id+10000 with its first component
    // nudged by +0.05; the corpus is unit-norm, so every planted pair sits
    // at cosine ≥ 0.9987 while the tightest natural pair is ≤ 0.61). At
    // r=8 an uncorrelated pair collides in ≥1 of 32 bands with p ≈ 0.118 —
    // candidates are ~12% of all pairs and shrink further the tighter the
    // corpus clusters — while a ≥0.98 pair is missed with p < 1e-29.
    // PipelineSpec measures both properties; the oracle replays the exact
    // all-pairs ≥0.98 result that the candidate+verify pipeline must equal.
    QueryDef(
      "d8_near_dup_tight",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |pl AS (SELECT vec_id + 10000 AS vec_id,
        |         list_transform(generate_series(1, 64),
        |                        i -> CASE WHEN i = 1 THEN v[1] + 0.05 ELSE v[i] END) AS v
        |       FROM e WHERE vec_id < 50),
        |c AS (SELECT * FROM e UNION ALL SELECT * FROM pl),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM c),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |        list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i]))
        |          / (a.nrm * b.nrm) AS cs
        |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(cs, 6) AS cosine FROM p
        |WHERE cs >= 0.98 ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val corpus = plantedNearDupCorpus(Tables.load(s, dir, "embeddings"))
      val e = corpus.withColumn("nrm", Similarity.norm(col("v")))
      // r DERIVED from the corpus via the documented cost model
      // (Similarity.rForCorpus): one more bit per corpus doubling keeps
      // junk-candidate volume linear, capped by the recall ceiling at the
      // 0.98 threshold. The BENCH_sf1 probe measured why a constant here
      // fails (fixed r=8 went 419x candidates at 10x corpus); the fixed
      // r=16 it was replaced with would itself stop pruning ~2^16 vectors
      // later. n comes from the raw parquet footer (metadata count, no
      // scan) + the 50 planted copies.
      val n = s.read.parquet(s"$dir/embeddings.parquet").count() + 50
      val r = Similarity.rForCorpus(n, threshold = 0.98, numBands = 32)
      // scale-attribution breadcrumb (VERDICT r14 #4): the sf100 decade
      // ratio is only interpretable knowing which r the gate derived —
      // candidate volume moves 2× per bit. SrpProbe prints the full
      // candidate census; this line ties a bench log to its r.
      System.err.println(s"[graft] d8 n=$n rForCorpus=$r bands=32")
      Similarity.srpBandedPairs(corpus, "vec_id", "v",
        bitsPerBand = r, numBands = 32)
        // verify joins ride a budget-gated broadcast of the vector table
        // (Similarity.gatedVecBroadcast): the candidate table is 16 B/row
        // but a SHUFFLED verify join re-shuffles every candidate with a
        // 512 B vector attached — at the sf100 tier that intermediate was
        // ~35 GB and ENOSPC'd the scratch volume while the broadcast side
        // is ~1.2 GB of vectors
        .join(Similarity.gatedVecBroadcast(
            e.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na")), n),
          Seq("id_a"))
        .join(Similarity.gatedVecBroadcast(
            e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), n),
          Seq("id_b"))
        .withColumn("cs", Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
        .filter(col("cs") >= 0.98)
        .select(col("id_a"), col("id_b"), round(col("cs"), 6).as("cosine"))
        .orderBy("id_a", "id_b")
    },

    // d6: near-dup clustering — connected components over the verified LSH
    // pair graph; each member mapped to its min-id representative. Oracle:
    // recursive reachability closure over the same exact-Jaccard pairs.
    QueryDef(
      "d6_dedup_clusters",
      {
        val concatExpr = (0 until 3).map(k => s"w[i+$k]").mkString(" || ' ' || ")
        s"""WITH RECURSIVE
           |tok AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM documents),
           |sh AS (SELECT DISTINCT doc_id,
           |  unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
           |                        i -> $concatExpr)) AS s FROM tok),
           |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
           |pairs AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2
           |  HAVING count(*) / (any_value(0) + (SELECT n FROM sz WHERE doc_id = a.doc_id)
           |                     + (SELECT n FROM sz WHERE doc_id = b.doc_id) - count(*)) >= 0.8),
           |e AS (SELECT id_a AS s, id_b AS t FROM pairs
           |      UNION SELECT id_b, id_a FROM pairs),
           |reach AS (SELECT s, t FROM e
           |          UNION SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s WHERE e.t != r.s)
           |SELECT s AS member, least(s, min(t)) AS cluster_rep
           |FROM reach GROUP BY s ORDER BY member""".stripMargin
      }) { (s, dir) =>
      val pairs = Dedup.minhashLshPairs(Tables.load(s, dir, "documents"),
        "doc_id", "text", threshold = 0.8)
      graft.pipeline.DedupCluster.connectedComponents(pairs)
        .orderBy("member")
    },

    // d7: deterministic stratified sampling (training-mix construction):
    // hash-mod gate with a per-language rate — reproducible on any engine.
    QueryDef(
      "d7_stratified_sample",
      """SELECT lang, count(*) AS n_sampled FROM documents
        |WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 <
        |  CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 30 ELSE 15 END
        |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      import graft.functions.Portable
      Tables.load(s, dir, "documents")
        .filter(Portable.hash32(col("text")) % 100 <
          when(col("lang") === "en", 50).when(col("lang") === "de", 30).otherwise(15))
        .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang")
    },

    // ------------------------------------------------------- similarity
    QueryDef(
      "sim1_bruteforce_knn",
      knnOracle("q.vec_id < 10", k = 5)) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // IVF with nprobe == #cells ⇒ exactly brute force; the full index path
    // is what's under test: build-once (cell-partitioned corpus + persisted
    // centroids), then query through the partition-pruned probed read.
    QueryDef(
      "sim2_ivf_knn",
      knnOracle("q.vec_id >= 10 AND q.vec_id < 20", k = 5)) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val idx = Similarity.ivfBuildCached(e, "embedding", "label",
        cachedIvfDir(dir, "sim2", "cellCol=label"))
      Similarity.ivfTopK(s, idx, e.filter(col("vec_id") >= 10 && col("vec_id") < 20),
          "vec_id", "embedding", "label", k = 5, nprobe = 10)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // The full IVF lifecycle: k-means cell TRAINING (distributed Lloyd's,
    // deterministic seeding) → cell-partitioned persist → probed query.
    // With nprobe == k the result is exactly brute force whatever the
    // clustering quality, so the same KNN oracle gates the trained path.
    QueryDef(
      "sim4_ivf_trained",
      knnOracle("q.vec_id >= 20 AND q.vec_id < 30", k = 5)) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val idx = Similarity.ivfBuildTrainedCached(e, "vec_id", "embedding",
        k = 8, iters = 3, cachedIvfDir(dir, "sim4", "cellCol=kmeans,k=8,iters=3"))
      Similarity.ivfTopK(s, idx, e.filter(col("vec_id") >= 20 && col("vec_id") < 30),
          "vec_id", "embedding", "cell", k = 5, nprobe = 8)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },

    // sim5: product quantization + ADC — the memory-bound ANN scale path
    // (IVF-PQ's quantization half; composes with the cell-partitioned IVF
    // layout). Codes are ~30-60x smaller than the raw vectors and scoring
    // is m table lookups per candidate. The trained codebooks ride float
    // `avg()` folds whose last-bit accumulation order isn't replayable in
    // SQL, so the gated row asserts the CONTRACT instead (the o3/o4/t10
    // self-asserting pattern): queries are the 50 planted near-dups (ids
    // 10000+x at cosine >= 0.9987 to original x, vs <= 0.61 for the
    // tightest natural pair — the d8 fixture), and ADC over the build-once
    // codes must surface each original at RANK 1: the planted copy and its
    // original quantize to (near-)identical codes, so any broken codebook
    // fold, encoder argmin, LUT, or rank window flips planted_top1 (or the
    // completeness/bounds booleans) and the hash goes red. Measured before
    // gating: 50/50 at rank 1 (AdcRecallProbe) at sf0.01; the gate allows
    // >= 48/50 so replay on a tier the probe never measured (the fixture
    // has been regenerated mid-round before) doesn't false-red on one
    // boundary quantization flip. Raw-corpus recall@5 vs exact is 0.20 —
    // quantization-error-dominated on near-random vectors, which is why
    // the gate rides the planted gap, and why the ADC path owes its caller
    // a rerank (sim6/sim7) for tight-margin corpora. The DuckDB oracle is
    // non-vacuous for planted_top1: it re-derives the planted queries
    // (v[0]+0.05 nudge) and checks EXACT cosine top-1 == original for
    // >= 48 of them, i.e. it independently verifies the geometric margin
    // the ADC gate rides on, rather than hardcoding true.
    QueryDef(
      "sim5_pq_adc",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |q AS (SELECT vec_id + 10000 AS query_id, vec_id AS orig,
        |        list_concat([v[1] + 0.05], v[2:64]) AS qv
        |      FROM e WHERE vec_id < 50),
        |qn AS (SELECT query_id, orig, qv,
        |         sqrt(list_sum(list_transform(qv, x -> x * x))) AS qnrm FROM q),
        |p AS (SELECT q.query_id, q.orig, c.vec_id AS neighbor_id,
        |        list_sum(list_transform(generate_series(1, 64), i -> q.qv[i] * c.v[i]))
        |          / (q.qnrm * c.nrm) AS cosine
        |      FROM qn q CROSS JOIN n c),
        |t AS (SELECT query_id, orig, neighbor_id,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY cosine DESC, neighbor_id) AS rn
        |      FROM p)
        |SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
        |  true AS complete_topk,
        |  (sum(CASE WHEN neighbor_id = orig THEN 1 ELSE 0 END) >= 48) AS planted_top1,
        |  true AS cosine_bounded
        |FROM t WHERE rn = 1""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      // build-once books + codes (same lifecycle as the IVF index cache):
      // repeated calls time the ADC QUERY over the stored codes table
      val base = cachedIvfDir(dir, "sim5", s"pq,m=8,k=16,iters=2,pqv${Pq.PqBuildVersion}")
      val books = Pq.trainCodebooksCached(e, "vec_id", "v", m = 8, k = 16,
        iters = 2, dim = 64, base + "_books", s)
      val codes = Pq.encodeCached(e, "vec_id", "v", books, m = 8, dim = 64,
        base + "_codes", s)
      val ann = Pq.adcTopK(codes, books, plantedQueries(Tables.load(s, dir, "embeddings")),
        "vec_id", "v", k = 5, m = 8, dim = 64)
      val per = ann.groupBy("query_id").agg(
        count(lit(1)).as("n"),
        countDistinct(col("rank")).as("nr"),
        min("rank").as("rmin"), max("rank").as("rmax"),
        max(when(col("rank") === 1, col("neighbor_id"))).as("top1"),
        min("adc_cosine").as("cmin"), max("adc_cosine").as("cmax"))
      per.agg(
        count(lit(1)).as("n_queries"),
        min(when(col("n") === 5 && col("nr") === 5 &&
          col("rmin") === 1 && col("rmax") === 5, 1).otherwise(0)).as("ct"),
        sum(when(col("top1") === col("query_id") - 10000, 1L).otherwise(0L)).as("pt"),
        min(when(col("cmin") >= -1.000001 && col("cmax") <= 1.000001, 1)
          .otherwise(0)).as("cb"))
        .select(col("n_queries"), lit(5L).as("k"),
          (col("ct") === 1).as("complete_topk"),
          (col("pt") >= 48L).as("planted_top1"),
          (col("cb") === 1).as("cosine_bounded"))
    },

    // sim6: IVF-PQ composed — probe the (cached, cell-partitioned) IVF
    // index, ADC-score only the probed cells' codes, exact-rerank the
    // shortlist. Oracle-gated via the sim5 self-asserting pattern (the PQ
    // codebooks and cell centroids ride float avg() folds that aren't
    // SQL-replayable): queries are the 50 planted near-dups, and the gate
    // asserts the composed path's CONTRACT —
    //   probed_top1: every planted query whose original's cell WAS probed
    //     (Pq.probedCells, the production probe) returns that original at
    //     rank 1. Deterministic by construction: the rerank is exact and
    //     the planted gap (>= 0.9987 vs <= 0.61 tightest natural pair)
    //     dominates every candidate from any probed cell. No slack needed.
    //   probe_effective: >= 25/50 originals' cells probed at nprobe=4 —
    //     guards probed_top1 against vacuous truth if the probe broke
    //     entirely (measured 36/43/36 across sf0.001/0.01/0.1).
    //   complete_topk / cosine_bounded: as in sim5 (corpus >= 500 and
    //     probed cells >= ~200 candidates at every tier, so top-5 always
    //     exists). DuckDB independently replays the query census and the
    //     exact-geometry margin probed_top1 rides on (as in sim5).
    // PipelineSpec separately proves the composition on a TRAINED index.
    QueryDef(
      "sim6_ivfpq",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |q AS (SELECT vec_id + 10000 AS query_id, vec_id AS orig,
        |        list_concat([v[1] + 0.05], v[2:64]) AS qv
        |      FROM e WHERE vec_id < 50),
        |qn AS (SELECT query_id, orig, qv,
        |         sqrt(list_sum(list_transform(qv, x -> x * x))) AS qnrm FROM q),
        |p AS (SELECT q.query_id, q.orig, c.vec_id AS neighbor_id,
        |        list_sum(list_transform(generate_series(1, 64), i -> q.qv[i] * c.v[i]))
        |          / (q.qnrm * c.nrm) AS cosine
        |      FROM qn q CROSS JOIN n c),
        |t AS (SELECT query_id, orig, neighbor_id,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY cosine DESC, neighbor_id) AS rn
        |      FROM p)
        |SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS BIGINT) AS k,
        |  true AS complete_topk,
        |  (sum(CASE WHEN neighbor_id = orig THEN 1 ELSE 0 END) >= 48) AS probed_top1,
        |  true AS probe_effective,
        |  true AS cosine_bounded
        |FROM t WHERE rn = 1""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val idx = Similarity.ivfBuildCached(e, "embedding", "label",
        cachedIvfDir(dir, "sim2", "cellCol=label"))
      val ed = e.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      // the full build-once IVF-PQ layout: trained books + (id, codes)
      // persisted CELL-PARTITIONED beside the index, so the probed codes
      // read partition-prunes exactly like the index; the query path is
      // probe -> pruned codes read -> ADC shortlist -> exact rerank
      val base = cachedIvfDir(dir, "sim6",
        s"pq,m=8,k=16,iters=2,cellCol=label,pqv${Pq.PqBuildVersion}")
      val books = Pq.trainCodebooksCached(ed, "vec_id", "v", m = 8, k = 16,
        iters = 2, dim = 64, base + "_books", s)
      val codesPath = Pq.encodeCellsCached(s, idx, "vec_id", "embedding",
        "label", books, m = 8, dim = 64, base + "_cellcodes")
      val planted = plantedQueries(e)
        .select(col("vec_id"), transform(col("v"), x => x.cast("float")).as("embedding"))
      // ONE probe job per invocation (r16): the gate census needs the same
      // (index, queries, nprobe=4) probe the ANN path runs — compute the
      // local probed table once and hand it to both consumers. Same rows,
      // same values as the two lazy replicas it replaces.
      val cent = Similarity.readCentroids(s, idx).withColumnRenamed("label", "cell")
      val q = planted.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .withColumn("qn", Similarity.norm(col("qv")))
      val probedLocal = Pq.probedCellsLocal(cent, q, nprobe = 4)
      val ann = Pq.ivfPqTopK(s, idx, books, planted, "vec_id", "embedding",
        "label", m = 8, dim = 64, k = 5, nprobe = 4, shortlist = 25,
        codesPath = Some(codesPath), probedOpt = Some(probedLocal))
      // which planted originals' cells did the production probe reach?
      val probedOrig = probedLocal
        .join(s.read.parquet(idx)
          .filter(col("vec_id") < 50)
          .select((col("vec_id") + 10000).as("query_id"), col("label").as("cell")),
          Seq("query_id", "cell"))
        .select(col("query_id"), lit(1).as("orig_probed"))
      val per = ann.groupBy("query_id").agg(
        count(lit(1)).as("n"),
        countDistinct(col("rank")).as("nr"),
        min("rank").as("rmin"), max("rank").as("rmax"),
        max(when(col("rank") === 1, col("neighbor_id"))).as("top1"),
        min("cosine").as("cmin"), max("cosine").as("cmax"))
        .join(probedOrig, Seq("query_id"), "left")
      per.agg(
        count(lit(1)).as("n_queries"),
        min(when(col("n") === 5 && col("nr") === 5 &&
          col("rmin") === 1 && col("rmax") === 5, 1).otherwise(0)).as("ct"),
        min(when(col("orig_probed").isNull ||
          col("top1") === col("query_id") - 10000, 1).otherwise(0)).as("pt"),
        sum(coalesce(col("orig_probed"), lit(0))).as("np"),
        min(when(col("cmin") >= -1.000001 && col("cmax") <= 1.000001, 1)
          .otherwise(0)).as("cb"))
        .select(col("n_queries"), lit(5L).as("k"),
          (col("ct") === 1).as("complete_topk"),
          (col("pt") === 1).as("probed_top1"),
          (col("np") >= 25L).as("probe_effective"),
          (col("cb") === 1).as("cosine_bounded"))
    },

    // sim7: the IVF-PQ RECALL GATE — sim5/sim6 are rows-only (float-fold
    // codebooks aren't SQL-replayable), so this query measures the one
    // thing an ANN path owes its caller: recall against the exact top-k.
    // Spark computes recall@5 of the composed path against its own
    // brute-force KNN (itself oracle-gated via sim1) at the correctness
    // operating point — nprobe = ALL 10 cells + a shortlist that SCALES
    // with the corpus (max(200, n/10)) — which isolates the PQ/ADC/rerank
    // machinery from cell-pruning loss; the measured value on the gate
    // corpus is 0.90 (near-random vectors, the hardest case for a
    // 16-centroid-per-subspace codebook). The shortlist must scale
    // because ADC quantization error is corpus-relative: a FIXED 200 was
    // 10% of the sf0.01 corpus but 1% at sf1, and the sf1 probe measured
    // recall dropping under the floor — the knob a real ANN deployment
    // sizes with the collection (or trades against a wider codebook).
    // The emitted row asserts recall >= 0.8; a broken codebook fold, ADC
    // table, or shortlist rank flips meets_floor to false and the oracle
    // hash-match goes red. DuckDB independently verifies the query-set
    // size.
    QueryDef(
      "sim7_ivfpq_recall",
      """SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries,
        | CAST(5 AS BIGINT) AS k, 0.8 AS recall_floor, true AS meets_floor
        |FROM embeddings WHERE vec_id < 10""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val qs = e.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(e, qs, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id")
      val idx = Similarity.ivfBuildCached(e, "embedding", "label",
        cachedIvfDir(dir, "sim2", "cellCol=label"))
      val ed = e.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val base = cachedIvfDir(dir, "sim6",
        s"pq,m=8,k=16,iters=2,cellCol=label,pqv${Pq.PqBuildVersion}")
      val books = Pq.trainCodebooksCached(ed, "vec_id", "v", m = 8, k = 16,
        iters = 2, dim = 64, base + "_books", s)
      val codesPath = Pq.encodeCellsCached(s, idx, "vec_id", "embedding",
        "label", books, m = 8, dim = 64, base + "_cellcodes")
      val shortlist = math.max(200L, e.count() / 10).toInt
      val ann = Pq.ivfPqTopK(s, idx, books, qs, "vec_id", "embedding", "label",
          m = 8, dim = 64, k = 5, nprobe = 10, shortlist = shortlist,
          codesPath = Some(codesPath))
        .select("query_id", "neighbor_id")
      val hits = ann.join(exact, Seq("query_id", "neighbor_id"))
      qs.agg(countDistinct("vec_id").as("n_queries"))
        .crossJoin(hits.agg(count(lit(1)).as("nhits")))
        .select(col("n_queries"), lit(5L).as("k"), lit(0.8).as("recall_floor"),
          (col("nhits") / (col("n_queries") * lit(5.0)) >= lit(0.8))
            .as("meets_floor"))
    },

    // sim8: INCREMENTAL index maintenance — ivfAdd assigns a delta (clones
    // of vec_id < 3, re-identified +10M) to nearest-centroid cells and
    // appends them to a fresh TRAINED index; the probed search over the
    // mutated index must equal DuckDB's exact KNN over corpus ∪ delta
    // (nprobe = all 8 cells ⇒ exact, regardless of cell assignment). A
    // mis-assigned cell, a lost append, or stale directory listing drops
    // the planted rank-1 clones and the hash goes red. On top of the exact
    // half, the gate proves the incremental path UNDER REAL PRUNING (the
    // sim6 probe-floor pattern): at nprobe=3 of 8,
    //   clone_probed_top1 — every query whose clone's assigned cell WAS
    //     probed returns that clone (cosine 1.0, exact rerank) at rank 1;
    //   probe_effective — >= 2/3 clone cells probed, guarding the above
    //     against vacuous truth. The clone is assigned by L2 argmin while
    //     the probe ranks by cosine, so the floor is MEASURED, not
    //     assumed: 3/3 at nprobe=2..4 on all of sf0.001/0.01/0.1
    //     (tools.Sim8Probe); >= 2 at nprobe=3 leaves one flip of slack.
    // Fresh temp index per call: the add MUTATES its index, so the shared
    // build-once caches (sim2/sim6) must never see it.
    QueryDef(
      "sim8_ivf_add",
      """WITH e0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |            FROM embeddings),
        |e AS (SELECT vec_id, v FROM e0
        |      UNION ALL SELECT vec_id + 10000000, v FROM e0 WHERE vec_id < 3),
        |n AS (SELECT vec_id, v,
        |        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |        round(list_sum(list_transform(generate_series(1, 64), i -> q.v[i] * c.v[i]))
        |              / (q.nrm * c.nrm), 6) AS cosine
        |      FROM n q JOIN n c ON c.vec_id != q.vec_id WHERE q.vec_id < 3),
        |r AS (SELECT query_id, neighbor_id, cosine,
        |        CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        |      FROM p)
        |SELECT query_id, neighbor_id, cosine, rank,
        |  true AS clone_probed_top1, true AS probe_effective
        |FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
      val path = java.nio.file.Files.createTempDirectory("graft_ivfadd")
        .resolve("idx").toString
      Similarity.ivfBuildTrained(e, "vec_id", "embedding", k = 8, iters = 2, path)
      val delta = e.filter(col("vec_id") < 3)
        .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
      Similarity.ivfAdd(s, path, delta, "vec_id", "embedding", "cell")
      val queries = e.filter(col("vec_id") < 3)
      // pruned-probe floor: which queries probe their clone's cell at
      // nprobe=3, and is the clone rank-1 whenever probed
      val cent = Similarity.readCentroids(s, path)
      val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .withColumn("qn", Similarity.norm(col("qv")))
      val cloneProbed = s.read.parquet(path)
        .filter(col("vec_id") >= 10000000L)
        .select((col("vec_id") - 10000000L).as("query_id"), col("cell"))
        .join(graft.pipeline.Pq.probedCellsLocal(cent, q, nprobe = 3),
          Seq("query_id", "cell"))
        .select(col("query_id"), lit(1).as("cp"))
      val floor = Similarity.ivfTopK(s, path, queries,
          "vec_id", "embedding", "cell", k = 5, nprobe = 3)
        .filter(col("rank") === 1)
        .join(cloneProbed, Seq("query_id"), "left")
        .agg(
          min(when(col("cp").isNull ||
            col("neighbor_id") === col("query_id") + 10000000L, 1).otherwise(0)).as("pt"),
          sum(coalesce(col("cp"), lit(0))).as("np"))
        .select((col("pt") === 1).as("clone_probed_top1"),
          (col("np") >= 2L).as("probe_effective"))
      Similarity.ivfTopK(s, path, queries,
          "vec_id", "embedding", "cell", k = 5, nprobe = 8)
        .withColumn("rank", col("rank").cast("long"))
        .crossJoin(floor)
        .orderBy("query_id", "rank")
    },

    // Sign-random-projection bucket histogram — the cosine-LSH scale path.
    QueryDef(
      "sim3_srp_buckets",
      """WITH pl AS (SELECT p, list_transform(generate_series(0, 63),
        |    j -> CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
        |         / 2147483648.0 - 1.0) AS comps
        |  FROM (SELECT unnest(generate_series(0, 15)) AS p)),
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |pr AS (SELECT vec_id, p,
        |         list_sum(list_transform(generate_series(1, 64), i -> v[i] * comps[i])) AS proj
        |       FROM e, pl),
        |b AS (SELECT vec_id,
        |        CAST(sum(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
        |      FROM pr GROUP BY 1)
        |SELECT bucket, count(*) AS n FROM b GROUP BY bucket ORDER BY bucket""".stripMargin) {
      (s, dir) =>
      Similarity.srpBuckets(Tables.load(s, dir, "embeddings"), "vec_id", "embedding", nbits = 16)
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    },

    // ----------------------------------------------------- text analysis
    QueryDef(
      "t1_langid",
      """WITH s AS (SELECT doc_id,
        |  len(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b')) AS s_en,
        |  len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b')) AS s_de,
        |  len(regexp_extract_all(lower(text), '\b(le|la|les|et|est)\b')) AS s_fr,
        |  len(regexp_extract_all(lower(text), '\b(el|los|las|y|es)\b')) AS s_es
        |  FROM documents),
        |p AS (SELECT doc_id,
        |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
        |       WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
        |       WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
        |       WHEN s_es > 0 THEN 'es'
        |       ELSE 'und' END AS predicted_lang FROM s)
        |SELECT predicted_lang, count(*) AS n FROM p
        |GROUP BY predicted_lang ORDER BY predicted_lang""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(TextAnalysis.langId(col("text")).as("predicted_lang"))
        .groupBy("predicted_lang").agg(count(lit(1)).as("n"))
        .orderBy("predicted_lang")
    },

    QueryDef(
      "t2_quality",
      """SELECT doc_id, length(text) AS n_chars,
        |  len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |  round(length(regexp_replace(text, '\s+', '', 'g')) /
        |        greatest(len(regexp_extract_all(text, '\S+')), 1), 4) AS mean_token_len,
        |  round(len(regexp_extract_all(lower(text), '\b(the|a|of|to|and|is|in)\b')) /
        |        greatest(len(regexp_extract_all(text, '\S+')), 1), 4) AS stopword_ratio,
        |  round(len(regexp_extract_all(lower(text), '[^a-z0-9\s]')) /
        |        greatest(length(text), 1), 4) AS non_alnum_ratio
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.qualityFeatures(Tables.load(s, dir, "documents"), "doc_id", "text")
        .withColumn("n_chars", col("n_chars").cast("long"))
        .orderBy("doc_id")
    },

    QueryDef(
      "t3_token_counts",
      """SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS ws_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_ish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.tokenCounts(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    QueryDef(
      "t4_fingerprint",
      s"""SELECT source, count(DISTINCT $fingerprintSql) AS n_unique, count(*) AS n_docs
         |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy("source")
        .agg(
          countDistinct(graft.pipeline.TextOps.fingerprint(col("text"))).as("n_unique"),
          count(lit(1)).as("n_docs"))
        .orderBy("source")
    },

    // t5: TF-IDF relevance scoring over a fixed query-term set; smooth idf,
    // rounded before ranking so ordering is engine-stable.
    QueryDef(
      "t5_tfidf",
      """WITH s AS (SELECT doc_id,
        |    len(regexp_extract_all(lower(text), '\bspark\b')) AS tf1,
        |    len(regexp_extract_all(lower(text), '\bquery\b')) AS tf2,
        |    len(regexp_extract_all(lower(text), '\bhash\b')) AS tf3
        |  FROM documents),
        |d AS (SELECT count(*) AS n,
        |        count(CASE WHEN tf1 > 0 THEN 1 END) AS df1,
        |        count(CASE WHEN tf2 > 0 THEN 1 END) AS df2,
        |        count(CASE WHEN tf3 > 0 THEN 1 END) AS df3 FROM s)
        |SELECT doc_id,
        |  round(tf1 * ln((n + 1.0) / (df1 + 1.0)) + tf2 * ln((n + 1.0) / (df2 + 1.0))
        |        + tf3 * ln((n + 1.0) / (df3 + 1.0)), 4) AS tfidf
        |FROM s, d
        |ORDER BY tfidf DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      // tier-keyed staging (r16): the doc-frequency aggregate AND the final
      // scoring both consume tf, so the unstaged form scans documents twice
      // and runs the 3 regexp_counts per doc TWICE — measured as the whole
      // of t5's first-decade 5.3×/decade excess. Staging tf (4 numbers per
      // doc, ~1/40 of the text bytes) halves that: sf1 1.63 → 1.08 s. But
      // the materialization has a fixed ~0.2 s cost that swamps the win on
      // a sub-MB corpus (sf0.1: 0.31 → 0.48 s), so it engages above a
      // measured text-bytes threshold — same policy shape as Engine.ioCodec
      // / durableStagePolicy: crossover measured between 0.6 MB (regresses)
      // and 5.5 MB (wins) of compressed text.
      val tfRaw = Tables.load(s, dir, "documents").select(
        col("doc_id"),
        regexp_count(lower(col("text")), lit("\\bspark\\b")).as("tf1"),
        regexp_count(lower(col("text")), lit("\\bquery\\b")).as("tf2"),
        regexp_count(lower(col("text")), lit("\\bhash\\b")).as("tf3"))
      val tf =
        if (graft.core.Engine.dataBytes(s"$dir/documents.parquet") > TfStageTierBytes) {
          import graft.core.Stage.Staged
          tfRaw.stage()
        } else tfRaw
      val d = tf.agg(
        count(lit(1)).as("n"),
        count(when(col("tf1") > 0, 1)).as("df1"),
        count(when(col("tf2") > 0, 1)).as("df2"),
        count(when(col("tf3") > 0, 1)).as("df3"))
      tf.crossJoin(broadcast(d))
        .select(col("doc_id"),
          round(col("tf1") * log((col("n") + 1.0) / (col("df1") + 1.0)) +
            col("tf2") * log((col("n") + 1.0) / (col("df2") + 1.0)) +
            col("tf3") * log((col("n") + 1.0) / (col("df3") + 1.0)), 4).as("tfidf"))
        .orderBy(desc("tfidf"), asc("doc_id"))
        .limit(20)
    },

    // t6: per-language token-count quantiles (exact linear-interpolation
    // percentile in both engines; corpus-stats op for quality thresholds).
    QueryDef(
      "t6_quality_quantiles",
      """SELECT lang,
        |  round(quantile_cont(tok, 0.5), 4) AS p50_tokens,
        |  round(quantile_cont(tok, 0.9), 4) AS p90_tokens
        |FROM (SELECT lang, len(regexp_extract_all(text, '\S+')) AS tok FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("lang"), graft.functions.Portable.tokenCount(col("text")).as("tok"))
        .groupBy("lang")
        .agg(
          round(expr("percentile(tok, 0.5)"), 4).as("p50_tokens"),
          round(expr("percentile(tok, 0.9)"), 4).as("p90_tokens"))
        .orderBy("lang")
    },

    // t7: deterministic train/val/test split — hash-range assignment, so
    // every engine (and every rerun at any scale) buckets a doc identically.
    QueryDef(
      "t7_split_census",
      """WITH h AS (SELECT CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
        |           FROM documents)
        |SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
        |       count(*) AS n_docs
        |FROM h GROUP BY 1 ORDER BY split""".stripMargin) { (s, dir) =>
      import graft.functions.Portable
      Tables.load(s, dir, "documents")
        .select((Portable.hash32(concat(lit("split:"), col("doc_id").cast("string"))) % 100).as("b"))
        .select(when(col("b") < 80, "train").when(col("b") < 90, "val")
          .otherwise("test").as("split"))
        .groupBy("split").agg(count(lit(1)).as("n_docs"))
        .orderBy("split")
    },

    // t8: Gopher-style repetition filters — duplicated-word fraction and
    // most-frequent-bigram share per document (exact integer counting,
    // rounded ratios; the word/bigram subset of Rae et al. 2021 §A1.1 that
    // is meaningful on a corpus without line structure).
    QueryDef(
      "t8_repetition",
      """WITH tok AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w FROM documents),
        |g2 AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(w)-1, 0)),
        |                             i -> w[i] || ' ' || w[i+1])) AS g FROM tok),
        |top AS (SELECT doc_id, max(c) AS top_bigram_n
        |        FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1)
        |SELECT t.doc_id, len(w) AS n_words,
        |  round(1.0 - len(list_distinct(w)) / len(w), 4) AS dup_word_frac,
        |  round(coalesce(top_bigram_n, 0) / greatest(len(w) - 1, 1), 4) AS top_bigram_frac
        |FROM tok t LEFT JOIN top USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.repetitionFeatures(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // t9: corpus-wide hottest-5-gram census — the boilerplate detector.
    // Deterministic top-20: count desc, gram asc.
    QueryDef(
      "t9_ngram_census",
      """WITH tok AS (SELECT regexp_split_to_array(lower(text), '\s+') AS w FROM documents),
        |g AS (SELECT unnest(list_transform(generate_series(1, greatest(len(w)-4, 0)),
        |             i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4])) AS s FROM tok)
        |SELECT s, count(*) AS n FROM g GROUP BY s
        |ORDER BY n DESC, s LIMIT 20""".stripMargin) { (s, dir) =>
      TextAnalysis.ngramCensus(Tables.load(s, dir, "documents"), "text", n = 5, limit = 20)
    },

    // t11: C4-style quality-gate battery — terminal punctuation, sentence
    // census, words-per-sentence band, symbol noise, boilerplate word-list,
    // composed keep verdict. One shuffle-free projection over the corpus
    // scan; every measure has an exact DuckDB spelling (hash-gated).
    QueryDef(
      "t11_c4_gates",
      """WITH f AS (SELECT doc_id,
        |  len(regexp_extract_all(text, '[.!?"]\s*$')) > 0 AS ends_with_punct,
        |  len(regexp_extract_all(text, '[.!?]+')) AS ns,
        |  len(regexp_extract_all(text, '\S+')) AS nt,
        |  len(regexp_extract_all(text, '[#{}<>|@]')) AS nsym,
        |  len(regexp_extract_all(lower(text), '\b(click here|subscribe now|lorem ipsum)\b')) AS bad,
        |  length(text) AS nc
        |  FROM documents)
        |SELECT doc_id, ends_with_punct,
        |  CAST(ns AS BIGINT) AS n_sentences,
        |  round(nt / greatest(ns, 1), 4) AS words_per_sentence,
        |  round(nsym / greatest(nc, 1), 4) AS symbol_ratio,
        |  CAST(bad AS BIGINT) AS bad_word_hits,
        |  (ends_with_punct AND ns >= 2 AND nt / greatest(ns, 1) BETWEEN 3 AND 60
        |   AND nsym / greatest(nc, 1) < 0.1 AND bad = 0) AS keep
        |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.c4Gates(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // t13: corpus-level sentence-dedup census — the sentence analog of
    // C4's repeated-line removal; per doc, distinct sentences + how many
    // also occur in another document. Hash-gated.
    QueryDef(
      "t13_sentence_dedup",
      """WITH s AS (SELECT doc_id, trim(x) AS sent
        |           FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '[.!?]+')) AS x
        |                 FROM documents)
        |           WHERE trim(x) <> ''),
        |d AS (SELECT DISTINCT doc_id, sent FROM s),
        |c AS (SELECT sent, count(DISTINCT doc_id) AS nd FROM d GROUP BY sent)
        |SELECT doc_id, count(*) AS n_unique_sentences,
        |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_sentences
        |FROM d JOIN c USING (sent) GROUP BY doc_id ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
      TextAnalysis.sentenceDedupCensus(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // t14: benchmark decontamination — the removal list of train docs
    // sharing any word 5-gram with a deterministic held-out "eval set"
    // (doc_id % 97 = 0 stands in for the benchmark corpus; the split is
    // replayable in both engines). Eval grams broadcast (benchmark-sized
    // by contract); the corpus side rides the documents scan map-side.
    QueryDef(
      "t14_decontaminate",
      """WITH tok AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w
        |             FROM documents),
        |g AS (SELECT DISTINCT doc_id,
        |        unnest(list_transform(generate_series(1, greatest(len(w)-4, 0)),
        |               i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4])) AS gram
        |      FROM tok),
        |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched
        |FROM g JOIN ev USING (gram)
        |WHERE doc_id % 97 <> 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      TextAnalysis.decontaminationHits(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 5)
        .orderBy("doc_id")
    },

    // mix1: domain-mixing sampler — rebalance per-source token mass toward
    // a target weighting (src0..src4 boosted 3x) by deterministic
    // hash-gated down-sampling; the census row carries the basis-point gate
    // itself so the oracle asserts the rate computation, not just survivors.
    QueryDef(
      "mix1_domain_mix",
      """WITH tok AS (SELECT source, text,
        |               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS toks
        |             FROM documents),
        |src AS (SELECT source, CAST(sum(toks) AS BIGINT) AS src_tokens,
        |          CASE WHEN source IN ('src0','src1','src2','src3','src4')
        |               THEN 3.0 ELSE 1.0 END AS w
        |        FROM tok GROUP BY source),
        |tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
        |               sum(w) AS total_w FROM src),
        |rt AS (SELECT source,
        |         CAST(floor(10000 * least(1.0,
        |           w / total_w * total_tokens / src_tokens)) AS BIGINT) AS rate_bp
        |       FROM src, tot)
        |SELECT t.source, r.rate_bp, CAST(count(*) AS BIGINT) AS n_kept,
        |       CAST(sum(t.toks) AS BIGINT) AS tokens_kept
        |FROM tok t JOIN rt r USING (source)
        |WHERE CAST(('0x' || substr(md5(t.text), 1, 8)) AS BIGINT) % 10000 < r.rate_bp
        |GROUP BY t.source, r.rate_bp ORDER BY t.source""".stripMargin) { (s, dir) =>
      Mix.domainMixCensus(
        Tables.load(s, dir, "documents"), "source", "text",
        when(col("source").isin("src0", "src1", "src2", "src3", "src4"), 3.0)
          .otherwise(1.0))
        .orderBy("source")
    },

    // pack1: token-budget sequence packing (concat-and-chunk) — pack
    // assignment is a per-source running token total, so the census is a
    // pure window + aggregate and the oracle replays it exactly.
    QueryDef(
      "pack1_token_pack",
      """WITH tok AS (SELECT source, doc_id,
        |               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS toks
        |             FROM documents),
        |cum AS (SELECT source, toks,
        |          sum(toks) OVER (PARTITION BY source ORDER BY doc_id
        |                          ROWS UNBOUNDED PRECEDING) AS c
        |        FROM tok)
        |SELECT source, CAST(floor((c - toks) / 256) AS BIGINT) AS pack_id,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(toks) AS BIGINT) AS pack_tokens
        |FROM cum GROUP BY source, pack_id ORDER BY source, pack_id""".stripMargin) {
      (s, dir) =>
        Mix.tokenPackCensus(Tables.load(s, dir, "documents"),
          "source", "doc_id", "text", budget = 256)
          .orderBy("source", "pack_id")
    },

    // d9: FUZZY decontamination — cross-corpus MinHash-LSH near-dup pairs
    // between the train split and a held-out slice (the planted every-50th
    // near-dups: their seeds sit in train, so the gate is non-vacuous on
    // every tier). Exact complement: t14's 5-gram containment. Oracle is
    // the exact all-pairs cross Jaccard, so it also pins LSH recall at the
    // gated threshold.
    QueryDef(
      "d9_decontaminate_fuzzy",
      s"""WITH ${shingleCte(3)},
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |          FROM sh a JOIN sh b ON a.s = b.s
         |          WHERE a.doc_id % 50 <> 49 AND b.doc_id % 50 = 49
         |          GROUP BY 1, 2)
         |SELECT id_a, id_b, round(c / (na.n + nb.n - c), 4) AS jaccard
         |FROM inter JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
         |WHERE c / (na.n + nb.n - c) >= 0.8
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      Dedup.minhashLshCrossPairs(
        docs.filter(col("doc_id") % 50 =!= 49),
        docs.filter(col("doc_id") % 50 === 49),
        "doc_id", "text", threshold = 0.8)
        .orderBy("id_a", "id_b")
    },

    // t10/st4: approximate-distinct census (HLL++ sketches). At 100 TB the
    // exact forms (t4's countDistinct fingerprint census, st3's distinct
    // users) shuffle EVERY distinct value to its reducer; the sketch form
    // ships one fixed-size (~KB at rsd 0.02) sketch per group per partition
    // and merges — constant network cost per group regardless of corpus
    // size. DuckDB can't replay the sketch VALUE, so the gated row follows
    // the sim7 self-asserting pattern: Spark computes the exact census
    // beside the sketch and emits meets_bound = |approx - exact| <= 5% of
    // exact (2.5 sigma at rsd 0.02; HLL++ is deterministic for a given
    // input set, so this is stable, not probabilistic flake). DuckDB
    // independently replays the exact side and pins the bound columns — a
    // drifting sketch flips the boolean and the hash goes red. The raw
    // sketch estimate itself stays off the row (unpredictable by the
    // oracle); PipelineSpec still bounds it directly.
    QueryDef(
      "t10_approx_distinct",
      s"""SELECT source, count(*) AS n_docs,
         | count(DISTINCT $fingerprintSql) AS exact_unique,
         | 0.05 AS err_bound, true AS meets_bound
         |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val fp = graft.pipeline.TextOps.fingerprint(col("text"))
      Tables.load(s, dir, "documents")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(fp).as("exact_unique"),
          approx_count_distinct(fp, rsd = 0.02).as("approx"))
        .select(col("source"), col("n_docs"), col("exact_unique"),
          lit(0.05).as("err_bound"),
          (abs(col("approx") - col("exact_unique")) <=
            col("exact_unique") * lit(0.05)).as("meets_bound"))
        .orderBy("source")
    },

    QueryDef(
      "st4_approx_users",
      """SELECT event_type, count(*) AS n_events,
        | count(DISTINCT user_id) AS exact_users,
        | 0.05 AS err_bound, true AS meets_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), rsd = 0.02).as("approx"))
        .select(col("event_type"), col("n_events"), col("exact_users"),
          lit(0.05).as("err_bound"),
          (abs(col("approx") - col("exact_users")) <=
            col("exact_users") * lit(0.05)).as("meets_bound"))
        .orderBy("event_type")
    },

    // t12: sketch-based quantiles (Greenwald-Khanna via approx_percentile)
    // — t6's exact percentile collects every group value onto its reducer;
    // the sketch form merges bounded summaries, the only shape that holds
    // for a 100 TB quality-threshold scan. DuckDB has no GK replay, so the
    // gated row asserts GK's actual CONTRACT in-band: the returned value v
    // is an element of the group whose normalized rank interval
    // [count(<v)/n, count(<=v)/n] must meet p ± eps (eps = 1/accuracy =
    // 0.001, plus a 1/n discreteness slack). Spark computes the rank check
    // by joining the sketch output back to the tokens; DuckDB replays the
    // group census and pins eps + the booleans — a mis-merged or
    // mis-ranked sketch flips a boolean and the hash goes red.
    QueryDef(
      "t12_approx_quantiles",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, 0.001 AS rank_eps,
        | true AS p50_in_bound, true AS p90_in_bound
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val eps = 0.001
      def inBound(lt: Column, le: Column, n: Column, p: Double): Column = {
        val slack = lit(eps) + lit(1.0) / n
        (lt.cast("double") / n <= lit(p) + slack) &&
          (le.cast("double") / n >= lit(p) - slack)
      }
      val toks = Tables.load(s, dir, "documents")
        .select(col("lang"), graft.functions.Portable.tokenCount(col("text")).as("tok"))
      val ap = toks.groupBy("lang")
        .agg(expr("approx_percentile(tok, array(0.5, 0.9), 1000)").as("q"))
        .select(col("lang"), col("q")(0).as("p50_a"), col("q")(1).as("p90_a"))
      toks.join(ap, "lang").groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("tok") < col("p50_a"), 1L).otherwise(0L)).as("lt50"),
          sum(when(col("tok") <= col("p50_a"), 1L).otherwise(0L)).as("le50"),
          sum(when(col("tok") < col("p90_a"), 1L).otherwise(0L)).as("lt90"),
          sum(when(col("tok") <= col("p90_a"), 1L).otherwise(0L)).as("le90"))
        .select(col("lang"), col("n_docs"), lit(eps).as("rank_eps"),
          inBound(col("lt50"), col("le50"), col("n_docs"), 0.5).as("p50_in_bound"),
          inBound(col("lt90"), col("le90"), col("n_docs"), 0.9).as("p90_in_bound"))
        .orderBy("lang")
    },

    // cur1: the composed curation pipeline — language gate, quality gate,
    // near-dup drop (pairwise-dominated rule: a doc is dropped when it is
    // the larger id of any >=0.8 pair), the shape of a real corpus build.
    // The near-dup pairs come from the LSH path (candidate-pruned verify),
    // not the exact all-pairs inverted index, and the total row count rides
    // the same DAG (crossJoin of two 1-row aggregates) — zero extra driver
    // actions, one job.
    QueryDef(
      "cur1_corpus_curation",
      {
        val concatExpr = (0 until 3).map(k => s"w[i+$k]").mkString(" || ' ' || ")
        s"""WITH tok AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM documents),
           |sh AS (SELECT DISTINCT doc_id,
           |  unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
           |                        i -> $concatExpr)) AS s FROM tok),
           |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
           |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
           |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
           |dominated AS (
           |  SELECT DISTINCT id_b FROM inter
           |  JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
           |  WHERE c / (na.n + nb.n - c) >= 0.8),
           |gated AS (
           |  SELECT doc_id FROM documents
           |  WHERE len(regexp_extract_all(text, '\\S+')) >= 30
           |    AND len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is)\\b')) > 0
           |    AND doc_id NOT IN (SELECT id_b FROM dominated))
           |SELECT count(*) AS n_kept,
           |  (SELECT count(*) FROM documents) - count(*) AS n_dropped
           |FROM gated""".stripMargin
      }) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val totals = docs.agg(count(lit(1)).as("n_total"))
      val dominated = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.8)
        .select(col("id_b").as("doc_id")).distinct()
      val kept = docs
        .filter(graft.functions.Portable.tokenCount(col("text")) >= 30)
        .filter(regexp_count(lower(col("text")), lit("\\b(the|and|of|to|is)\\b")) > 0)
        .join(dominated, Seq("doc_id"), "left_anti")
      kept.agg(count(lit(1)).as("n_kept"))
        .crossJoin(broadcast(totals))
        .select(col("n_kept"), (col("n_total") - col("n_kept")).as("n_dropped"))
    },

    // cur2: END-TO-END DECONTAMINATION (Curation.curateDecontaminated) —
    // t14 and d9 each produce a removal list; this is their composition,
    // the operator a real pipeline actually runs: anti-join the corpus
    // against the UNION of the exact 5-gram containment list and the fuzzy
    // MinHash-LSH near-dup list (threshold 0.8), emit the surviving
    // per-source census. Eval set = the doc_id % 50 = 49 slice (the tier's
    // planted near-dups, so BOTH screens fire: verbatim-span grams AND
    // whole-doc Jaccard). The oracle independently replays both removal
    // lists (5-gram containment; exact cross-corpus Jaccard) and the
    // surviving census — a lost hit on either screen changes n_kept and
    // the hash goes red.
    QueryDef(
      "cur2_decontaminated",
      s"""WITH ${shingleCte(3)},
         |g AS (SELECT DISTINCT doc_id,
         |        unnest(list_transform(generate_series(1, greatest(len(w)-4, 0)),
         |               i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4])) AS gram
         |      FROM tok),
         |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 49),
         |exact_hits AS (SELECT DISTINCT doc_id FROM g JOIN ev USING (gram)
         |               WHERE doc_id % 50 <> 49),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |          FROM sh a JOIN sh b ON a.s = b.s
         |          WHERE a.doc_id % 50 <> 49 AND b.doc_id % 50 = 49
         |          GROUP BY 1, 2),
         |fuzzy_hits AS (SELECT DISTINCT id_a AS doc_id FROM inter
         |               JOIN sz na ON id_a = na.doc_id JOIN sz nb ON id_b = nb.doc_id
         |               WHERE c / (na.n + nb.n - c) >= 0.8),
         |kept AS (SELECT source, text FROM documents
         |         WHERE doc_id % 50 <> 49
         |           AND doc_id NOT IN (SELECT doc_id FROM exact_hits)
         |           AND doc_id NOT IN (SELECT doc_id FROM fuzzy_hits))
         |SELECT source, count(*) AS n_kept,
         |  CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS kept_tokens
         |FROM kept GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      graft.pipeline.Curation.curateDecontaminated(
          docs.filter(col("doc_id") % 50 =!= 49),
          docs.filter(col("doc_id") % 50 === 49),
          "doc_id", "text", n = 5, threshold = 0.8)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(graft.functions.Portable.tokenCount(col("text")).cast("long"))
            .as("kept_tokens"))
        .orderBy("source")
    },

    // --------------------------------------------------------- multimodal
    QueryDef(
      "m1_media_meta",
      """WITH m AS (SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  octet_length(encode(text)) AS n_bytes FROM documents)
        |SELECT kind, count(*) AS n_items, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |       CAST(max(n_bytes) AS BIGINT) AS max_bytes
        |FROM m GROUP BY kind ORDER BY kind""".stripMargin) { (s, dir) =>
      Multimodal.metaByKind(Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents")))
    },

    // Batch decode over the binary column (mapPartitions kernel); checksum is
    // engine-internal, the SQL-checkable metadata is verified here.
    QueryDef(
      "m2_decode_meta",
      """SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
        |  CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |  CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) % 16 AS INTEGER) AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.decodeBatch(Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents")))
        .toDF()
        .select("media_id", "n_bytes", "width", "height", "n_frames")
        .orderBy("media_id")
    },

    // m3: frame-sample fan-out — one row per sampled frame of each video
    // payload; the deterministic fake-codec arithmetic (n % 16 frames,
    // every 4th sampled) lets DuckDB replay the full explode.
    QueryDef(
      "m3_frame_sample",
      """WITH v AS (SELECT doc_id AS media_id,
        |    CAST(octet_length(encode(text)) % 16 AS INTEGER) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT media_id, n_frames,
        |       CAST(unnest(generate_series(0, n_frames - 1, 4)) AS BIGINT) AS frame_idx
        |FROM v WHERE n_frames > 0
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      Multimodal.sampleFrames(
          Multimodal.decodeBatch(
            Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents"))),
          everyNth = 4)
        .select(col("media_id"), col("n_frames"), col("frame_idx").cast("long").as("frame_idx"))
        .orderBy("media_id", "frame_idx")
    },

    // m4: resize-stage metadata — dimensions bounded to 224×224 and the
    // resampled payload's byte budget (outW·outH); integer-only math, so
    // DuckDB replays the whole stage from the document text bytes.
    QueryDef(
      "m4_resize_meta",
      """SELECT doc_id AS media_id,
        |  CAST(least(octet_length(encode(text)) % 640, 224) AS INTEGER) AS out_w,
        |  CAST(least((octet_length(encode(text)) * 7) % 480, 224) AS INTEGER) AS out_h,
        |  CAST(least(octet_length(encode(text)) % 640, 224) *
        |       least((octet_length(encode(text)) * 7) % 480, 224) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.resizeBatch(
          Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents")))
        .toDF()
        .select(col("media_id"), col("width").as("out_w"), col("height").as("out_h"),
          length(col("payload")).cast("long").as("n_bytes"))
        .orderBy("media_id")
    },

    // ---------------------------------------------------------- streaming
    // Tumbling-window aggregation — batch form of the Structured Streaming
    // query in graft.streaming (same plan modulo the watermark).
    QueryDef(
      "st1_tumbling_window",
      """SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
      import graft.functions.Portable.dsum
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 4).as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start", "event_type")
    },

    // aj1: as-of join — each event picks up the most recent order (at or
    // before the event time) of the same customer. Spark has no native
    // as-of join; graft.operators.AsOf is the union-window formulation
    // (one keyed shuffle), and DuckDB's native ASOF LEFT JOIN is the
    // oracle. Right side deduped to one row per (customer, date) so tie
    // resolution is deterministic in both engines.
    QueryDef(
      "aj1_asof_join",
      """WITH o AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |           FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, o.o_orderkey AS last_orderkey
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND CAST(e.ts AS TIMESTAMP) >= o.o_orderdate
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val events = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"))
      val orders = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max("o_orderkey").as("o_orderkey"))
      graft.operators.AsOf.join(events, orders,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payloadCols = Seq("o_orderkey"))
        .select(col("event_id"), col("o_orderkey").as("last_orderkey"))
        .orderBy("event_id")
    },

    // sk1: skew-tolerant two-phase aggregation — the salted (key, salt)
    // partial + exact re-aggregate path, hash-matched against the direct
    // GROUP BY. The salting tool itself (core.Salting) sits behind the
    // oracle gate: counts and decimal sums re-aggregate exactly.
    QueryDef(
      "sk1_salted_agg",
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      graft.core.Salting.saltedCountSum(
          Tables.load(s, dir, "events"), "event_type",
          col("value").cast(DecimalType(18, 4)), salt = 8)
        .select(col("event_type"), col("n"),
          col("__sum").cast("double").as("sum_value"))
        .orderBy("event_type")
    },

    // rj1: pure range join (no equi key) — orders placed in the 24 h before
    // each event, any customer. Spark would plan the bare range predicate
    // as a BroadcastNestedLoopJoin; graft.operators.RangeJoin buckets time
    // so it runs as an equi-join on bucket ids + residual filter. DuckDB's
    // IEJoin is the oracle.
    QueryDef(
      "rj1_range_join",
      """SELECT e.event_id, CAST(count(o.o_orderkey) AS BIGINT) AS n_recent_orders
        |FROM events e LEFT JOIN orders o
        |  ON o.o_orderdate >= CAST(e.ts AS TIMESTAMP) - INTERVAL 1 DAY
        | AND o.o_orderdate < CAST(e.ts AS TIMESTAMP)
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val dayUs = 86400L * 1000000
      val evts = Tables.load(s, dir, "events")
        .select(col("event_id"), unix_micros(col("ts")).as("e_us"))
      val ords = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"))
      val pairs = graft.operators.RangeJoin.recentPairs(
        evts, ords, "e_us", "o_us", windowUs = dayUs)
      val counts = pairs.groupBy("event_id").agg(count(lit(1)).as("n"))
      evts.select("event_id")
        .join(counts, Seq("event_id"), "left_outer")
        .select(col("event_id"), coalesce(col("n"), lit(0L)).as("n_recent_orders"))
        .orderBy("event_id")
    },

    // st2: batch twin of the stream-static enrichment join
    // (EventStream.enrichedCountsByNation) — same plan minus the watermark;
    // StreamingSpec proves stream/batch parity on the same data.
    QueryDef(
      "st2_enriched_by_nation",
      """SELECT n_name, count(*) AS n_events
        |FROM events JOIN customer ON user_id = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .join(Tables.load(s, dir, "customer"), col("user_id") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n_events"))
        .orderBy("n_name")
    },

    // st3: exact distinct-user census per event type — the batch FORM of
    // EventStream.distinctUsersPerWindow. NOT a general equivalence: the
    // streaming side's dropDuplicatesWithinWatermark re-emits a user whose
    // dedup state expired past the watermark (the price of bounded state on
    // an unbounded feed); they agree when each user's events per type fall
    // within the watermark, which StreamingSpec's fixture does.
    QueryDef(
      "st3_distinct_users",
      """SELECT event_type, count(DISTINCT user_id) AS distinct_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("event_type").agg(countDistinct("user_id").as("distinct_users"))
        .orderBy("event_type")
    },

    // st6: the batch twin of the stream-stream interval join
    // (EventStream.sameUserRecentPairs) — each event paired with the same
    // user's events in the trailing hour. Equi-join on the user plus a
    // range residual: one keyed shuffle, never a time-only nested loop.
    // StreamingSpec proves stream/batch parity on the same data.
    QueryDef(
      "st6_stream_stream_join",
      """SELECT a.event_id, b.event_id AS prior_event_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id <> b.event_id
        | AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP) - INTERVAL 1 HOUR
        | AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP)
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts").cast("timestamp_ntz").as("ts"))
      val b = ev.select(col("event_id").as("prior_event_id"),
        col("user_id").as("b_user_id"), col("ts").as("b_ts"))
      ev.join(b,
          col("user_id") === col("b_user_id") &&
            col("prior_event_id") =!= col("event_id") &&
            col("b_ts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
            col("b_ts") <= col("ts"))
        .select(col("event_id"), col("prior_event_id"))
        .orderBy("event_id", "prior_event_id")
    },

    // st5: NATIVE session windows (session_window) — gap-merged per-user
    // sessions as a first-class grouping, the operator w3 emulates with
    // window functions and EventStream.sessionize with custom state. Merge
    // rule: two events share a session iff their gap is STRICTLY below 10
    // minutes (Spark merges on window overlap, so an exactly-10-minute gap
    // opens a new session — the oracle's >= mirrors that edge). The
    // streaming twin (EventStream.sessionWindowStats) is parity-proven in
    // StreamingSpec on the same data.
    QueryDef(
      "st5_session_window",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |s AS (SELECT user_id, ts, value,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |             OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                                 ROWS UNBOUNDED PRECEDING) AS sid FROM s)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      import graft.functions.Portable.dsum
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value"), 4).as("sum_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")
    },

    // st7: corpus-ingest dedup — the batch twin of DocStream.ingestDedup
    // (streaming parity pinned in StreamingSpec). The curated corpus is the
    // deterministic doc_id % 3 = 0 slice; the "arriving" feed is the rest;
    // admitted = feed docs whose content fingerprint is absent from the
    // corpus. Census per source so the output is corpus-stat-sized.
    QueryDef(
      "st7_ingest_dedup",
      s"""WITH f AS (SELECT doc_id, source, $fingerprintSql AS fp FROM documents),
         |corpus AS (SELECT DISTINCT fp FROM f WHERE doc_id % 3 = 0)
         |SELECT source, count(*) AS n_admitted,
         |  CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct
         |FROM f WHERE doc_id % 3 <> 0 AND fp NOT IN (SELECT fp FROM corpus)
         |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      graft.streaming.DocStream.ingestDedup(
          docs.filter(col("doc_id") % 3 =!= 0),
          docs.filter(col("doc_id") % 3 === 0))
        .select(col("source"), graft.pipeline.TextOps.fingerprint(col("text")).as("fp"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_admitted"),
          countDistinct(col("fp")).as("n_distinct"))
        .orderBy("source")
    }
  )
}
