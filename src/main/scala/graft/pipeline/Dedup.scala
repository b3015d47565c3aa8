package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Stage.Staged
import graft.functions.Portable

/** Deduplication operators for large-scale corpus curation.
  *
  * Four families, each shaped for 100 TB execution:
  *
  *  - '''exact''': hash-groupBy on a normalized fingerprint — one shuffle on
  *    a 60-bit key, map-side partial aggregation.
  *  - '''MinHash + LSH''': shingle → 96 minhashes → 24 bands × 4 rows →
  *    bucket self-join → exact-Jaccard verify. Only bucket-collision pairs
  *    are verified; a true pair at Jaccard s is caught with
  *    p = 1-(1-s⁴)^24 (≥ 1-3.2e-6 at s = 0.8, ≥ 1-1e-15 at s ≥ 0.9), so
  *    verified output equals the exact pair set on any realistic corpus.
  *
  *    Rows-per-band r is the SCALE lever, not a tuning nicety (the same
  *    physics as [[Similarity.rForCorpus]] for cosine banding): an
  *    uncorrelated pair at background Jaccard J̄ collides in ≥1 band with
  *    p ≈ b·J̄^r, so junk candidates are n²/2 · b·J̄^r — quadratic in the
  *    corpus with a constant-factor prune. The former r=2/b=32 ran out of
  *    pruning power exactly at the third measured decade: on the
  *    low-entropy bench corpus (30-word vocabulary ⇒ J̄ ≈ 1e-3) junk grew
  *    4M → 400M pairs from sf10 to sf100 and the verify join's scratch
  *    ENOSPC'd. r=4 cuts the junk rate J̄²-fold (~10⁶× here) for 1.5× the
  *    signature arithmetic; 96 permutations also stay under Spark's
  *    codegen maxFields=100 so the wide min-aggregate keeps whole-stage
  *    codegen. At 100 TB with a higher-entropy corpus the same r=4 is a
  *    2⁻⁶⁴-grade prune; a LOWER-entropy corpus needs r grown further —
  *    the parameters stay caller-settable for exactly that.
  *  - '''SimHash''': 32-bit signature from token hashes; pairs within hamming
  *    distance ≤ 3 found by 4-byte banding — pigeonhole-exact (≤3 differing
  *    bits over 4 bands ⇒ ≥1 band identical), so banding loses nothing while
  *    avoiding the O(n²) self-join.
  *  - '''n-gram Jaccard''': exact inverted-index pair join (shingle equality →
  *    pair counts → |A∩B|/|A∪B|), the verification kernel the LSH path reuses.
  *
  * Base hashes are the md5-derived portable ones (see
  * [[graft.functions.Portable]]); minhash permutations mix the base hash
  * with fixed-seed linear functions (deterministic, and the oracle gates
  * compare the exact-VERIFIED pair sets, which the mixing cannot alter).
  */
object Dedup {

  /** Exact-dedup census: rows, distinct normalized fingerprints, dupes. */
  def exactStats(docs: DataFrame, textCol: String): DataFrame =
    docs.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(TextOps.fingerprint(col(textCol))).as("n_distinct"))
      .select(
        col("n_rows"), col("n_distinct"),
        (col("n_rows") - col("n_distinct")).as("n_dupes"))

  /** Exact dedup: keep the min-id representative per fingerprint. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = docs.withColumn("fp", TextOps.fingerprint(col(textCol)))
    val keep = fp.groupBy("fp").agg(min(col(idCol)).as(idCol))
    fp.join(keep, Seq("fp", idCol), "left_semi").drop("fp")
  }

  /** Hashed shingle table `(id, h)` with `h = hash60(shingle)` — the STAGED
    * form every set-similarity operator materializes and verifies over.
    *
    * Staging the 8-byte hash instead of the shingle STRING is a scale
    * necessity, not an optimization nicety: a word-3-gram shingle is
    * ~20–40 bytes of text, so a corpus-sized staged table of raw shingles
    * is 3–5× the corpus itself — at the sf100 tier (~5M docs) that staged
    * table plus the `collect_list` verify sets it feeds is what filled a
    * ~57 GB scratch volume (ENOSPC, four recording attempts). Every
    * downstream consumer only ever needs equality/identity of shingles —
    * minhash signatures are already functions of `hash60(s)`, document
    * frequency, prefix ordering, and Jaccard verification all survive any
    * injective renaming — so the hash carries the full semantics at ~1/4
    * the staged bytes and a fraction of the verify-join width.
    *
    * Collision caveat: two distinct shingles colliding in 60 bits
    * (p ≈ 2⁻⁶⁰ per pair) could in principle merge set elements and nudge a
    * Jaccard value. That is far below the oracle gates' resolution (the
    * gates compare exact pair sets on corpora of ≤ ~10⁷ shingles, expected
    * collisions ≈ 10¹⁴/2⁶⁰ ≈ 10⁻⁴) and below any curation-relevant effect
    * at 100 TB; documented here once for all callers. */
  private def hashedShingleTable(docs: DataFrame, idCol: String,
      textCol: String, shingleN: Int): DataFrame =
    TextOps.shingleTable(docs, idCol, textCol, shingleN)
      .select(col("id"), Portable.hash60(col("s")).as("h"))

  /** Per-permutation linear-hash constants: fixed-seed draws so signatures
    * are deterministic across runs and engines. pa/pb from [1, prime): a
    * draw equal to the modulus prime would vanish mod p and degenerate that
    * permutation to a function of one 30-bit half of the base hash; pc from
    * [0, prime). */
  private val MinhashPrime = 2147483647L // 2^31 - 1
  private def permConstants(numPerm: Int): Seq[(Int, Long, Long, Long)] = {
    val rnd = new scala.util.Random(0x9e3779b9L)
    (0 until numPerm).map { p =>
      (p, rnd.nextLong(MinhashPrime - 1) + 1, rnd.nextLong(MinhashPrime - 1) + 1,
        rnd.nextLong(MinhashPrime))
    }
  }

  /** (id, mh0..mh{n-1}) — the standard minwise-hashing construction: ONE
    * base md5 per shingle, then `numPerm` values from a per-permutation
    * 2-universal linear hash `(a·hi + b·lo + c) mod (2³¹−1)` over the base
    * hash's two 30-bit halves (products stay < 2⁶¹ — no Long overflow).
    * Random linear families are the textbook minhash permutations, and the
    * verify stage is exact either way — the oracle gates compare the
    * VERIFIED pair set, pinned at the data tiers.
    *
    * Physical form: the whole signature is `numPerm` parallel `min(...)`
    * AGGREGATE expressions over literal coefficients — straight-line
    * codegen'd arithmetic, no per-permutation row blow-up. The round-5
    * shape crossJoined each shingle against a 64-row permutation table, so
    * 64× the shingle rows ran through projection and partial aggregation
    * and a second pivot pass reassembled the bands; this computes the same
    * 64 mins in one pass over the shingle rows and the exchange carries one
    * 64-column row per id.
    *
    * The shingle table is hash-repartitioned by id FIRST: a small local
    * parquet read arrives as one partition, and the base hashing plus the
    * ×numPerm arithmetic would otherwise run on one core. Partitioning by
    * id satisfies the groupBy(id) exactly, so the repartition replaces the
    * aggregation's exchange instead of adding one. */
  private def minhashWide(sh: DataFrame, numPerm: Int): DataFrame = {
    val aggs = permConstants(numPerm).map { case (p, pa, pb, pc) =>
      min((lit(pa) * col("hi") + lit(pb) * col("lo") + lit(pc)) % MinhashPrime)
        .as(s"mh$p")
    }
    // callers hand sh already spread by id (see minhashBuckets /
    // minhashLshPairs), which satisfies the groupBy(id) without an exchange;
    // input is the HASHED shingle table (id, h) — the base hash is computed
    // once at staging time, never re-derived from strings here
    sh.select(col("id"), (col("h") % (1L << 30)).as("lo"),
        shiftright(col("h"), 30).as("hi"))
      .groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** (id, band, sig): per-band signature string, deterministic in perm
    * order — band b concatenates mh{b·r}..mh{b·r+r-1} from the wide
    * signature row (a projection + explode, no extra aggregation). */
  def minhashBuckets(docs: DataFrame, idCol: String, textCol: String,
      numPerm: Int = 96, rowsPerBand: Int = 4): DataFrame =
    bucketsOfShingles(
      hashedShingleTable(docs, idCol, textCol, 3).repartition(col("id")),
      numPerm, rowsPerBand)

  /** Hashed-relation footprint per broadcast bucket row (id long + band
    * int + signature string, UnsafeRow + hash-map overhead included) —
    * conservative ceiling for the explicit-hint budget math. */
  private val BucketHashedBytes = 128L

  /** Band signature as a 64-bit hash of the band's minhash tuple rather
    * than the ":"-joined decimal STRING (~29 B vs 8 B): the bucket table is
    * staged once and exchanged on (band, sig) TWICE by the self-join, so
    * signature width is a first-order term of d2's peak scratch footprint.
    * A 64-bit collision can only ADD a candidate pair (verify rejects it
    * exactly); it can never lose one — banding semantics are unchanged
    * under any injective-up-to-2⁻⁶⁴ renaming. */
  private def bucketsOfShingles(sh: DataFrame, numPerm: Int, rowsPerBand: Int): DataFrame = {
    val wide = minhashWide(sh, numPerm)
    val bands = (0 until numPerm / rowsPerBand).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until rowsPerBand)
          .map(s => col(s"mh${b * rowsPerBand + s}")): _*).as("sig"))
    }
    wide.select(col("id"), explode(array(bands: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Near-duplicate pairs at `threshold` Jaccard over word-`n`-gram shingles:
    * LSH candidate generation + exact verification. Output (id_a, id_b,
    * jaccard rounded to 4) — equals the exact pair set (see class doc). */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numPerm: Int = 96, rowsPerBand: Int = 4,
      shingleN: Int = 3): DataFrame = {
    // the HASHED shingle table feeds BOTH the signature build and the
    // verify — materialize it once (tokenize + explode + distinct is the
    // most expensive projection in the pipeline), spread by id so the
    // materialized blocks aren't one partition from the single-file read.
    // Hashing BEFORE staging (see hashedShingleTable) is what keeps the
    // materialized footprint ~8 B/shingle instead of the raw string.
    val sh = hashedShingleTable(docs, idCol, textCol, shingleN)
      .repartition(col("id")).stage()
    // UNSTAGED (r16): the band self-join's two sides are canonically
    // identical subtrees over the staged shingle table, so their
    // (band, sig) exchanges dedupe to ONE ReusedExchange — the bucket
    // table is computed once either way, and dropping the materialization
    // removes a corpus-sized localCheckpoint/durable-checkpoint write
    // (n·numBands rows — GBs at sf100) from the chain. Measured: sf0.1
    // 1.88 → 1.87 s with identical shuffle bytes (8.84 MB — the proof the
    // exchange is shared), −2 jobs; sf1 7.50 → 6.90 s. (d4's prefix table
    // stays staged: its window subtree is NOT above a reusable exchange,
    // and the same A/B measured +5% wall, +33% task time unstaged.)
    val b = bucketsOfShingles(sh, numPerm, rowsPerBand)
    // the candidate table is consumed THREE times downstream (the id
    // census plus both verify joins): staged, so (a) the band self-join
    // subtree runs once, and (b) — the peak-scratch point — the self-join
    // and distinct exchanges become DEAD the moment the (tiny, two-long-
    // column) candidate table materializes, instead of staying live
    // through the whole verify phase. sf100 attempt 5 rep 1 ENOSPC'd with
    // the band-join shuffle still live under the verify joins' exchanges;
    // this truncation is what lets the periodic GC reclaim the former
    // before the latter peaks.
    val cand = b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
      .stage()
    verifyJaccard(sh, cand, threshold)
  }

  /** Exact Jaccard for given candidate pairs, PER PAIR: each candidate id
    * pulls its doc's (distinct) shingle set through an equi-join and the
    * overlap is `size(array_intersect(...))` — work linear in
    * |candidates| × doc size. The earlier inverted-index form self-joined
    * the shingle tables of all candidate DOCUMENTS on the shingle value,
    * which computes co-occurrence for every doc pair sharing any hot
    * shingle — quadratic in candidate docs regardless of how short the
    * candidate PAIR list is (measured: ~13 s of d4's 15 s at sf0.1). The
    * shingle table is still semi-joined to candidate ids first so only
    * candidate docs are collected; callers pass their (checkpointed)
    * HASHED shingle table (id, h) so it is never computed twice per query
    * and the collected sets are 8-byte longs, not shingle strings (set
    * identity is hash identity — collision caveat on hashedShingleTable). */
  private def verifyJaccard(sh: DataFrame, cand: DataFrame,
      threshold: Double): DataFrame = {
    val candIds = cand.select(col("id_a").as("id"))
      .unionByName(cand.select(col("id_b").as("id")))
      .distinct()
    // consumed by BOTH pair-side joins: staged so the semi-join + set
    // aggregation run once and their exchanges die before the wide
    // (set-carrying) pair joins allocate their own shuffle
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

  /** Cross-corpus near-duplicate pairs: LSH candidate generation between a
    * train corpus and a (typically much smaller) reference/eval corpus with
    * exact Jaccard verification — the FUZZY complement of
    * `TextAnalysis.decontaminationHits`' exact n-gram containment (a
    * lightly-edited eval document shares high Jaccard but may share no
    * exact 5-gram). Output (id_a ∈ corpus, id_b ∈ ref, jaccard).
    *
    * Scale shape: both sides build banded signatures independently (the
    * same wide-aggregate, no row blow-up); the candidate join is a band
    * equi-join where the REF side is eval-set-sized BY CONTRACT, so the
    * corpus side never shuffles for candidacy. The hint is budget-gated
    * rather than unconditional or stats-reliant: under
    * [[graft.core.Engine.broadcastBudget]] (counted off the checkpointed
    * bucket table — one cheap job) the ref buckets get an explicit
    * broadcast; over it the hint is omitted and the band join plans
    * shuffled — an oversized ref degrades instead of dying at Spark's
    * 8 GB broadcast ceiling. Verification is linear in candidate pairs,
    * never corpus². */
  def minhashLshCrossPairs(corpus: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, threshold: Double = 0.8, numPerm: Int = 96,
      rowsPerBand: Int = 4, shingleN: Int = 3): DataFrame = {
    val shA = hashedShingleTable(corpus, idCol, textCol, shingleN)
      .repartition(col("id")).stage()
    val shB = hashedShingleTable(ref, idCol, textCol, shingleN)
      .repartition(col("id")).stage()
    val bB = bucketsOfShingles(shB, numPerm, rowsPerBand).stage()
    val fits = bB.count() * BucketHashedBytes <=
      graft.core.Engine.broadcastBudget()
    val cand = bucketsOfShingles(shA, numPerm, rowsPerBand).as("x")
      .join((if (fits) broadcast(bB) else bB).as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
      .stage() // 4 downstream consumers — same truncation as minhashLshPairs
    verifyJaccardCross(shA, shB, cand, threshold)
  }

  /** Cross-corpus exact-Jaccard verify: like `verifyJaccard` but each pair
    * side pulls its shingle set from its OWN corpus's table (id spaces may
    * overlap across corpora, so the sets cannot share one aggregate). */
  private def verifyJaccardCross(shA: DataFrame, shB: DataFrame,
      cand: DataFrame, threshold: Double): DataFrame = {
    def sets(sh: DataFrame, side: String) = sh
      .join(cand.select(col(side).as("id")).distinct(), Seq("id"), "left_semi")
      .groupBy("id")
      .agg(collect_list(col("h")).as("set"), count(lit(1)).as("n"))
      .stage() // lineage-truncated for the same peak-scratch reason as verifyJaccard
    cand
      .join(sets(shA, "id_a")
        .select(col("id").as("id_a"), col("set").as("sa"), col("n").as("na")),
        Seq("id_a"))
      .join(sets(shB, "id_b")
        .select(col("id").as("id_b"), col("set").as("sb"), col("n").as("nb")),
        Seq("id_b"))
      .withColumn("c", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .filter(col("c") / (col("na") + col("nb") - col("c")) >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("c") / (col("na") + col("nb") - col("c")), 4).as("jaccard"))
  }

  /** Exact n-gram-Jaccard pairs ≥ threshold (no LSH), with PREFIX-FILTERED
    * candidate generation (the AllPairs/PPJoin family — Bayardo et al.,
    * "Scaling Up All Pairs Similarity Search", WWW'07; public algorithm).
    *
    * Order shingles globally by (document frequency asc, shingle): for
    * J(A,B) ≥ t the globally-first COMMON shingle must lie within both
    * docs' prefixes of length |d| - ceil(t·|d|) + 1 — otherwise all common
    * shingles fit in a suffix of size ceil(t·|d|)-1 < t·|d| ≤ |A∩B|,
    * a contradiction. So the candidate equi-join touches only prefix
    * shingles — and because rarest-first ordering puts stopword shingles
    * (the hot keys that make the naive inverted index quadratic) LAST,
    * they never enter the join unless a doc is almost all stopwords.
    * Verification is exact over the pruned candidate set, so the output
    * equals the naive all-pairs join row for row.
    *
    * (The fp product t·n can land a hair ABOVE the exact integer when t·n
    * is integral — 0.3·10 → 3.0000000000000004 → ceil 4 — which would
    * SHORTEN the prefix and drop a pair sitting exactly at the threshold;
    * `ceil(t·n − 1e-9)` keeps the bound safe: the epsilon is far above
    * double rounding error and far below 1/n for any real doc size, and a
    * too-SMALL ceil only lengthens the prefix, which never loses pairs.)
    *
    * Measured cost regime (sf0.1, 5000 docs, 2-grams, t=0.5): prefixes are
    * half of each doc, so hot shingles DO enter the join — 16.5M raw prefix
    * matches, 3.5M candidates after the length + positional filters, for
    * 256 true pairs. Exact MID-threshold text similarity on a
    * dense-vocabulary corpus is near-quadratic whatever the filter stack
    * (the same physics as the loose-threshold embedding gate — see
    * Similarity.exactCosinePairs); prefix filtering pays off steeply as t
    * rises (prefix length (1−t)·n + 1, positional bound t/(1+t)·(na+nb)).
    * Everything downstream is linear in candidates: the pair-wise
    * set-intersection verify replaced a co-shingle self-join that was
    * quadratic in candidate DOCS (13 of d4's 15 s). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one HASHED shingle table for the prefix build AND the verify (see
    // minhashLshPairs); repartition by id up front so the tokenize/explode
    // work is spread before materialization. The prefix-filter proof needs
    // only SOME global total order over shingles shared by all documents —
    // (df asc, h) is as valid as (df asc, s), and the 8-byte key keeps the
    // staged prefix table and the df/window shuffles string-free.
    val sh = hashedShingleTable(docs, idCol, textCol, shingleN)
      .repartition(col("id")).stage()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val docFreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    // prefix carries each doc's shingle count so the join can apply the
    // LENGTH filter (J >= t forces t·max(na,nb) <= min(na,nb) — Bayardo et
    // al.'s size condition): size-mismatched pairs never become candidates.
    // localCheckpoint: the self-join consumes the prefix twice, and the
    // subtree above it (two aggregations + a per-doc window sort) would
    // otherwise run once per side with blind size estimates (same lesson
    // as the minhash bucket table).
    val prefix = sh.join(docFreq, Seq("h"))
      .withColumn("rank",
        row_number().over(Window.partitionBy("id").orderBy("df", "h")))
      .join(sizes, Seq("id"))
      .filter(col("rank") <= col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)
      .select("id", "h", "n", "rank")
      .stage() // A/B'd unstaged (r16): +5% wall, +33% task time — the
               // window subtree recomputes per join side (exchange reuse
               // does not cover it), so the materialization stays
    // positional filter (PPJoin, Xiao et al. WWW'08): a match on shingle s
    // at ranks (ra, rb) bounds the overlap by 1 + min(na-ra, nb-rb); a pair
    // whose bound can't reach the required minimum overlap
    // ceil(t/(1+t)·(na+nb)) is pruned. Exact: for the pair's FIRST common
    // prefix shingle no common element precedes it (it would be an earlier
    // prefix match), so the bound holds — and keeping a pair if ANY of its
    // matches passes only widens the kept set.
    val minOverlap =
      ceil(lit(threshold / (1 + threshold)) * (col("a.n") + col("b.n")) - lit(1e-9))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
          least(col("a.n"), col("b.n")) >=
            lit(threshold) * greatest(col("a.n"), col("b.n")) &&
          lit(1) + least(col("a.n") - col("a.rank"), col("b.n") - col("b.rank")) >=
            minOverlap)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
      .stage() // 3 downstream consumers — same truncation as minhashLshPairs
    verifyJaccard(sh, cand, threshold)
  }

  /** 32-bit SimHash signature per document (term-frequency weighted: every
    * token occurrence votes ±1 per bit). */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val bits = spark.range(32).select(col("id").cast("int").as("b"))
    val tok = docs.select(col(idCol).as("id"),
        explode(TextOps.tokens(col(textCol))).as("w"))
      .select(col("id"), Portable.hash32(col("w")).as("h"))
    // repartition by id for the same single-input-partition reason as
    // minhashes: spread the ×32 bit blow-up, satisfy the (id, b) grouping
    tok.repartition(col("id")).crossJoin(broadcast(bits))
      .groupBy("id", "b")
      .agg(sum(when(expr("(h >> b) & 1") === 1, 1).otherwise(-1)).as("wt"))
      .groupBy("id")
      .agg(sum(when(col("wt") > 0, expr("shiftleft(cast(1 as bigint), b)"))
        .otherwise(0L)).as("simhash"))
  }

  /** SimHash near-dup pairs with hamming ≤ maxHamming (≤3 with 4 bands is
    * pigeonhole-exact). Output (id_a, id_b, hamming). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = simhash(docs, idCol, textCol)
    // 4 bands of 8 bits; a pair within hamming ≤ 3 must agree on ≥ 1 band.
    val banded = sig.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("band"), expr(s"(simhash >> ${k * 8}) & 255").as("bv"))): _*)).as("bb"))
      .select(col("id"), col("simhash"), col("bb.band"), col("bb.bv"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.simhash").as("sa"), col("y.simhash").as("sb"))
      .distinct()
    cand.withColumn("hamming", expr("bit_count(sa ^ sb)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
