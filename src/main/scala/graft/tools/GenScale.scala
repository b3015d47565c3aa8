package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.core.Engine

/** Dev tool: generate a LARGER tier of the driver's synthetic testdata
  * layout (TESTDATA.md) for scale probing — same schemas, same value
  * distributions and cross-table key ranges, rows ×`scale` of the sf0.1
  * tier. Used to produce `/tmp/graft_sf1` (lineitem ≈ 6M) for
  * `BENCH_sf1.json`: the artifact that tests whether each bench query's
  * cost curve is linear where it claims to be.
  *
  * Deterministic and seedless-RNG: every value is a pure hash of
  * (row id, column tag) — xxhash64 → uniform [0,1) → inverse transforms —
  * so generation distributes as a map-only job with no RNG state, the same
  * discipline the engine's own sampling operators follow.
  *
  * Usage: runMain graft.tools.GenScale <outDir> [scale]   (default 10) */
object GenScale {

  /** Uniform [0, 1) from a hash of the given columns (52-bit mantissa). */
  private def u(cols: Column*): Column =
    (pmod(xxhash64(cols: _*), lit(1L << 52)).cast("double") / lit((1L << 52).toDouble))

  private def pick(uu: Column, opts: Seq[String]): Column =
    element_at(array(opts.map(lit): _*), (uu * opts.size).cast("int") + 1)

  /** Standard normal via Box–Muller on two hashed uniforms. */
  private def gauss(u1: Column, u2: Column): Column =
    sqrt(lit(-2.0) * log(greatest(u1, lit(1e-12)))) * cos(lit(2 * math.Pi) * u2)

  /** Zipf-ish rank in [0, n): inverse CDF of the continuous density x^-s on
    * [1, n+1], so P(rank = k) ≈ (k+1)^-s (rank 0 is the hottest key).
    * Used by `--zipf s` to produce genuinely skewed key columns — the
    * uniform `pmod(xxhash64)` keys of the default tiers never exercise the
    * salted/AQE skew paths, which is exactly the evidence gap the skew
    * probe exists to close (SCALE.md). */
  private def zipfRank(uu: Column, n: Long, s: Double): Column = {
    val x =
      if (s == 1.0) pow(lit(n + 1.0), uu)
      else {
        val a = 1.0 - s
        pow(uu * (math.pow(n + 1.0, a) - 1.0) + 1.0, 1.0 / a)
      }
    least(floor(x).cast("long") - 1, lit(n - 1))
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GenScale <outDir> [scale] [--zipf s]")
    val out = args(0)
    val pos = args.filterNot(_.startsWith("--")).drop(1)
    val scale = pos.headOption.map(_.toInt).getOrElse(10)
    // --zipf s: skew events.user_id and lineitem.l_suppkey with exponent s
    // (default 0 = uniform, the driver-tier shape). Key RANGES are
    // unchanged, so every cross-table join stays valid; only the key
    // frequency distribution changes.
    val zipfS = args.sliding(2).collectFirst {
      case Array("--zipf", v) => v.toDouble
    }.getOrElse(0.0)
    val spark = Engine.session("graft-genscale")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // sf0.1 row counts (TESTDATA.md tier) × scale; region/nation are fixed
    val nCust = 15000L * scale
    val nSupp = 1000L * scale
    val nPart = 20000L * scale
    val nOrd = 150000L * scale
    val nLine = 600000L * scale
    val nEv = 100000L * scale
    val nDoc = 5000L * scale
    val nVec = 2000L * scale
    val nUser = 1500L * scale

    def ids(n: Long, tag: String): DataFrame =
      spark.range(0, n, 1, 32).toDF("id").withColumn("_t", lit(tag))

    /** Write as the driver's single-file layout: `{out}/{name}.parquet` is
      * one FILE (the streaming source's pathGlobFilter and every loader
      * expect that shape) — but with 16 MB row groups, so the big tables
      * are SPLITTABLE for parallel scan like real large-scale data; the
      * source tier's single-row-group files make every scan one task,
      * which at 6M rows turns the map side into a serial bottleneck.
      *
      * `repartition(1)`, NOT `coalesce(1)`: coalesce collapses the whole
      * upstream compute into the single writer task (at the sf100 tier
      * that is 600M rows of hashing serialized onto one core); the
      * repartition keeps generation parallel across the 32 input slices
      * and only the final write is single-task. Row ORDER in the file
      * becomes shuffle-arrival order — values stay a pure function of row
      * id, and no consumer of a generated tier depends on file order
      * (the order-sensitive gates run on the driver's own tiers). */
    def writeOne(df: DataFrame, name: String): Unit = {
      val staging = s"$out/_stage_$name"
      df.repartition(1).write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", (16 * 1024 * 1024).toString)
        .parquet(staging)
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf)
      val part = fs.globStatus(new org.apache.hadoop.fs.Path(s"$staging/part-*.parquet"))
        .head.getPath
      val dest = new org.apache.hadoop.fs.Path(s"$out/$name.parquet")
      if (fs.exists(dest)) require(fs.delete(dest, false), s"delete failed for $dest")
      // rename returning false (not throwing) would leave the tier silently
      // missing this table — "wrote" would lie and downstream bench/verify
      // runs fail later with a confusing missing-table error
      require(fs.rename(part, dest), s"rename $part -> $dest failed")
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
      println(s"wrote $out/$name.parquet")
    }

    val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    writeOne(regions.zipWithIndex.map { case (r, i) => (i, r) }
      .toDF("r_regionkey", "r_name"), "region")
    val nations = (0 until 25).map(i => (i, s"Nation#$i", i % 5))
    writeOne(nations.toDF("n_nationkey", "n_name", "n_regionkey"), "nation")

    writeOne(ids(nCust, "c").select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      (pmod(xxhash64(col("id"), lit("cn")), lit(25))).cast("int").as("c_nationkey"),
      round(u(col("id"), lit("cb")) * 10000, 2).as("c_acctbal"),
      pick(u(col("id"), lit("cm")),
        Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
        .as("c_mktsegment")), "customer")

    writeOne(ids(nSupp, "s").select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      (pmod(xxhash64(col("id"), lit("sn")), lit(25))).cast("int").as("s_nationkey"),
      round(u(col("id"), lit("sb")) * 10000, 2).as("s_acctbal")), "supplier")

    val adjs = Seq("large", "hot", "blue", "old", "new", "dim", "bright", "cold")
    val nouns = Seq("ring", "bolt", "plate", "wire", "disk", "rod", "cap", "gear")
    writeOne(ids(nPart, "p").select(
      col("id").as("p_partkey"),
      concat_ws(" ", pick(u(col("id"), lit("pa")), adjs),
        pick(u(col("id"), lit("pn")), nouns)).as("p_name"),
      concat(lit("Brand#"),
        (pmod(xxhash64(col("id"), lit("pb")), lit(25)) + 1).cast("string")).as("p_brand"),
      pick(u(col("id"), lit("pt")),
        Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")).as("p_type"),
      (pmod(xxhash64(col("id"), lit("ps")), lit(50)) + 1).cast("int").as("p_size"),
      round(lit(900.0) + pmod(col("id"), lit(1000)) * 0.1, 1).as("p_retailprice")),
      "part")

    // orders span 1995-01-01 .. 2001-08-01 (2404 days), like the source tier
    writeOne(ids(nOrd, "o").select(
      col("id").as("o_orderkey"),
      pmod(xxhash64(col("id"), lit("oc")), lit(nCust)).as("o_custkey"),
      pick(u(col("id"), lit("os")), Seq("O", "P", "F")).as("o_orderstatus"),
      round(u(col("id"), lit("ot")) * 499000 + 1000, 2).as("o_totalprice"),
      date_add(lit("1995-01-01").cast("date"),
        (u(col("id"), lit("od")) * 2404).cast("int"))
        .cast("timestamp").as("o_orderdate"),
      pick(u(col("id"), lit("op")),
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .as("o_orderpriority")), "orders")

    // 6M lines hashed into 1.5M orders ≈ Poisson(4) lines/order, the same
    // per-order fanout shape as the source tier
    writeOne(ids(nLine, "l").select(
      pmod(xxhash64(col("id"), lit("lo")), lit(nOrd)).as("l_orderkey"),
      pmod(xxhash64(col("id"), lit("lp")), lit(nPart)).as("l_partkey"),
      (if (zipfS > 0) zipfRank(u(col("id"), lit("ls")), nSupp, zipfS)
       else pmod(xxhash64(col("id"), lit("ls")), lit(nSupp))).as("l_suppkey"),
      (pmod(col("id"), lit(7)) + 1).cast("int").as("l_linenumber"),
      ((u(col("id"), lit("lq")) * 50).cast("int") + 1).cast("double").as("l_quantity"),
      round(u(col("id"), lit("le")) * 104099 + 901, 2).as("l_extendedprice"),
      round(u(col("id"), lit("ld")) * 0.1, 2).as("l_discount"),
      round(u(col("id"), lit("lt")) * 0.08, 2).as("l_tax"),
      pick(u(col("id"), lit("lr")), Seq("A", "N", "R")).as("l_returnflag"),
      pick(u(col("id"), lit("ll")), Seq("F", "O")).as("l_linestatus"),
      date_add(lit("1995-01-02").cast("date"),
        (u(col("id"), lit("lsd")) * 2498).cast("int"))
        .cast("timestamp").as("l_shipdate")), "lineitem")

    // events: ts is a LONG of NANOSECONDS like the driver's files (Spark 4
    // reads those via nanosAsLong; Tables.load/EventStream convert) — one
    // month's span, users ×scale so per-user session density stays flat
    val monthUs = 30L * 86400 * 1000000
    writeOne(ids(nEv, "e").select(
      col("id").as("event_id"),
      ((lit(1704067200000000L) + (u(col("id"), lit("ets")) * monthUs).cast("long"))
        * 1000).as("ts"),
      (if (zipfS > 0) zipfRank(u(col("id"), lit("eu")), nUser, zipfS)
       else pmod(xxhash64(col("id"), lit("eu")), lit(nUser))).as("user_id"),
      pick(u(col("id"), lit("ee")),
        Seq("click", "view", "purchase", "signup", "error")).as("event_type"),
      round(u(col("id"), lit("ev")) * 560, 2).as("value"),
      format_string("{\"k\": %d}",
        pmod(xxhash64(col("id"), lit("ep")), lit(100))).as("props")), "events")

    // documents: word-soup text from a small vocabulary (the source tier's
    // shape); every 50th doc is a NEAR-DUP of its predecessor (same word
    // sequence + one extra token) so the dedup operators have real work
    val vocab = Seq("batch", "part", "spark", "line", "column", "order", "small",
      "sort", "fast", "value", "scan", "a", "vector", "query", "agg", "table",
      "hash", "stream", "filter", "big", "merge", "group", "the", "key", "slow",
      "customer", "join", "index", "cache", "shuffle")
    val seedId = when(pmod(col("id"), lit(50)) === 49, col("id") - 1).otherwise(col("id"))
    val nWords = (u(seedId, lit("dn")) * 90).cast("int") + 8
    val words = transform(sequence(lit(0), nWords - 1),
      j => pick(u(seedId, j, lit("dw")), vocab))
    val text = concat_ws(" ",
      flatten(array(words,
        when(pmod(col("id"), lit(50)) === 49, array(lit("extra")))
          .otherwise(array().cast("array<string>")))))
    writeOne(ids(nDoc, "d").select(
      col("id").as("doc_id"),
      text.as("text"),
      when(u(col("id"), lit("dl")) < 0.4, "en")
        .when(u(col("id"), lit("dl")) < 0.55, "de")
        .when(u(col("id"), lit("dl")) < 0.70, "zh")
        .when(u(col("id"), lit("dl")) < 0.85, "fr")
        .otherwise("es").as("lang"),
      concat(lit("src"), pmod(col("id"), lit(20)).cast("string")).as("source"),
      // bigint, not Spark's int `length`: the driver's pyarrow layout types
      // n_chars int64, and the catalog-inventory queries derive row widths
      // from the ACTUAL schema — the 4-byte gap was a measured sf1 oracle
      // mismatch (s1/inv row_width 108 vs 112)
      length(text).cast("bigint").as("n_chars")), "documents")

    // embeddings: 64-dim ~N(0, 0.13²) float vectors, labels 0..9 (labels
    // deliberately NOT cosine-aligned, like the source tier)
    writeOne(ids(nVec, "v").select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        (gauss(u(col("id"), i, lit("g1")), u(col("id"), i, lit("g2"))) * 0.13)
          .cast("float")).as("embedding"),
      (pmod(xxhash64(col("id"), lit("vl")), lit(10))).cast("int").as("label")),
      "embeddings")

    spark.stop()
  }
}
