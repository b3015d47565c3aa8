package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{QueryDef, Tables}
import graft.functions.Portable.{dsum, sqlDsum}

/** Headline analytical queries (TPC-H-shaped) — the bench set. These are the
  * plans that must survive a 100×–1000× scale-up: fact-side scans with
  * pushed filters, broadcast dims, partial aggregation before the single
  * shuffle, decimal-exact money math.
  */
object Headline {

  /** Names of the queries Bench times: the six TPC-H headliners plus the
    * wider shapes (deep join tree q9, anti/semi stack q21) and one
    * representative per pipeline/operator family — exact dedup, MinHash
    * LSH, AllPairs Jaccard, loose- and tight-threshold embedding near-dup,
    * IVF probe, IVF-PQ (probe → pruned ADC → exact rerank over the cached
    * build-once layout), TF-IDF, windowed agg, TopKPerKey, range join,
    * as-of join — so a run-noise swing on any one family is attributable. */
  val benchNames: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_revenue",
    "q6_forecast_revenue", "q9_profit_by_nation", "q10_returned_items",
    "q18_large_orders", "q21_sole_blame",
    "d1_dedup_exact", "d2_minhash_lsh", "d4_ngram_jaccard",
    "d5_embedding_near_dup", "d8_near_dup_tight", "sim2_ivf_knn",
    "sim6_ivfpq",
    "t5_tfidf", "st1_tumbling_window", "w5_topk_per_key",
    "rj1_range_join", "aj1_asof_join")

  private val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  val defs: Seq[QueryDef] = Seq(

    // q4-shaped: EXISTS semi-join + priority counts (late lineitems)
    QueryDef(
      "q4_order_priority",
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      val li = Tables.load(s, dir, "lineitem")
      o.join(li, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // q12-shaped: conditional counts over a fact-dim join
    QueryDef(
      "q12_priority_lines",
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .cast("long").as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
            .cast("long").as("low_line_count"))
        .orderBy("l_returnflag")
    },

    // q14-shaped: conditional revenue share (promo-ratio form)
    QueryDef(
      "q14_revenue_share",
      """SELECT round(100.0 *
        |  CAST(sum(CASE WHEN p_type LIKE 'SMALL%'
        |      THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin) { (s, dir) =>
      val d4 = DecimalType(18, 4)
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .join(Tables.load(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type").like("SMALL%"), disc.cast(d4)).otherwise(lit(0).cast(d4))).cast("double") /
          sum(disc.cast(d4)).cast("double"), 4).as("promo_share"))
    },

    // q19-shaped: disjunction of conjunctive ranges — the OR-of-ANDs
    // predicate form; Catalyst still pushes the disjunction to the scan.
    QueryDef(
      "q19_disjunctive",
      """SELECT count(*) AS n, """ +
        ("CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)" +
         " AS revenue ") +
        """FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_size >= 7 AND l_quantity >= 25)""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "part"), col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20)) ||
          (col("p_size") >= 7 && col("l_quantity") >= 25))
        .agg(count(lit(1)).as("n"),
          sum(disc.cast(DecimalType(18, 4))).cast("double").as("revenue"))
    },

    // q17-shaped: correlated avg-quantity subquery, decorrelated into a
    // per-part pre-aggregate; the comparison stays in exact decimals
    // (qty * 5 * cnt < sum_qty  ⇔  qty < 0.2 * avg) so no division crosses
    // the engines.
    QueryDef(
      "q17_small_quantity",
      """WITH pa AS (SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
        |                   count(*) AS c
        |            FROM lineitem GROUP BY l_partkey)
        |SELECT count(*) AS n_lines,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
        |WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * c < sq""".stripMargin) { (s, dir) =>
      val d2t = DecimalType(18, 2)
      val li = Tables.load(s, dir, "lineitem")
      val pa = li.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity").cast(d2t)).as("sq"), count(lit(1)).as("c"))
      li.join(pa, col("l_partkey") === col("pk"))
        .filter(col("l_quantity").cast(d2t) * 5 * col("c") < col("sq"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast(d2t)).cast("double").as("total_price"))
    },

    QueryDef(
      "q1_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
         |  ${sqlDsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(disc, 4).as("sum_disc_price"),
          dsum(disc * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    QueryDef(
      "q3_shipping_priority",
      s"""SELECT l_orderkey, ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
         |  o_orderdate
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15'
         |  AND l_shipdate > TIMESTAMP '1998-03-15'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      // pre-aggregate the fact side per orderkey BEFORE joining dims: the
      // shuffle carries one row per order instead of one per lineitem
      // (fanout ~4x smaller; decimal sums are associative so semantics hold)
      val liAgg = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
        .groupBy("l_orderkey")
        .agg(dsum(disc, 4).as("revenue"))
      val bldOrders = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
        .join(Tables.load(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey"),
          col("o_custkey") === col("c_custkey"), "left_semi")
      liAgg.join(bldOrders, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
    },

    QueryDef(
      "q5_local_revenue",
      s"""SELECT n_name, ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      // lineitem is the STREAM side (r15): the old customer⋈orders-first
      // spelling made lineitem the next join's BUILD side, so at every tier
      // where its pruned-column estimate fit, the planner BROADCAST the
      // fact table — a single-threaded 600k-row hashed-relation build at
      // sf0.1. Fixing the build side at plan time is not possible without
      // CBO (any join output's size estimate is a product, so the
      // orders⋈customer key table always "looks" huge), so the spelling
      // leans on AQE instead: lineitem first picks up s_nationkey through
      // the tiny always-broadcast supplier dim, which makes BOTH sides of
      // the big join be join outputs — it plans as a sort-merge join and
      // AQE converts it from TRUE runtime sizes (bench tiers: broadcast of
      // the ~45k-row key table, fact side streamed through a local shuffle
      // read; big tiers: stays SMJ). Inner-join conditions move freely, so
      // the row set is unchanged — the c_nationkey = s_nationkey predicate
      // rides the key-table join instead of the supplier join.
      val oc = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
        .join(Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_nationkey")
      // supplier SCALES with SF (10k rows/SF), so its hint is budget-gated
      // (r16, VERDICT #3): an explicit broadcast() overrides the size
      // threshold and at a genuine 100 TB tier would be a multi-GB
      // driver-built relation. Under Engine.broadcastBudget the plan is
      // unchanged (bench tiers: supplier is KBs); over it the hint is
      // omitted and AQE still broadcasts wherever runtime sizes fit.
      val supplier = graft.core.Engine.gatedBroadcast(
        Tables.load(s, dir, "supplier"),
        graft.core.Engine.dataBytes(s"$dir/supplier.parquet") *
          graft.core.Engine.BroadcastBytesPerParquetByte)
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(supplier,
          col("l_suppkey") === col("s_suppkey"))
        .join(oc, col("l_orderkey") === col("o_orderkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.load(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(disc, 4).as("revenue"))
        .orderBy(desc("revenue"), asc("n_name"))
    },

    QueryDef(
      "q6_forecast_revenue",
      s"""SELECT ${sqlDsum("l_extendedprice * l_discount", 4)} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_discount BETWEEN 0.03 AND 0.09 AND l_quantity < 24.0""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.09) && col("l_quantity") < 24.0)
        .agg(dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"))
    },

    QueryDef(
      "q10_returned_items",
      s"""SELECT c_custkey, c_name, ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
         |  n_name
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
         |  AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
      // same pre-aggregation shape as q3: per-order partial revenue first,
      // then the dim joins and the (much smaller) per-customer re-aggregate
      val liAgg = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .groupBy("l_orderkey")
        .agg(sum(disc.cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("rev_part"))
      val ords = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      liAgg.join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(col("rev_part")).cast("double").as("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)
    },

    QueryDef(
      "q18_large_orders",
      s"""SELECT c_custkey, o_orderkey, o_orderdate,
         |  CAST(o_totalprice AS DOUBLE) AS total_price, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
         |HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
         |ORDER BY total_price DESC, o_orderkey LIMIT 20""".stripMargin) { (s, dir) =>
      // orderkey is unique in orders, so grouping by the order attributes is
      // the same as grouping lineitem by orderkey first — do that, filter
      // early (HAVING prunes before the join), then broadcast the dims
      val liAgg = Tables.load(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2))).as("qdec"),
          dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("qdec") > 150)
      liAgg.join(Tables.load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice").cast("double").as("total_price"), col("sum_qty"))
        .orderBy(desc("total_price"), asc("o_orderkey"))
        .limit(20)
    }
  )
}
