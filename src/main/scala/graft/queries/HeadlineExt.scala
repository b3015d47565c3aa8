package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{QueryDef, Tables}
import graft.functions.Portable.{dsum, sqlDsum}

/** Extended TPC-H-pattern coverage (q2/q7/q8/q9/q13/q15/q16/q22 shapes),
  * adapted where the synthetic schema lacks a column (no partsupp, no
  * l_commitdate/receiptdate, no c_phone — adaptations noted per query).
  * Same plan discipline as [[Headline]]: filters reach the scans, only
  * fixed-size dims broadcast, exact decimal money math, every aggregate
  * double-cast only at the end.
  */
object HeadlineExt {

  private val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val d4 = DecimalType(18, 4)

  val defs: Seq[QueryDef] = Seq(

    // q2-shaped: min-per-group with join-back (the decorrelated form of
    // q2's correlated min-cost subquery; partsupp absent → retailprice).
    QueryDef(
      "q2_min_cost",
      """WITH m AS (SELECT p_size, min(p_retailprice) AS min_price
        |           FROM part WHERE p_type = 'STANDARD' GROUP BY p_size)
        |SELECT p.p_size, p.p_partkey, p.p_name, p.p_retailprice
        |FROM part p JOIN m ON p.p_size = m.p_size AND p.p_retailprice = m.min_price
        |WHERE p.p_type = 'STANDARD'
        |ORDER BY p.p_size, p.p_partkey""".stripMargin) { (s, dir) =>
      val std = Tables.load(s, dir, "part").filter(col("p_type") === "STANDARD")
      // rename the aggregate's key: the grouped frame shares attribute ids
      // with its parent, so a direct self-join condition would be ambiguous
      val m = std.groupBy(col("p_size").as("m_size"))
        .agg(min("p_retailprice").as("min_price"))
      std.join(m, col("p_size") === col("m_size") &&
          col("p_retailprice") === col("min_price"))
        .select("p_size", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_size", "p_partkey")
    },

    // q7: volume shipping between two nations, grouped by direction + year.
    QueryDef(
      "q7_volume_shipping",
      """WITH sh AS (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |         CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS volume
        |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01')
        |SELECT supp_nation, cust_nation, l_year, CAST(sum(volume) AS DOUBLE) AS revenue
        |FROM sh GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, dir) =>
      val n1 = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(Tables.load(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.load(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(dsum(disc, 4).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // q8: national market share within a region per year — conditional
    // decimal sums ratioed only at the end.
    QueryDef(
      "q8_market_share",
      """WITH al AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |         CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS volume,
        |         n1.n_name AS supp_nation
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  JOIN region ON n2.n_regionkey = r_regionkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  WHERE r_name = 'EUROPE' AND p_type = 'SMALL'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT o_year,
        |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume
        |                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |        / CAST(sum(volume) AS DOUBLE), 4) AS mkt_share
        |FROM al GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, dir) =>
      val n1 = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_regionkey").as("n2_rkey"))
      val euro = broadcast(Tables.load(s, dir, "region").filter(col("r_name") === "EUROPE"))
      Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "part").filter(col("p_type") === "SMALL"),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.load(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .join(euro, col("n2_rkey") === col("r_regionkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_7", disc.cast(d4))
            .otherwise(lit(0).cast(d4))).cast("double") /
          sum(disc.cast(d4)).cast("double"), 4).as("mkt_share"))
        .orderBy("o_year")
    },

    // q9-shaped: profit by nation and year over a part-name pattern
    // (no partsupp → profit is revenue, the grouping/filter shape is q9's).
    QueryDef(
      "q9_profit_by_nation",
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_profit
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "part").filter(col("p_name").like("%red%")),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.load(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(Tables.load(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(dsum(disc, 4).as("sum_profit"))
        .orderBy(asc("nation"), desc("o_year"))
    },

    // q13: customer order-count distribution — left outer join with an
    // ON-clause filter, then a second aggregation over the first.
    QueryDef(
      "q13_custdist",
      """WITH c_orders AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT CAST(c_count AS BIGINT) AS c_count, count(*) AS custdist
        |FROM c_orders GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    },

    // q15: top supplier — revenue CTE reused for max comparison; exact
    // decimal revenue makes the equality safe across engines.
    QueryDef(
      "q15_top_supplier",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      val revenue = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(disc.cast(d4)).as("total_revenue"))
      val top = revenue.agg(max("total_revenue").as("max_revenue"))
      Tables.load(s, dir, "supplier")
        .join(revenue, col("s_suppkey") === col("supplier_no"))
        .crossJoin(broadcast(top))
        .filter(col("total_revenue") === col("max_revenue"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_revenue").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    },

    // q16-shaped: distinct-supplier census per brand/type/size (partsupp
    // absent → supplier relationships derived through lineitem).
    QueryDef(
      "q16_supplier_cnt",
      """SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'SMALL' AND p_size IN (1, 2, 3, 4, 5)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "SMALL" &&
          col("p_size").isin(1, 2, 3, 4, 5))
        .join(Tables.load(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
    },

    // q11-shaped: important parts — per-key value share against a global
    // total (partsupp absent → lineitem extendedprice value).
    QueryDef(
      "q11_important_parts",
      """WITH v AS (SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
        |           FROM lineitem GROUP BY l_partkey),
        |t AS (SELECT sum(val) AS total FROM v)
        |SELECT l_partkey, CAST(val AS DOUBLE) AS value
        |FROM v, t
        |WHERE CAST(val AS DOUBLE) > CAST(total AS DOUBLE) * 0.005
        |ORDER BY value DESC, l_partkey""".stripMargin) { (s, dir) =>
      val d2 = DecimalType(18, 2)
      val v = Tables.load(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(sum(col("l_extendedprice").cast(d2)).as("val"))
      val t = v.agg(sum("val").as("total"))
      v.crossJoin(broadcast(t))
        .filter(col("val").cast("double") > col("total").cast("double") * 0.005)
        .select(col("l_partkey"), col("val").cast("double").as("value"))
        .orderBy(desc("value"), asc("l_partkey"))
    },

    // q20-shaped: promotion candidates — nested IN-subquery with an
    // aggregation threshold (partsupp absent → shipped quantity).
    QueryDef(
      "q20_promotion_candidates",
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_type = 'SMALL'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY l_suppkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200)
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      val d2 = DecimalType(18, 2)
      val qualifying = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "part").filter(col("p_type") === "SMALL"),
          col("p_partkey") === col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(sum(col("l_quantity").cast(d2)).as("q"))
        .filter(col("q") > 200)
        .select("l_suppkey")
      Tables.load(s, dir, "supplier")
        .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    },

    // q21-shaped: sole-blame suppliers in multi-supplier orders — q21's
    // EXISTS / NOT EXISTS correlated pair (no receipt/commit dates →
    // returnflag='R' marks the fault).
    //
    // PLAN: single-pass per-order census instead of the literal
    // EXISTS/NOT-EXISTS form. The naive plan (l1 ⋈ l2 semi ⋈ l3 anti)
    // shuffles the fact table THREE times and sort-merge-joins two
    // fact-sized sides — at the sf100 tier that is ~3× the 15.5 GB
    // lineitem as live shuffle + SMJ sort spill, which ENOSPC'd a ~50 GB
    // scratch volume twice (round 14, attempts 3–4). The census form
    // computes, per (orderkey, suppkey) then per orderkey, exactly the
    // three facts the correlated pair tests — #suppliers in the order,
    // #suppliers with a fault row, the fault supplier's row count — as
    // TWO narrow map-side-combinable aggregations (projection: 3 cols),
    // then joins only the surviving sole-blame orders (a few % of the
    // fact) against orders-F and supplier. Same rows, same counts:
    //   EXISTS l2 (other supplier)            ⇔ n_supp ≥ 2
    //   NOT EXISTS l3 (other supplier with R) ⇔ r_supp = 1  (l1 is R)
    //   count(*) over qualifying l1 rows      ⇔ Σ r_rows of that supplier
    QueryDef(
      "q21_sole_blame",
      """SELECT s_name, count(*) AS numwait FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin) { (s, dir) =>
      // ONE exchange for both census levels (r15): hash-spread the fact
      // rows by l_orderkey up front — HashPartitioning(l_orderkey) satisfies
      // the clustering of BOTH the (orderkey, suppkey) census and the
      // per-order rollup, so neither aggregation plans its own exchange.
      // The per-(ok, sk) partial agg barely reduced this fact table (~4
      // lines/order over ~4 suppliers), so the single raw-row shuffle
      // carries the same bytes the old first exchange did and the old
      // SECOND exchange disappears outright — fewer shuffles at every tier.
      val perSupp = graft.core.Engine.spread(
          Tables.load(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_suppkey"),
              when(col("l_returnflag") === "R", 1L).otherwise(0L).as("is_r")),
          col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(sum(col("is_r")).as("r_rows"))
      val soleBlame = perSupp.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"),
          sum(when(col("r_rows") > 0, 1).otherwise(0)).as("r_supp"),
          sum(col("r_rows")).as("r_rows"),
          max(when(col("r_rows") > 0, col("l_suppkey"))).as("r_suppkey"))
        .filter(col("r_supp") === 1 && col("n_supp") >= 2)
      soleBlame
        .join(Tables.load(s, dir, "orders").filter(col("o_orderstatus") === "F")
            .select("o_orderkey"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .join(Tables.load(s, dir, "supplier"), col("s_suppkey") === col("r_suppkey"))
        .groupBy("s_name").agg(sum(col("r_rows")).as("numwait"))
        .orderBy(desc("numwait"), asc("s_name"))
        .limit(20)
    },

    // q22-shaped: prospects — above-average positive balances in a country
    // set with no orders (scalar subquery + anti-join; c_phone absent →
    // country code is c_nationkey).
    QueryDef(
      "q22_prospects",
      """WITH avgbal AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS a
        |  FROM customer WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7))
        |SELECT c_nationkey AS cntrycode, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, avgbal
        |WHERE c_nationkey IN (1, 3, 5, 7) AND c_acctbal > a
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey ORDER BY cntrycode""".stripMargin) { (s, dir) =>
      val d2 = DecimalType(18, 2)
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_nationkey").isin(1, 3, 5, 7))
      val avgbal = cust.filter(col("c_acctbal") > 0.0)
        .agg((sum(col("c_acctbal").cast(d2)).cast("double") /
          count(lit(1))).as("a"))
      cust.crossJoin(broadcast(avgbal))
        .filter(col("c_acctbal") > col("a"))
        .join(Tables.load(s, dir, "orders"),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast(d2)).cast("double").as("totacctbal"))
        .orderBy("cntrycode")
    }
  )
}
