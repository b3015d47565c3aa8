package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Salting, Tables}

/** Skewed-tier evidence for the skew operators (SCALE.md): measures the
  * salted join/agg paths and AQE's skew-join splitting against the plain
  * plans on a tier whose keys are GENUINELY Zipf-distributed
  * (`GenScale <dir> <scale> --zipf <s>` — the driver tiers' uniform
  * hash-derived keys never exercise these paths, which is exactly why this
  * probe exists).
  *
  * The join probe runs with broadcast DISABLED: at probe scale the dim
  * table would broadcast and no skew path is reachable at all — but the
  * 100 TB regime this evidence stands in for is a dim over the broadcast
  * budget, where the fact side must shuffle on the skewed key. Three
  * variants: plain shuffle join with AQE skew-splitting ON (the default
  * path), OFF (what the skew actually costs), and the explicit salted
  * join (the deterministic tool for when AQE can't see the skew).
  *
  * Usage: runMain graft.tools.SkewProbe <zipfDir> [salt] */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SkewProbe <zipfDir> [salt]")
    val dir = args(0)
    val salt = if (args.length > 1) args(1).toInt else 32
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = Engine.session("skew-probe", dataDir = Some(dir))
    spark.sparkContext.setLogLevel("WARN")

    val li = Tables.load(spark, dir, "lineitem")
    val supp = Tables.load(spark, dir, "supplier")
    val ev = Tables.load(spark, dir, "events")

    // realized skew: top-key share of the fact rows (the documented skew
    // factor the measurements are AT)
    def topShare(df: org.apache.spark.sql.DataFrame, key: String): (Long, Double) = {
      val total = df.count()
      val top = df.groupBy(col(key)).count().orderBy(desc("count")).limit(1)
        .collect()(0)
      (top.getLong(1), top.getLong(1).toDouble / total)
    }
    val (liTop, liShare) = topShare(li, "l_suppkey")
    val (evTop, evShare) = topShare(ev, "user_id")
    println(f"[skew] lineitem.l_suppkey top-key rows=$liTop share=${liShare * 100}%.1f%%")
    println(f"[skew] events.user_id     top-key rows=$evTop share=${evShare * 100}%.1f%%")

    def time(name: String)(body: => Long): Long = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[skew] $name%-38s min=${ts.map(_._1).min}%7.2f s  " +
        f"reps=${ts.map(t => f"${t._1}%.2f").mkString("[", ",", "]")}  rows=${ts.head._2}")
      ts.head._2
    }

    // ---- fact-dim join on the skewed key (broadcast off: the over-budget
    // dim regime); all three variants must agree on cardinality
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // untimed warmup pass: the FIRST measured variant otherwise absorbs all
    // the JIT + parquet-footer + page-cache cost (measured 27.8 s first rep
    // vs 7.7 s second at sf10) and the variant comparison inverts
    li.join(supp, li("l_suppkey") === supp("s_suppkey")).count()
    ev.groupBy(col("user_id")).agg(count(lit(1))).count()
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val nAqe = time("join plain (AQE skew-split ON)") {
      li.join(supp, li("l_suppkey") === supp("s_suppkey")).count()
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val nPlain = time("join plain (AQE skew-split OFF)") {
      li.join(supp, li("l_suppkey") === supp("s_suppkey")).count()
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val nSalt = time(s"join salted (salt=$salt)") {
      Salting.saltedJoin(li, supp, "l_suppkey", "s_suppkey", salt).count()
    }
    require(nAqe == nPlain && nPlain == nSalt,
      s"salted/plain join cardinality drift: $nAqe / $nPlain / $nSalt")

    // ---- skewed-key aggregation: two-phase salted vs direct (partial
    // aggregation already absorbs most agg skew map-side; measured, not
    // assumed — the honest result goes to SCALE.md either way)
    val aAgg = time("agg direct groupBy(user_id)") {
      ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum("value").as("s")).count()
    }
    val aSalt = time(s"agg salted two-phase (salt=$salt)") {
      Salting.saltedCountSum(ev, "user_id", col("value"), salt).count()
    }
    require(aAgg == aSalt, s"salted agg group drift: $aAgg vs $aSalt")
    spark.stop()
  }
}
