package graft

import org.apache.spark.sql.functions._

import graft.core.{Bucketing, Tables}

class BucketingSpec extends SparkTestBase {

  test("bucketed co-located join plans with zero shuffle exchanges") {
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey")
    Bucketing.writeBucketed(ord, "ord_bucketed", "o_orderkey")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.cojoin(spark, "li_bucketed", "ord_bucketed",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange"), s"unexpected shuffle in bucketed join:\n$plan")
      // and it is still correct
      assert(joined.count() ==
        li.join(ord, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("bucketed aggregation on the bucket key avoids the shuffle") {
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(li, "li_bucketed2", "l_orderkey")
    try {
      val agg = spark.table("li_bucketed2")
        .groupBy("l_orderkey").agg(sum("l_quantity"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in bucketed agg:\n$plan")
      assert(agg.count() == li.select("l_orderkey").distinct().count())
    } finally spark.sql("DROP TABLE IF EXISTS li_bucketed2")
  }
}
