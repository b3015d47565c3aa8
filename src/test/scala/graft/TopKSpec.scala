package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.plans.TopK

class TopKSpec extends SparkTestBase {

  private def keptValues(df: org.apache.spark.sql.DataFrame, key: String,
      ord: String): Map[Any, Seq[Double]] =
    df.collect().groupBy(_.getAs[Any](key))
      .view.mapValues(_.map(_.getAs[Double](ord)).sorted.toSeq).toMap

  test("TopKPerKey equals the window row_number result (value multiset)") {
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_totalprice"))
    val viaOp = TopK.perKey(orders, Seq("o_custkey"), "o_totalprice", k = 3)
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"))
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(keptValues(viaOp, "o_custkey", "o_totalprice") ==
      keptValues(viaWindow, "o_custkey", "o_totalprice"))
  }

  test("ascending mode keeps the smallest k") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val viaOp = TopK.perKey(li, Seq("l_returnflag"), "l_extendedprice",
      k = 5, descending = false)
    val w = Window.partitionBy("l_returnflag").orderBy(asc("l_extendedprice"))
    val viaWindow = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
    assert(keptValues(viaOp, "l_returnflag", "l_extendedprice") ==
      keptValues(viaWindow, "l_returnflag", "l_extendedprice"))
  }

  test("the physical plan contains the custom exec and no Sort") {
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_totalprice"))
    val plan = TopK.perKey(orders, Seq("o_custkey"), "o_totalprice", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!plan.contains("Sort "), s"unexpected sort in:\n$plan")
  }

  test("NULL order values rank worst in both directions (window nulls-last parity)") {
    import spark.implicits._
    val df = Seq[(String, Option[Double])](
      ("a", Some(3.0)), ("a", Some(1.0)), ("a", None), ("a", Some(2.0)),
      ("b", None), ("b", None), ("b", Some(5.0)),
      ("c", None)) // group of only-null: must still surface
      .toDF("k", "v")
    def multiset(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]))).toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_.getOrElse(-1e18))).toMap
    for (desc <- Seq(true, false)) {
      val ordCol = if (desc) col("v").desc_nulls_last else col("v").asc_nulls_last
      val w = Window.partitionBy("k").orderBy(ordCol)
      val viaWindow = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).drop("rn")
      val viaOp = TopK.perKey(df, Seq("k"), "v", k = 2, descending = desc)
      assert(multiset(viaOp) == multiset(viaWindow), s"descending=$desc")
    }
  }

  test("planner emits a map-side partial pass before the exchange") {
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_totalprice"))
    val plan = TopK.perKey(orders, Seq("o_custkey"), "o_totalprice", k = 3)
      .queryExecution.executedPlan.toString
    // final above the exchange, partial below it: partial top-k bounds the
    // shuffle to k rows per key per input partition
    val iFinal = plan.indexOf("TopKPerKey ")
    val iExchange = plan.indexOf("Exchange hashpartitioning")
    val iPartial = plan.indexOf("TopKPerKeyPartial")
    assert(iFinal >= 0 && iExchange >= 0 && iPartial >= 0, s"missing nodes:\n$plan")
    assert(iFinal < iExchange && iExchange < iPartial,
      s"partial/exchange/final out of order:\n$plan")
  }

  test("tiebreak makes the kept SET deterministic under duplicated ord values") {
    import spark.implicits._
    // every price duplicated within its key group — without a tiebreak the
    // kept row set would be an arbitrary 3-subset of the tied rows
    val df = Seq(
      ("a", 10L, 100.0), ("a", 11L, 100.0), ("a", 12L, 100.0), ("a", 13L, 100.0),
      ("a", 14L, 50.0),
      ("b", 20L, 7.0), ("b", 21L, 7.0), ("b", 22L, 9.0), ("b", 23L, 7.0))
      .toDF("k", "id", "price")
    val viaOp = TopK.perKey(df, Seq("k"), "price", k = 3,
      tiebreak = Seq(-col("id")))
    val w = Window.partitionBy("k").orderBy(desc("price"), asc("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("k", "id", "price").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2)).toSeq
    assert(rows(viaOp) == rows(viaWindow))
    // exact expected set: ties broken by LOWEST id
    assert(rows(viaOp) == Seq(
      ("a", 10L, 100.0), ("a", 11L, 100.0), ("a", 12L, 100.0),
      ("b", 20L, 7.0), ("b", 21L, 7.0), ("b", 22L, 9.0)))
  }

  test("tiebreak mode keeps nulls-last for a NULLABLE ord column, both directions") {
    import spark.implicits._
    // group "a": two non-null dups (tiebroken) + a null; group "b": nulls
    // outnumber non-nulls so a null row must fill the k-quota LAST
    val df = Seq(
      ("a", Some(5.0), 1L), ("a", Some(5.0), 2L), ("a", None, 3L),
      ("b", Some(1.0), 4L), ("b", None, 5L), ("b", None, 6L))
      .toDF("key", "ord", "id")
      .select(col("key"), col("ord").cast("double").as("ord"), col("id"))
    def got(desc0: Boolean) = TopK.perKey(df, Seq("key"), "ord", k = 2,
        descending = desc0, tiebreak = Seq(-col("id")))
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getLong(2)))
      .sortBy(t => (t._1, t._3)).toSeq
    // desc: a keeps the 5.0 dups (ids 1,2 — null id-3 excluded); b keeps
    // its lone non-null then the LOWEST-id null via the -id tiebreak
    assert(got(true) == Seq(("a", Some(5.0), 1L), ("a", Some(5.0), 2L),
      ("b", Some(1.0), 4L), ("b", None, 5L)), s"desc: ${got(true)}")
    // asc: nulls still last; the -id tiebreak now reads ascending, so the
    // HIGHEST id null (6) fills b's quota — direction applies to the whole
    // struct, tiebreak included
    assert(got(false) == Seq(("a", Some(5.0), 1L), ("a", Some(5.0), 2L),
      ("b", Some(1.0), 4L), ("b", None, 6L)), s"asc: ${got(false)}")
  }

  test("no-reduction bypass preserves results on high-cardinality keys") {
    // > BypassSampleRows rows per partition with ~all-distinct keys: the
    // partial pass samples, sees no per-key reduction, and streams the
    // remainder through untouched (TopKPerKeyExec.BypassSampleRows). The
    // final pass must absorb the extra rows — output identical to the
    // window plan. Key 0 is a planted HOT key crossing the sample boundary
    // so the bypass path also carries buffered heap state for a key that
    // keeps arriving after the switch.
    val df = spark.range(20000).repartition(2)
      .select(when(col("id") < 100, lit(0L)).otherwise(col("id")).as("k"),
        (col("id") % 7).cast("double").as("v"), col("id"))
    assert(20000 / 2 > graft.plans.TopKPerKeyExec.BypassSampleRows)
    val viaOp = TopK.perKey(df, Seq("k"), "v", k = 2, tiebreak = Seq(-col("id")))
    val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("k", "id", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(rows(viaOp) == rows(viaWindow))
  }

  test("k larger than group size returns whole groups") {
    val nation = Tables.load(spark, sfDir, "nation")
      .select(col("n_regionkey"), col("n_nationkey").cast("double").as("v"))
    val res = TopK.perKey(nation, Seq("n_regionkey"), "v", k = 100)
    assert(res.count() == nation.count())
  }
}
