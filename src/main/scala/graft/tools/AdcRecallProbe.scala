package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.pipeline.{Pq, Similarity}

/** Dev probe: recall@k of the PURE ADC path (full-corpus codes scan, no
  * IVF pruning, no exact rerank) against exact brute-force top-k — sets
  * the sim5 gate's floor from measurement rather than hope. */
object AdcRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-adc-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val queries = e.filter(col("vec_id") < 10)
    // exact ground truth over the SAME double-cast vectors the ADC path
    // scores, so 6-dp tie-breaks can't diverge between the two rankings
    val exact = Similarity.bruteForceTopK(e, queries, "vec_id", "v", k = 5)
      .select("query_id", "neighbor_id")
    val denom = exact.count().toDouble
    val base = graft.queries.Pipeline.cachedIvfDir(dir, "sim5",
      s"pq,m=8,k=16,iters=2,pqv${Pq.PqBuildVersion}")
    val books = Pq.trainCodebooksCached(e, "vec_id", "v", m = 8, k = 16,
      iters = 2, dim = 64, base + "_books", spark)
    val codes = Pq.encodeCached(e, "vec_id", "v", books, m = 8, dim = 64,
      base + "_codes", spark)
    for (k <- Seq(5, 10, 25, 50)) {
      val ann = Pq.adcTopK(codes, books, queries, "vec_id", "v",
          k = k, m = 8, dim = 64)
        .select("query_id", "neighbor_id")
      val hits = ann.join(exact, Seq("query_id", "neighbor_id")).count()
      println(f"adc_k=$k%3d  contains_exact_top5=${hits / denom}%.2f")
    }
    // planted-pair retrieval: queries are the 50 planted near-dups (ids
    // 10000+x, cosine >= 0.9987 to original x), corpus codes are the raw
    // embeddings — the original must surface in the ADC top-k
    val planted = graft.queries.Pipeline.plantedQueries(
      Tables.load(spark, dir, "embeddings"))
    val nq = planted.count()
    for (k <- Seq(1, 5)) {
      val ann = Pq.adcTopK(codes, books, planted, "vec_id", "v",
          k = k, m = 8, dim = 64)
      val hit = ann.filter(col("neighbor_id") === col("query_id") - 10000)
      val hitAt1 = hit.filter(col("rank") === 1).count()
      println(f"planted k=$k%2d  n=$nq  hit=${hit.count()}  hit_at_rank1=$hitAt1")
    }
    spark.stop()
  }
}
