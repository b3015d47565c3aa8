package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.pipeline.{Pq, Similarity}

/** Dev probe: recall@k of the IVF-PQ path against the exact brute-force
  * top-k across (nprobe, shortlist) operating points, to set the sim7
  * gate's floor from measurement rather than hope. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val e = Tables.load(spark, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
    val idx = Similarity.ivfBuildCached(e, "embedding", "label",
      graft.queries.Pipeline.cachedIvfDir(dir, "sim2", "cellCol=label"))
    val ed = e.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val base = graft.queries.Pipeline.cachedIvfDir(dir, "sim6",
      s"pq,m=8,k=16,iters=2,cellCol=label,pqv${Pq.PqBuildVersion}")
    val books = Pq.trainCodebooksCached(ed, "vec_id", "v", m = 8, k = 16,
      iters = 2, dim = 64, base + "_books", spark)
    val codesPath = Pq.encodeCellsCached(spark, idx, "vec_id", "embedding",
      "label", books, m = 8, dim = 64, base + "_cellcodes")
    for ((np, sl) <- Seq((4, 25), (4, 100), (10, 50), (10, 100), (10, 200))) {
      val ann = Pq.ivfPqTopK(spark, idx, books, queries, "vec_id",
          "embedding", "label", m = 8, dim = 64, k = 5, nprobe = np,
          shortlist = sl, codesPath = Some(codesPath))
        .select("query_id", "neighbor_id")
      val hits = ann.join(exact, Seq("query_id", "neighbor_id")).count()
      println(f"nprobe=$np%2d shortlist=$sl%3d  recall@5=${hits / 50.0}%.2f")
    }
    spark.stop()
  }
}
