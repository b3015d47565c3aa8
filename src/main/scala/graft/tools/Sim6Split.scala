package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.pipeline.{Pq, Similarity}

/** Dev probe: attribute sim6's bench time between the composed IVF-PQ ANN
  * path and the self-asserting oracle gate that now rides the same frame
  * (added round 11) — so a round-over-round bench delta on sim6 is
  * attributable to the query's changed surface, not an ANN regression. */
object Sim6Split {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-sim6-split")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[sim6split] $label%-12s min=${ts.min}%6.2f s reps=${ts.map(t => f"$t%.2f").mkString("[", ", ", "]")}")
    }
    // warm both paths once (index/books/codes caches build untimed)
    graft.SparkEntry.queries("sim6_ivfpq")(spark, dir).count()
    val e = Tables.load(spark, dir, "embeddings")
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
    val planted = graft.queries.Pipeline.plantedQueries(e)
      .select(col("vec_id"), transform(col("v"), x => x.cast("float")).as("embedding"))
    time("ann_only") {
      Pq.ivfPqTopK(spark, idx, books, planted, "vec_id", "embedding",
        "label", m = 8, dim = 64, k = 5, nprobe = 4, shortlist = 25,
        codesPath = Some(codesPath)).count()
    }
    time("full_gated") {
      graft.SparkEntry.queries("sim6_ivfpq")(spark, dir).count()
    }
    spark.stop()
  }
}
