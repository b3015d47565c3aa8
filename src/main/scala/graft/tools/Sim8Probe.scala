package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.pipeline.{Pq, Similarity}

/** Measurement behind sim8's probe-effectiveness floor (judge r13 item 6):
  * on a TRAINED index mutated by `ivfAdd`, at nprobe < cells, how many of
  * the planted exact-clone queries probe the cell their clone was assigned
  * to, and does the clone surface at rank 1 whenever its cell IS probed?
  * The clone is assigned by L2 argmin while the query probe ranks by
  * cosine — similar but not identical orderings on kmeans centroids of
  * near-gaussian vectors — so the floor must be MEASURED per tier, not
  * assumed. Run per tier: `run_tool.sh graft.tools.Sim8Probe <sfDir>`. */
object Sim8Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Engine.session("sim8-probe", dataDir = Some(dir))
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding", "label")
    for (nprobe <- Seq(2, 3, 4)) {
      val path = java.nio.file.Files.createTempDirectory("graft_sim8probe")
        .resolve("idx").toString
      Similarity.ivfBuildTrained(e.select("vec_id", "embedding"),
        "vec_id", "embedding", k = 8, iters = 2, path)
      val delta = e.filter(col("vec_id") < 3)
        .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
      Similarity.ivfAdd(spark, path, delta, "vec_id", "embedding", "cell")
      val queries = e.filter(col("vec_id") < 3).select("vec_id", "embedding")
      val cent = Similarity.readCentroids(spark, path)
      val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .withColumn("qn", Similarity.norm(col("qv")))
      val probed = Pq.probedCells(cent, q, nprobe)
      val cloneCells = spark.read.parquet(path)
        .filter(col("vec_id") >= 10000000L)
        .select((col("vec_id") - 10000000L).as("query_id"), col("cell"))
      val np = cloneCells.join(probed, Seq("query_id", "cell")).count()
      val top1 = Similarity.ivfTopK(spark, path, queries,
          "vec_id", "embedding", "cell", k = 5, nprobe = nprobe)
        .filter(col("rank") === 1)
        .join(cloneCells.join(probed, Seq("query_id", "cell"))
          .select(col("query_id"), lit(1).as("cp")), Seq("query_id"), "left")
        .agg(min(when(col("cp").isNull ||
          col("neighbor_id") === col("query_id") + 10000000L, 1).otherwise(0)))
        .collect()(0).getInt(0)
      println(s"SIM8PROBE dir=$dir nprobe=$nprobe cloneCellsProbed=$np/3 top1WhenProbed=$top1")
    }
    spark.stop()
  }
}
