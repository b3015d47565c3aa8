package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.pipeline.{Pq, Similarity}

/** Dev probe for the sim6 gate: planted-pair retrieval through the FULL
  * IVF-PQ composition (probe -> pruned codes read -> ADC shortlist ->
  * exact rerank) under the sim6 operating point, plus the probe-miss
  * diagnosis (was the original's cell among the probed cells at all?) —
  * sets the gate's booleans from measurement rather than hope. */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-ivfpq-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
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
    val nq = planted.count()
    // is the original's cell among the probed? (Pq.probedCells IS the
    // production probe — shared, so this diagnosis can't drift from it)
    val cent = Similarity.readCentroids(spark, idx).withColumnRenamed("label", "cell")
    val q = planted.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .withColumn("qn", Similarity.norm(col("qv")))
    for (nprobe <- Seq(2, 4, 6, 10)) {
      val probed = Pq.probedCells(cent, q, nprobe)
      val origCell = spark.read.parquet(idx)
        .select((col("vec_id") + 10000).as("query_id"), col("label").as("ocell"))
        .filter(col("query_id") >= 10000 && col("query_id") < 10050)
      val cellHit = probed.join(origCell,
        probed("query_id") === origCell("query_id") && col("cell") === col("ocell")).count()
      val ann = Pq.ivfPqTopK(spark, idx, books, planted, "vec_id", "embedding",
        "label", m = 8, dim = 64, k = 5, nprobe = nprobe, shortlist = 25,
        codesPath = Some(codesPath))
      val hit = ann.filter(col("neighbor_id") === col("query_id") - 10000)
      println(f"nprobe=$nprobe%2d  n=$nq  orig_cell_probed=$cellHit  " +
        f"hit_top5=${hit.count()}  hit_rank1=${hit.filter(col("rank") === 1).count()}")
    }
    spark.stop()
  }
}
