package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.pipeline.Similarity

/** Dev probe: attribute the d8 (banded-SRP near-dup) cost curve at a tier.
  *
  * The sf100 recording measured d8 at 31.9×/decade; the cost model says r
  * grows one bit per corpus doubling, so a 10× corpus at the right r should
  * cost ≈10× plus a disk term. This probe prints the pieces the VERDICT
  * asked for — corpus n, the `rForCorpus`-derived r the gate actually uses,
  * the banded-join CANDIDATE count, and the verified pair count — so a
  * superlinear wall number is attributable to candidates (model wrong),
  * projection (map cost), or environment (disk thrash).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<tier> runMain graft.tools.SrpProbe */
object SrpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-srp-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = graft.queries.Pipeline.plantedNearDupCorpus(
      Tables.load(spark, sfDir, "embeddings"))
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count() + 50
    val r = Similarity.rForCorpus(n, threshold = 0.98, numBands = 32)
    println(s"d8 n=$n rForCorpus=$r bands=32 planes=${r * 32}")
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val res = f
      println(f"d8 $tag%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s"); res
    }
    val cand = Similarity.srpBandedPairs(corpus, "vec_id", "v",
      bitsPerBand = r, numBands = 32)
    val nCand = timed("candidates")(cand.count())
    println(s"d8 candidates=$nCand (${"%.2f".format(nCand.toDouble / n)} per vector)")
    // the verify joins as the d8 gate runs them (budget-gated broadcast)
    val e = corpus.withColumn("nrm", Similarity.norm(col("v")))
    val verified = cand
      .join(Similarity.gatedVecBroadcast(
          e.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na")), n),
        Seq("id_a"))
      .join(Similarity.gatedVecBroadcast(
          e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), n),
        Seq("id_b"))
      .filter(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")) >= 0.98)
    println(s"d8 verified=${timed("verify")(verified.count())}")
    spark.stop()
  }
}
