package graft.tools

import graft.core.{Engine, Tables}

/** Dev probe: isolate the minhash signature build and time it under
  * different codegen field limits, to attribute wide-aggregate cost. */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-minhash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    for (mf <- Seq("100", "300", "100")) {
      spark.conf.set("spark.sql.codegen.maxFields", mf)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.pipeline.Dedup.minhashBuckets(docs, "doc_id", "text").count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"maxFields=$mf%s  times=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    val full = (1 to 4).map { _ =>
      val t0 = System.nanoTime()
      graft.pipeline.Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.8).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"full minhashLshPairs: ${full.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
