package graft.tools

import graft.core.{Engine, Tables}
import graft.core.Stage.Staged

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

    // d4 attribution: shingle volume, prefix volume, candidate volume, and
    // full-pipeline time
    import org.apache.spark.sql.functions._
    val sh = graft.pipeline.TextOps.shingleTable(docs, "doc_id", "text", 2)
      .stage()
    println(s"d4 shingles=${sh.count()} docs=${docs.count()}")
    val t1 = System.nanoTime()
    val pairs = graft.pipeline.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      threshold = 0.5, shingleN = 2)
    println(f"d4 pairs=${pairs.count()} firstRun=${(System.nanoTime() - t1) / 1e9}%.2f")
    val t2 = System.nanoTime()
    pairs.count()
    println(f"d4 secondRun=${(System.nanoTime() - t2) / 1e9}%.2f")

    // stage bisect: prefix volume, candidate volume, verify time
    import org.apache.spark.sql.expressions.Window
    val threshold = 0.5
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"d4 $tag%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val docFreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val prefix = sh.join(docFreq, Seq("s"))
      .withColumn("rank", row_number().over(Window.partitionBy("id").orderBy("df", "s")))
      .join(sizes, Seq("id"))
      .filter(col("rank") <= col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)
      .select("id", "s", "n", "rank")
      .stage()
    println(s"d4 prefixRows=${timed("prefix")(prefix.count())}")
    val minOverlap =
      ceil(lit(threshold / (1 + threshold)) * (col("a.n") + col("b.n")) - lit(1e-9))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          least(col("a.n"), col("b.n")) >= lit(threshold) * greatest(col("a.n"), col("b.n")) &&
          lit(1) + least(col("a.n") - col("a.rank"), col("b.n") - col("b.rank")) >= minOverlap)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
      .stage()
    println(s"d4 candRows=${timed("cand")(cand.count())}")
    // raw (pre-distinct) match volume: how much the join itself fans out
    val raw = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
    println(s"d4 rawMatches=${timed("raw")(raw.count())}")
    spark.stop()
  }
}
