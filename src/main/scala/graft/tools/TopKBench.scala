package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.plans.TopK

/** Dev tool: measure the custom TopKPerKey operator against the window
  * row_number formulation on the bench tier. */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-topk")
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_suppkey"), col("l_extendedprice"))
    def time(tag: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-10s ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    }
    time("custom") { TopK.perKey(li, Seq("l_suppkey"), "l_extendedprice", 5).count() }
    val w = Window.partitionBy("l_suppkey").orderBy(desc("l_extendedprice"))
    time("window") { li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5).count() }
    spark.stop()
  }
}
