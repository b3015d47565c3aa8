package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.plans.TopK

/** Dev tool: measure the custom TopKPerKey operator against the window
  * row_number formulation on the bench tier — wall time AND shuffle volume.
  *
  * Three formulations:
  *  - custom: TopKPerKey partial+final (exchange carries ≤ k·keys·partitions)
  *  - window: Spark 4's own InferWindowGroupLimit gives rank-filters a
  *    map-side partial too, so its shuffle volume matches — its remaining
  *    cost is the reduce-side per-partition SORT the heap operator avoids
  *  - window-nolimit: the pushdown disabled — the naive plan every input
  *    row shuffles through; this is the volume the partial pass eliminates.
  *
  * `maxPartitionBytes` is lowered so the scan has real parallelism at this
  * tier (one 20 MB file would otherwise be a single partition and make the
  * map-side story degenerate). */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-topk")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")
    val shuffleRecords = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleRecords.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
    })
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_suppkey"), col("l_extendedprice"))
    println(s"input rows=${li.count()} scan_partitions=${li.rdd.getNumPartitions}")
    def time(tag: String)(f: => Long): Unit = {
      f // warm
      Thread.sleep(1500) // listener drain
      shuffleRecords.set(0)
      val t0 = System.nanoTime(); val n = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      println(f"$tag%-15s $secs%.3f s  rows=$n  shuffle_records=${shuffleRecords.get()}")
    }
    val w = Window.partitionBy("l_suppkey").orderBy(desc("l_extendedprice"))
    time("custom") { TopK.perKey(li, Seq("l_suppkey"), "l_extendedprice", 5).count() }
    time("window") { li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5).count() }
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
    time("window-nolimit") { li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5).count() }
    spark.conf.unset("spark.sql.optimizer.windowGroupLimitThreshold")
    spark.stop()
  }
}
