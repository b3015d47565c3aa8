package graft.core

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory for the engine.
  *
  * The reference (`/root/reference/Migration/migration.py:2085-2241`) hand-rolls
  * a multiprocessing worker pool per server node; on Spark the equivalent
  * "physical policy" is session-level: shuffle partitioning sized to the
  * cluster, AQE for runtime re-planning (skew join splitting, partition
  * coalescing), and broadcast thresholds for the catalog-sized dimension
  * tables. At 100 TB the same settings scale by raising
  * `spark.sql.shuffle.partitions` to O(cores); locally we pin to the thread
  * count so tiny shuffles don't fan out into 200 empty tasks.
  */
object Engine {

  def session(appName: String = "graft", cpus: Option[String] = None): SparkSession = {
    val n = cpus.orElse(sys.env.get("SPARK_GRAFT_CPUS"))
      .getOrElse(Runtime.getRuntime.availableProcessors().toString)
    SparkSession.builder()
      .master(s"local[$n]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", n)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
