package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time named `SparkEntry.queries` entries under an explicit
  * session geometry — the probe for attributing a bench ratio to a knob
  * (shuffle width, heap via SPARK_DRIVER_MEM) instead of guessing.
  *
  * Env: SPARK_GRAFT_SF_DIR (tier), SPARK_GRAFT_CPUS (local threads),
  * SPARK_GRAFT_SHUFFLE (shuffle partitions; defaults to CPUS — Bench's
  * geometry), SPARK_GRAFT_BENCH_REPS (default 2).
  * Usage: runMain graft.tools.TimeQuery <queryName> [more names] */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQuery <queryName>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // same width policy as Bench: derive from tier bytes unless overridden
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      graft.core.Engine.shuffleWidth(sfDir, cpus.toInt).toString)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[time] heap=${Runtime.getRuntime.maxMemory() / 1024 / 1024}MB " +
      s"cpus=$cpus shuffle=$shuffle sf=$sfDir")
    args.foreach { name =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name%-28s min=${ts.min}%8.2f s  reps=${ts.map(t => f"$t%.2f").mkString("[", ", ", "]")}")
    }
    spark.stop()
  }
}
