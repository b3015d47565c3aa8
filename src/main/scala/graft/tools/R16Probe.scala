package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-16 optimization probe: per-query job/stage/task census + wall
  * under the exact bench geometry, for the VERDICT r15 follow-ups (sim6
  * driver-job count, q18/q10/q3 exchange counts, t5 attribution, d2/d4
  * stage-chain). Dev tool only — never on a driver path.
  *
  * Usage: R16Probe <queryName>...   (each run 3×, min reported) */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      graft.core.Engine.shuffleWidth(sfDir, cpus.toInt).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var shuffleWriteBytes = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        shuffleWriteBytes += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (t.taskInfo != null) taskTimeMs += t.taskInfo.duration
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val names = if (args.isEmpty) Seq("sim6_ivfpq") else args.toSeq
    names.foreach { name =>
      // warm (builds caches, JIT)
      try graft.SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable => println(s"[r16] $name warm FAILED: $e") }
      val reps = (1 to 3).map { _ =>
        Thread.sleep(300) // listener bus drain (no public waitUntilEmpty)
        jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0L; shuffleWriteBytes = 0L
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        (wall, jobs, stages, tasks, taskTimeMs / 1e3, shuffleWriteBytes / 1e6)
      }
      val best = reps.minBy(_._1)
      println(f"[r16] $name%-24s wall=${best._1}%7.3f s jobs=${best._2}%3d " +
        f"stages=${best._3}%3d tasks=${best._4}%4d sumTask=${best._5}%7.2f s " +
        f"shufMB=${best._6}%8.2f  walls=${reps.map(r => f"${r._1}%.3f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
