package graft.tools

import graft.{Bench, SparkEntry}
import graft.core.Engine

/** Dev tool: dump the MASKED canonicalized physical plan of named queries to
  * `<outdir>/<name>.plan`, so two fresh-JVM runs can be diffed to verify
  * `plan_sha` session-reproducibility (and localize any residual drift to
  * the exact plan line that changed). */
object PlanShaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "/tmp/graft_plans")
    val spark = Engine.session("graft-plan-probe")
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = if (args.nonEmpty) args.toSeq else graft.queries.Headline.benchNames
    // SPARK_GRAFT_PLAN_EXEC: run each query (N×) before canonicalizing, to
    // reproduce the bench's compute-shas-after-the-reps geometry
    val execReps = sys.env.get("SPARK_GRAFT_PLAN_EXEC").map(_.toInt).getOrElse(0)
    names.foreach { name =>
      (1 to execReps).foreach(_ => SparkEntry.queries(name)(spark, sfDir).count())
      val plan = Bench.maskPlan(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.canonicalized.toString)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/$name.plan"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"$name -> $outDir/$name.plan (${plan.length} chars)")
    }
    spark.stop()
  }
}
