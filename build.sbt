ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "iqtohdlmigrationspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver tails `sbt "runMain graft.Bench"` stdout for the bench's
// one-line JSON. sbt's default LoggedOutput strategy routes the forked
// JVM's output through the sbt logger, decorating every line with
// `[info] `/`[error] ` — which has broken the driver's JSON parse since
// round 13 (`BENCH_r13..r15.json`: `parsed: null`). StdoutOutput passes
// the forked process's stdout/stderr through UNDECORATED, and disabling
// the `[success] Total time: …` epilogue makes the bench's JSON the last
// line of stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not a task — exclude it
// from the unused-key lint so the warning doesn't decorate driver runs
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
// MIRRORED in run_tool.sh (the outside-sbt runner): a change here must be
// applied there too, or tool runs drift to different JVM flags.
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 8g default, measured not guessed: an A/B on the sf1 probe (d4) showed
  // a 16g heap makes the query 5-10x SLOWER (150-306 s vs 17-30 s at 8g) —
  // Spark's unified memory grows with the heap, operator state balloons to
  // fill it, and G1 collapses collecting it; serialized or disk-only
  // checkpoint storage did not rescue the large heap, so the heap size
  // itself is the knob. The smaller heap spills earlier to fast local disk
  // and stays flat across reps. SPARK_DRIVER_MEM still overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
