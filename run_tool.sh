#!/bin/bash
# Run a graft main class outside sbt (same JVM flags as build.sbt).
# FLAG SOURCE OF TRUTH: build.sbt (jdk17AddOpens + javaOptions). If those
# change, change the OPENS list / properties below to match — build.sbt
# carries the mirror-comment pointing back here.
CP="$(cd "$(dirname "$0")" && pwd)/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
# ExplicitGCInvokesConcurrent: the engine's periodic shuffle-GC policy
# (spark.cleaner.periodicGC.interval) calls System.gc(); on G1 that is a
# stop-the-world FULL collection, and at a 64g bench heap one such pause
# measured 149s - past spark.network.timeout, so local-mode removed its
# own executor and the session collapsed (sf100 attempt 4). The flag turns
# explicit GC into a concurrent cycle, which still processes the weak
# references the ContextCleaner needs to release dead shuffle files.
exec java $OPENS -XX:+ExplicitGCInvokesConcurrent \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} -cp "$CP" "$@"
