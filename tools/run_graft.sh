#!/bin/bash
# Run a graft main class directly (no sbt lock): mirrors build.sbt's
# forked-JVM options. Usage: run_graft.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g) + the class's own env vars.
set -e
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# GRAFT_EXTRA_OPTS: optional extra -D flags (e.g. a shuffle codec for a
# disk-bound probe) — documented in the artifact that uses them.
exec java $OPENS $GRAFT_EXTRA_OPTS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dspark.sql.adaptive.advisoryPartitionSizeInBytes=16m \
  -Dspark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=16m \
  -Xmx${SPARK_DRIVER_MEM:-8g} \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
