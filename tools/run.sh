#!/bin/bash
# Run a graft main class directly against the compiled classes + Spark jars
# (bypasses sbt's shell for clean stdout and no startup overhead).
# Usage: tools/run.sh <MainClass> [args...]
#   env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_DRIVER_MEM
set -e
CLS="$1"; shift || true
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
mkdir -p /dev/shm/spark-local
exec java -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  $ADDOPENS \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dspark.local.dir=/dev/shm/spark-local \
  "$CLS" "$@"
