#!/usr/bin/env bash
# Run a graft main class in a JVM configured exactly like build.sbt's
# forked `sbt runMain` JVM (module opens, page size, code cache, heap).
# Usage: tools/run_main.sh graft.Bench [args...]
# Used for kill-resilience tests (a bare java process is killable without
# orphaning, unlike sbt's fork) and fast local timing loops.
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dspark.buffer.pageSize=4m \
  -XX:ReservedCodeCacheSize=512m \
  -Dspark.sql.codegen.cache.maxEntries="${SPARK_GRAFT_CODEGEN_CACHE:-8192}" \
  -Dspark.sql.codegen.useIdInClassName="${SPARK_GRAFT_CODEGEN_USEID:-false}" \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
