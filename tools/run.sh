#!/bin/bash
# Run a graft main from the ALREADY-COMPILED classes with plain java —
# no sbt lock, so long scale sweeps (ScaleUp/Verify/Bench at sf1+) can
# run in the background while sbt keeps compiling in the foreground.
# Usage: tools/run.sh graft.ScaleUp /tmp/graft_sf1 /tmp/graft_sf10 10
# Env: SPARK_DRIVER_MEM (default 8g) and the usual SPARK_GRAFT_* vars.
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=target/scala-2.13/classes
[ -d "$CLASSES" ] || { echo "compile first: sbt -batch compile" >&2; exit 1; }
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
