#!/bin/bash
# Launch a graft main class directly from compiled classes + /opt/spark/jars,
# replicating build.sbt's forked-JVM options exactly (add-opens set, UI off,
# UTC session timezone, SPARK_DRIVER_MEM heap). Same timed numbers as the
# sbt -batch runMain path (RunOne times only the steady-state pass) without
# the ~40 s sbt startup — used by the r15+ probe suites.
# Usage: [SPARK_GRAFT_CPUS=32] [SPARK_DRIVER_MEM=64g] tools/runjava.sh <MainClass> [args...]
set -u
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" ${SPARK_GRAFT_JVM_OPTS:-} \
  -cp "${GRAFT_CLASSES:-target/scala-2.13/classes}:/opt/spark/jars/*" "$@"
