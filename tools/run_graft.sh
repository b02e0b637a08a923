#!/bin/bash
# Run a graft main class via plain java using the sbt-exported classpath
# (tools: refresh with `sbt "export Runtime/fullClasspath"` > /tmp/graft_cp.txt).
# Mirrors build.sbt's fork javaOptions (JDK17 add-opens, UTC, no UI).
# Usage: run_graft.sh <mainClass> [args...]
CP=$(cat /tmp/graft_cp.txt)
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} -cp "$CP" "$@"
