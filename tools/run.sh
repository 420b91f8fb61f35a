#!/bin/bash
# Run a graft main without sbt: compiled classes + the image's Spark jars.
# Usage: tools/run.sh <mainClass> [args...]   (env: SPARK_GRAFT_* as usual)
set -euo pipefail
CLASSES="$(dirname "$0")/../target/scala-2.13/classes"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
OPENS="$OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec java $OPENS ${GRAFT_JAVA_OPTS:-} -Xmx"${SPARK_DRIVER_MEM:-8g}" -Duser.timezone=UTC \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
