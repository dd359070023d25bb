#!/usr/bin/env bash
# Copy the Spark jars to tmpfs so JVM launches read them at RAM speed.
# This host evicts its page cache aggressively and its disk drops to
# ~1.5 MB/s in stall episodes; without this, every sbt/test/runMain
# invocation can spend minutes re-reading /opt/spark/jars (462 MB).
# build.sbt prefers the cache when present and falls back to /opt
# otherwise, so this script is an optimization, never a requirement.
set -euo pipefail
DST=/dev/shm/spark-jars-cache
MARKER="$DST/spark-sql_2.13-4.1.2.jar"
if [ ! -f "$MARKER" ]; then
  mkdir -p "$DST"
  cp /opt/spark/jars/*.jar "$DST/"
  echo "warm_jars: populated $DST ($(du -sh "$DST" | cut -f1))"
else
  echo "warm_jars: cache already present"
fi
