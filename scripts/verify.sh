#!/bin/bash
# Compile once, then run graft.Verify + the DuckDB compare without sbt's JVM
# startup on every iteration.
# Usage: scripts/verify.sh [sfDir] [outDir] [query ...]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/graft_out}
shift 2 2>/dev/null || shift $# 2>/dev/null || true
sbt -batch compile > /tmp/graft_compile.log 2>&1 \
  || { grep -E "\[error\]" /tmp/graft_compile.log | head -50; echo "COMPILE FAILED"; exit 1; }
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
rm -rf "$OUT"
java $OPENS -XX:ReservedCodeCacheSize=1g -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Verify "$SF" "$OUT" "$@" 2>&1 | grep -vE "^2[0-9]|INFO|WARN" || true
python3 scripts/check.py "$SF" "$OUT" "$@"
