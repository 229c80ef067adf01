#!/bin/bash
# Run graft.Verify against a compiled classes dir without sbt startup cost.
# Usage: tools/verify.sh [sfDir] [outDir]
set -e
SF=${1:-/root/testdata/sf0.001}
OUT=${2:-/tmp/graft_verify}
shift $(( $# > 2 ? 2 : $# ))   # remaining args = optional key subset
cd /root/repo
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xmx12g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/opt/spark/jars/*:target/scala-2.13/classes" \
  graft.Verify "$SF" "$OUT" "$@"
