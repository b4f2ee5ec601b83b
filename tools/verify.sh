#!/bin/bash
# Dev loop: run graft.Verify directly (bypasses sbt JVM spin-up) then the
# DuckDB compare. Usage: tools/verify.sh [sfDir] [outDir]
set -e -o pipefail
cd "$(dirname "$0")/.."
. tools/env.sh
SF=${1:-/root/testdata/sf0.001}
OUT=${2:-/tmp/graft_verify}
# pipefail + grep wrapped in || true: a crashed Verify run fails here
# instead of handing check.py a partial dump
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} java $ADD_OPENS $GRAFT_JAVA_FLAGS \
  -cp "$GRAFT_CP" graft.Verify "$SF" "$OUT" 2>&1 \
  | { grep -E "\[verify\]|Exception" || true; }
python3 tools/check.py "$SF" "$OUT"
