#!/bin/bash
# Cross-parallelism determinism check: run graft.Verify at two thread
# counts and compare every query's dump by symmetric EXCEPT ALL in
# DuckDB. Re-run whenever partitioning- or plan-affecting code changes
# in a covered family (PLANS.md "Determinism re-verified" protocol —
# one SparkContext per JVM means this cannot be an in-process spec).
# Usage: tools/determinism.sh [sfDir] [threadsA] [threadsB]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
A=${2:-5}
B=${3:-16}
OUT_A=/tmp/graft_det_${A}t
OUT_B=/tmp/graft_det_${B}t
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for T in "$A:$OUT_A" "$B:$OUT_B"; do
  CPUS=${T%%:*}; OUT=${T##*:}
  rm -rf "$OUT"
  SPARK_GRAFT_CPUS=$CPUS java $ADD_OPENS \
    -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:target/scala-2.13/classes" \
    graft.Verify "$SF" "$OUT" 2>&1 | grep -E "\[verify\]|Exception" || true
done
python3 - "$OUT_A" "$OUT_B" <<'PY'
import duckdb, os, sys
a, b = sys.argv[1], sys.argv[2]
qs = sorted(d for d in os.listdir(a)
            if os.path.isdir(os.path.join(a, d)))
bad = 0
for q in qs:
    if not os.path.isdir(os.path.join(b, q)):
        print(f"MISSING  {q} (only in {a})"); bad += 1; continue
    n = duckdb.sql(
        f"SELECT count(*) FROM ("
        f"(SELECT * FROM '{a}/{q}/*.parquet' EXCEPT ALL "
        f" SELECT * FROM '{b}/{q}/*.parquet') UNION ALL "
        f"(SELECT * FROM '{b}/{q}/*.parquet' EXCEPT ALL "
        f" SELECT * FROM '{a}/{q}/*.parquet'))").fetchone()[0]
    if n:
        print(f"DIFF     {q}: {n} asymmetric rows"); bad += 1
    else:
        print(f"SAME     {q}")
print(f"\n{len(qs) - bad}/{len(qs)} bit-identical across parallelism")
sys.exit(1 if bad else 0)
PY
