#!/bin/bash
# Cross-parallelism determinism check: run graft.Verify at two thread
# counts and compare every query's dump by symmetric EXCEPT ALL in
# DuckDB. Re-run whenever partitioning- or plan-affecting code changes
# in a covered family (PLANS.md "Determinism re-verified" protocol —
# one SparkContext per JVM means this cannot be an in-process spec).
# Usage: tools/determinism.sh [sfDir] [threadsA] [threadsB]
set -e -o pipefail
cd "$(dirname "$0")/.."
. tools/env.sh
SF=${1:-/root/testdata/sf0.01}
A=${2:-5}
B=${3:-16}
OUT_A=/tmp/graft_det_${A}t
OUT_B=/tmp/graft_det_${B}t
for T in "$A:$OUT_A" "$B:$OUT_B"; do
  CPUS=${T%%:*}; OUT=${T##*:}
  rm -rf "$OUT"
  # pipefail + grep wrapped in || true: a crashed Verify run fails the
  # script here instead of silently shrinking the compared query set
  SPARK_GRAFT_CPUS=$CPUS java $ADD_OPENS $GRAFT_JAVA_FLAGS \
    -cp "$GRAFT_CP" graft.Verify "$SF" "$OUT" 2>&1 \
    | { grep -E "\[verify\]|Exception" || true; }
done
python3 - "$OUT_A" "$OUT_B" <<'PY'
import duckdb, json, os, sys
a, b = sys.argv[1], sys.argv[2]
def dirs(root):
    return {d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))}
def manifest(root):
    p = os.path.join(root, "manifest.json")
    return set(json.load(open(p))) if os.path.exists(p) else set()
# the INTENDED query set (manifest.json written by Verify) unioned with
# whatever dumps exist: a query that failed in BOTH runs is still in the
# manifest and is flagged MISSING, not silently dropped from the
# denominator (the dirs-union alone would pass over a deterministic
# per-query crash)
qs = sorted(manifest(a) | manifest(b) | dirs(a) | dirs(b))
bad = 0
for q in qs:
    if not os.path.isdir(os.path.join(a, q)):
        print(f"MISSING  {q} (absent from {a})"); bad += 1; continue
    if not os.path.isdir(os.path.join(b, q)):
        print(f"MISSING  {q} (absent from {b})"); bad += 1; continue
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
