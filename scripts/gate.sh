#!/usr/bin/env bash
# One-command local replica of the driver's round gate:
#   compile → Verify at sf → DuckDB oracle compare (strict) → Bench.
# Usage: scripts/gate.sh [sf-dir] [bench-sf-dir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
BENCH_SF="${2:-/root/testdata/sf0.1}"
OUT="$(mktemp -d /tmp/graft_gate.XXXX)"
echo "== compile =="
sbt -batch compile | tail -1
echo "== verify ($SF) =="
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep -E '\[verify\]' || true
echo "== oracle compare =="
python3 scripts/check.py "$SF" "$OUT"
echo "== bench ($BENCH_SF) =="
SPARK_GRAFT_SF_DIR="$BENCH_SF" sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'
