#!/usr/bin/env bash
# Pre-snapshot gate: refuse to bless a tree that hasn't passed
# compile -> test -> Verify -> DuckDB oracle check on the EXACT diff.
# Round 3 shipped a commit last compiled 3 minutes before the snapshot
# and zeroed the official gate; this script makes that impossible.
#
# Usage: tools/gate.sh [sfDir] [outDir]
#   sfDir  defaults to /root/testdata/sf0.01 (the driver's gate SF)
#   outDir defaults to out/gate
# Exit 0 = safe to commit/snapshot. Nonzero = DO NOT.
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-out/gate}"

tools/warm_jars.sh || true

echo "== gate: sbt compile + test =="
sbt -batch "Test/compile" test

echo "== gate: Verify @ $SF -> $OUT =="
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $(pwd)/$OUT"

echo "== gate: DuckDB oracle check =="
python3 tools/check.py "$SF" "$OUT" | tee "$OUT/check.log"
if grep -q "FAIL" "$OUT/check.log"; then
  echo "GATE REFUSED: oracle mismatches above" >&2
  exit 1
fi
echo "== gate: all green — safe to commit =="
