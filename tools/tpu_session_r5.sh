#!/bin/bash
# Round-5 device measurement agenda — one unattended pass for a flaky
# tunnel window (same pattern as tools/tpu_session_r3.sh: per-stage
# .done markers make re-runs idempotent after tunnel drops).
#
#   bash tools/tpu_session_r5.sh
#
# Stages (value order):
#   bench     bench.py headline with the round-5 dedup pipeline
#             (per-frame prefix + flat boundary + trimmed chunks +
#             fb=96 adaptive encode batches) — the BENCH_r05 number
#   dedupconf confirm the fb=96/cw=4 clip rate via the sweep harness
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r5
mkdir -p "$OUT"

stage() {
  local name="$1"; shift
  if [ -f "$OUT/$name.done" ]; then
    echo "[agenda] $name: done marker exists, skipping"
    return 0
  fi
  echo "[agenda] $name: start $(date)"
  if "$@" > "$OUT/$name.log" 2>&1; then
    touch "$OUT/$name.done"
    echo "[agenda] $name: OK"
  else
    echo "[agenda] $name: FAILED (rc=$?) — see $OUT/$name.log"
  fi
}

stage bench timeout 3000 python bench.py
stage dedupconf timeout 2000 python -u tools/bench_dedup_cw.py --config 518 --cw 4 --fb 96
echo "[agenda] pass complete: $(date)"
