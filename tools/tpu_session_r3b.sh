#!/bin/bash
# Round-3 follow-up device agenda — runs after tpu_session_r3.sh.
# Same idempotent stage pattern (logs + .done markers in /tmp/tpu_r3b).
#
# Stages:
#   warp2    banded/tiled warp step A/B retry — the first attempt failed
#            Mosaic compile on every windowed mode ("cannot statically
#            prove index is a multiple of 8"); fixed by pl.multiple_of
#            alignment hints (kernels/warp_matmul.py).
#   ftrain2  profile_train_step with the winning warp band mode (run
#            manually once warp2 picks a winner; placeholder here runs
#            the default).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r3b
mkdir -p "$OUT"

stage() {
  local name=$1; shift
  if [ -f "$OUT/$name.done" ]; then
    echo "== $name: already done, skipping"
    return 0
  fi
  echo "== $name: $(date)"
  if "$@" >> "$OUT/$name.log" 2>&1; then
    touch "$OUT/$name.done"
    echo "== $name OK"
  else
    echo "== $name FAILED (rc=$?) — see $OUT/$name.log"
  fi
}

stage warp2 python -u tools/bench_warp_windows.py --steps 2 \
    --modes full,band,tile,band32,tile32

# combined serving switches: the main agenda A/Bs int8 and the fused
# RCU separately; the VERDICT fps target would ride their combination
run_combo() {
  # bench_int8_serving toggles ENDODAV_INT8 itself (both legs); the RCU
  # flag rides through, so this measures bf16+RCU vs int8+RCU at 518px
  ENDODAV_FUSED_RCU=1 \
      python -u tools/bench_int8_serving.py --config 518 --iters 6
}
stage combo run_combo

# the main agenda's vitl int8 leg died with the tunnel (non-fatal there,
# so int8model is .done and will not retry it) — retry it here
stage int8vitl python -u tools/bench_int8_serving.py --config 518 \
    --encoder vitl --iters 4

echo "== all stages attempted; logs in $OUT"
mkdir -p bench_logs_r3
cp "$OUT"/*.log bench_logs_r3/ 2>/dev/null || true
