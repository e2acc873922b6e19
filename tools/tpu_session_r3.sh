#!/bin/bash
# Round-3 device measurement agenda — one unattended pass for a flaky
# tunnel window.  Each stage appends to /tmp/tpu_r3/<stage>.log and is
# skipped if its .done marker exists, so the script is safe to re-run
# after a tunnel drop.
#
#   bash tools/tpu_session_r3.sh
#
# Stages (value order — early ones matter most if the tunnel drops):
#   warp      bench_warp_windows: full/band/tile/band32/tile32 step A/B
#   bench     bench.py headline (new serving config)
#   vitl_eval evaluate_depth_video.py --encoder vitl via split compile
#   outconv   FFB low-res out_conv vs reference order (518 + 224 serving)
#   stream    DepthStreamer per-window latency (224 + 518)
#   ftrain    ENDODAV_FUSED_TRAIN=1 vs default train-step profile
#   int8probe int8-vs-bf16 MXU GEMM ceiling at ViT shapes
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r3
mkdir -p "$OUT"

stage() {  # stage <name> <cmd...>
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

stage warp python -u tools/bench_warp_windows.py --steps 2 \
    --modes full,band,tile,band32,tile32

stage bench python -u bench.py

run_vitl_eval() {
  # vitl through the real eval CLI needs the split-compile path (the
  # whole-model vitl jit exceeds the remote-compile service limits)
  [ -d /tmp/scared_synth ] || { echo "no /tmp/scared_synth tree"; return 1; }
  ENDODAV_SPLIT_COMPILE=1 python -u evaluate_depth_video.py \
      --data_path /tmp/scared_synth --model_type endodav --encoder vitl \
      --chunk_windows 1
}
stage vitl_eval run_vitl_eval

run_outconv() {
  for cfg in 518 224; do
    echo "--- config $cfg, low-res out_conv (default)"
    python -u tools/bench_fused_e2e.py --config "$cfg" --iters 6 || return 1
    echo "--- config $cfg, reference order (ENDODAV_HIRES_OUTCONV=1)"
    ENDODAV_HIRES_OUTCONV=1 python -u tools/bench_fused_e2e.py \
        --config "$cfg" --iters 6 || return 1
  done
}
stage outconv run_outconv

run_stream() {
  python -u tools/bench_streaming.py --config 224 --frames 142 || return 1
  python -u tools/bench_streaming.py --config 518 --frames 142 || return 1
}
stage stream run_stream

run_ftrain() {
  echo "--- default (XLA temporal in train)"
  python -u tools/profile_train_step.py --steps 2 || return 1
  echo "--- ENDODAV_FUSED_TRAIN=1"
  ENDODAV_FUSED_TRAIN=1 python -u tools/profile_train_step.py --steps 2 \
      || return 1
}
stage ftrain run_ftrain

# cheap ceiling probe: is int8 2x on the v5e MXU at our GEMM shapes?
stage int8probe python -u tools/bench_int8.py

# whole-model int8 serving A/B (merged graph; reports speedup + disp
# deviation so the number is never quoted without its numerics cost)
run_int8model() {
  python -u tools/bench_int8_serving.py --config 518 --iters 6 || return 1
  python -u tools/bench_int8_serving.py --config 224 --iters 6 || return 1
  # vitl (split-compile; most GEMM-dominated, biggest int8 upside) —
  # non-fatal: its compile path is the slowest in the tree
  python -u tools/bench_int8_serving.py --config 518 --encoder vitl --iters 4 \
    || echo "vitl int8 A/B failed (non-fatal)"
}
stage int8model run_int8model

# fused ResidualConvUnit kernel A/B (in-VMEM im2col, kernels/fused_rcu.py)
run_rcu() {
  for cfg in 518 224; do
    echo "--- config $cfg, XLA RCU (default)"
    python -u tools/bench_fused_e2e.py --config "$cfg" --iters 6 || return 1
    echo "--- config $cfg, fused RCU (ENDODAV_FUSED_RCU=1)"
    ENDODAV_FUSED_RCU=1 python -u tools/bench_fused_e2e.py \
        --config "$cfg" --iters 6 || return 1
  done
}
stage rcu run_rcu

echo "== all stages attempted; logs in $OUT"

# Mirror the raw logs into the repo so an unattended pass survives the
# round boundary (the round driver commits stray files; a later session
# folds the numbers into PERFORMANCE.md and prunes this directory).
mkdir -p bench_logs_r3
cp "$OUT"/*.log bench_logs_r3/ 2>/dev/null || true
ls "$OUT"/*.done 2>/dev/null | sed 's#.*/##' > bench_logs_r3/stages_done.txt || true
echo "== logs mirrored to bench_logs_r3/"
