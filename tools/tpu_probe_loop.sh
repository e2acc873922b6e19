#!/bin/bash
# Probe the TPU tunnel every ~4 min; when it answers, run the round-3
# unattended measurement agenda (tools/tpu_session_r3.sh) once and exit.
# Safe to restart — the agenda's per-stage .done markers make it idempotent.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r3
mkdir -p "$OUT"
echo "probe loop start: $(date)" >> "$OUT/probe.log"
while true; do
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" \
      >> "$OUT/probe.log" 2>&1; then
    echo "tunnel UP: $(date)" >> "$OUT/probe.log"
    bash tools/tpu_session_r3.sh >> "$OUT/agenda.log" 2>&1
    bash tools/tpu_session_r3b.sh >> "$OUT/agenda.log" 2>&1
    echo "agenda pass done: $(date)" >> "$OUT/probe.log"
    exit 0
  fi
  echo "tunnel down: $(date)" >> "$OUT/probe.log"
  sleep 240
done
