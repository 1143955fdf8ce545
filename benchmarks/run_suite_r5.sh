#!/bin/bash
# Round-5 accuracy-suite-of-record launcher (VERDICT r4 #3/#4):
#   - severity sweep (incl. x3) on ALL 8 objects,
#   - single-axis shift ablation on textured_box (+ cube control),
#   - forced-recovery on 4 objects, LIVE-path recovery on 2,
#   - 499-frame long horizon on every object (matches r4 protocol).
# Self-driving against the flaky axon tunnel: waits for the device,
# retries on the suite's stall-watchdog exit (3) with ensemble-checkpoint
# resume, and gives up after MAX_TRIES so it can never spin forever.
set -u
cd "$(dirname "$0")/.."
CKPT=${CKPT:-/root/suite_ckpt_r5}
OUT=${OUT:-benchmarks/accuracy_suite_results.json}
LOG=${LOG:-benchmarks/accuracy_suite_run_r5.log}
MAX_TRIES=${MAX_TRIES:-8}
mkdir -p "$CKPT"

wait_for_device() {
  for _ in $(seq 1 200); do
    if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      return 0
    fi
    echo "$(date +%H:%M:%S) device unreachable; retry in 120s" | tee -a "$LOG"
    sleep 120
  done
  return 1
}

for try in $(seq 1 "$MAX_TRIES"); do
  wait_for_device || exit 2
  echo "$(date +%H:%M:%S) suite attempt $try" | tee -a "$LOG"
  python benchmarks/accuracy_suite.py \
    --objects cube,box,lshape,icosahedron,cylinder,sphere,plate,textured_box \
    --ensemble --ensemble_ckpt_dir "$CKPT" \
    --domain_shift --long_horizon 499 \
    --shift_sweep 0.5,1,2,3,4 \
    --sweep_objects cube,box,lshape,icosahedron,cylinder,sphere,plate,textured_box \
    --recovery cube,lshape,textured_box,icosahedron \
    --live_recovery cube,lshape \
    --ablation textured_box,cube \
    --out "$OUT" >> "$LOG" 2>&1
  rc=$?
  echo "$(date +%H:%M:%S) suite attempt $try exited rc=$rc" | tee -a "$LOG"
  [ "$rc" -eq 0 ] && exit 0
  # rc=3: stall watchdog (lost tunnel RPC) — resume from checkpoints.
  # Any other rc: real failure; retry once in case it was transient.
  sleep 60
done
exit 1
