#!/bin/bash
# Round-3 second TPU batch: per-layer profile at the winning bench config,
# measured train-step MFU, and the codebook-collapse A/B (VERDICT #4).
set -u
cd /root/repo
LOG=/tmp/tpu_q2.log
run() {
  local t=$1; shift
  echo "### $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | grep -viE "warning|xla_bridge" | tee -a "$LOG"
  echo | tee -a "$LOG"
}
run 1500 python tools/layer_bench.py --batch 32
echo LAYERBENCH-DONE | tee -a "$LOG"
run 1500 python tools/train_flop_audit.py --measure
echo MFU-DONE | tee -a "$LOG"
run 2400 python tools/codebook_probe.py --steps 300 --batch 8 --inv-temperature 10
echo PROBE-T10-DONE | tee -a "$LOG"
run 2400 python tools/codebook_probe.py --steps 300 --batch 8 --inv-temperature 10 --exact-entropy
echo PROBE-T10-EXACT-DONE | tee -a "$LOG"
echo Q2-ALL-DONE | tee -a "$LOG"
