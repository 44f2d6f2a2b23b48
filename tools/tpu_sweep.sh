#!/bin/bash
# Round-3 perf sweep — run serially on the one real TPU chip (tunnel).
# Each command is bounded; output accumulates in /tmp/tpu_sweep.log.
set -u
cd /root/repo
LOG=/tmp/tpu_sweep.log
run() {  # run <timeout_s> <cmd...>
  local t=$1; shift
  echo "### $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | grep -viE "warning|xla_bridge" | tee -a "$LOG"
  echo | tee -a "$LOG"
}
run 900 python tools/kernel_compile_check.py
run 1500 python bench.py                                   # driver default
run 1500 env MAGVIT2_TPU_NO_FUSED_ATTN=1 python bench.py   # isolate fused attn
run 1500 python bench.py --lane-pack true                  # packed+fused RU
run 1500 python bench.py --lane-pack true --batch 96
run 1500 python bench.py --lane-pack encoder
run 1500 env MAGVIT2_TPU_FUSED_RU_UNPACKED=1 python bench.py
run 1500 python bench.py --batch 160
echo SWEEP-DONE | tee -a "$LOG"
run 1800 python tools/train_flop_audit.py
echo MFU-DONE | tee -a "$LOG"
run 3600 python tools/codebook_probe.py --steps 300 --batch 8
echo ALL-DONE | tee -a "$LOG"
