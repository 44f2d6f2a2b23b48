#!/bin/bash
# Round-5 TPU measurement queue, v4 — the split grad-accum MFU ladder.
#
# Every monolithic attempt at a batch>=2 train-step measurement is now dead:
#   b1xa4 dots, b2xa4 full  -> axon remote compile helper crash (r4-era logs)
#   b8xa1 full, b4xa1 full  -> HBM OOM (17.24G vs 15.75G at b4)
#   b1xa8 false             -> HBM OOM (unrolled accum-8 schedules all micros)
# The trainer's new grad_accum_split=True mode compiles ONE micro-grad
# program + ONE apply program, so compile size and activation memory are
# independent of accum. Ladder: largest micro-batch first (best MFU), stop
# at the first config that prints an MFU row.
set -x
cd "$(dirname "$0")/.."

probe() {
  for i in $(seq 1 1200); do
    if timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print('TPU_OK', (x @ x).sum())" 2>/dev/null \
        | grep -q TPU_OK; then
      return 0
    fi
    sleep 60
  done
  echo "TUNNEL_NEVER_CAME_BACK" >&2
  return 1
}

for cfg in "4 2 full" "2 4 dots" "2 4 full" "1 8 dots"; do
  read -r B A R <<< "$cfg"
  probe || break
  log="results/train_mfu_r5_split_b${B}a${A}_${R}.log"
  timeout 2400 python tools/train_flop_audit.py --measure --vgg --split \
    --batch "$B" --accum "$A" --remat "$R" > "$log" 2>&1
  if grep -q "MFU" "$log"; then
    echo "SPLIT_MFU_LADDER_SUCCESS $cfg" >> "$log"
    break
  fi
done

echo QUEUE_V4_DONE
