#!/bin/bash
# Round-5 TPU measurement queue, v3 — after queue v2 drained:
#   1. GAN flagship re-run with the NEW automatic orthogonal VGG init:
#      the v1 run's adaptive weight was ~1e-12 (degenerate random VGG), so
#      the adversarial gradient was numerically disabled; this run exercises
#      a LIVE O(1)-weighted adversarial signal (VERDICT r4 #5, properly).
#   2. train-step MFU ladder (VERDICT r4 #6): both a4 variants killed the
#      axon remote compile helper; try smaller compile graphs, largest
#      usable batch first, stop at the first success.
#   3. packed-int8 at b64 + unpacked control (b128 packed control OOMs).
# Sequential: one process owns the tunnel at a time. Probe between jobs.
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

# 1) GAN flagship with live adversarial weight
probe && timeout 7200 python tools/gan_convergence_run.py --steps 2000 --discr-start 500 \
  --out results/gan_convergence_flagship_v2.json \
  > results/gan_convergence_r5_v2.log 2>&1

# 2) MFU ladder — largest batch first, stop at first success
for cfg in "8 1 full" "4 1 full" "2 1 dots" "1 8 false"; do
  read -r B A R <<< "$cfg"
  probe || break
  log="results/train_mfu_r5_b${B}a${A}_${R}.log"
  timeout 2400 python tools/train_flop_audit.py --measure --vgg \
    --batch "$B" --accum "$A" --remat "$R" > "$log" 2>&1
  if grep -q "MFU" "$log"; then
    echo "MFU_LADDER_SUCCESS $cfg" >> "$log"
    break
  fi
done

# 3) packed-int8 experiment at b64 (+ unpacked control at the same batch)
probe && timeout 3600 python tools/int8_bench.py --batch 64 --static --lane-pack --no-fused-ru \
  > results/int8_packed_r5_b64.log 2>&1
probe && timeout 3000 python tools/int8_bench.py --batch 64 --static \
  > results/int8_bench_r5_b64_static.log 2>&1

echo QUEUE_V3_DONE
