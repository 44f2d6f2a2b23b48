#!/bin/bash
# Round-5 TPU measurement queue, v2 — reordered so the most decision-relevant
# measurements land first if the tunnel returns late in the round:
#   1. int8 static at the driver batch  (can int8 reach the 2500-fps target?)
#   2. per-layer profile at batch 64    (is the c64 stage still 22% at scale?)
#   3. GAN-phase flagship stability run (VERDICT r4 #5 — last credibility gap)
#   4. train-step MFU at batch-8-equiv  (VERDICT r4 #6)
#   5. final headline bench for the record
# Run sequentially: one process owns the tunnel at a time; concurrent owners
# OOM each other and poison the runtime. Each job is preceded by a tunnel
# probe (first r5 queue run died at backend init during a tunnel outage —
# axon UNAVAILABLE / device-claim hang); a job only launches once a fresh
# subprocess can claim the device. Probe retries for up to 20h.
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

# 1) int8 static-vs-dynamic-vs-bf16 at the driver batch (VERDICT r4 #3)
probe && timeout 3000 python tools/int8_bench.py --batch 128 --static \
  > results/int8_bench_r5_b128_static.log 2>&1

# 2) per-layer profile at batch 64 (b128 OOMs the chained single-layer
#    harness on 16 GB) — refreshes the r4 b8 table where the occupancy
#    argument applies; decides whether the c64 stem fight continues
probe && timeout 3600 python tools/layer_bench.py --batch 64 \
  > results/layer_bench_r5_b64.md 2>&1

# 3) GAN-phase flagship stability run (VERDICT r4 #5) — longest
probe && timeout 7200 python tools/gan_convergence_run.py --steps 2000 --discr-start 500 \
  --out results/gan_convergence_flagship.json \
  > results/gan_convergence_r5.log 2>&1

# 4) train-step MFU at batch-8-equivalent (VERDICT r4 #6)
probe && timeout 2400 python tools/train_flop_audit.py --measure --vgg --batch 1 --accum 4 \
  > results/train_mfu_r5_b1a4.log 2>&1
probe && timeout 2400 python tools/train_flop_audit.py --measure --vgg --batch 2 --accum 4 --remat full \
  > results/train_mfu_r5_b2a4_remat.log 2>&1

# 5) final headline for the record
probe && timeout 1800 python bench.py > results/bench_r5_final.log 2>&1

echo QUEUE_V2_DONE
