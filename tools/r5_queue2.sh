#!/bin/bash
# Round-5 follow-up TPU queue — run AFTER tools/r5_queue.sh finishes (one
# process owns the tunnel at a time; see the OOM-poisoning note there).
set -x
cd "$(dirname "$0")/.."

probe() {
  for i in $(seq 1 240); do
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

# per-layer profile at a driver-representative batch (b128 OOMs the chained
# single-layer harness on 16 GB; b64 is the largest that fits) — refreshes
# the r4 b8 table, in particular the enc-vs-dec linear_attend_space and the
# c64-stage %-peak at a batch where XLA's occupancy argument applies
probe && timeout 3600 python tools/layer_bench.py --batch 64 \
  > results/layer_bench_r5_b64.md 2>&1

echo QUEUE2_DONE
