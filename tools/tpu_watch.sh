#!/bin/bash
# Poll the axon TPU tunnel; when a chip becomes claimable, run the queued
# round-3 measurement sweep (tools/tpu_sweep.sh) exactly once.
#
# The tunnel's failure mode is a hang inside backend init (the claim leg
# waits forever for a grant), so each probe is a subprocess under timeout.
# Detach with: nohup bash tools/tpu_watch.sh & echo $! > /tmp/tpu_watch.pid
set -u
cd /root/repo
LOG=/tmp/tpu_watch.log
while true; do
  if timeout 240 python - >>"$LOG" 2>&1 <<'EOF'
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.bfloat16)
print('TPU ALIVE', jax.default_backend(), float(np.asarray(x @ x)[0, 0]), flush=True)
EOF
  then
    echo "tunnel up $(date)" >>"$LOG"
    bash tools/tpu_sweep.sh >>"$LOG" 2>&1
    echo "WATCH-SWEEP-DONE $(date)" >>"$LOG"
    exit 0
  fi
  echo "tunnel still down $(date)" >>"$LOG"
  sleep 300
done
