#!/bin/bash
# round-4 measurement queue (sequential: ONE real TPU chip).
set -x
cd /root/repo
mkdir -p results
timeout 2400 python tools/convergence_run.py --inv-temperature 10 \
  --out results/convergence_config1_t10.json \
  > results/convergence_t10.log 2>&1
timeout 2400 python tools/train_flop_audit.py --measure --vgg \
  > results/train_mfu.log 2>&1
timeout 3600 python tools/codebook_probe.py \
  > results/codebook_2e18_t100.log 2>&1
timeout 3600 python tools/codebook_probe.py --exact-entropy \
  > results/codebook_2e18_exact.log 2>&1
timeout 2400 python tools/streaming_bench.py \
  > results/streaming_config5.log 2>&1
echo QUEUE_DONE
