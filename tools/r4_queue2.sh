#!/bin/bash
# round-4 measurement queue #2 (sequential: ONE real TPU chip).
# 1. packed-island e2e bench (new blocked-in conv_out head + fused RU)
# 2. train-step MFU retry at batch 1 (batch 2 OOMed, results/train_mfu.log)
# 3. 2^18 codebook probe at the tempered entropy setting (the r4
#    convergence study's recommendation), surrogate + exact entropy
set -x
cd /root/repo
mkdir -p results
timeout 1800 python bench.py --lane-pack true \
  > results/bench_packed_island.log 2>&1
timeout 2400 python tools/train_flop_audit.py --measure --vgg --batch 1 \
  > results/train_mfu.log 2>&1
timeout 3600 python tools/codebook_probe.py --inv-temperature 10 \
  > results/codebook_2e18_t10.log 2>&1
timeout 3600 python tools/codebook_probe.py --inv-temperature 10 \
  --exact-entropy > results/codebook_2e18_t10_exact.log 2>&1
echo QUEUE2_DONE
