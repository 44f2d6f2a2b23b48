#!/bin/bash
# Round-5 TPU measurement queue — run sequentially (one process owns the
# tunnel at a time; concurrent owners OOM each other and poison the runtime).
set -x
cd "$(dirname "$0")/.."

# 1) train-step MFU at batch-8-equivalent (VERDICT r4 #6)
timeout 2400 python tools/train_flop_audit.py --measure --vgg --batch 1 --accum 4 \
  > results/train_mfu_r5_b1a4.log 2>&1
timeout 2400 python tools/train_flop_audit.py --measure --vgg --batch 2 --accum 4 --remat full \
  > results/train_mfu_r5_b2a4_remat.log 2>&1

# 2) int8 static-vs-dynamic-vs-bf16 (VERDICT r4 #3)
timeout 3000 python tools/int8_bench.py --batch 64 --static \
  > results/int8_bench_r5_b64_static.log 2>&1
timeout 3000 python tools/int8_bench.py --batch 128 --static \
  > results/int8_bench_r5_b128_static.log 2>&1

# 3) GAN-phase flagship stability run (VERDICT r4 #5)
timeout 5400 python tools/gan_convergence_run.py --steps 2000 --discr-start 500 \
  > results/gan_convergence_r5.log 2>&1

# 4) final headline for the record
timeout 1800 python bench.py > results/bench_r5_final.log 2>&1

echo QUEUE_DONE
