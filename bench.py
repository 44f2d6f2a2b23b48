#!/usr/bin/env python
"""Benchmark: encode+decode throughput on the flagship (README-default) video
tokenizer — 128px x 17 frames, codebook 1024 (BASELINE.json metric:
frames/sec/chip; north star >= 10k on TPU v5e).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=8)
    parser.add_argument('--frames', type=int, default=17)
    parser.add_argument('--image-size', type=int, default=128)
    parser.add_argument('--iters', type=int, default=20)
    parser.add_argument('--warmup', type=int, default=3)
    parser.add_argument('--dtype', default='bfloat16')
    args = parser.parse_args()

    from magvit2_pytorch_tpu.configs import readme_video_tokenizer_kwargs
    from magvit2_pytorch_tpu.models import VideoTokenizer
    from magvit2_pytorch_tpu.models.tokenizer_module import TokenizerModule

    on_tpu = jax.default_backend() in ('tpu', 'axon')

    tok = VideoTokenizer(
        **readme_video_tokenizer_kwargs(
            image_size=args.image_size,
            use_gan=False,
            perceptual_loss_weight=0.0,
        ),
        seed=0,
    )

    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    module = tok.module
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tok.params)

    @jax.jit
    def roundtrip(params, video):
        recon, qout = module.apply({'params': params}, video)
        return qout.indices, recon

    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.uniform(size=(args.batch, args.frames, args.image_size,
                          args.image_size, 3)).astype(np.float32)).astype(dtype)

    # warmup / compile
    for _ in range(args.warmup):
        codes, recon = roundtrip(params, video)
    jax.block_until_ready((codes, recon))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        codes, recon = roundtrip(params, video)
    jax.block_until_ready((codes, recon))
    elapsed = time.perf_counter() - t0

    total_frames = args.batch * args.frames * args.iters
    fps = total_frames / elapsed

    result = {
        'metric': 'encode_decode_frames_per_sec_per_chip',
        'value': round(fps, 2),
        'unit': f'frames/sec/chip @{args.image_size}px x {args.frames}f '
                f'({args.dtype}, batch {args.batch}, backend '
                f'{jax.default_backend()})',
        'vs_baseline': round(fps / 10_000.0, 4),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    sys.exit(main())
