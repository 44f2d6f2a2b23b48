#!/usr/bin/env python
"""TPU timing for the flagship's stem ops in packed vs unpacked call modes.

The lane-packed pipeline (lane_pack=true) runs conv_in with w_blocked_out,
the 128px SpatialDownsample2x with w_blocked_in, the mirrored
SpatialUpsample2x with w_blocked_out, and conv_out with w_blocked_in/out.
This tool times each against its unpacked twin to locate where packed mode
loses throughput e2e (measured: packed+fused 1323 fps vs unpacked 1434 at
batch 128).

Usage: python tools/stem_bench.py [--batch 8]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12


def chain(fn, shape, dtype=jnp.bfloat16, n_s=2, n_l=12):
    @jax.jit
    def chained(key, n):
        x0 = jax.random.normal(key, shape, dtype)

        def body(i, x):
            out = fn(x)
            return x0 * (1.0 + 1e-6 * out.astype(jnp.float32).mean().astype(
                dtype)) + (1e-6 * i).astype(dtype)

        return jax.lax.fori_loop(0, n, body, x0).reshape(-1)[:1].astype(
            jnp.float32)

    seed = [0]

    def run(n):
        seed[0] += 1
        t0 = time.perf_counter()
        float(np.asarray(chained(jax.random.PRNGKey(seed[0]), n))[0])
        return time.perf_counter() - t0

    run(n_s); run(n_l)
    ts = min(run(n_s), run(n_s))
    tl = min(run(n_l), run(n_l))
    return max((tl - ts) / (n_l - n_s), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--frames', type=int, default=17)
    args = ap.parse_args()
    assert jax.default_backend() == 'tpu'

    from magvit2_pytorch_tpu.ops.conv import CausalConv3d, w_block
    from magvit2_pytorch_tpu.ops.resample import (
        SpatialDownsample2x, SpatialUpsample2x)

    B, T = args.batch, args.frames
    key = jax.random.PRNGKey(0)
    rows = []

    def bench(name, mod, shape, flops, **call_kw):
        x = jax.random.normal(key, shape, jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(1), x, **call_kw)
        f = jax.jit(lambda x: mod.apply(params, x, **call_kw))
        sec = chain(f, shape)
        print(f'{name:34s} {sec * 1e3:8.3f} ms  '
              f'{flops / sec / 1e12:6.1f} TF/s ({flops / sec / PEAK * 100:4.1f}%)',
              flush=True)
        rows.append((name, sec))

    M = B * T * 128 * 128
    fl_in = 2 * M * 3 * 343 * 64
    bench('conv_in 7x7x7 3->64', CausalConv3d(64, (7, 7, 7)),
          (B, T, 128, 128, 3), fl_in)
    bench('conv_in 7x7x7 3->64 packed-out', CausalConv3d(64, (7, 7, 7)),
          (B, T, 128, 128, 3), fl_in, w_blocked_out=True)

    fl_dn = 2 * (M // 4) * 64 * 9 * 128
    bench('down 64->128 @128px', SpatialDownsample2x(128),
          (B, T, 128, 128, 64), fl_dn)
    bench('down 64->128 @128px packed-in', SpatialDownsample2x(128),
          (B, T, 64, 64, 128), fl_dn, w_blocked_in=True)

    fl_up = 2 * (M // 4) * 128 * 9 * 256
    bench('up 128->64 @64px', SpatialUpsample2x(64),
          (B, T, 64, 64, 128), fl_up)
    bench('up 128->64 @64px packed-out', SpatialUpsample2x(64),
          (B, T, 64, 64, 128), fl_up, w_blocked_out=True)

    fl_out = 2 * M * 64 * 27 * 3
    bench('conv_out 3x3x3 64->3', CausalConv3d(3, (3, 3, 3)),
          (B, T, 128, 128, 64), fl_out)
    bench('conv_out 3x3x3 64->3 packed', CausalConv3d(3, (3, 3, 3)),
          (B, T, 64, 64, 128), fl_out, w_blocked_in=True, w_blocked_out=True)


if __name__ == '__main__':
    main()
