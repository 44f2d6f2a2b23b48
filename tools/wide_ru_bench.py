#!/usr/bin/env python
"""TPU correctness + speed check for the WIDE fused ResidualUnit kernel
(ops/pallas/residual_unit_wide.py) at the flagship's three wide stages:

  C=128 @ 64px, C=256 @ 32px, C=512 @ 16px  (batch 8, 17 frames)

Compares the kernel against the XLA twin (same math, unfused) with
slope-timed chained iterations.

Usage: python tools/wide_ru_bench.py [--batch 8] [--stages 128,256,512]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_FLOPS = 197e12
STAGE_HW = {64: 128, 128: 64, 256: 32, 512: 16}


def slope(fn, x0, args, n_s=2, n_l=10):
    @jax.jit
    def chained(n, x, a):
        def body(i, v):
            return fn(v, a) * (1.0 + 1e-7 * i)
        return jax.lax.fori_loop(0, n, body, x)

    def run(n):
        t0 = time.perf_counter()
        out = chained(n, x0, args)
        float(np.asarray(out.reshape(-1)[:1]).astype(np.float32).sum())
        return time.perf_counter() - t0

    run(n_s)
    t_s = min(run(n_s), run(n_s))
    t_l = min(run(n_l), run(n_l))
    return (t_l - t_s) / (n_l - n_s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--frames', type=int, default=17)
    ap.add_argument('--stages', default='64,128,256,512')
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args()

    assert jax.default_backend() == 'tpu', jax.default_backend()

    from magvit2_pytorch_tpu.ops.pallas.residual_unit_wide import (
        _residual_unit_xla_plain, fused_residual_unit_wide)

    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32

    for c in [int(s) for s in args.stages.split(',')]:
        hw = STAGE_HW.get(c, 16)
        hidden = max(16, c // 2)
        ks = jax.random.split(jax.random.PRNGKey(c), 11)
        p = (
            (jax.random.normal(ks[0], (3, 3, 3, c, c)) * 0.05).astype(dtype),
            (jax.random.normal(ks[1], (c,)) * 0.1).astype(dtype),
            (jax.random.normal(ks[2], (c, c)) * 0.09).astype(dtype),
            (jax.random.normal(ks[3], (c,)) * 0.1).astype(dtype),
            (jax.random.normal(ks[4], (c, 1)) * 0.3).astype(dtype),
            (jax.random.normal(ks[5], (1,)) * 0.1).astype(dtype),
            (jax.random.normal(ks[6], (c, hidden)) * 0.15).astype(dtype),
            (jax.random.normal(ks[7], (hidden,)) * 0.1).astype(dtype),
            (jax.random.normal(ks[8], (hidden, c)) * 0.15).astype(dtype),
            ((jax.random.normal(ks[9], (c,)) * 0.1) - 2.0).astype(dtype),
        )
        x = (jax.random.normal(ks[10], (args.batch, args.frames, hw, hw, c))
             * 0.5).astype(dtype)

        fused = lambda v, a: fused_residual_unit_wide(v, *a, False)
        plain = lambda v, a: _residual_unit_xla_plain(v, *a)

        got = jax.jit(fused)(x, p)
        want = jax.jit(plain)(x, p)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
        flops = 2 * x.size * (27 * c + c)

        t_f = slope(fused, x, p)
        t_p = slope(plain, x, p)
        print(f'C={c:4d} @ {hw}px  max|err| {err:.3e} (rel {err / scale:.1e})')
        print(f'  fused  {t_f * 1e3:7.3f} ms  {flops / t_f / 1e12:6.1f} '
              f'TFLOP/s ({flops / t_f / PEAK_FLOPS * 100:5.1f}% of peak)')
        print(f'  plain  {t_p * 1e3:7.3f} ms  {flops / t_p / 1e12:6.1f} '
              f'TFLOP/s ({flops / t_p / PEAK_FLOPS * 100:5.1f}% of peak)'
              f'   fused is {t_p / t_f:.2f}x', flush=True)


if __name__ == '__main__':
    main()
