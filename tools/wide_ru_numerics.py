#!/usr/bin/env python
"""Numerics triage for the wide fused ResidualUnit (VERDICT r4 weak #3).

Separates bf16 accumulation-order noise from kernel bugs by comparing
THREE candidates against an f32 XLA ground truth at each stage:

  plain-bf16 : the XLA twin in bf16          (pure dtype/ordering noise)
  fused-bf16 : the Pallas kernel in bf16      (noise + any kernel bug)
  fused-vs-plain : the old wide_ru_bench metric, for continuity

If fused-bf16's deviation from f32 truth is comparable to plain-bf16's,
the r4 'rel 8.5e-2 / 6.1e-1' numbers were a metric artifact (bf16 vs bf16
max-normalized); if fused deviates much more, the kernel is wrong.

Usage: python tools/wide_ru_numerics.py [--stages 64,128,256,512]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

STAGE_HW = {64: 128, 128: 64, 256: 32, 512: 16}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--frames', type=int, default=17)
    ap.add_argument('--stages', default='64,128,256,512')
    args = ap.parse_args()

    from magvit2_pytorch_tpu.ops.pallas.residual_unit_wide import (
        _residual_unit_xla_plain, fused_residual_unit_wide)

    interp = jax.default_backend() != 'tpu'
    for c in [int(s) for s in args.stages.split(',')]:
        hw = STAGE_HW.get(c, 16)
        hidden = max(16, c // 2)
        ks = jax.random.split(jax.random.PRNGKey(c), 11)
        scales = [0.05, 0.1, 0.09, 0.1, 0.3, 0.1, 0.15, 0.1, 0.15, 0.1]
        shapes = [(3, 3, 3, c, c), (c,), (c, c), (c,), (c, 1), (1,),
                  (c, hidden), (hidden,), (hidden, c), (c,)]
        p32 = [jax.random.normal(k, s) * m
               for k, s, m in zip(ks, shapes, scales)]
        p32[9] = p32[9] - 2.0
        x32 = jax.random.normal(ks[10], (args.batch, args.frames, hw, hw, c)) * 0.5

        pb = [a.astype(jnp.bfloat16) for a in p32]
        xb = x32.astype(jnp.bfloat16)

        truth = jax.jit(_residual_unit_xla_plain)(x32, *p32)
        plain_b = jax.jit(_residual_unit_xla_plain)(xb, *pb).astype(jnp.float32)
        fused_b = jax.jit(
            lambda v, *a: fused_residual_unit_wide(v, *a, interp))(
            xb, *pb).astype(jnp.float32)

        scale = float(jnp.max(jnp.abs(truth)))
        def dev(a, b):
            return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b)))
        print(f'C={c:4d} @ {hw}px  |truth|max {scale:.3f}')
        print(f'  plain-bf16 vs f32 truth : max|err| {dev(truth, plain_b):.3e}'
              f' (rel {dev(truth, plain_b)/scale:.1e})')
        print(f'  fused-bf16 vs f32 truth : max|err| {dev(truth, fused_b):.3e}'
              f' (rel {dev(truth, fused_b)/scale:.1e})')
        print(f'  fused vs plain (old)    : max|err| {dev(plain_b, fused_b):.3e}'
              f' (rel {dev(plain_b, fused_b)/scale:.1e})', flush=True)

        # the bound (results/wide_ru_numerics_r5.log): the kernel must not be
        # meaningfully further from f32 truth than XLA's own bf16 twin —
        # anything past 2x + an absolute floor would be a real kernel bug,
        # not accumulation-order noise
        f_dev, p_dev = dev(truth, fused_b), dev(truth, plain_b)
        assert f_dev <= 2.0 * p_dev + 1e-2 * scale, (
            f'C={c}: fused dev {f_dev:.3e} >> plain-bf16 dev {p_dev:.3e}')


if __name__ == '__main__':
    main()
