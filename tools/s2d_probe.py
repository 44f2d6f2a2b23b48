#!/usr/bin/env python
"""Lowering shoot-out for the c64 stage convs (r4 headline fight).

tools/layer_bench.py pins the flagship's worst layers on the 64-channel
128px stage: the 3^3 c64->c64 residual conv runs at 32% of MXU peak and the
stride-2 c64->c128 downsample at 15%, while c128<->c128 convs hit 85% —
measured rule: XLA conv throughput needs BOTH sides >= 128 lanes.

Candidates measured here, at the flagship stage shape (B,17,128,128,64):

  A. direct 3^3 c64->c64 (the baseline the stage runs today)
  B. output-PAIR lowering: _cout_block_kernel(k, G=2) + w-stride 2 — emits
     both w-phases as 2F=128 output channels; 4/3 logical FLOPs; input is
     UNTOUCHED (no relayout) and the output reshape (W/2,2F)->(W,F) is free.
  C. output-QUAD (G=4): 2x logical FLOPs, 256-wide output — is wider better?
  D. dense w-blocked conv (ops/conv._w_block_kernel_dense): 128<->128 but 2x
     logical FLOPs (the union tap window is 3 packed taps) — the r2 lane-
     packing kernel, for reference.
  E. direct (1,3,3) stride-2 c64->c128 downsample (baseline).
  F. w-blocked-input downsample (_w_block_kernel_in_down2): free input
     reshape to (W/2,128), kernel (1,3,2,128,128), strides (1,2,1) — 4/3
     logical FLOPs, both sides 128.

Each candidate is checked numerically against the direct conv (<=2e-2 rtol
in bf16) before timing.

Usage: python tools/s2d_probe.py [--batch 8] [--iters 20]
"""

import argparse
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from magvit2_pytorch_tpu.ops.conv import (  # noqa: E402
    DN_3D,
    _cout_block_kernel,
    _w_block_kernel_dense,
    _w_block_kernel_in_down2,
)

PEAK = 197e12


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # force a real host fetch per iter batch (tunnel: block_until_ready can
    # return early); time a chain of iters
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0]))[0, 0, 0, 0]
    return (time.perf_counter() - t0) / iters


def direct(x, k, strides=(1, 1, 1), padding=((2, 0), (1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=strides, padding=list(padding),
        dimension_numbers=DN_3D)


@jax.jit
def pair_lowered(x, k):
    """B: output-pair via _cout_block_kernel(G=2) + w-stride 2."""
    kb = _cout_block_kernel(k, 2)            # (kt, kh, 4, C, 2F)
    out = jax.lax.conv_general_dilated(
        x, kb, window_strides=(1, 1, 2),
        padding=[(2, 0), (1, 1), (1, 1)],
        dimension_numbers=DN_3D)
    b, t, h, w2, f2 = out.shape
    return out.reshape(b, t, h, w2 * 2, f2 // 2)


@jax.jit
def quad_lowered(x, k):
    """C: output-quad via _cout_block_kernel(G=4) + w-stride 4."""
    kb = _cout_block_kernel(k, 4)            # (kt, kh, 6, C, 4F)
    out = jax.lax.conv_general_dilated(
        x, kb, window_strides=(1, 1, 4),
        padding=[(2, 0), (1, 1), (1, 1)],
        dimension_numbers=DN_3D)
    b, t, h, w4, f4 = out.shape
    return out.reshape(b, t, h, w4 * 4, f4 // 4)


@jax.jit
def wblock_dense(x, k):
    """D: dense w-blocked 128<->128 conv (free reshapes both sides)."""
    b, t, h, w, c = x.shape
    xb = x.reshape(b, t, h, w // 2, 2 * c)
    kb, (lo, hi) = _w_block_kernel_dense(k)
    out = jax.lax.conv_general_dilated(
        xb, kb, window_strides=(1, 1, 1),
        padding=[(2, 0), (1, 1), (lo, hi)],
        dimension_numbers=DN_3D)
    return out.reshape(b, t, h, w, c)


@jax.jit
def down_direct(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 2, 2),
        padding=[(0, 0), (1, 1), (1, 1)],
        dimension_numbers=DN_3D)


@jax.jit
def down_wblocked(x, k):
    b, t, h, w, c = x.shape
    xb = x.reshape(b, t, h, w // 2, 2 * c)
    kb, (lo, hi) = _w_block_kernel_in_down2(k)
    return jax.lax.conv_general_dilated(
        xb, kb, window_strides=(1, 2, 1),
        padding=[(0, 0), (1, 1), (lo, hi)],
        dimension_numbers=DN_3D)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--dim', type=int, default=64)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    B, T, H, W, C = args.batch, 17, 128, 128, args.dim
    x = jax.random.normal(key, (B, T, H, W, C), jnp.bfloat16)
    k3 = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, C, C),
                            jnp.bfloat16) * 0.05)
    kd = (jax.random.normal(jax.random.PRNGKey(2), (1, 3, 3, C, 2 * C),
                            jnp.bfloat16) * 0.05)

    ref = jax.jit(direct)(x, k3)
    gf = B * T * H * W * 3 * 3 * 3 * C * C * 2 / 1e9
    rows = []

    def check(name, fn, k, ref_out, logical_gf, overhead):
        out = fn(x, k)
        dev = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref_out.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref_out.astype(jnp.float32))))
        ms = bench(fn, x, k, iters=args.iters) * 1e3
        eff = logical_gf / 1e3 / (ms / 1e3) / (PEAK / 1e12) * 100
        rows.append((name, ms, dev / max(scale, 1e-6), overhead, eff))
        print(f'{name:32s} {ms:7.2f} ms  rel-dev {dev / max(scale, 1e-6):.2e}'
              f'  x{overhead:.2f} FLOPs  {eff:5.1f}% peak(logical)',
              flush=True)

    print(f'# backend={jax.default_backend()}  shape={x.shape}  '
          f'logical {gf:.1f} GF per 3^3 conv', flush=True)
    check('A direct 3^3 c64->c64', jax.jit(direct), k3, ref, gf, 1.0)
    check('B output-pair (G=2, 4/3x)', pair_lowered, k3, ref, gf, 4 / 3)
    check('C output-quad (G=4, 2x)', quad_lowered, k3, ref, gf, 2.0)
    check('D dense w-blocked (2x)', wblock_dense, k3, ref, gf, 2.0)

    refd = down_direct(x, kd)
    gfd = B * T * (H // 2) * (W // 2) * 3 * 3 * C * 2 * C * 2 / 1e9
    check('E direct down2 c64->c128',
          down_direct, kd, refd, gfd, 1.0)
    check('F w-blocked-in down2 (4/3x)',
          down_wblocked, kd, refd, gfd, 4 / 3)


if __name__ == '__main__':
    main()
