#!/usr/bin/env python
"""TPU correctness + speed check for the fused Pallas ResidualUnit kernel.

Compares three implementations of the flagship's 64-channel 128px stage
(reference ResidualUnit, magvit2_pytorch.py:930-944):

  1. fused   — ops/pallas/residual_unit.fused_residual_unit (one VMEM pass)
  2. blocked — the XLA twin on the lane-packed layout (VJP recompute target)
  3. plain   — the unfused module path on the unblocked (B,T,H,W,C) layout

Correctness: fused vs blocked must agree to bf16 tolerance (identical math,
different schedule). Speed: slope-timed chained iterations (see
tools/layer_bench.py — robust to the TPU tunnel's dispatch memoization).

Usage: python tools/fused_residual_bench.py [--batch 8] [--hw 128] [--dim 64]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--frames', type=int, default=17)
    ap.add_argument('--hw', type=int, default=128)
    ap.add_argument('--dim', type=int, default=64)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--unpacked', action='store_true',
                    help='also run the packed_io=False mode (fails to lower '
                         'on current Mosaic: unsupported shape cast)')
    args = ap.parse_args()

    assert jax.default_backend() == 'tpu', jax.default_backend()

    from magvit2_pytorch_tpu.ops.pallas.residual_unit import (
        fused_residual_unit, _residual_unit_xla_blocked)
    from magvit2_pytorch_tpu.ops.resample import ResidualUnit
    from magvit2_pytorch_tpu.ops.conv import w_block, w_unblock

    B, T, H, W, C = args.batch, args.frames, args.hw, args.hw, args.dim
    dtype = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    hidden = max(16, C // 2)

    def nrm(k, shape, scale=0.3):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(
            jnp.float32)

    params = dict(
        conv_k=nrm(ks[0], (3, 3, 3, C, C), 0.05),
        conv_b=nrm(ks[1], (C,)),
        pw_k=nrm(ks[2], (C, C), 0.1),
        pw_b=nrm(ks[3], (C,)),
        tok_k=nrm(ks[4], (C, 1)),
        tok_b=nrm(ks[5], (1,)),
        gi_k=nrm(ks[6], (C, hidden)),
        gi_b=nrm(ks[7], (hidden,)),
        go_k=nrm(ks[8], (hidden, C), 0.05),
        go_b=jnp.full((C,), -2.0, jnp.float32),
    )
    order = ['conv_k', 'conv_b', 'pw_k', 'pw_b', 'tok_k', 'tok_b',
             'gi_k', 'gi_b', 'go_k', 'go_b']

    x = jax.random.normal(ks[9], (B, T, H, W, C), dtype)
    xb = w_block(x)

    fused = jax.jit(lambda xb, p: fused_residual_unit(
        xb, *[p[k] for k in order]))
    fused_unpacked = jax.jit(lambda x, p: fused_residual_unit(
        x, *[p[k] for k in order], False, False))  # interpret, packed_io
    blocked = jax.jit(lambda xb, p: _residual_unit_xla_blocked(
        xb, *[p[k] for k in order]))

    # ---- correctness --------------------------------------------------------
    of = np.asarray(fused(xb, params).astype(jnp.float32))
    ob = np.asarray(blocked(xb, params).astype(jnp.float32))
    err = np.max(np.abs(of - ob))
    scale = np.max(np.abs(ob)) + 1e-6
    print(f'max|fused-blocked| = {err:.4e}  (scale {scale:.3f}, '
          f'rel {err / scale:.3e})')
    tol = 0.05 if dtype == jnp.bfloat16 else 1e-4
    assert err / scale < tol, 'fused kernel diverges from XLA twin'

    # unblocked module path as an end-to-end sanity reference
    unit = ResidualUnit(C, 3)
    uparams = unit.init(jax.random.PRNGKey(1), x[:1, :1])
    ou = np.asarray(w_unblock(blocked(xb, params)).astype(jnp.float32))
    print(f'blocked-vs-plain layout check skipped (separate params); '
          f'module init ok: {jax.tree_util.tree_structure(uparams) is not None}')

    # ---- speed --------------------------------------------------------------
    def chain(fn, xin):
        @jax.jit
        def chained(xin, p, key, niter):
            def body(i, x):
                return fn(x, p) + (1e-6 * i).astype(x.dtype)
            out = jax.lax.fori_loop(0, niter, body, xin)
            return out.reshape(-1)[:1].astype(jnp.float32)

        seed = [100]

        def run(niter):
            seed[0] += 1
            t0 = time.perf_counter()
            float(np.asarray(chained(
                xin * (1 + 1e-5 * seed[0]), params,
                jax.random.PRNGKey(seed[0]), niter))[0])
            return time.perf_counter() - t0

        n_s, n_l = 2, 12
        run(n_s); run(n_l)
        ts = min(run(n_s), run(n_s))
        tl = min(run(n_l), run(n_l))
        return max((tl - ts) / (n_l - n_s), 1e-9)

    # logical (unblocked) useful FLOPs: conv27C + 1x1 + SE (tiny)
    M = B * T * H * W
    flops = 2 * M * C * (27 * C + C + 1 + 0)  # conv + pointwise + to_k
    cases = [('fused', fused, xb), ('xla-blocked', blocked, xb)]
    if args.unpacked:
        # correctness of the unpacked-io mode on the real TPU lowering
        ofu = np.asarray(w_block(fused_unpacked(x, params)).astype(
            jnp.float32))
        err_u = np.max(np.abs(ofu - ob))
        print(f'max|fused_unpacked-blocked| = {err_u:.4e} '
              f'(rel {err_u/scale:.3e})')
        cases.insert(1, ('fused-unpack', fused_unpacked, x))

    rows = []
    for nm, fn, xin in cases:
        sec = chain(fn, xin)
        rows.append((nm, sec))
        print(f'{nm:12s} {sec * 1e3:8.3f} ms/apply   '
              f'{flops / sec / 1e12:6.2f} TFLOP/s useful '
              f'({flops / sec / PEAK_FLOPS * 100:5.1f}% of peak)')

    # plain module path (own params — timing only)
    plain = jax.jit(lambda x, p: unit.apply(p, x))
    sec = chain(lambda x, p: plain(x, uparams), x)
    print(f'{"plain-xla":12s} {sec * 1e3:8.3f} ms/apply   '
          f'{flops / sec / 1e12:6.2f} TFLOP/s useful '
          f'({flops / sec / PEAK_FLOPS * 100:5.1f}% of peak)')


if __name__ == '__main__':
    main()
