#!/usr/bin/env python
"""Probe: w-pair im2col for the 64-channel conv (the 22%-of-peak stage).

tools/int8_probe.py showed the bare 3x3x3 c64->c64 conv runs at 32% of bf16
peak while c128 convs run at 85% — the MXU contraction is starved at 64
input channels. Scheme: x2[w] = concat(x[w], x[w+1]) over channels (c=128,
one XLA concat), then a (3, 3, 2) conv whose kernel holds the original taps
with 1/4 structural zeros — 1.33x logical FLOPs at c128 efficiency, no
custom kernel, no layout games:

    kw2=0 (reads x2[w-1]) rows   0:64  = original kw=0 tap (x[w-1])
    kw2=1 (reads x2[w  ]) rows   0:64  = original kw=1 tap (x[w])
    kw2=1 (reads x2[w  ]) rows  64:128 = original kw=2 tap (x[w+1])

Correctness asserted vs the direct conv; timings for the pieces and the
fused chain. Usage: python tools/wpair_probe.py [--batch 8]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

DN_3D = ('NDHWC', 'DHWIO', 'NDHWC')
PEAK = 197e12


def wpair_kernel(k3):
    """(3, 3, 3, C, F) -> (3, 3, 2, 2C, F) w-pair kernel."""
    kt, kh, kw, c, f = k3.shape
    assert kw == 3
    k2 = jnp.zeros((kt, kh, 2, 2 * c, f), k3.dtype)
    k2 = k2.at[:, :, 0, :c].set(k3[:, :, 0])      # x[w-1]
    k2 = k2.at[:, :, 1, :c].set(k3[:, :, 1])      # x[w]
    k2 = k2.at[:, :, 1, c:].set(k3[:, :, 2])      # x[w+1]
    return k2


def wpair_conv(x, k3, time_pad):
    """Causal (pad_t, 0) 3x3x3 conv via the w-pair scheme."""
    c = x.shape[-1]
    x_sh = jnp.concatenate(
        [x[:, :, :, 1:], jnp.zeros_like(x[:, :, :, :1])], axis=3)
    x2 = jnp.concatenate([x, x_sh], axis=-1)       # (B,T,H,W,2C)
    return jax.lax.conv_general_dilated(
        x2, wpair_kernel(k3),
        window_strides=(1, 1, 1),
        padding=[(time_pad, 0), (1, 1), (1, 0)],
        dimension_numbers=DN_3D)


def direct_conv(x, k3, time_pad):
    return jax.lax.conv_general_dilated(
        x, k3, window_strides=(1, 1, 1),
        padding=[(time_pad, 0), (1, 1), (1, 1)],
        dimension_numbers=DN_3D)


def bench(fn, x0, *rest, n_short=2, n_long=10):
    @jax.jit
    def chained(n, x, *rest):
        def body(i, v):
            out = fn(v, *rest)
            return out.reshape(v.shape).astype(v.dtype) * 5e-2
        return jax.lax.fori_loop(0, n, body, x)

    def run(n):
        t0 = time.perf_counter()
        out = chained(n, x0, *rest)
        float(np.asarray(out.reshape(-1)[:1]).astype(np.float32).sum())
        return time.perf_counter() - t0

    run(n_short)
    t_s = min(run(n_short), run(n_short))
    t_l = min(run(n_long), run(n_long))
    return (t_l - t_s) / (n_long - n_short)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    B, T, H, W, C = args.batch, 17, 128, 128, 64
    x = jnp.asarray(rng.normal(size=(B, T, H, W, C)) * 0.5, dtype)
    k3 = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.05, dtype)

    # correctness
    want = np.asarray(direct_conv(x, k3, 2), np.float32)
    got = np.asarray(wpair_conv(x, k3, 2), np.float32)
    err = np.abs(want - got).max() / (np.abs(want).max() + 1e-6)
    print(f'w-pair vs direct rel err: {err:.2e} '
          f'({"OK" if err < 3e-2 else "FAIL"})')

    flops = 2 * B * T * H * W * C * 27 * C
    t_d = bench(lambda v: direct_conv(v, k3, 2), x)
    print(f'direct c64 conv : {t_d*1e3:7.2f} ms  '
          f'{flops/t_d/1e12:6.1f} TFLOP/s ({flops/t_d/PEAK*100:4.1f}% pk)')
    t_w = bench(lambda v: wpair_conv(v, k3, 2), x)
    print(f'w-pair c128 conv: {t_w*1e3:7.2f} ms  '
          f'{flops/t_w/1e12:6.1f} TFLOP/s logical '
          f'({flops/t_w/PEAK*100:4.1f}% pk; speedup {t_d/t_w:.2f}x)')

    # concat alone (is the pair build memory-roofline?)
    def concat_only(v):
        v_sh = jnp.concatenate(
            [v[:, :, :, 1:], jnp.zeros_like(v[:, :, :, :1])], axis=3)
        return jnp.concatenate([v, v_sh], axis=-1)[..., :C]
    t_c = bench(concat_only, x)
    print(f'pair-concat only: {t_c*1e3:7.2f} ms')

    # raw (3,3,2) c128->c64 conv on a premade x2 (conv speed w/o concat)
    x2 = jnp.asarray(rng.normal(size=(B, T, H, W, 2 * C)) * 0.5, dtype)
    k2 = wpair_kernel(k3)
    def raw(v2):
        return jax.lax.conv_general_dilated(
            v2, k2, window_strides=(1, 1, 1),
            padding=[(2, 0), (1, 1), (1, 0)], dimension_numbers=DN_3D)
    t_r = bench(lambda v2: jnp.concatenate(
        [raw(v2), jnp.zeros_like(v2[..., :C])], axis=-1), x2)
    print(f'raw (3,3,2) conv: {t_r*1e3:7.2f} ms (incl. a {C}-ch pad concat)')


if __name__ == '__main__':
    main()
