#!/usr/bin/env python
"""Per-piece timing of the lane-packed stage's boundary ops vs unpacked.

The packed-island e2e bench (r4: 1401 fps packed vs 1531 unpacked @ b128)
says packing loses ~10% despite the fused RU kernel saving ~30% on the
ResidualUnit itself (tools/fused_residual_bench.py). This probe isolates
WHERE: each boundary op at the flagship shape, packed vs unpacked lowering.

  1. conv_in   3->64, k=7^2x(kt)?: plain vs w_blocked_out
  2. down2    64->128 strided:     plain vs w_blocked_in
  3. up2     128->64 d2s:          plain vs w_blocked_out
  4. conv_out 64->3:               plain(G-trick) vs w_blocked_in(head)
  5. residual unit:                plain vs fused-packed (reference row)

Usage: python tools/packed_stem_probe.py [--batch 8]
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


def slope_time(fn, *args, n_short=2, n_long=10):
    """Slope-timed chained iterations; output fed back via a cast to the
    first arg's shape (robust to the tunnel's async dispatch)."""
    @jax.jit
    def chained(n, x, *rest):
        def body(i, v):
            out = fn(v, *rest)
            return (out.reshape(-1)[:v.size].reshape(v.shape)
                    .astype(v.dtype) * 5e-2
                    if out.size >= v.size else
                    v * (1e-6 + out.reshape(-1)[:1].astype(v.dtype).sum()))
        return jax.lax.fori_loop(0, n, body, x)

    x0, *rest = args

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

    from magvit2_pytorch_tpu.models.tokenizer_module import TokenizerConfig
    from magvit2_pytorch_tpu.ops.conv import CausalConv3d, w_block
    from magvit2_pytorch_tpu.ops.resample import (
        SpatialDownsample2x,
        SpatialUpsample2x,
    )

    cfg = TokenizerConfig(image_size=128, init_dim=64, codebook_size=512,
                          layers=('residual', 'compress_space'))
    B, T, S = args.batch, 17, 128
    rng = jax.random.PRNGKey(0)

    def timed_pair(name, mod, x_plain, plain_kw, x_packed, packed_kw,
                   flops=None):
        p = mod.init(rng, x_plain, **plain_kw)
        f_plain = jax.jit(lambda x: mod.apply(p, x, **plain_kw))
        f_packed = jax.jit(lambda x: mod.apply(p, x, **packed_kw))
        t_p = slope_time(f_plain, x_plain)
        t_b = slope_time(f_packed, x_packed)
        extra = ''
        if flops:
            extra = (f'  [{flops / t_p / 1e12:5.1f} vs '
                     f'{flops / t_b / 1e12:5.1f} TFLOP/s]')
        print(f'{name:22s} plain {t_p * 1e3:7.2f} ms | packed '
              f'{t_b * 1e3:7.2f} ms ({t_p / t_b:4.2f}x){extra}')

    kin = cfg.input_conv_kernel_size
    x3 = jax.random.normal(rng, (B, T, S, S, 3), dtype)
    conv_in = CausalConv3d(64, kin)
    timed_pair('conv_in 3->64', conv_in,
               x3, dict(), x3, dict(w_blocked_out=True),
               flops=2 * B * T * S * S * 3 *
               int(np.prod(np.atleast_1d(kin))) * 64)

    x64 = jax.random.normal(rng, (B, T, S, S, 64), dtype)
    x64b = w_block(x64)
    down = SpatialDownsample2x(64, 128)
    timed_pair('down2 64->128', down,
               x64, dict(), x64b, dict(w_blocked_in=True),
               flops=2 * B * T * (S // 2) * (S // 2) * 9 * 64 * 128)

    x128 = jax.random.normal(rng, (B, T, S // 2, S // 2, 128), dtype)
    up = SpatialUpsample2x(128, 64)
    timed_pair('up2 128->64', up,
               x128, dict(), x128, dict(w_blocked_out=True),
               flops=2 * B * T * (S // 2) * (S // 2) * 128 * 4 * 64)

    conv_out = CausalConv3d(3, (3, 3, 3))
    timed_pair('conv_out 64->3', conv_out,
               x64, dict(), x64b, dict(w_blocked_in=True),
               flops=2 * B * T * S * S * 27 * 64 * 3)


if __name__ == '__main__':
    main()
