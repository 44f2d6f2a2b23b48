#!/usr/bin/env python
"""Measured int8 inference path on the flagship roundtrip (VERDICT r3 #2).

Runs the README-default tokenizer encode+decode with MAGVIT2_TPU_INT8_CONV=1
(dynamic per-tensor activation / per-out-channel weight int8 convs,
ops/conv.py) and reports:

  - frames/sec/chip int8 vs bf16 (same slope-timed chained measurement as
    bench.py)
  - fidelity vs the bf16 path: code-index agreement and recon PSNR/max-dev
    (the north-star's `recon deviation <= 1e-3` contract is defined for the
    bf16 path; int8 trades it for throughput — this prints the actual trade)

Usage: python tools/int8_bench.py [--batch 128] [--no-fused-ru]
"""

import argparse
import functools
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def slope_bench(apply_fn, params, video, n_short=2, n_long=10):
    @functools.partial(jax.jit, donate_argnums=(1,))
    def chained(params, v, n):
        def body(i, vv):
            recon, _ = apply_fn(params, vv)
            return recon + 1e-6 * i
        return jax.lax.fori_loop(0, n, body, v)

    def run(n, seed):
        v = video * (1.0 + 1e-6 * seed)
        t0 = time.perf_counter()
        out = chained(params, v, n)
        float(np.asarray(out[:1, :1, :1, :1]).astype(np.float32).sum())
        return time.perf_counter() - t0

    run(n_short, 0)
    t_s = run(n_short, 1)
    t_l = run(n_long, 2)
    return (t_l - t_s) / (n_long - n_short)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--frames', type=int, default=17)
    ap.add_argument('--image-size', type=int, default=128)
    ap.add_argument('--no-fused-ru', action='store_true',
                    help='disable the bf16 fused ResidualUnit kernel in the '
                         'int8 run so the 64-ch stage uses int8 convs too')
    ap.add_argument('--static', action='store_true',
                    help='also measure the statically-calibrated int8 path '
                         '(calibrate_int8: no per-call absmax pass)')
    ap.add_argument('--percentile', type=float, default=None,
                    help='clip calibration: record this |activation| '
                         'percentile instead of the absmax for static '
                         'scales (e.g. 99.9) — outlier-robust quantization')
    ap.add_argument('--lane-pack', action='store_true',
                    help='run the model with the lane-packed c64 island AND '
                         'MAGVIT2_TPU_INT8_PACKED=1, so the packed 2x64=128-'
                         'wide convs take the int8 path too (the packed-int8 '
                         'experiment: packed bf16 loses at b128, but packed '
                         'int8 may recover it on MXU rate)')
    args = ap.parse_args()

    from magvit2_pytorch_tpu.configs import readme_video_tokenizer_kwargs
    from magvit2_pytorch_tpu.models import VideoTokenizer

    kwargs = readme_video_tokenizer_kwargs(
        image_size=args.image_size, use_gan=False,
        perceptual_loss_weight=0.0)
    if args.lane_pack:
        kwargs['lane_pack'] = True
        os.environ['MAGVIT2_TPU_INT8_PACKED'] = '1'
        # the packed residual units otherwise run the bf16 fused Pallas RU
        # kernel — the int8 path would never see the island's convs (and
        # calibration would miss them). Applies to ALL modes incl. the bf16
        # control: this run's bf16 number is the no-fused-RU packed control,
        # cross-run comparisons use the unpacked log.
        os.environ['MAGVIT2_TPU_NO_FUSED_RU'] = '1'
    tok = VideoTokenizer(**kwargs, seed=0)
    module = tok.module
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        tok.params)

    rng = np.random.default_rng(0)
    shape = (args.batch, args.frames, args.image_size, args.image_size, 3)
    video = jnp.asarray(rng.uniform(size=shape).astype(np.float32),
                        jnp.bfloat16)
    small = video[:min(8, args.batch)]

    int8_vars = None
    if args.static:
        # calibrate once (batch 8 slice is plenty for per-tensor absmax; the
        # full batch would just re-derive the same scales slower)
        os.environ['MAGVIT2_TPU_INT8_CONV'] = '1'
        n = tok.calibrate_int8(small, percentile=args.percentile)
        int8_vars = tok._int8_vars
        os.environ.pop('MAGVIT2_TPU_INT8_CONV', None)
        print(f'# calibrated {n} conv sites '
              f'(percentile={args.percentile})', flush=True)

    def apply_fn(p, v):
        return module.apply(p, v)

    modes = ('bf16', 'int8', 'int8-static') if args.static else ('bf16',
                                                                 'int8')
    results = {}
    for mode in modes:
        if mode.startswith('int8'):
            os.environ['MAGVIT2_TPU_INT8_CONV'] = '1'
            if args.no_fused_ru:
                os.environ['MAGVIT2_TPU_NO_FUSED_RU'] = '1'
        else:
            os.environ.pop('MAGVIT2_TPU_INT8_CONV', None)
        jax.clear_caches()  # the int8 gate is read at trace time

        pvars = {'params': params}
        if mode == 'int8-static':
            pvars = {'params': params, 'int8': int8_vars}
        per_iter = slope_bench(apply_fn, pvars, video)
        fps = args.batch * args.frames / per_iter
        recon, qout = jax.jit(apply_fn)(pvars, small)
        results[mode] = dict(
            fps=fps, recon=np.asarray(recon, np.float32),
            codes=np.asarray(qout.indices))
        print(f'{mode}: {fps:.1f} frames/sec/chip '
              f'({per_iter*1e3:.1f} ms/iter, batch {args.batch})', flush=True)

    b = results['bf16']
    for mode in modes[1:]:
        i8 = results[mode]
        agree = float((b['codes'] == i8['codes']).mean())
        dev = np.abs(b['recon'] - i8['recon'])
        mse = float(np.mean((np.clip(b['recon'], 0, 1)
                             - np.clip(i8['recon'], 0, 1)) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        print(f'[{mode}] speedup: {i8["fps"] / b["fps"]:.3f}x')
        print(f'[{mode}] code-index agreement vs bf16: {agree * 100:.2f}%')
        print(f'[{mode}] recon deviation: max {dev.max():.4f}, mean '
              f'{dev.mean():.5f}, PSNR(bf16, {mode}) {psnr:.1f} dB')


if __name__ == '__main__':
    main()
