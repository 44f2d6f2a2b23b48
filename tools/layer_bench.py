#!/usr/bin/env python
"""Measured per-layer TPU timing for the flagship tokenizer.

Companion to tools/flop_audit.py: times every encoder/decoder layer standalone
at its true activation shape (chained device-side iterations, slope timing —
robust to the remote-TPU tunnel's dispatch memoization) and reports achieved
TFLOP/s vs the XLA cost model's FLOP count. The layers with the worst
efficiency are the optimization targets.

Usage: python tools/layer_bench.py [--batch 8]
"""

import argparse
import pathlib
import sys
import time

# repo root on sys.path WITHOUT PYTHONPATH (PYTHONPATH breaks the TPU-tunnel
# PJRT plugin registration in this image)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_FLOPS = 197e12


def chain_bench(apply_fn, params, shape, dtype, n_short=2, n_long=10):
    """Seconds per apply, slope-timed with a forced host fetch."""

    @jax.jit
    def chained(params, key, niter):
        x0 = jax.random.normal(key, shape, dtype)

        def body(i, x):
            out = apply_fn(params, x)
            # keep shape: feed the output back only if same shape, else
            # re-inject x0 perturbed by a scalar from out
            if out.shape == x.shape:
                return out + 1e-6 * i
            return x0 * (1.0 + 1e-6 * out.astype(jnp.float32).mean().astype(
                dtype)) + 1e-6 * i

        out = jax.lax.fori_loop(0, niter, body, x0)
        return out.reshape(-1)[:1].astype(jnp.float32)

    seed = [0]

    def run(niter):
        seed[0] += 1
        t0 = time.perf_counter()
        float(np.asarray(chained(params, jax.random.PRNGKey(seed[0]),
                                 niter))[0])
        return time.perf_counter() - t0

    run(n_short)
    run(n_long)
    ts = min(run(n_short), run(n_short))
    tl = min(run(n_long), run(n_long))
    return max((tl - ts) / (n_long - n_short), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--image-size', type=int, default=128)
    ap.add_argument('--frames', type=int, default=17)
    ap.add_argument('--side', choices=['encoder', 'decoder', 'both'], default='both')
    ap.add_argument('--filter', default=None,
                    help='only bench layers whose layer_type contains this '
                         'substring (e.g. "residual") — lets a single stage '
                         'be probed at batches where the full chained sweep '
                         'OOMs 16 GB')
    args = ap.parse_args()

    from magvit2_pytorch_tpu.configs import readme_video_tokenizer_kwargs
    from magvit2_pytorch_tpu.models import VideoTokenizer
    from magvit2_pytorch_tpu.models.tokenizer_module import _build_layer
    from tools.flop_audit import layer_cost  # reuse XLA cost model reader

    tok = VideoTokenizer(**readme_video_tokenizer_kwargs(
        image_size=args.image_size, use_gan=False,
        perceptual_loss_weight=0.0), seed=0)
    config = tok.module.config
    parsed = config.parsed()

    b, t0, s0 = args.batch, args.frames, args.image_size
    dtype = jnp.bfloat16

    def walk(encoder: bool):
        t, s = t0, s0
        if encoder:
            for spec in parsed.specs:
                yield spec, (t, s, spec.dim_in)
                if spec.layer_type == 'compress_space':
                    s //= 2
                elif spec.layer_type == 'compress_time':
                    t = (t - 1) // 2 + 1
        else:
            shapes = []
            for spec in parsed.specs:
                if spec.layer_type == 'compress_space':
                    s //= 2
                elif spec.layer_type == 'compress_time':
                    t = (t - 1) // 2 + 1
                shapes.append((t, s))
            for spec, (t_, s_) in zip(reversed(parsed.specs),
                                      list(reversed(shapes))):
                yield spec, (t_, s_, spec.dim_out)

    print(f'# per-layer TPU timing, batch {b}, '
          f'backend={jax.default_backend()}')
    print('| side | # | layer | input | ms | GFLOPs | TFLOP/s | % peak |')
    print('|---|---|---|---|---|---|---|---|')
    total_ms = 0.0
    total_fl = 0.0
    sides = ('encoder', 'decoder') if args.side == 'both' else (args.side,)
    for side in sides:
        for spec, (t, s, c) in walk(side == 'encoder'):
            if args.filter and args.filter not in spec.layer_type:
                continue
            mod = _build_layer(spec, config, f'lb_{side}_{spec.index}',
                               encoder=(side == 'encoder'))
            shape = (b, t, s, s, c)
            try:
                x = jnp.zeros(shape, dtype)
                params = mod.init(jax.random.PRNGKey(0), x)
                params = jax.tree.map(
                    lambda a: a.astype(dtype)
                    if a.dtype == jnp.float32 else a, params)
                fl, _ = layer_cost(mod, shape, dtype)
                sec = chain_bench(lambda p, x: mod.apply(p, x), params,
                                  shape, dtype)
            except Exception as e:  # noqa: BLE001
                print(f'SKIP {side} {spec.index} {spec.layer_type}: {e}',
                      file=sys.stderr)
                continue
            tflops = fl / sec / 1e12
            total_ms += sec * 1e3
            total_fl += fl
            print(f'| {side} | {spec.index} | {spec.layer_type} | '
                  f'{t}x{s}x{s}x{c} | {sec * 1e3:.2f} | {fl / 1e9:.1f} | '
                  f'{tflops:.1f} | {100 * tflops * 1e12 / PEAK_FLOPS:.0f} |',
                  flush=True)
    if total_ms == 0:
        raise SystemExit('every layer was skipped (device unavailable?)')
    fps = b * t0 / (total_ms / 1e3)
    print(f'\nlayers-only total: {total_ms:.1f} ms/batch '
          f'({total_fl / 1e9:.0f} GFLOPs, '
          f'{total_fl / (total_ms / 1e3) / 1e12:.1f} TFLOP/s, '
          f'implies {fps:.0f} fps before stem/quantizer)')


if __name__ == '__main__':
    main()
