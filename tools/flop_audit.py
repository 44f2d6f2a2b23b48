#!/usr/bin/env python
"""Per-layer FLOP/byte audit of the flagship (README) tokenizer.

Backs the perf-ceiling claim in STATUS.md with evidence instead of assertion
(VERDICT round 1, weak #1): for every encoder/decoder layer, compile the layer
standalone at its true activation shape and read XLA's own cost model
(``compiled.cost_analysis()``) — FLOPs and bytes accessed — then report the
roofline ceiling those numbers imply for one TPU chip.

Usage: python tools/flop_audit.py [--batch 1] [--image-size 128] [--frames 17]
Prints a markdown table (paste into STATUS.md) and totals.
"""

import argparse
import pathlib
import sys

# repo root on sys.path WITHOUT PYTHONPATH (PYTHONPATH breaks the TPU-tunnel
# PJRT plugin registration in this image)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

# v5e per-chip peaks (public spec): 197 bf16 TFLOPS, 819 GB/s HBM
PEAK_FLOPS = 197e12
PEAK_BYTES = 819e9


def layer_cost(module, shape, dtype=jnp.bfloat16, extra_kwargs=None):
    """Compile `module.apply` standalone at `shape`; return XLA's cost."""
    x = jnp.zeros(shape, dtype)
    params = module.init(jax.random.PRNGKey(0), x, **(extra_kwargs or {}))
    fn = jax.jit(lambda p, x: module.apply(p, x, **(extra_kwargs or {})))
    compiled = fn.lower(params, x).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return float(cost.get('flops', 0.0)), float(
        cost.get('bytes accessed', 0.0))


def full_cost(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get('flops', 0.0)), float(
        cost.get('bytes accessed', 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=1)
    ap.add_argument('--image-size', type=int, default=128)
    ap.add_argument('--frames', type=int, default=17)
    args = ap.parse_args()

    from magvit2_pytorch_tpu.configs import readme_video_tokenizer_kwargs
    from magvit2_pytorch_tpu.models import VideoTokenizer
    from magvit2_pytorch_tpu.models.tokenizer_module import (
        TokenizerConfig, _build_layer)

    kwargs = readme_video_tokenizer_kwargs(
        image_size=args.image_size, use_gan=False,
        perceptual_loss_weight=0.0)
    tok = VideoTokenizer(**kwargs, seed=0)
    config: TokenizerConfig = tok.module.config
    parsed = config.parsed()

    b, t0, s0 = args.batch, args.frames, args.image_size

    rows = []

    def walk(encoder: bool):
        """Yield (spec, (t, s, c_in)) input shapes along the data path."""
        t, s = t0, s0
        if encoder:
            for spec in parsed.specs:
                yield spec, (t, s, spec.dim_in)
                if spec.layer_type == 'compress_space':
                    s //= 2
                elif spec.layer_type == 'compress_time':
                    t = (t - 1) // 2 + 1
        else:
            # decoder runs the reversed stack at the *downsampled* entry
            # shapes; replay the encoder walk to find each layer's output
            # (t, s), which is the decoder layer's input
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

    for side in ('encoder', 'decoder'):
        for spec, (t, s, c) in walk(side == 'encoder'):
            mod = _build_layer(spec, config, f'audit_{side}_{spec.index}',
                               encoder=(side == 'encoder'))
            shape = (b, t, s, s, c)
            try:
                fl, by = layer_cost(mod, shape)
            except Exception as e:  # noqa: BLE001
                print(f'SKIP {side} {spec.index} {spec.layer_type}: {e}',
                      file=sys.stderr)
                continue
            rows.append((side, spec.index, spec.layer_type,
                         f'{t}x{s}x{s}x{c}', fl, by))

    # whole-model encode+decode for the ground-truth total
    dtype = jnp.bfloat16
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        tok.params)
    video = jnp.zeros((b, t0, s0, s0, 3), dtype)
    total_fl, total_by = full_cost(
        lambda p, v: tok.module.apply({'params': p}, v)[0], params, video)

    layers_fl = sum(r[4] for r in rows)
    layers_by = sum(r[5] for r in rows)

    print(f'\n## FLOP audit — flagship config @{s0}px x {t0}f, batch {b} '
          f'(XLA cost model, backend={jax.default_backend()})\n')
    print('| side | # | layer | input (t,h,w,c) | GFLOPs | MB accessed | '
          'FLOP/byte |')
    print('|---|---|---|---|---|---|---|')
    for side, idx, lt, shape, fl, by in rows:
        print(f'| {side} | {idx} | {lt} | {shape} | {fl / 1e9:.2f} | '
              f'{by / 1e6:.1f} | {fl / max(by, 1):.1f} |')
    print(f'\nlayers sum: {layers_fl / 1e12:.3f} TFLOPs, '
          f'{layers_by / 1e9:.2f} GB')
    print(f'full encode+decode (XLA): {total_fl / 1e12:.3f} TFLOPs, '
          f'{total_by / 1e9:.2f} GB '
          f'(stem+quantizer+glue = {(total_fl - layers_fl) / 1e9:.1f} GFLOPs)')

    clip_fl = total_fl / b
    clip_by = total_by / b
    fps_compute = PEAK_FLOPS / clip_fl * t0
    fps_memory = PEAK_BYTES / clip_by * t0
    print(f'\nper-clip: {clip_fl / 1e12:.3f} TFLOPs, {clip_by / 1e9:.2f} GB, '
          f'intensity {clip_fl / clip_by:.0f} FLOP/byte')
    print(f'v5e naive rooflines: compute {fps_compute:.0f} fps, '
          f'cost-model-bytes {fps_memory:.0f} fps (the XLA bytes number '
          f'counts per-HLO operands, NOT fused HBM traffic — an upper '
          f'bound on bytes, so a LOWER bound on the memory roofline)')

    # honest per-layer mixed roofline: each layer's floor is
    # max(FLOPs/peak_flops, minimal-HBM-bytes/peak_bw), where minimal bytes
    # = read input once + write output once in bf16 (perfect fusion). This
    # is the speed-of-light for THIS architecture on one chip — stricter
    # than the all-compute ceiling for the low-intensity layers.
    floor_s = 0.0
    for side, idx, lt, shape, fl, by in rows:
        t_, h_, w_, c_ = (int(v) for v in shape.replace('x', ' ').split())
        act_bytes = 2 * (b * t_ * h_ * w_ * c_) * 2  # in + out, bf16
        floor_s += max(fl / PEAK_FLOPS, act_bytes / PEAK_BYTES)
    stem_fl = total_fl - layers_fl
    floor_s += stem_fl / PEAK_FLOPS
    fps_honest = b * t0 / floor_s
    print(f'honest per-layer mixed roofline (perfect fusion, in+out bytes): '
          f'{fps_honest:.0f} fps ceiling')


if __name__ == '__main__':
    main()
