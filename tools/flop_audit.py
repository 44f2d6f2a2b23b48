#!/usr/bin/env python
"""Audited roofline for the flagship (README-default) tokenizer.

Round-1 verdict: the ~2.2k fps/chip ceiling claim was asserted, not shown.
This tool derives it from XLA's own cost model: lower + compile the
encode->quantize->decode round trip (and each encoder/decoder layer
separately), read ``compile().cost_analysis()`` (flops / bytes accessed), and
compute the v5e roofline time per component:

    t_component = max(flops / PEAK_FLOPS, bytes / HBM_BW)

Peak numbers (TPU v5e, public spec): 197 TFLOP/s bf16, 819 GB/s HBM.

Usage:  python tools/flop_audit.py [--batch 32] [--backend cpu|tpu]
The audit writes a markdown table to stdout (pasted into STATUS.md).
"""

from __future__ import annotations

import argparse

PEAK_FLOPS = 197e12     # bf16 MXU, v5e
HBM_BW = 819e9          # bytes/sec, v5e


def cost(fn, *args):
    import jax
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    flops = float(c.get('flops', 0.0))
    bytes_accessed = float(c.get('bytes accessed', 0.0))
    return flops, bytes_accessed


def roofline(flops, bytes_accessed):
    t_flops = flops / PEAK_FLOPS
    t_bytes = bytes_accessed / HBM_BW
    return max(t_flops, t_bytes), t_flops, t_bytes


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=32)
    parser.add_argument('--frames', type=int, default=17)
    parser.add_argument('--image-size', type=int, default=128)
    parser.add_argument('--dtype', default='bfloat16')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from magvit2_pytorch_tpu.configs import readme_video_tokenizer_kwargs
    from magvit2_pytorch_tpu.models import VideoTokenizer
    from magvit2_pytorch_tpu.models.tokenizer_module import TokenizerModule

    tok = VideoTokenizer(**readme_video_tokenizer_kwargs(
        image_size=args.image_size, use_gan=False, perceptual_loss_weight=0.0),
        seed=0)
    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    module = tok.module
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tok.params)

    b, t, s = args.batch, args.frames, args.image_size
    video = jnp.zeros((b, t, s, s, 3), dtype)

    # ---- whole round trip -------------------------------------------------
    def roundtrip(params, v):
        recon, qout = module.apply({'params': params}, v)
        return recon, qout.indices

    fl, by = cost(roundtrip, params, video)
    t_roof, t_f, t_b = roofline(fl, by)
    frames_total = b * t
    print(f'## FLOP audit — {s}px x {t}f, batch {b}, {args.dtype} '
          f'(XLA cost model, backend={jax.default_backend()})\n')
    print(f'| component | GFLOPs | GB moved | intensity (flop/B) | '
          f'roofline ms | bound |')
    print('|---|---|---|---|---|---|')

    def row(name, fl, by):
        t_roof, t_f, t_b = roofline(fl, by)
        bound = 'compute' if t_f >= t_b else 'memory'
        inten = fl / max(by, 1)
        print(f'| {name} | {fl / 1e9:.1f} | {by / 1e9:.3f} | {inten:.0f} | '
              f'{t_roof * 1e3:.2f} | {bound} |')
        return t_roof

    total_roof = row('roundtrip (whole program)', fl, by)
    ceiling = frames_total / total_roof
    print(f'\nwhole-program roofline ceiling: **{ceiling:,.0f} frames/sec/chip'
          f'** (compute-bound share {t_f / t_roof:.0%})\n')

    # ---- per stage: encoder layers with their true input shapes ----------
    print('per-layer breakdown (encode path then decode path):\n')
    print('| layer | in shape | GFLOPs | GB | roofline ms |')
    print('|---|---|---|---|---|')

    parsed = tok.config.parsed()
    tp = tok.time_padding

    def run_layer(method_name, layer_idx, x):
        def f(params, x):
            return module.apply(
                {'params': params}, x, layer_idx,
                method=getattr(TokenizerModule, method_name))
        return cost(f, params, x)

    # encode: conv_in then each layer
    x = jnp.zeros((b, t + tp, s, s, 3), dtype)

    def conv_in_fn(params, x):
        return module.apply({'params': params}, x,
                            method=lambda m, v: m.conv_in(v))
    fl, by = cost(conv_in_fn, params, x)
    sum_roof = row(f'conv_in {tuple(x.shape)}', fl, by)

    # trace shapes on a batch-1 run (cheap), then scale the batch dim
    shapes1 = module.apply(
        {'params': params}, jnp.zeros((1, t, s, s, 3), dtype),
        method=TokenizerModule.trace_shapes)
    shapes = [(tuple([b, *e[1:]]), tuple([b, *d[1:]])) for e, d in shapes1]
    for spec, (enc_shape, dec_shape) in zip(parsed.specs, shapes):
        enc_x = jnp.zeros(enc_shape, dtype)

        def enc_fn(params, xx, _i=spec.index):
            return module.apply({'params': params}, xx, _i,
                                method=TokenizerModule.apply_encoder_layer)
        fl, by = cost(enc_fn, params, enc_x)
        sum_roof += row(f'enc[{spec.index}] {spec.layer_type} '
                        f'{tuple(enc_shape)}', fl, by)

    for spec, (enc_shape, dec_shape) in reversed(
            list(zip(parsed.specs, shapes))):
        dec_x = jnp.zeros(dec_shape, dtype)

        def dec_fn(params, xx, _i=spec.index):
            return module.apply({'params': params}, xx, _i,
                                method=TokenizerModule.apply_decoder_layer)
        fl, by = cost(dec_fn, params, dec_x)
        sum_roof += row(f'dec[{spec.index}] {spec.layer_type} '
                        f'{tuple(dec_shape)}', fl, by)

    def conv_out_fn(params, x):
        return module.apply({'params': params}, x,
                            method=lambda m, v: m.conv_out(v))
    x_out = jnp.zeros((b, t + tp, s, s, 64), dtype)
    fl, by = cost(conv_out_fn, params, x_out)
    sum_roof += row(f'conv_out {tuple(x_out.shape)}', fl, by)

    print(f'\nsum of per-layer rooflines: {sum_roof * 1e3:.2f} ms '
          f'-> {frames_total / sum_roof:,.0f} frames/sec/chip ceiling')


if __name__ == '__main__':
    main()
