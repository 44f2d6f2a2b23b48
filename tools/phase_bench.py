#!/usr/bin/env python
"""In-context phase timing at the DRIVER batch: encode / quantize / decode.

The per-layer (tools/layer_bench.py, batch 8) and stem (tools/stem_bench.py)
standalone numbers do not reproduce the batch-128 in-context split — XLA
fuses and schedules differently inside the full program. This times the
three phases of the flagship roundtrip as separately-jitted programs at the
bench batch, plus the whole roundtrip, so the residue (fusion benefit /
boundary cost) is visible.

Usage: python tools/phase_bench.py [--batch 128]
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


def slope(fn, x0, params, n_s=2, n_l=10):
    """Chained slope timing; fn must map (x, params) to a same-shaped out.
    params MUST be an explicit argument — a closure would embed ~600 MB of
    device arrays as MLIR constants, and fetching them through the remote
    tunnel during lowering dies with RESOURCE_EXHAUSTED."""
    @jax.jit
    def chained(n, x, p):
        def body(i, v):
            return fn(v, p).reshape(v.shape).astype(v.dtype) * (1.0 + 1e-7 * i)
        return jax.lax.fori_loop(0, n, body, x)

    def run(n):
        t0 = time.perf_counter()
        out = chained(n, x0, params)
        float(np.asarray(out.reshape(-1)[:1]).astype(np.float32).sum())
        return time.perf_counter() - t0

    run(n_s)
    ts = min(run(n_s), run(n_s))
    tl = min(run(n_l), run(n_l))
    return (tl - ts) / (n_l - n_s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--frames', type=int, default=17)
    ap.add_argument('--image-size', type=int, default=128)
    ap.add_argument('--lane-pack', default='false',
                    choices=['false', 'encoder', 'true'])
    ap.add_argument('--phase', default='all',
                    choices=['all', 'encode', 'quantize', 'decode',
                             'roundtrip'],
                    help='time one phase only (own process: at batch 128 '
                         'holding all four jitted programs OOMs the chip)')
    args = ap.parse_args()

    from magvit2_pytorch_tpu.configs import readme_video_tokenizer_kwargs
    from magvit2_pytorch_tpu.models import VideoTokenizer
    from magvit2_pytorch_tpu.models.tokenizer_module import TokenizerModule

    tok = VideoTokenizer(**readme_video_tokenizer_kwargs(
        use_gan=False, perceptual_loss_weight=0.0,
        lane_pack={'false': False, 'encoder': 'encoder',
                   'true': True}[args.lane_pack]), seed=0)
    module = tok.module
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        tok.params)

    B, T, S = args.batch, args.frames, args.image_size
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.uniform(size=(B, T, S, S, 3)), jnp.bfloat16)

    # encode: video -> latents (pad video back out of the latents for the
    # chained same-shape contract via a cheap broadcast hack)
    def enc(v, p):
        lat = module.apply({'params': p}, v,
                           method=TokenizerModule.encode)
        return jnp.broadcast_to(
            lat.astype(jnp.float32).mean() * 1e-6, v.shape).astype(v.dtype) + v

    lat = jax.jit(lambda v, p: module.apply(
        {'params': p}, v, method=TokenizerModule.encode))(video, params)
    print(f'# latents {lat.shape}', flush=True)

    def quant(l, p):
        q = module.apply({'params': p}, l,
                         method=TokenizerModule.quantize)
        return q.quantized

    def dec(l, p):
        recon = module.apply({'params': p}, l,
                             method=TokenizerModule.decode)
        return jnp.broadcast_to(
            recon.astype(jnp.float32).mean() * 1e-6, l.shape).astype(
                l.dtype) + l

    def roundtrip(v, p):
        recon, _ = module.apply({'params': p}, v)
        return recon

    want = args.phase
    if want in ('all', 'encode'):
        print(f'encode   : {slope(enc, video, params)*1e3:8.1f} ms',
              flush=True)
    if want in ('all', 'quantize'):
        print(f'quantize : {slope(quant, lat, params)*1e3:8.1f} ms',
              flush=True)
    if want in ('all', 'decode'):
        print(f'decode   : {slope(dec, lat, params)*1e3:8.1f} ms',
              flush=True)
    if want in ('all', 'roundtrip'):
        t_rt = slope(roundtrip, video, params)
        print(f'roundtrip: {t_rt*1e3:8.1f} ms  ({B * T / t_rt:.1f} '
              f'frames/sec)', flush=True)


if __name__ == '__main__':
    main()
