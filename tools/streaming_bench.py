#!/usr/bin/env python
"""Streaming performance for BASELINE config 5 (256px x 65f chunked).

Round-3 review #7: streaming had correctness tests but no performance story.
This measures, on the attached backend:

1. config 5 as specified (conv/gateloop-free pure causal-conv stack):
   per-chunk encode and decode latency, end-to-end streamed frames/sec, and
   steady-state device memory — vs the whole-clip pass for reference.
2. the kv_window bound (needs a time-attention layer, so a config-5 variant
   with 'attend_time'): per-chunk latency and HBM growth over a LONG stream
   (4x the nominal clip) with kv_window unset vs kv_window=16 — the
   unbounded kv cache grows linearly AND recompiles at every new cache
   shape (~20 s/chunk through the tunnel compiler), while the bounded one
   reaches a fixed cache shape after the window fills: steady sub-ms
   chunks, constant memory.

Usage: python tools/streaming_bench.py [--frames 65] [--long-frames 257]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def device_mb():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get('bytes_in_use', 0) / 1e6
    except Exception:  # pragma: no cover - not all backends expose stats
        return float('nan')


def fetch(out):
    """Force a REAL host fetch: through the remote-TPU tunnel,
    block_until_ready can return before execution finishes (observed:
    '65 frames in 7 ms'); fetching one scalar waits for every enqueued
    program (device programs execute in order)."""
    return float(np.asarray(out).reshape(-1)[:1].astype(np.float32).sum())


def time_chunks(session_fn, chunks):
    """Per-chunk wall latency; first call of each shape compiles."""
    lat = []
    for c in chunks:
        t0 = time.perf_counter()
        fetch(session_fn(c))
        lat.append(time.perf_counter() - t0)
    return lat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=65)
    ap.add_argument('--long-frames', type=int, default=257)
    ap.add_argument('--image-size', type=int, default=256)
    ap.add_argument('--chunk', type=int, default=16)
    ap.add_argument('--batch', type=int, default=1)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--skip-kv-demo', action='store_true')
    args = ap.parse_args()

    from magvit2_pytorch_tpu.configs import streaming_video_tokenizer_kwargs
    from magvit2_pytorch_tpu.models import VideoTokenizer
    from magvit2_pytorch_tpu.models.streaming import StreamingSession

    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    print(f'# streaming bench — config 5, {args.image_size}px x '
          f'{args.frames}f, chunk {args.chunk}, batch {args.batch}, '
          f'{args.dtype}, backend={jax.default_backend()}', flush=True)

    tok = VideoTokenizer(**streaming_video_tokenizer_kwargs(
        image_size=args.image_size, use_gan=False,
        perceptual_loss_weight=0.0), seed=0)
    tok.params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        tok.params)

    rng = np.random.default_rng(0)
    tdf = tok.time_downsample_factor
    s = args.image_size

    def make_chunks(total_frames):
        video = rng.uniform(size=(
            args.batch, total_frames, s, s, 3)).astype(np.float32)
        video = jnp.asarray(video, dtype)
        chunks = [video[:, :1 + args.chunk]]
        t = 1 + args.chunk
        while t < total_frames:
            chunks.append(video[:, t:t + args.chunk])
            t += args.chunk
        return video, chunks

    assert (args.frames - 1) % args.chunk == 0 and args.chunk % tdf == 0

    # ---- 1) config-5 chunked encode/decode --------------------------------
    video, chunks = make_chunks(args.frames)
    # warm: run one full stream to compile every chunk shape
    sess = StreamingSession(tok)
    codes = [sess.encode_chunk(c) for c in chunks]
    fetch(codes[-1])
    dec_warm = [sess.decode_chunk(c) for c in codes]
    fetch(dec_warm[-1])

    sess2 = StreamingSession(tok)
    sess2._jit_cache = sess._jit_cache  # reuse compiles
    enc_lat = time_chunks(sess2.encode_chunk, chunks)
    sess3 = StreamingSession(tok)
    sess3._jit_cache = sess._jit_cache
    codes = [sess3.encode_chunk(c) for c in chunks]
    fetch(codes[-1])
    dec_lat = time_chunks(sess3.decode_chunk, codes)

    total = sum(enc_lat) + sum(dec_lat)
    fps = args.batch * args.frames / total
    print(f'encode per-chunk ms: first {enc_lat[0]*1e3:.1f}, steady '
          f'{np.mean(enc_lat[1:])*1e3:.1f}')
    print(f'decode per-chunk ms: first {dec_lat[0]*1e3:.1f}, steady '
          f'{np.mean(dec_lat[1:])*1e3:.1f}')
    print(f'streamed encode+decode: {fps:.1f} frames/sec '
          f'({args.frames} frames in {total*1e3:.0f} ms)')
    print(f'device memory in use: {device_mb():.0f} MB')

    # whole-clip reference (memory + speed)
    @jax.jit
    def roundtrip(params, v):
        recon, _ = tok.module.apply({'params': params}, v)
        return recon

    fetch(roundtrip(tok.params, video))
    t0 = time.perf_counter()
    fetch(roundtrip(tok.params, video * (1.0 + 1e-6)))
    t_clip = time.perf_counter() - t0
    print(f'whole-clip roundtrip: {args.batch*args.frames/t_clip:.1f} '
          f'frames/sec; device memory {device_mb():.0f} MB')

    if args.skip_kv_demo:
        return

    # ---- 2) kv_window bound on a long stream ------------------------------
    # config-5 variant with causal time attention at the deepest stage
    print(f'\n# kv_window demo — attend_time variant, '
          f'{args.long_frames} frames', flush=True)
    base = streaming_video_tokenizer_kwargs(
        image_size=args.image_size, use_gan=False,
        perceptual_loss_weight=0.0)
    base['layers'] = base['layers'] + ('attend_time',)
    for kv_window in (None, 16):
        tok2 = VideoTokenizer(**base, streaming_kv_window=kv_window,
                              seed=0)
        tok2.params = jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
            tok2.params)
        video, chunks = make_chunks(args.long_frames)
        sess = StreamingSession(tok2)
        lat = []
        mem = []
        for c in chunks:
            t0 = time.perf_counter()
            fetch(sess.encode_chunk(c))
            lat.append(time.perf_counter() - t0)
            mem.append(device_mb())
        n = len(lat)
        print(f'kv_window={kv_window}: chunk latency ms '
              f'[1]={lat[1]*1e3:.1f} [{n//2}]={lat[n//2]*1e3:.1f} '
              f'[{n-1}]={lat[-1]*1e3:.1f} | device MB '
              f'[1]={mem[1]:.0f} [{n//2}]={mem[n//2]:.0f} '
              f'[{n-1}]={mem[-1]:.0f}', flush=True)
        del sess, tok2


if __name__ == '__main__':
    main()
