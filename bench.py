#!/usr/bin/env python
"""Benchmark: encode+decode throughput on the flagship (README-default) video
tokenizer — 128px x 17 frames, codebook 1024 (BASELINE.json metric:
frames/sec/chip; north star >= 10k on TPU v5e).

Measurement: chained device-side iterations (each round-trip consumes the
previous reconstruction) with a single final host fetch, timed at two chain
lengths; throughput comes from the SLOPE, which cancels fixed dispatch/tunnel
overhead (~0.5s through the remote-TPU tunnel) and defeats any transport-level
memoization of repeated inputs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import functools
import json
import os
import subprocess
import sys
import time


def _wait_for_tunnel(max_wait=None, probe_timeout=240, retry_sleep=120):
    """Bound the TPU-tunnel failure mode where backend init hangs forever.

    The remote-TPU (axon) relay can be half-dead: the local port accepts
    connections but the device-claim leg never receives a grant, so the
    FIRST jax backend init blocks indefinitely (observed 2026-08-18 — every
    in-process timeout is useless because the hang is inside PJRT client
    creation). Probe device claim in a SUBPROCESS under a timeout and retry
    until `max_wait` (env MAGVIT2_TPU_BENCH_WAIT_S, default 1800s); exit
    with a clear diagnostic instead of hanging the driver if the tunnel
    never comes back. No-op unless the env selects the tunnel backend.
    """
    if 'axon' not in os.environ.get('JAX_PLATFORMS', ''):
        return
    if max_wait is None:
        max_wait = float(os.environ.get('MAGVIT2_TPU_BENCH_WAIT_S', 1800))
    deadline = time.time() + max_wait
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, '-c', 'import jax; jax.devices()'],
                timeout=probe_timeout, capture_output=True, text=True)
            if r.returncode == 0:
                if attempt > 1:
                    print(f'# tunnel back after {attempt} probes',
                          file=sys.stderr)
                return
            detail = (r.stderr or '').strip().splitlines()[-1:]
        except subprocess.TimeoutExpired:
            detail = [f'device claim hung > {probe_timeout}s']
        remaining = deadline - time.time()
        print(f'# TPU tunnel probe {attempt} failed '
              f'({"; ".join(detail) or "unknown"}); '
              f'{remaining:.0f}s before giving up', file=sys.stderr)
        if remaining <= retry_sleep:
            print('# TPU tunnel unreachable — refusing to hang the driver. '
                  'Re-run when the tunnel is restored, or set '
                  'JAX_PLATFORMS=cpu for a (meaningless) CPU number.',
                  file=sys.stderr)
            sys.exit(3)
        time.sleep(retry_sleep)


_wait_for_tunnel()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=128)
    parser.add_argument('--frames', type=int, default=17)
    parser.add_argument('--image-size', type=int, default=128)
    parser.add_argument('--n-short', type=int, default=2)
    parser.add_argument('--n-long', type=int, default=10)
    parser.add_argument('--dtype', default='bfloat16')
    parser.add_argument('--lane-pack', default='false',
                        choices=['false', 'encoder', 'true'])
    args = parser.parse_args()

    from magvit2_pytorch_tpu.configs import readme_video_tokenizer_kwargs
    from magvit2_pytorch_tpu.models import VideoTokenizer

    tok = VideoTokenizer(
        **readme_video_tokenizer_kwargs(
            image_size=args.image_size,
            use_gan=False,
            perceptual_loss_weight=0.0,
            lane_pack={'false': False, 'encoder': 'encoder',
                       'true': True}[args.lane_pack],
        ),
        seed=0,
    )

    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    module = tok.module
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tok.params)

    # donate the input clip buffer — the roundtrip runs within ~1 GB of HBM
    # at batch 128, and the 1.3 GB input is dead after the first iteration
    @functools.partial(jax.jit, donate_argnums=(1,))
    def chained(params, video, n):
        def body(i, v):
            recon, _ = module.apply({'params': params}, v)
            return recon + (1e-6 * i)  # data dependency across iterations
        return jax.lax.fori_loop(0, n, body, video)

    shape = (args.batch, args.frames, args.image_size, args.image_size, 3)
    gen = jax.jit(
        lambda k: jax.random.uniform(k, shape, jnp.float32).astype(dtype))

    def run(n, seed):
        t0 = time.perf_counter()
        out = chained(params, gen(jax.random.PRNGKey(seed)), n)
        float(np.asarray(out[:1, :1, :1, :1]).astype(np.float32).sum())
        return time.perf_counter() - t0

    # the whole measurement doubles as an OOM probe: if the requested batch
    # does not fit (HBM layouts shift release to release), step down and
    # retry so the driver always gets a number. A fused Pallas kernel that
    # fails to lower (Mosaic errors shift release to release too) falls back
    # to the XLA paths via the kill switches rather than killing the bench.
    fused_fallback_done = False
    while True:
        try:
            run(args.n_short, 0)  # compile + warm
            t_short = run(args.n_short, 1)
            t_long = run(args.n_long, 2)
            break
        except Exception as e:  # noqa: BLE001
            # the remote-compile tunnel surfaces HBM OOM as an INTERNAL
            # JaxRuntimeError whose text says "Ran out of memory", not as
            # RESOURCE_EXHAUSTED — match both so OOM steps the batch down
            # instead of being misread as a kernel-compile failure. Pallas
            # VMEM/SMEM exhaustion ("Ran out of memory in memory space
            # vmem") is batch-independent: route it to the fused-kernel
            # fallback, not the batch step-down.
            msg = str(e)
            is_kernel_oom = ('memory space vmem' in msg
                             or 'memory space smem' in msg
                             or 'VMEM' in msg)
            is_oom = (not is_kernel_oom
                      and ('RESOURCE_EXHAUSTED' in msg
                           or 'Ran out of memory' in msg
                           or 'Exceeded hbm capacity' in msg))
            if is_oom and not os.environ.get('MAGVIT2_TPU_BENCH_OOM_RETRY'):
                # FIRST HBM OOM: before conceding batch size, retry once at
                # the SAME batch with every fused-kernel kill switch set — a
                # kernel whose custom-call boundary forces layout copies can
                # OOM a batch the plain XLA path fits (exactly the r4
                # failure: wide fused-RU default OOM'd batch 128 while the
                # kill-switch path ran it at 1532 fps). Fresh process because
                # a real HBM OOM poisons the tunnel runtime.
                print('# HBM OOM: retrying same batch with fused Pallas '
                      'kernels disabled before stepping batch down',
                      file=sys.stderr)
                sys.stderr.flush()
                os.environ['MAGVIT2_TPU_BENCH_OOM_RETRY'] = '1'
                for kill in ('MAGVIT2_TPU_NO_FUSED_ATTN',
                             'MAGVIT2_TPU_NO_FUSED_RU',
                             'MAGVIT2_TPU_NO_FUSED_RU_WIDE',
                             'MAGVIT2_TPU_NO_FUSED_RU_W64'):
                    os.environ[kill] = '1'
                os.execv(sys.executable, [
                    sys.executable, os.path.abspath(__file__),
                    '--batch', str(args.batch),
                    '--frames', str(args.frames),
                    '--image-size', str(args.image_size),
                    '--n-short', str(args.n_short),
                    '--n-long', str(args.n_long),
                    '--dtype', args.dtype,
                    '--lane-pack', args.lane_pack,
                ])
            if is_oom and args.batch > 8:
                # after a real HBM OOM the tunnel runtime can stay poisoned
                # (every later allocation fails too, observed 2026-08-19:
                # a genuine batch-128 OOM cascaded failures down to batch 8)
                # — re-exec in a FRESH process instead of retrying in this one
                new_batch = max(8, args.batch * 3 // 4 // 8 * 8)
                print(f'# OOM, re-executing with batch {new_batch}',
                      file=sys.stderr)
                sys.stderr.flush()
                os.execv(sys.executable, [
                    sys.executable, os.path.abspath(__file__),
                    '--batch', str(new_batch),
                    '--frames', str(args.frames),
                    '--image-size', str(args.image_size),
                    '--n-short', str(args.n_short),
                    '--n-long', str(args.n_long),
                    '--dtype', args.dtype,
                    '--lane-pack', args.lane_pack,
                ])
            if not fused_fallback_done:
                fused_fallback_done = True
                print(f'# compile/run failed ({type(e).__name__}); '
                      'disabling fused Pallas kernels and retrying',
                      file=sys.stderr)
                os.environ['MAGVIT2_TPU_NO_FUSED_ATTN'] = '1'
                os.environ['MAGVIT2_TPU_NO_FUSED_RU'] = '1'
                jax.clear_caches()  # gates are read at trace time
                continue
            raise

    per_iter = (t_long - t_short) / (args.n_long - args.n_short)
    fps = args.batch * args.frames / per_iter

    result = {
        'metric': 'encode_decode_frames_per_sec_per_chip',
        'value': round(fps, 2),
        'unit': f'frames/sec/chip @{args.image_size}px x {args.frames}f '
                f'({args.dtype}, batch {args.batch}, backend '
                f'{jax.default_backend()})',
        'vs_baseline': round(fps / 10_000.0, 4),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    sys.exit(main())
