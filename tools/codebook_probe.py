#!/usr/bin/env python
"""Does the 2^18 LFQ codebook stay healthy under the factorized entropy loss?

Round-2 review weak #7: for codebooks > 4096 the diversity term uses per-bit
marginal entropy (ops/quantizers.py factorized path) — marginals can look
perfect while the joint code distribution collapses. This probe trains the
BASELINE config-4 tokenizer (256px, 2^18 LFQ, Open-MAGVIT2 scale) for a few
hundred generator steps on procedurally textured images and tracks, on a
fixed probe set:

  - batch code entropy (nats, normalized by log K)
  - per-bit marginal entropy (what the surrogate optimizes)
  - unique codes in the probe batch + cumulative unique codes ever emitted

Collapse signature: normalized entropy falling / unique counts shrinking
while the per-bit marginals stay high. Healthy: entropy ~flat or rising,
cumulative uniques growing roughly linearly in draws.

Usage: python tools/codebook_probe.py [--steps 300] [--batch 8] [--probe 64]
"""

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

# honor an explicit JAX_PLATFORMS=cpu: the TPU-tunnel plugin's sitecustomize
# pins jax_platforms='axon,cpu' in CONFIG at interpreter start (config beats
# env), and a half-dead tunnel then hangs backend init forever
if os.environ.get('JAX_PLATFORMS') == 'cpu':
    jax.config.update('jax_platforms', 'cpu')


def _textures(n, size, seed):
    """Procedural images: random mixtures of oriented sinusoids + soft blobs
    (structured enough that codes must specialize; NOT pure noise, which
    would trivially saturate the codebook)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    out = np.empty((n, size, size, 3), np.float32)
    for i in range(n):
        img = np.zeros((size, size, 3), np.float32)
        for _ in range(4):
            f = rng.uniform(2, 24)
            th = rng.uniform(0, np.pi)
            ph = rng.uniform(0, 2 * np.pi)
            col = rng.uniform(0.2, 1.0, size=3).astype(np.float32)
            wave = np.sin(2 * np.pi * f * (np.cos(th) * xx + np.sin(th) * yy)
                          + ph).astype(np.float32)
            img += wave[..., None] * col
        for _ in range(2):
            cx, cy = rng.uniform(0, 1, 2)
            s = rng.uniform(0.02, 0.2)
            blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)))
            img += blob[..., None] * rng.uniform(-1, 1, 3).astype(np.float32)
        lo, hi = img.min(), img.max()
        out[i] = (img - lo) / max(hi - lo, 1e-6)
    return out


class _ImageDataset:
    def __init__(self, arr):
        self.arr = arr

    def __len__(self):
        return len(self.arr)

    def __getitem__(self, i):
        return self.arr[i]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=300)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--probe', type=int, default=64)
    ap.add_argument('--every', type=int, default=25)
    ap.add_argument('--image-size', type=int, default=256)
    ap.add_argument('--train-items', type=int, default=256)
    ap.add_argument('--exact-entropy', action='store_true',
                    help='train with the exact chunk-enumerated diversity '
                         'entropy instead of the per-bit surrogate '
                         '(lfq_exact_codebook_entropy=True)')
    ap.add_argument('--inv-temperature', type=float, default=100.0,
                    help='entropy-loss softmax sharpness (parity default '
                         '100; at 100 the diversity gradient saturates to '
                         'zero once |z| > ~0.05 — try 1-10)')
    args = ap.parse_args()

    from magvit2_pytorch_tpu.configs import open_magvit2_image_tokenizer_kwargs
    from magvit2_pytorch_tpu.data import cycle
    from magvit2_pytorch_tpu.models import VideoTokenizer
    from magvit2_pytorch_tpu.training.metrics import (
        code_entropy, codebook_utilization)
    from magvit2_pytorch_tpu.training.trainer import VideoTokenizerTrainer

    K = 2 ** 18
    print(f'# codebook probe — config 4 (256px, 2^18 LFQ), '
          f'{args.steps} gen steps, batch {args.batch}, '
          f'backend={jax.default_backend()}', flush=True)

    tok = VideoTokenizer(**open_magvit2_image_tokenizer_kwargs(
        image_size=args.image_size,
        use_gan=False, perceptual_loss_weight=0.0,
        lfq_exact_codebook_entropy=args.exact_entropy,
        lfq_entropy_inv_temperature=args.inv_temperature,
    ), seed=0)
    data = _textures(args.train_items, args.image_size, seed=1)
    probe = jnp.asarray(
        _textures(args.probe, args.image_size, seed=2)[:, None])  # (n,1,s,s,3)

    trainer = VideoTokenizerTrainer(
        tok, batch_size=args.batch, num_train_steps=args.steps,
        learning_rate=1e-4, warmup_steps=20,
        dataset=_ImageDataset(data), dataset_type='images', valid_frac=0.0,
        use_wandb_tracking=False, log_every=10 ** 9)

    def probe_codes(params):
        # chunk the probe set so 256px activations stay small
        outs = []
        for i in range(0, args.probe, 8):
            outs.append(np.asarray(
                tok.tokenize(probe[i:i + 8])).reshape(-1))
        return np.concatenate(outs)

    seen = np.zeros(K, bool)
    nbits = 18
    it = cycle(trainer.dataloader)
    print('| step | recon | norm. entropy | mean bit H | probe unique | '
          'cum unique | ms/step |', flush=True)
    print('|---|---|---|---|---|---|---|', flush=True)
    t_last = time.perf_counter()
    for step in range(args.steps + 1):
        if step % args.every == 0:
            codes = probe_codes(tok.params)
            ent = float(code_entropy(jnp.asarray(codes), K)) / np.log(K)
            bits = (codes[:, None] >> np.arange(nbits - 1, -1, -1)) & 1
            pb = bits.mean(axis=0)
            bit_h = float(np.mean(
                -(pb * np.log(np.maximum(pb, 1e-12))
                  + (1 - pb) * np.log(np.maximum(1 - pb, 1e-12)))))
            uniq = len(np.unique(codes))
            seen[codes] = True
            dt = (time.perf_counter() - t_last) / max(args.every, 1) * 1e3
            rl = getattr(main, '_last_recon', float('nan'))
            print(f'| {step} | {rl:.4f} | {ent:.4f} | {bit_h:.4f} | '
                  f'{uniq}/{codes.size} | {int(seen.sum())} | {dt:.0f} |',
                  flush=True)
            t_last = time.perf_counter()
        if step == args.steps:
            break
        m = trainer.train_step(it)
        main._last_recon = float(m['recon_loss'])


if __name__ == '__main__':
    main()
