#!/usr/bin/env python
"""Convergence evidence: train BASELINE config 1 and record the curves.

Round-3 review weak #5: every training test asserts finiteness over <=4
steps; nothing showed losses actually improving. This trains the images-mode
64px LFQ-512 tokenizer (BASELINE config 1) on procedural textures for a few
hundred steps and records recon loss, validation PSNR, and codebook
utilization every ``--every`` steps to results/convergence_config1.json
(plus a markdown table on stdout).

The dataset is the procedural texture family from tools/codebook_probe.py —
structured (oriented sinusoids + blobs), not noise, so reconstruction is
learnable and codes must specialize.

Usage: python tools/convergence_run.py [--steps 400] [--batch 32]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from codebook_probe import _ImageDataset, _textures  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=400)
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--every', type=int, default=25)
    ap.add_argument('--train-items', type=int, default=512)
    ap.add_argument('--probe', type=int, default=64)
    ap.add_argument('--lr', type=float, default=3e-4)
    ap.add_argument(
        '--inv-temperature', type=float, default=None,
        help='override lfq_entropy_inv_temperature (parity default 100 '
             'saturates the diversity gradient — see tokenizer_module.py '
             'config comment; ~4-10 keeps it alive)')
    ap.add_argument('--out', default='results/convergence_config1.json')
    args = ap.parse_args()

    from magvit2_pytorch_tpu.configs import images_mode_tokenizer_kwargs
    from magvit2_pytorch_tpu.data import cycle
    from magvit2_pytorch_tpu.models import VideoTokenizer
    from magvit2_pytorch_tpu.training.metrics import (
        codebook_utilization, psnr)
    from magvit2_pytorch_tpu.training.trainer import VideoTokenizerTrainer

    print(f'# convergence — BASELINE config 1 (images 64px, LFQ-512), '
          f'{args.steps} steps, batch {args.batch}, lr {args.lr}, '
          f'backend={jax.default_backend()}', flush=True)

    overrides = {}
    if args.inv_temperature is not None:
        overrides['lfq_entropy_inv_temperature'] = args.inv_temperature
    tok = VideoTokenizer(**images_mode_tokenizer_kwargs(**overrides), seed=0)
    size = tok.config.image_size
    data = _textures(args.train_items, size, seed=1)
    probe = jnp.asarray(_textures(args.probe, size, seed=2)[:, None])

    trainer = VideoTokenizerTrainer(
        tok, batch_size=args.batch, num_train_steps=args.steps,
        learning_rate=args.lr, warmup_steps=20,
        dataset=_ImageDataset(data), dataset_type='images', valid_frac=0.0,
        use_wandb_tracking=False, log_every=10 ** 9)

    @jax.jit
    def probe_metrics(params):
        recon, qout = tok.module.apply({'params': params}, probe)
        return (jnp.mean((recon - probe) ** 2), psnr(probe, jnp.clip(recon, 0, 1)),
                qout.indices)

    K = tok.codebook_size
    curves = []
    it = cycle(trainer.dataloader)
    t_last = time.perf_counter()
    recon_tr = float('nan')
    for step in range(args.steps + 1):
        if step % args.every == 0:
            mse, p, codes = probe_metrics(tok.params)
            util = float(codebook_utilization(
                jnp.asarray(np.asarray(codes).reshape(-1)), K))
            dt = (time.perf_counter() - t_last) / max(args.every, 1) * 1e3
            row = dict(step=step,
                       train_recon=(float(recon_tr)
                                    if np.isfinite(recon_tr) else None),
                       valid_mse=float(mse), valid_psnr=float(p),
                       codebook_utilization=util, ms_per_step=round(dt, 1))
            curves.append(row)
            print(f"| {step} | {float(recon_tr):.4f} | "
                  f"{row['valid_mse']:.4f} | {row['valid_psnr']:.2f} | "
                  f"{util:.3f} | {dt:.0f} |", flush=True)
            t_last = time.perf_counter()
        if step == args.steps:
            break
        m = trainer.train_step(it)
        recon_tr = float(m['recon_loss'])

    out = pathlib.Path(__file__).resolve().parent.parent / args.out
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(dict(
        config='baseline_config1_images64_lfq512',
        steps=args.steps, batch=args.batch, lr=args.lr,
        inv_temperature=args.inv_temperature,
        backend=jax.default_backend(), curves=curves), indent=1))
    print(f'# wrote {out}')

    first, last = curves[0], curves[-1]
    assert last['valid_mse'] < first['valid_mse'], (
        'validation MSE did not improve')
    print(f"# PSNR {first['valid_psnr']:.2f} -> {last['valid_psnr']:.2f} dB; "
          f"utilization {first['codebook_utilization']:.3f} -> "
          f"{last['codebook_utilization']:.3f}")


if __name__ == '__main__':
    main()
