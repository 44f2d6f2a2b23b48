#!/usr/bin/env python
"""Training-throughput benchmark: full GAN step (generator grad-accum +
adaptive adversarial weight + discriminator w/ R1) on the flagship
README-default config, synthetic in-memory data.

Reports s/step and train-frames/sec/chip. VERDICT round-1 item 5: measured
baseline was 1.27 s/step at (batch 2 x accum 2) with remat=True, ~53
train-frames/sec on one v5e chip.

Usage:
  python tools/train_bench.py --batch 4 --accum 1 --remat dots
  python tools/train_bench.py --profile /tmp/xprof   # also dumps a trace
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

# repo root on sys.path WITHOUT using PYTHONPATH (which, in this image,
# breaks the TPU-tunnel PJRT plugin's registration)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=2)
    parser.add_argument('--accum', type=int, default=2)
    parser.add_argument('--frames', type=int, default=17)
    parser.add_argument('--image-size', type=int, default=128)
    parser.add_argument('--remat', default='true',
                        choices=['true', 'false', 'dots'])
    parser.add_argument('--steps', type=int, default=6)
    parser.add_argument('--no-gan', action='store_true')
    parser.add_argument('--no-vgg', action='store_true')
    parser.add_argument('--profile', default=None)
    parser.add_argument('--lane-pack', default='false',
                        choices=['false', 'encoder', 'true'])
    args = parser.parse_args()

    import jax

    cache_dir = pathlib.Path(__file__).resolve().parent.parent / '.jax_cache'
    jax.config.update('jax_compilation_cache_dir', str(cache_dir))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from magvit2_pytorch_tpu.configs import readme_video_tokenizer_kwargs
    from magvit2_pytorch_tpu.data import cycle
    from magvit2_pytorch_tpu.models import VideoTokenizer
    from magvit2_pytorch_tpu.training.trainer import VideoTokenizerTrainer

    remat = {'true': True, 'false': False, 'dots': 'dots'}[args.remat]

    kwargs = readme_video_tokenizer_kwargs(
        image_size=args.image_size,
        use_gan=not args.no_gan,
        perceptual_loss_weight=0.0 if args.no_vgg else 0.1,
    )
    kwargs['remat'] = remat
    kwargs['lane_pack'] = {'false': False, 'encoder': 'encoder',
                           'true': True}[args.lane_pack]
    model = VideoTokenizer(**kwargs, seed=0)

    def sync():
        # block_until_ready is unreliable through the remote-TPU tunnel
        # (returns before execution drains); force a real host fetch
        leaf = jax.tree.leaves(trainer.model.params)[0]
        float(np.asarray(leaf.reshape(-1)[:1]).astype(np.float32)[0])

    class SyntheticVideos:
        def __init__(self, n=64):
            rng = np.random.default_rng(0)
            self.items = [
                rng.uniform(size=(args.frames, args.image_size,
                                  args.image_size, 3)).astype(np.float32)
                for _ in range(n)]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    trainer = VideoTokenizerTrainer(
        model,
        batch_size=args.batch,
        grad_accum_every=args.accum,
        num_train_steps=args.steps,
        learning_rate=1e-4,
        warmup_steps=10,
        dataset=SyntheticVideos(),
        valid_frac=0.0,
        discr_start_after_step=0,
        apply_gradient_penalty_every=4,
        checkpoints_folder='/tmp/train_bench/ckpts',
        results_folder='/tmp/train_bench/results',
        log_every=10_000,  # keep host sync off the timed path
    )

    dl_iter = cycle(trainer.dataloader)

    # warmup: compile both gen variants (with/without GP cadence — the R1
    # penalty fires every 4th step, so 4 warm steps cover both programs)
    for _ in range(4):
        trainer.train_step(dl_iter)
    sync()

    if args.profile:
        jax.profiler.start_trace(args.profile)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        trainer.train_step(dl_iter)
    sync()
    elapsed = time.perf_counter() - t0

    if args.profile:
        jax.profiler.stop_trace()

    s_per_step = elapsed / args.steps
    frames = args.batch * args.accum * args.frames
    print(json.dumps({
        'metric': 'train_frames_per_sec_per_chip',
        'value': round(frames / s_per_step, 2),
        's_per_step': round(s_per_step, 4),
        'config': f'{args.image_size}px x {args.frames}f batch {args.batch} '
                  f'x accum {args.accum}, remat={args.remat}, '
                  f'gan={not args.no_gan}, vgg={not args.no_vgg}, '
                  f'backend {jax.default_backend()}',
    }))


if __name__ == '__main__':
    main()
