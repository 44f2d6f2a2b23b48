"""Worker for tests/test_multiprocess.py — one JAX process of a simulated
2-host pod (2 virtual CPU devices per process, gloo collectives).

Exercises the full multi-host trainer path: sharded DataLoader (each process
decodes its own chunk), `jax.make_array_from_process_local_data` batch
assembly over a ('dcn', 'data') mesh, SPMD GAN train steps, all-process
validation (globally-sharded forward + replicated fetch), and a coordinated
multi-host Orbax checkpoint save/restore.

Usage: python mp_worker.py <process_id> <num_processes> <port> <workdir>
"""

import sys

pid, nproc, port, workdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])

# must run before any JAX backend use (flips platform to cpu x2 + gloo)
from magvit2_pytorch_tpu.parallel import initialize_distributed  # noqa: E402

initialize_distributed(
    coordinator_address=f'localhost:{port}',
    num_processes=nproc,
    process_id=pid,
    cpu_devices_per_process=2,
)

import jax  # noqa: E402
import numpy as np  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()

from magvit2_pytorch_tpu.data import cycle  # noqa: E402
from magvit2_pytorch_tpu.models import VideoTokenizer  # noqa: E402
from magvit2_pytorch_tpu.parallel import make_mesh  # noqa: E402
from magvit2_pytorch_tpu.training.trainer import (  # noqa: E402
    VideoTokenizerTrainer,
)

# dcn = process axis (cross-host), data = intra-host devices
mesh = make_mesh(data=2, dcn=nproc)
assert mesh.axis_names == ('dcn', 'data', 'tensor')

model = VideoTokenizer(
    image_size=16,
    init_dim=8,
    codebook_size=64,
    layers=('residual', ('compress_space', 12)),
    use_gan=True,
    discr_kwargs=dict(dim=8, image_size=16, channels=3, max_dim=16),
    perceptual_loss_weight=0.0,
    seed=0,
)


class SyntheticVideos:
    def __init__(self, n=16):
        rng = np.random.default_rng(0)
        self.items = rng.uniform(size=(n, 3, 16, 16, 3)).astype(np.float32)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


trainer = VideoTokenizerTrainer(
    model,
    batch_size=2 * nproc,          # global batch: one clip per device
    num_train_steps=2,
    learning_rate=1e-4,
    warmup_steps=1,
    dataset=SyntheticVideos(),
    valid_frac=0.0,
    discr_start_after_step=0,      # full GAN step incl. R1 from step 0
    validate_every_step=2,
    checkpoint_every_step=1,
    checkpoints_folder=f'{workdir}/ckpts',
    results_folder=f'{workdir}/results',
    mesh=mesh,
)

dl_iter = cycle(trainer.dataloader)
metrics0 = trainer.train_step(dl_iter)
metrics1 = trainer.train_step(dl_iter)
for m in (metrics0, metrics1):
    assert np.isfinite(float(m['total_loss'])), m
    assert np.isfinite(float(m['discr_loss'])), m

# all-process validation over a globally-sharded batch
recon_loss, ema_recon_loss = trainer.valid_step(
    cycle(trainer.valid_dataloader), save_recons=True)
assert np.isfinite(recon_loss) and np.isfinite(ema_recon_loss)

# coordinated multi-host Orbax save + restore round-trip
trainer.save(f'{workdir}/ckpts/checkpoint.final')
step_before = trainer.step
trainer.load(f'{workdir}/ckpts/checkpoint.final')
assert trainer.step == step_before

# loss must be identical across processes (same SPMD program + global batch)
print(f'MP_OK pid={pid} total_loss={float(metrics1["total_loss"]):.6f} '
      f'recon={recon_loss:.6f}', flush=True)
