"""VideoTokenizerTrainer: the full GAN training loop, TPU-native.

Rebuild of reference trainer.py:59-538. The reference's per-step host loop
(zero_grad / micro-batch backward / no_sync / clip / step / EMA-on-rank-0) is
collapsed into TWO jitted SPMD step functions closed over a device mesh:

- generator step: grad-accum via ``lax.scan`` over micro-batches, optax
  update (clip folded into the chain), EMA lerp — one XLA program; the DDP
  allreduce becomes an XLA ``psum`` over the mesh's ICI 'data' axis.
- discriminator step: same shape, including R1 gradient penalty every
  ``apply_gradient_penalty_every`` steps (two compiled variants — the
  penalty flag is static, mirroring trainer.py:406).

Reference semantics preserved: delayed GAN via ``discr_start_after_step``
(trainer.py:203-205,339-342), linear warmup (:159-162), 95/5 random split
seeded 42 (:119-141), validation recon + EMA recon with side-by-side GIF grids
(:452-510), checkpoint/resume of every piece of state (:291-330, via Orbax).

Fixed reference quirks: #3 (EMA device move crash on non-main ranks — EMA is
just a replicated pytree here) and #4 (discr warmup stepping the optimizer
twice — there is no second step).
"""

from __future__ import annotations

import dataclasses
import os
import time
from contextlib import contextmanager
from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from magvit2_pytorch_tpu.data.datasets import (
    DataLoader,
    ImageDataset,
    VideoDataset,
    cycle,
    random_split,
)
from magvit2_pytorch_tpu.data.video_io import video_array_to_gif
from magvit2_pytorch_tpu.models.tokenizer import VideoTokenizer
from magvit2_pytorch_tpu.parallel.mesh import (
    data_parallel_extent,
    data_sharding,
    is_main_process,
    make_mesh,
    replicate,
    replicated_sharding,
)
from magvit2_pytorch_tpu.training.ema import EMAConfig, ema_update
from magvit2_pytorch_tpu.training.losses import (
    discriminator_loss,
    tokenizer_loss,
)
from magvit2_pytorch_tpu.training.optimizer import get_optimizer
from magvit2_pytorch_tpu.utils.helpers import default, exists
from magvit2_pytorch_tpu.utils.precision import Policy, default_policy


def _fill_adam_state(opt_state, mu, nu, count):
    """Write converted torch Adam moments into an optax state pytree: every
    ``ScaleByAdamState`` mu/nu leaf is replaced by the corresponding leaf of
    ``mu``/``nu`` (matched by tree path), and every ``count`` field — Adam
    bias-correction and LR-schedule counts alike — is set to ``count``
    (torch Adam's per-param ``step`` and optax's ``count`` share semantics:
    number of applied updates). Path-based surgery works for any nesting:
    clip chains, ``apply_if_finite``, ``multi_transform``/``masked`` states;
    ``optax.MaskedNode`` placeholders have no leaves and pass through."""
    from jax.tree_util import (
        DictKey,
        GetAttrKey,
        SequenceKey,
        tree_map_with_path,
    )

    def _lookup(tree, keys):
        for k in keys:
            if isinstance(k, DictKey):
                tree = tree[k.key]
            elif isinstance(k, SequenceKey):
                tree = tree[k.idx]
            elif isinstance(k, GetAttrKey):
                tree = getattr(tree, k.name)
            else:
                raise TypeError(f'unsupported tree path key {k!r}')
        return tree

    def repl(path, leaf):
        names = [getattr(k, 'name', None) for k in path]
        for field, src in (('mu', mu), ('nu', nu)):
            if field in names:
                i = len(names) - 1 - names[::-1].index(field)
                return jnp.asarray(_lookup(src, path[i + 1:]),
                                   dtype=leaf.dtype)
        if names and names[-1] == 'count':
            return jnp.asarray(count, dtype=leaf.dtype)
        return leaf

    return tree_map_with_path(repl, opt_state)


class VideoTokenizerTrainer:

    def __init__(
        self,
        model: VideoTokenizer,
        *,
        batch_size: int,
        num_train_steps: int,
        learning_rate: float = 1e-5,
        grad_accum_every: int = 1,
        grad_accum_split: bool = False,
        apply_gradient_penalty_every: int = 4,
        max_grad_norm: Optional[float] = None,
        dataset=None,
        valid_dataset=None,
        dataset_folder: Optional[str] = None,
        dataset_type: str = 'videos',
        checkpoints_folder: str = './checkpoints',
        results_folder: str = './results',
        random_split_seed: int = 42,
        valid_frac: float = 0.05,
        validate_every_step: int = 100,
        checkpoint_every_step: int = 100,
        num_frames: int = 17,
        use_wandb_tracking: bool = False,
        discr_start_after_step: int = 0,
        warmup_steps: int = 1000,
        scheduler=None,           # optional optax schedule fn(step) -> lr
        optimizer_kwargs: Optional[dict] = None,
        ema_kwargs: Optional[dict] = None,
        dataset_kwargs: Optional[dict] = None,
        mesh=None,
        policy: Optional[Policy] = None,
        tensor_parallel: bool = False,
        seed: int = 0,
        profile_dir: Optional[str] = None,
        log_every: int = 1,
    ):
        # the int8 conv path is inference-only: jnp.round has zero gradient,
        # so training with it engaged would silently produce (near-)zero conv
        # gradients (ADVICE r4). Refuse loudly at construction.
        if os.environ.get('MAGVIT2_TPU_INT8_CONV', '') == '1':
            raise RuntimeError(
                'MAGVIT2_TPU_INT8_CONV=1 is an inference-only path (round() '
                'kills conv gradients); unset it before constructing '
                'VideoTokenizerTrainer')

        self.model = model
        self.batch_size = batch_size
        self.num_train_steps = num_train_steps
        self.grad_accum_every = grad_accum_every
        # split mode: one compiled micro-grad program dispatched
        # grad_accum_every times + one optimizer-apply program, instead of a
        # single program containing the unrolled accum loop. Same math;
        # compile size and peak activation memory become independent of
        # grad_accum_every (the monolithic graph at accum>=4 crashes some
        # AOT compile services and schedules all micros' remat buffers
        # together). Costs one extra dispatch + a persistent grads buffer.
        self.grad_accum_split = bool(grad_accum_split) and grad_accum_every > 1
        self.apply_gradient_penalty_every = apply_gradient_penalty_every
        self.discr_start_after_step = discr_start_after_step
        self.validate_every_step = validate_every_step
        self.checkpoint_every_step = checkpoint_every_step
        self.use_wandb_tracking = use_wandb_tracking
        self.log_every = max(1, log_every)
        self.policy = default(policy, default_policy())
        self.profile_dir = profile_dir

        self.mesh = default(mesh, make_mesh())
        n_data = data_parallel_extent(self.mesh)
        assert batch_size % n_data == 0, (
            f'batch_size {batch_size} must divide the data-parallel extent '
            f'{n_data}')
        # multi-host: batch_size is GLOBAL; each process decodes its shard
        self._n_proc = jax.process_count()
        assert batch_size % self._n_proc == 0, (
            f'global batch_size {batch_size} must divide the process count '
            f'{self._n_proc}')

        # datasets (reference trainer.py:115-149)
        dataset_kwargs = dict(default(dataset_kwargs, {}))
        dataset_kwargs['channels'] = model.channels
        # decode stays uint8 end-to-end; the native batch assembler
        # (native/batch_ops.cpp) normalizes whole batches at collate
        dataset_kwargs.setdefault('output_dtype', 'uint8')
        if not exists(dataset):
            if dataset_type == 'videos':
                dataset_klass = VideoDataset
                dataset_kwargs = {**dataset_kwargs, 'num_frames': num_frames}
            else:
                dataset_klass = ImageDataset
            assert exists(dataset_folder)
            dataset = dataset_klass(
                dataset_folder, image_size=model.image_size, **dataset_kwargs)

        assert 0 <= valid_frac < 1
        if not exists(valid_dataset):
            if valid_frac > 0:
                train_size = int((1 - valid_frac) * len(dataset))
                valid_size = len(dataset) - train_size
                dataset, valid_dataset = random_split(
                    dataset, [train_size, valid_size], seed=random_split_seed)
                self.print(
                    f'training with dataset of {len(dataset)} samples and '
                    f'validating with randomly splitted {len(valid_dataset)} '
                    f'samples')
            else:
                valid_dataset = dataset
                self.print(
                    f'training with shared training and valid dataset of '
                    f'{len(dataset)} samples')

        self.dataset = dataset
        self.valid_dataset = valid_dataset
        shard_kwargs = dict(num_shards=self._n_proc,
                            shard_id=jax.process_index())
        self.dataloader = DataLoader(
            dataset, batch_size=batch_size, shuffle=True, drop_last=True,
            **shard_kwargs)
        # validation tolerates small splits. Single-process: any size works
        # (_put_global falls back to an unsharded batch). Multi-process: the
        # global valid batch must divide BOTH the data-parallel extent
        # (dcn*data — _put_global's sharding contract) and the process count
        # (the sharded loader's contract) — round down to a multiple of their
        # lcm, and skip validation entirely when the split is too small to
        # shard (all processes compute the same vbs, so they skip together).
        import math
        vbs = min(batch_size, len(valid_dataset))
        if self._n_proc > 1:
            unit = math.lcm(n_data, self._n_proc)
            vbs -= vbs % unit
        self._valid_enabled = vbs > 0
        if not self._valid_enabled:
            self.print(
                f'valid split of {len(valid_dataset)} samples is smaller than '
                f'the data-parallel extent {n_data} — validation disabled')
        self.valid_dataloader = DataLoader(
            valid_dataset, batch_size=max(vbs, 1), shuffle=True,
            drop_last=True, **shard_kwargs) if self._valid_enabled else None

        # optimizers (reference trainer.py:154-171; warmup folded into the
        # optax schedule, clip folded into the chain)
        optimizer_kwargs = default(optimizer_kwargs, {})
        self.optimizer = get_optimizer(
            lr=learning_rate, warmup_steps=warmup_steps,
            max_grad_norm=max_grad_norm, scheduler=scheduler,
            **optimizer_kwargs)
        self.opt_state = self.optimizer.init(model.params)

        self.has_gan = model.use_gan and exists(model.discr)
        self.discr_optimizer = None
        self.discr_opt_state = None
        if self.has_gan:
            # the reference creates ONE optimizer per discriminator (main +
            # each multiscale, trainer.py:156-157,209-217) — under
            # max_grad_norm that means each discriminator is clipped by its
            # OWN global norm. optax.multi_transform with one transform per
            # subtree reproduces that; a single shared chain would couple the
            # clip across discriminators.
            discr_tree = self._discr_tree()
            make_opt = lambda: get_optimizer(
                lr=learning_rate, warmup_steps=warmup_steps,
                max_grad_norm=max_grad_norm, scheduler=scheduler,
                **optimizer_kwargs)
            n_ms = len(model.multiscale_params)
            if n_ms:
                transforms = {'discr': make_opt()}
                transforms.update({f'ms{i}': make_opt() for i in range(n_ms)})
                labels = {
                    'discr': jax.tree.map(lambda _: 'discr',
                                          discr_tree['discr']),
                    'multiscale': tuple(
                        jax.tree.map(lambda _, i=i: f'ms{i}', p)
                        for i, p in enumerate(discr_tree['multiscale'])),
                }
                self.discr_optimizer = optax.multi_transform(
                    transforms, labels)
            else:
                self.discr_optimizer = make_opt()
            self.discr_opt_state = self.discr_optimizer.init(discr_tree)

        # EMA (reference trainer.py:108-113; replicated pytree, not rank-0)
        ema_kwargs = default(ema_kwargs, {})
        self.ema_config = EMAConfig(**ema_kwargs)
        self.ema_params = jax.tree.map(jnp.copy, model.params)

        # place state over the mesh: replicated, or channel-sharded over the
        # 'tensor' axis when tensor parallelism is requested
        if tensor_parallel and self.mesh.shape.get('tensor', 1) > 1:
            from magvit2_pytorch_tpu.parallel.mesh import (
                shard_params_tensor_parallel,
            )
            place = lambda tree: shard_params_tensor_parallel(tree, self.mesh)
        else:
            place = lambda tree: replicate(tree, self.mesh)
        # kept so load() restores with the same placement (a TP run resumed
        # through replicate() would silently hold full params per device)
        self._place = place
        self.model.params = place(self.model.params)
        self.ema_params = place(self.ema_params)
        self.opt_state = place(self.opt_state)
        if self.has_gan:
            self.model.discr_params = replicate(
                self.model.discr_params, self.mesh)
            self.model.multiscale_params = [
                replicate(p, self.mesh) for p in self.model.multiscale_params]
            self.discr_opt_state = replicate(self.discr_opt_state, self.mesh)
        if exists(self.model.vgg_params):
            # the perceptual net is value-only during training (no grads land
            # on it): hold it in the compute dtype — fp32 VGG16 weights alone
            # are ~540MB of HBM
            self.model.vgg_params = replicate(
                self.policy.cast_to_compute(self.model.vgg_params), self.mesh)

        self.checkpoints_folder = Path(checkpoints_folder)
        self.results_folder = Path(results_folder)
        self.checkpoints_folder.mkdir(parents=True, exist_ok=True)
        self.results_folder.mkdir(parents=True, exist_ok=True)

        self.step = 0
        self._rng = jax.random.PRNGKey(seed)
        # cumulative codebook seen-mask (codebook-health canary; lazily
        # placed on the mesh at the first train step)
        self._code_seen = None
        self._jit_cache = {}
        self._wandb_run = None

    # -- plumbing ------------------------------------------------------------

    @property
    def is_main(self) -> bool:
        return is_main_process()

    def print(self, msg):
        if self.is_main:
            print(msg)

    def log(self, **data):
        if exists(self._wandb_run):
            self._wandb_run.log(data, step=self.step)

    @contextmanager
    def trackers(self, project_name: str, run_name: Optional[str] = None,
                 hps: Optional[dict] = None):
        """wandb tracking context (reference trainer.py:241-257)."""
        assert self.use_wandb_tracking
        import wandb
        self._wandb_run = wandb.init(project=project_name, name=run_name,
                                     config=hps)
        try:
            yield
        finally:
            self._wandb_run.finish()
            self._wandb_run = None

    def _discr_tree(self):
        return {
            'discr': self.model.discr_params,
            'multiscale': tuple(self.model.multiscale_params),
        }

    def _set_discr_tree(self, tree):
        self.model.discr_params = tree['discr']
        self.model.multiscale_params = list(tree['multiscale'])

    @property
    def ema_tokenizer(self):
        """Eval copy of the tokenizer carrying the EMA params
        (reference trainer.py:284-286)."""
        ema_model = self.model.copy_for_eval()
        ema_model.params = self.ema_params
        return ema_model

    def tokenize(self, *args, **kwargs):
        return self.ema_tokenizer.tokenize(*args, **kwargs)

    def _put_global(self, local: np.ndarray, *, leading_none: int = 0):
        """Place a host batch over the mesh's batch axes. Single-process:
        plain sharded device_put. Multi-process: every process holds only its
        shard of the batch axis (the sharded DataLoader guarantees process p
        decoded contiguous chunk p), assembled into one global array."""
        # `local` holds only this process's shard of the batch axis; the
        # divisibility contract is on the GLOBAL batch.
        b = local.shape[leading_none] * self._n_proc
        if b % data_parallel_extent(self.mesh):
            # small validation splits can't shard evenly; run them unsharded
            # (single-host only — the train path asserts divisibility upfront)
            assert self._n_proc == 1, (
                f'batch of {b} does not divide the data-parallel extent '
                f'{data_parallel_extent(self.mesh)} on a multi-process mesh')
            return jnp.asarray(local)
        sharding = data_sharding(self.mesh, leading_none=leading_none)
        if self._n_proc == 1:
            return jax.device_put(local, sharding)
        b_axis = leading_none
        global_shape = (local.shape[:b_axis]
                        + (local.shape[b_axis] * self._n_proc,)
                        + local.shape[b_axis + 1:])
        return jax.make_array_from_process_local_data(
            sharding, local, global_shape)

    def _fetch_full(self, arr) -> np.ndarray:
        """Device array -> full host value on EVERY process (resharding to
        replicated is the multi-host-safe inverse of :meth:`_put_global`)."""
        if self._n_proc > 1:
            if '_replicate' not in self._jit_cache:
                self._jit_cache['_replicate'] = jax.jit(
                    lambda x: x,
                    out_shardings=replicated_sharding(self.mesh))
            arr = self._jit_cache['_replicate'](arr)
        return np.asarray(arr)

    def _next_batches(self, dl_iter):
        """Pull grad_accum_every (process-local) batches, stack to
        (A, B_local, ...), assemble the global (A, B, ...) array sharded over
        the mesh's batch axes. Uploaded directly in the compute dtype — an
        fp32 copy of the full accum x batch of clips was one of the largest
        allocations in the training step (532MB at 128px batch 2 x accum 2)."""
        dtype = np.dtype(self.policy.compute_dtype)
        batches = []
        for _ in range(self.grad_accum_every):
            data, *_ = next(dl_iter)
            batches.append(np.asarray(data, dtype=dtype))
        stacked = np.stack(batches)
        if stacked.ndim == 5:
            # image dataset: lift (A, B, H, W, C) to single-frame videos,
            # like the reference's images-mode rearrange
            # (magvit2_pytorch.py:1706-1710)
            stacked = stacked[:, :, None]
        return self._put_global(stacked, leading_none=1)

    def _next_batch(self, dl_iter):
        """One (B, ...) global micro-batch for split grad-accum — same upload
        path as :meth:`_next_batches` without the accum axis."""
        dtype = np.dtype(self.policy.compute_dtype)
        data, *_ = next(dl_iter)
        arr = np.asarray(data, dtype=dtype)
        if arr.ndim == 4:
            arr = arr[:, None]    # images -> single-frame videos
        return self._put_global(arr)

    # -- jitted steps --------------------------------------------------------

    def _gen_micro_loss(self, train_adversarially: bool):
        """(params, discr_params, ms_params, vgg_params, batch, key) ->
        (total_loss, LossBreakdown) for ONE micro-batch — shared by the
        monolithic accum step and the split-accum micro step."""
        model = self.model
        cfg = model.config
        policy = self.policy

        adv_w = cfg.adversarial_loss_weight if train_adversarially else 0.0
        ms_adv_w = (cfg.multiscale_adversarial_loss_weight
                    if train_adversarially else 0.0)
        has_gan = self.has_gan and train_adversarially and adv_w > 0
        has_ms = (model.has_multiscale_discrs and train_adversarially
                  and ms_adv_w > 0)

        def micro_loss(params, discr_params, ms_params, vgg_params, batch, key):
            total, breakdown, _ = tokenizer_loss(
                model.module, params,
                policy.cast_to_compute(batch), key,
                discr_module=model.discr, discr_params=discr_params,
                multiscale_modules=tuple(model.multiscale_discrs),
                multiscale_params=ms_params,
                vgg_module=model.vgg, vgg_params=vgg_params,
                train=True,
                use_vgg=model.use_vgg,
                has_gan=has_gan,
                has_multiscale_gan=has_ms,
                perceptual_loss_weight=cfg.perceptual_loss_weight,
                quantizer_aux_loss_weight=cfg.quantizer_aux_loss_weight,
                adversarial_loss_weight=adv_w,
                multiscale_adversarial_loss_weight=ms_adv_w,
            )
            return total, breakdown

        return micro_loss

    @staticmethod
    def _gen_micro_metrics(breakdown):
        """Per-micro-batch scalar metric dict from a LossBreakdown (shared by
        both accum modes so logged keys are identical)."""
        ms = breakdown.multiscale_gen_losses
        micro = {
            'recon_loss': breakdown.recon_loss,
            'perceptual_loss': breakdown.perceptual_loss,
            'adversarial_gen_loss': breakdown.adversarial_gen_loss,
            'adaptive_adversarial_weight':
                breakdown.adaptive_adversarial_weight,
            'lfq_aux_loss': breakdown.lfq_aux_loss,
            'multiscale_gen_loss': (
                sum(ms) / len(ms) if len(ms) > 0
                else jnp.zeros((), jnp.float32)),
        }
        if breakdown.mean_bit_entropy is not None:   # LFQ only
            micro['mean_bit_entropy'] = breakdown.mean_bit_entropy
        return micro

    def _gen_step_fn(self, train_adversarially: bool):
        key = ('gen', train_adversarially)
        if key in self._jit_cache:
            return self._jit_cache[key]

        optimizer = self.optimizer
        ema_config = self.ema_config
        micro_loss = self._gen_micro_loss(train_adversarially)
        micro_metrics = self._gen_micro_metrics

        def step_fn(params, opt_state, ema_params, discr_params, ms_params,
                    vgg_params, batches, rng, step, code_seen):
            # grad accumulation: unrolled python loop (accum is small and
            # static; an XLA while-loop over the full grads pytree compiles
            # pathologically slowly on some backends)
            accum = batches.shape[0]
            keys = jax.random.split(rng, accum)
            grads = jax.tree.map(jnp.zeros_like, params)
            loss_sum = 0.0
            metric_sums = None
            for i in range(accum):
                (loss, breakdown), g = jax.value_and_grad(
                    micro_loss, has_aux=True)(
                        params, discr_params, ms_params, vgg_params,
                        batches[i], keys[i])
                grads = jax.tree.map(jnp.add, grads, g)
                loss_sum = loss_sum + loss
                micro = micro_metrics(breakdown)
                metric_sums = micro if metric_sums is None else jax.tree.map(
                    jnp.add, metric_sums, micro)
                code_seen = jnp.logical_or(code_seen, breakdown.codes_seen)
            grads = jax.tree.map(lambda g: g / accum, grads)

            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            new_ema = ema_update(ema_params, new_params, step, ema_config)

            # average the loss breakdown across micro-batches (reference
            # trainer.py:365-372 accumulates loss/grad_accum_every per key)
            metrics = {k: v / accum for k, v in metric_sums.items()}
            metrics['total_loss'] = loss_sum / accum
            # codebook-health canaries (results/codebook_2e18_t2.log):
            # cumulative unique codes compounding + mean bit entropy > ~0.1
            # in the first 50 steps = healthy; frozen = permanent collapse
            metrics['codebook_unique_codes'] = code_seen.sum()
            return new_params, new_opt_state, new_ema, metrics, code_seen

        # donate the batch (argnum 6) too: its buffer is dead after the last
        # micro-batch read and the allocator can reuse it for gradients
        fn = jax.jit(step_fn, donate_argnums=(0, 1, 2, 6, 9))
        self._jit_cache[key] = fn
        return fn

    # -- split grad-accum (grad_accum_split=True) ----------------------------
    # The monolithic step above traces the whole accum loop into ONE program:
    # best dispatch overhead, but the graph grows with grad_accum_every (a
    # b2 x accum4 flagship train graph crashes some AOT compile services) and
    # XLA must schedule all micro-batches' remat buffers together. Split mode
    # compiles ONE micro-batch grad program + ONE optimizer-apply program and
    # loops on the host: compile size and activation memory are independent
    # of grad_accum_every. Same math, same metric keys; grads accumulate in
    # a params-shaped f32 buffer that every micro call donates through.

    def _gen_metric_zeros(self):
        keys = ['recon_loss', 'perceptual_loss', 'adversarial_gen_loss',
                'adaptive_adversarial_weight', 'lfq_aux_loss',
                'multiscale_gen_loss']
        if not self.model.config.use_fsq:     # LFQ carries the entropy canary
            keys.append('mean_bit_entropy')
        # distinct buffers per key — the accumulator dict is DONATED through
        # the micro calls, and donating one aliased buffer twice is an error
        return {k: jnp.zeros((), jnp.float32) for k in keys}

    def _gen_micro_grad_fn(self, train_adversarially: bool):
        key = ('gen_micro', train_adversarially)
        if key in self._jit_cache:
            return self._jit_cache[key]

        micro_loss = self._gen_micro_loss(train_adversarially)
        micro_metrics = self._gen_micro_metrics

        def micro_fn(params, discr_params, ms_params, vgg_params, batch, key,
                     grads, loss_sum, metric_sums, code_seen):
            (loss, breakdown), g = jax.value_and_grad(
                micro_loss, has_aux=True)(
                    params, discr_params, ms_params, vgg_params, batch, key)
            grads = jax.tree.map(jnp.add, grads, g)
            metric_sums = jax.tree.map(
                jnp.add, metric_sums, micro_metrics(breakdown))
            code_seen = jnp.logical_or(code_seen, breakdown.codes_seen)
            return grads, loss_sum + loss, metric_sums, code_seen

        # donate batch + every accumulator: each call consumes the previous
        # call's accumulators, so the buffers thread through in place
        fn = jax.jit(micro_fn, donate_argnums=(4, 6, 7, 8, 9))
        self._jit_cache[key] = fn
        return fn

    def _gen_apply_fn(self):
        key = 'gen_apply'
        if key in self._jit_cache:
            return self._jit_cache[key]

        optimizer = self.optimizer
        ema_config = self.ema_config
        accum = self.grad_accum_every

        def apply_fn(params, opt_state, ema_params, grads, loss_sum,
                     metric_sums, step, code_seen):
            grads = jax.tree.map(lambda g: g / accum, grads)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            new_ema = ema_update(ema_params, new_params, step, ema_config)
            metrics = {k: v / accum for k, v in metric_sums.items()}
            metrics['total_loss'] = loss_sum / accum
            metrics['codebook_unique_codes'] = code_seen.sum()
            return new_params, new_opt_state, new_ema, metrics

        fn = jax.jit(apply_fn, donate_argnums=(0, 1, 2, 3))
        self._jit_cache[key] = fn
        return fn

    def _gen_step_split(self, train_adversarially, dl_iter, rng, step):
        """Split-accum generator step: grad_accum_every micro-grad dispatches
        + one optimizer apply. Numerically identical to the monolithic step
        (same per-micro keys, same summation order)."""
        model = self.model
        micro_fn = self._gen_micro_grad_fn(train_adversarially)
        apply_fn = self._gen_apply_fn()
        accum = self.grad_accum_every
        keys = jax.random.split(rng, accum)

        if 'gen_zeros' not in self._jit_cache:
            self._jit_cache['gen_zeros'] = jax.jit(
                lambda p: jax.tree.map(jnp.zeros_like, p))
        grads = self._jit_cache['gen_zeros'](model.params)
        loss_sum = jnp.zeros((), jnp.float32)
        metric_sums = self._gen_metric_zeros()
        code_seen = self._code_seen
        ms_params = tuple(model.multiscale_params)
        for i in range(accum):
            grads, loss_sum, metric_sums, code_seen = micro_fn(
                model.params, model.discr_params, ms_params,
                model.vgg_params, self._next_batch(dl_iter), keys[i],
                grads, loss_sum, metric_sums, code_seen)
        self._code_seen = code_seen
        (model.params, self.opt_state, self.ema_params, metrics) = apply_fn(
            model.params, self.opt_state, self.ema_params, grads, loss_sum,
            metric_sums, jnp.asarray(step), code_seen)
        return metrics

    def _discr_micro_loss(self, apply_gradient_penalty: bool):
        """(discr_tree, params, batch, key) -> (total, DiscrLossBreakdown)
        for ONE micro-batch — shared by both accum modes."""
        model = self.model
        cfg = model.config
        policy = self.policy

        def micro_loss(discr_tree, params, batch, key):
            total, breakdown = discriminator_loss(
                model.module, params, model.discr, discr_tree['discr'],
                policy.cast_to_compute(batch), key,
                multiscale_modules=tuple(model.multiscale_discrs),
                multiscale_params=discr_tree['multiscale'],
                apply_gradient_penalty=apply_gradient_penalty,
                grad_penalty_loss_weight=cfg.grad_penalty_loss_weight,
                multiscale_adversarial_loss_weight=cfg.multiscale_adversarial_loss_weight,
            )
            return total, breakdown

        return micro_loss

    def _discr_step_fn(self, apply_gradient_penalty: bool):
        key = ('discr', apply_gradient_penalty)
        if key in self._jit_cache:
            return self._jit_cache[key]

        model = self.model
        optimizer = self.discr_optimizer
        micro_loss = self._discr_micro_loss(apply_gradient_penalty)

        def step_fn(discr_tree, discr_opt_state, params, batches, rng):
            accum = batches.shape[0]
            keys = jax.random.split(rng, accum)
            grads = jax.tree.map(jnp.zeros_like, discr_tree)
            loss_sum = 0.0
            discr_loss_sum = 0.0
            gp_sum = 0.0
            ms_sum = 0.0
            for i in range(accum):
                (loss, bd), g = jax.value_and_grad(
                    micro_loss, has_aux=True)(discr_tree, params, batches[i],
                                              keys[i])
                grads = jax.tree.map(jnp.add, grads, g)
                loss_sum = loss_sum + loss
                discr_loss_sum = discr_loss_sum + bd.discr_loss
                gp_sum = gp_sum + bd.gradient_penalty
                if len(bd.multiscale_discr_losses) > 0:
                    ms_sum = ms_sum + sum(bd.multiscale_discr_losses) / len(
                        bd.multiscale_discr_losses)
            grads = jax.tree.map(lambda g: g / accum, grads)

            updates, new_opt_state = optimizer.update(
                grads, discr_opt_state, discr_tree)
            new_tree = optax.apply_updates(discr_tree, updates)

            metrics = {
                'discr_loss': discr_loss_sum / accum,
                'gradient_penalty': gp_sum / accum,
                'total_discr_loss': loss_sum / accum,
                'multiscale_discr_loss': ms_sum / accum
                if len(model.multiscale_discrs) > 0
                else jnp.zeros((), jnp.float32),
            }
            return new_tree, new_opt_state, metrics

        fn = jax.jit(step_fn, donate_argnums=(0, 1, 3))
        self._jit_cache[key] = fn
        return fn

    def _discr_micro_grad_fn(self, apply_gradient_penalty: bool):
        key = ('discr_micro', apply_gradient_penalty)
        if key in self._jit_cache:
            return self._jit_cache[key]

        micro_loss = self._discr_micro_loss(apply_gradient_penalty)
        has_ms = len(self.model.multiscale_discrs) > 0

        def micro_fn(discr_tree, params, batch, key, grads, sums):
            (loss, bd), g = jax.value_and_grad(micro_loss, has_aux=True)(
                discr_tree, params, batch, key)
            grads = jax.tree.map(jnp.add, grads, g)
            ms = bd.multiscale_discr_losses
            micro = {
                'total_discr_loss': loss,
                'discr_loss': bd.discr_loss,
                'gradient_penalty': bd.gradient_penalty,
                'multiscale_discr_loss': (
                    sum(ms) / len(ms) if has_ms
                    else jnp.zeros((), jnp.float32)),
            }
            return grads, jax.tree.map(jnp.add, sums, micro)

        fn = jax.jit(micro_fn, donate_argnums=(2, 4, 5))
        self._jit_cache[key] = fn
        return fn

    def _discr_apply_fn(self):
        key = 'discr_apply'
        if key in self._jit_cache:
            return self._jit_cache[key]

        optimizer = self.discr_optimizer
        accum = self.grad_accum_every

        def apply_fn(discr_tree, discr_opt_state, grads, sums):
            grads = jax.tree.map(lambda g: g / accum, grads)
            updates, new_opt_state = optimizer.update(
                grads, discr_opt_state, discr_tree)
            new_tree = optax.apply_updates(discr_tree, updates)
            metrics = {k: v / accum for k, v in sums.items()}
            return new_tree, new_opt_state, metrics

        fn = jax.jit(apply_fn, donate_argnums=(0, 1, 2))
        self._jit_cache[key] = fn
        return fn

    def _discr_step_split(self, apply_gradient_penalty, dl_iter, rng):
        """Split-accum discriminator step (see _gen_step_split)."""
        model = self.model
        micro_fn = self._discr_micro_grad_fn(apply_gradient_penalty)
        apply_fn = self._discr_apply_fn()
        accum = self.grad_accum_every
        keys = jax.random.split(rng, accum)

        discr_tree = self._discr_tree()
        if 'discr_zeros' not in self._jit_cache:
            self._jit_cache['discr_zeros'] = jax.jit(
                lambda p: jax.tree.map(jnp.zeros_like, p))
        grads = self._jit_cache['discr_zeros'](discr_tree)
        # distinct buffers per key (the dict is donated through micro calls)
        sums = {k: jnp.zeros((), jnp.float32)
                for k in ('total_discr_loss', 'discr_loss',
                          'gradient_penalty', 'multiscale_discr_loss')}
        for i in range(accum):
            grads, sums = micro_fn(discr_tree, model.params,
                                   self._next_batch(dl_iter), keys[i],
                                   grads, sums)
        discr_tree, self.discr_opt_state, metrics = apply_fn(
            discr_tree, self.discr_opt_state, grads, sums)
        self._set_discr_tree(discr_tree)
        return metrics

    # -- train loop ----------------------------------------------------------

    def train_step(self, dl_iter):
        step = self.step
        model = self.model

        train_adversarially = (
            self.has_gan and (step + 1) > self.discr_start_after_step)

        rng = jax.random.fold_in(self._rng, step)
        rng_gen, rng_discr = jax.random.split(rng)

        # generator
        if self._code_seen is None:
            self._code_seen = replicate(
                jnp.zeros((model.codebook_size,), jnp.bool_), self.mesh)
        if self.grad_accum_split:
            metrics = self._gen_step_split(
                train_adversarially, dl_iter, rng_gen, step)
        else:
            batches = self._next_batches(dl_iter)
            gen_fn = self._gen_step_fn(train_adversarially)
            (model.params, self.opt_state, self.ema_params, metrics,
             self._code_seen) = gen_fn(
                model.params, self.opt_state, self.ema_params,
                model.discr_params, tuple(model.multiscale_params),
                model.vgg_params, batches, rng_gen, jnp.asarray(step),
                self._code_seen)

        if not train_adversarially:
            self.step += 1
            return self._emit_metrics(step, metrics)

        # discriminator (reference trainer.py:400-446) — dispatched BEFORE the
        # generator metrics are pulled to host, so the device→host sync
        # overlaps the discriminator step instead of serializing dispatch
        apply_gp = not (step % self.apply_gradient_penalty_every)
        if self.grad_accum_split:
            discr_metrics = self._discr_step_split(apply_gp, dl_iter,
                                                   rng_discr)
        else:
            batches = self._next_batches(dl_iter)
            discr_fn = self._discr_step_fn(apply_gp)
            discr_tree = self._discr_tree()
            discr_tree, self.discr_opt_state, discr_metrics = discr_fn(
                discr_tree, self.discr_opt_state, model.params, batches,
                rng_discr)
            self._set_discr_tree(discr_tree)

        self.step += 1
        return self._emit_metrics(step, metrics, discr_metrics, apply_gp)

    def _emit_metrics(self, step, metrics, discr_metrics=None,
                      apply_gp: bool = False):
        """Pull metrics to host + log/print, only every ``log_every`` steps —
        the float() conversion blocks on the device and would otherwise cap
        async dispatch; off-cadence steps return the raw device arrays."""
        if step % self.log_every:
            out = dict(metrics)
            if exists(discr_metrics):
                out.update(discr_metrics)
            return out

        metrics = {k: float(v) for k, v in metrics.items()}
        self.log(**metrics)
        self.print(f"recon loss: {metrics['recon_loss']:.3f}")

        if exists(discr_metrics):
            discr_metrics = {k: float(v) for k, v in discr_metrics.items()}
            self.log(discr_loss=discr_metrics['discr_loss'])
            if apply_gp:
                self.log(gradient_penalty=discr_metrics['gradient_penalty'])
            self.print(f"discr loss: {discr_metrics['discr_loss']:.3f}")
            metrics = {**metrics, **discr_metrics}
        return metrics

    def valid_step(self, dl_iter, save_recons: bool = True,
                   num_save_recons: int = 1):
        """Validation recon loss for online + EMA model, side-by-side GIF grid
        (reference trainer.py:452-510). Runs on EVERY process — the jitted
        forward over globally-sharded batches is an SPMD program all processes
        must enter; only the GIF write is main-process-gated."""
        model = self.model
        ema_model = self.ema_tokenizer

        recon_loss = 0.0
        ema_recon_loss = 0.0
        valid_videos = []
        recon_videos = []

        for _ in range(self.grad_accum_every):
            local_video, *_ = next(dl_iter)
            valid_video = self._put_global(
                np.asarray(local_video, np.float32))

            loss, _ = model.forward(valid_video, return_recon_loss_only=True)
            ema_loss, ema_recon = ema_model.forward(
                valid_video, return_recon_loss_only=True)

            recon_loss += float(loss) / self.grad_accum_every
            ema_recon_loss += float(ema_loss) / self.grad_accum_every

            valid_video = self._fetch_full(valid_video)
            ema_recon = self._fetch_full(ema_recon)
            if valid_video.ndim == 4:
                valid_video = valid_video[:, None]
                ema_recon = ema_recon[:, None] if ema_recon.ndim == 4 else ema_recon

            valid_videos.append(np.asarray(valid_video))
            recon_videos.append(np.asarray(ema_recon))

        # north-star metrics (BASELINE.json): recon PSNR + codebook
        # utilization, aggregated over EVERY validation micro-batch (matching
        # how the recon losses above are averaged — a single micro-batch made
        # these needlessly noisy)
        from magvit2_pytorch_tpu.training.metrics import (
            codebook_utilization,
            psnr,
        )
        valid_psnr = 0.0
        all_codes = []
        for v, r in zip(valid_videos, recon_videos):
            v, r = jnp.asarray(v), jnp.clip(jnp.asarray(r), 0, 1)
            valid_psnr += float(psnr(v, r)) / len(valid_videos)
            all_codes.append(np.asarray(ema_model.tokenize(v)).reshape(-1))
        utilization = float(codebook_utilization(
            jnp.concatenate([jnp.asarray(c) for c in all_codes]),
            ema_model.codebook_size))

        self.log(valid_recon_loss=recon_loss,
                 valid_ema_recon_loss=ema_recon_loss,
                 valid_psnr=valid_psnr,
                 codebook_utilization=utilization)
        self.print(f'validation recon loss {recon_loss:.3f}')
        self.print(f'validation EMA recon loss {ema_recon_loss:.3f}')
        self.print(f'validation PSNR {valid_psnr:.2f} dB | codebook '
                   f'utilization {utilization:.3f}')

        if not save_recons or not self.is_main:
            return recon_loss, ema_recon_loss

        valid_videos = np.concatenate(valid_videos)[:num_save_recons]
        recon_videos = np.clip(
            np.concatenate(recon_videos)[:num_save_recons], 0, 1)

        # (2, b, t, h, w, c) -> (t, b*h, 2*w, c): real|recon side by side
        pair = np.stack([valid_videos, recon_videos])
        n, b, t, h, w, c = pair.shape
        grid = pair.transpose(2, 1, 3, 0, 4, 5).reshape(t, b * h, n * w, c)

        validate_step = self.step // self.validate_every_step
        sample_path = self.results_folder / f'sampled.{validate_step}.gif'
        video_array_to_gif(grid, str(sample_path))
        self.print(f'sample saved to {sample_path}')
        return recon_loss, ema_recon_loss

    def train(self):
        """Outer loop (reference trainer.py:512-538), with preemption-safe
        checkpointing: SIGTERM/SIGINT triggers one final checkpoint before
        exit (SURVEY.md §5.3 — the reference has no failure handling beyond
        periodic checkpoints)."""
        import signal

        stop_requested = {'flag': False}

        def _on_signal(signum, frame):
            self.print(f'signal {signum} received — checkpointing and stopping')
            stop_requested['flag'] = True

        prev_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # non-main thread
                pass

        dl_iter = cycle(self.dataloader)
        valid_dl_iter = (cycle(self.valid_dataloader)
                         if self._valid_enabled else None)

        while self.step < self.num_train_steps:
            if stop_requested['flag']:
                # save/valid run on ALL processes: Orbax coordinates the
                # multi-host write and the jitted valid forward is SPMD — a
                # rank-0-only call on globally-sharded state would deadlock
                self.save(self.checkpoints_folder / 'checkpoint.preempt')
                break
            step = self.step
            self.print(f'step {step}')

            if exists(self.profile_dir) and step == 2:
                jax.profiler.start_trace(self.profile_dir)

            t0 = time.perf_counter()
            self.train_step(dl_iter)
            step_time = time.perf_counter() - t0
            self.log(step_time=step_time)

            if exists(self.profile_dir) and step == 4:
                jax.profiler.stop_trace()

            if not (step % self.validate_every_step) and self._valid_enabled:
                self.valid_step(valid_dl_iter)

            if not (step % self.checkpoint_every_step):
                checkpoint_num = step // self.checkpoint_every_step
                self.save(
                    self.checkpoints_folder / f'checkpoint.{checkpoint_num}')

        for sig, handler in prev_handlers.items():
            signal.signal(sig, handler)

    def maybe_auto_resume(self) -> bool:
        """Resume from the newest checkpoint in checkpoints_folder, if any —
        combined with the signal handler this gives preemption-safe restart
        semantics. Returns True if a checkpoint was loaded."""
        candidates = sorted(
            self.checkpoints_folder.glob('checkpoint.*'),
            key=lambda p: p.stat().st_mtime)
        if not candidates:
            return False
        latest = candidates[-1]
        self.print(f'auto-resuming from {latest}')
        self.load(latest)
        return True

    # -- checkpoint / resume (reference trainer.py:291-330) ------------------

    def _state(self):
        state = {
            'params': self.model.params,
            'ema_params': self.ema_params,
            'opt_state': self.opt_state,
            'step': self.step,
        }
        if self.has_gan:
            state['discr_tree'] = self._discr_tree()
            state['discr_opt_state'] = self.discr_opt_state
        return state

    def save(self, path):
        import orbax.checkpoint as ocp

        path = Path(path).resolve()
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, self._state(), force=True)

    def load(self, path):
        import orbax.checkpoint as ocp

        path = Path(path).resolve()
        assert path.exists()
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(path, self._state())

        self.model.params = self._place(restored['params'])
        self.ema_params = self._place(restored['ema_params'])
        self.opt_state = self._place(restored['opt_state'])
        self.step = int(restored['step'])
        if self.has_gan and 'discr_tree' in restored:
            self._set_discr_tree(
                replicate(restored['discr_tree'], self.mesh))
            self.discr_opt_state = replicate(
                restored['discr_opt_state'], self.mesh)

    def load_torch_checkpoint(self, path):
        """Resume from a reference TRAINER ``.pt`` package (reference
        ``VideoTokenizerTrainer.save``, trainer.py:291-310): model + EMA
        weights, main-discriminator weights, Adam moments of the generator
        and main-discriminator optimizers, and the step counter.

        Not carried over: reference multiscale discriminators (arbitrary
        user torch modules — weights/optimizer states unconvertible; a
        warning is emitted and the rebuild's multiscale params keep their
        init) and torch warmup/LR-scheduler internals (the rebuild folds
        warmup into an optax schedule keyed on the optimizer step count,
        which IS imported, so the learning-rate trajectory resumes at the
        right point). Trust boundary: like the reference's own
        ``trainer.load`` this unpickles the package — only load checkpoints
        you trust."""
        import warnings

        import torch

        from magvit2_pytorch_tpu.models.torch_import import (
            discr_adam_moments,
            generator_adam_moments,
            load_torch_discr_state_dict,
            load_torch_multiscale_discr_state_dict,
            load_torch_tokenizer_state_dict,
            multiscale_discr_adam_moments,
            multiscale_discr_indices,
        )

        pkg = torch.load(str(path), map_location='cpu', weights_only=False)
        cfg = self.model.config
        model_sd = pkg['model']

        params = load_torch_tokenizer_state_dict(cfg, model_sd)
        self.model.params = self._place(jax.tree.map(jnp.asarray, params))

        # EMA: keys live under 'ema_model.' (ema_pytorch EMA with
        # include_online_model=False, reference trainer.py:109-113;
        # 'initted'/'step' are EMA-internal buffers)
        ema_sd = {k[len('ema_model.'):]: v for k, v in pkg['ema_model'].items()
                  if k.startswith('ema_model.')}
        ema = load_torch_tokenizer_state_dict(cfg, ema_sd)
        self.ema_params = self._place(jax.tree.map(jnp.asarray, ema))

        mu, nu, count = generator_adam_moments(cfg, model_sd, pkg['optimizer'])
        self.opt_state = self._place(
            _fill_adam_state(self.opt_state, mu, nu, count))

        if self.has_gan:
            discr = load_torch_discr_state_dict(model_sd)
            tree = self._discr_tree()

            # multiscale discriminators: the reference accepts arbitrary user
            # Modules, so import is BEST-EFFORT per scale — converted when the
            # torch weights are reference-`Discriminator`-shaped AND match the
            # rebuild's initialized tree (structure + shapes); otherwise that
            # scale keeps its init with a warning. Per-scale Adam moments
            # (pkg['multiscale_discr_optimizer_{i}'], reference
            # trainer.py:307-308) import only alongside their weights.
            ms_params = list(tree['multiscale'])
            ms_mu = [jax.tree.map(jnp.zeros_like, p) for p in ms_params]
            ms_nu = [jax.tree.map(jnp.zeros_like, p) for p in ms_params]
            torch_scales = multiscale_discr_indices(model_sd)
            if len(torch_scales) > len(ms_params):
                warnings.warn(
                    f'checkpoint has {len(torch_scales)} multiscale '
                    f'discriminators but the trainer only has '
                    f'{len(ms_params)}; extra scales are ignored')
            def _assert_same_treedef_and_shapes(a, b):
                # chex-free structure + shape check (chex is only a
                # transitive dep of optax/flax, not declared — ADVICE r4)
                ta, tb = jax.tree.structure(a), jax.tree.structure(b)
                if ta != tb:
                    raise ValueError(f'tree structures differ: {ta} vs {tb}')
                for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                    if jnp.shape(la) != jnp.shape(lb):
                        raise ValueError(
                            f'leaf shapes differ: {jnp.shape(la)} vs '
                            f'{jnp.shape(lb)}')

            for i, cur in enumerate(ms_params):
                if i not in torch_scales:
                    # a configured scale absent from the checkpoint keeps
                    # its initialized params — say so (ADVICE r4)
                    warnings.warn(
                        f'multiscale discriminator {i} is not present in the '
                        f'checkpoint; keeping initialized params')
                    continue
                try:
                    cand = jax.tree.map(
                        jnp.asarray,
                        load_torch_multiscale_discr_state_dict(model_sd, i))
                    _assert_same_treedef_and_shapes(cand, cur)
                except Exception as e:  # noqa: BLE001 — any shape/key mismatch
                    warnings.warn(
                        f'multiscale discriminator {i} is not reference-'
                        f'Discriminator-shaped or does not match the '
                        f'configured scale ({type(e).__name__}); keeping '
                        f'initialized params')
                    continue
                ms_params[i] = cand
                opt_key = f'multiscale_discr_optimizer_{i}'
                if opt_key in pkg:
                    mmu, mnu, _ = multiscale_discr_adam_moments(
                        model_sd, pkg[opt_key], i)
                    ms_mu[i] = jax.tree.map(jnp.asarray, mmu)
                    ms_nu[i] = jax.tree.map(jnp.asarray, mnu)

            tree = {'discr': jax.tree.map(jnp.asarray, discr),
                    'multiscale': tuple(ms_params)}
            self._set_discr_tree(replicate(tree, self.mesh))
            dmu, dnu, dcount = discr_adam_moments(
                model_sd, pkg['discr_optimizer'])
            self.discr_opt_state = replicate(
                _fill_adam_state(
                    self.discr_opt_state,
                    {'discr': dmu, 'multiscale': tuple(ms_mu)},
                    {'discr': dnu, 'multiscale': tuple(ms_nu)},
                    dcount),
                self.mesh)

        self.step = int(pkg['step'])
