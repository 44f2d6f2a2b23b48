"""Trainer integration: GAN loop over the 8-device virtual CPU mesh (the
multi-chip-without-a-cluster strategy from SURVEY.md §4), delayed adversarial
start, EMA tracking, checkpoint/resume, validation GIF dump.

Configs are deliberately tiny (16px, dim 8) — the test box is single-core and
XLA compile time dominates; tests share trainers to reuse jitted steps.
"""

import numpy as np
import pytest

from magvit2_pytorch_tpu.data import cycle, video_array_to_gif
from magvit2_pytorch_tpu.models import VideoTokenizer
from magvit2_pytorch_tpu.training.trainer import VideoTokenizerTrainer

SIZE = 16
FRAMES = 3


class SyntheticVideos:
    def __init__(self, n=24, t=FRAMES, size=SIZE, c=3, seed=0):
        rng = np.random.default_rng(seed)
        self.items = rng.uniform(size=(n, t, size, size, c)).astype(np.float32)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _model(use_gan=False, **kwargs):
    return VideoTokenizer(
        image_size=SIZE,
        init_dim=8,
        codebook_size=64,
        layers=('residual', ('compress_space', 12), ('compress_time', 12)),
        use_gan=use_gan,
        discr_kwargs=dict(dim=4, image_size=SIZE, channels=3, max_dim=16),
        perceptual_loss_weight=0.0,  # VGG is too heavy for the 1-core CI box
        seed=0,
        **kwargs,
    )


def _trainer(model, tmp_path, **kwargs):
    defaults = dict(
        batch_size=8,            # shards over the 8 virtual devices
        num_train_steps=4,
        learning_rate=1e-4,
        warmup_steps=2,
        dataset=SyntheticVideos(),
        valid_frac=0.25,
        checkpoints_folder=str(tmp_path / 'ckpts'),
        results_folder=str(tmp_path / 'results'),
        validate_every_step=1000,
        checkpoint_every_step=1000,
    )
    defaults.update(kwargs)
    return VideoTokenizerTrainer(model, **defaults)


def test_train_no_gan_full_cycle(tmp_path):
    """Covers: param updates, grad accum, EMA, validation GIF, resume."""
    import jax
    assert len(jax.devices()) == 8

    model = _model(use_gan=False)
    trainer = _trainer(model, tmp_path, grad_accum_every=2,
                       ema_kwargs=dict(update_after_step=0, update_every=1,
                                       beta=0.5))
    dl_iter = cycle(trainer.dataloader)

    params_before = np.asarray(jax.tree.leaves(model.params)[0]).copy()
    m1 = trainer.train_step(dl_iter)
    m2 = trainer.train_step(dl_iter)
    assert trainer.step == 2
    assert np.isfinite(m1['total_loss']) and np.isfinite(m2['total_loss'])

    # codebook-health canaries (VERDICT r4 #4): mean bit entropy in [0, ln2]
    # (exactly 0.0 is legitimate at init — all tokens on one code — and is
    # precisely the collapse signal the metric exists to expose), cumulative
    # unique codes positive and non-decreasing
    assert 0.0 <= float(m1['mean_bit_entropy']) <= np.log(2) + 1e-6
    assert 1 <= float(m1['codebook_unique_codes']) <= 64
    assert float(m2['codebook_unique_codes']) >= float(
        m1['codebook_unique_codes'])

    params_after = np.asarray(jax.tree.leaves(model.params)[0])
    assert np.abs(params_after - params_before).max() > 0

    # EMA is finite and tokenize-through-EMA works
    ema_leaf = np.asarray(jax.tree.leaves(trainer.ema_params)[0])
    assert np.isfinite(ema_leaf).all()
    video = np.random.default_rng(0).uniform(
        size=(1, FRAMES, SIZE, SIZE, 3)).astype(np.float32)
    codes = trainer.tokenize(video)
    assert codes.shape[0] == 1

    # validation + GIF dump (reference trainer.py:452-510)
    valid_iter = cycle(trainer.valid_dataloader)
    recon_loss, ema_loss = trainer.valid_step(valid_iter)
    assert np.isfinite(recon_loss) and np.isfinite(ema_loss)
    assert len(list((tmp_path / 'results').glob('*.gif'))) == 1

    # checkpoint -> fresh trainer -> resume (reference trainer.py:291-330)
    ckpt = tmp_path / 'ckpts' / 'manual'
    trainer.save(ckpt)

    model2 = _model(use_gan=False)
    trainer2 = _trainer(model2, tmp_path, grad_accum_every=2)
    trainer2.load(ckpt)
    assert trainer2.step == 2
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(model.params)[0]),
        np.asarray(jax.tree.leaves(model2.params)[0]))
    m = trainer2.train_step(dl_iter)
    assert np.isfinite(m['total_loss'])


def test_train_with_gan_delayed_start_and_gp(tmp_path):
    """Covers: discr_start_after_step gating, discriminator step, gradient
    penalty cadence, GAN checkpoint round-trip."""
    model = _model(use_gan=True)
    trainer = _trainer(model, tmp_path, discr_start_after_step=1,
                       apply_gradient_penalty_every=2)
    dl_iter = cycle(trainer.dataloader)

    m1 = trainer.train_step(dl_iter)       # step 0: no adversarial yet
    assert 'discr_loss' not in m1
    m2 = trainer.train_step(dl_iter)       # step 1: (1+1) > 1 -> GAN on
    assert 'discr_loss' in m2
    assert np.isfinite(m2['discr_loss'])
    # step 1 % 2 != 0 -> no gradient penalty; step 2 -> penalty on
    m3 = trainer.train_step(dl_iter)
    assert np.isfinite(m3['gradient_penalty'])

    ckpt = tmp_path / 'ckpts' / 'gan'
    trainer.save(ckpt)
    model2 = _model(use_gan=True)
    trainer2 = _trainer(model2, tmp_path, discr_start_after_step=1,
                        apply_gradient_penalty_every=2)
    trainer2.load(ckpt)
    assert trainer2.step == 3
    import jax
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(model.discr_params)[0]),
        np.asarray(jax.tree.leaves(model2.discr_params)[0]))


def test_trainer_with_video_files_dataset(tmp_path):
    rng = np.random.default_rng(0)
    data_dir = tmp_path / 'videos'
    data_dir.mkdir()
    for i in range(8):
        vid = rng.uniform(size=(FRAMES, SIZE, SIZE, 3)).astype(np.float32)
        video_array_to_gif(vid, str(data_dir / f'v{i}.gif'))

    import jax

    from magvit2_pytorch_tpu.parallel import make_mesh

    model = _model(use_gan=False)
    trainer = _trainer(model, tmp_path, dataset=None,
                       dataset_folder=str(data_dir), num_frames=FRAMES,
                       valid_frac=0.25, batch_size=4,
                       mesh=make_mesh(data=4, devices=jax.devices()[:4]))
    m = trainer.train_step(cycle(trainer.dataloader))
    assert np.isfinite(m['total_loss'])


def test_tensor_parallel_mesh_training(tmp_path):
    """dp x tp mesh: batch over 'data', large channel dims over 'tensor' —
    XLA GSPMD inserts the collectives (beyond-reference capability)."""
    import jax

    from magvit2_pytorch_tpu.parallel import make_mesh

    mesh = make_mesh(data=4, tensor=2, devices=jax.devices()[:8])
    model = _model(use_gan=False)
    trainer = _trainer(model, tmp_path, batch_size=4, mesh=mesh,
                       tensor_parallel=True)
    m = trainer.train_step(cycle(trainer.dataloader))
    assert np.isfinite(m['total_loss'])
    m2 = trainer.train_step(cycle(trainer.dataloader))
    assert np.isfinite(m2['total_loss'])


def test_per_discriminator_clip_isolation(tmp_path):
    """Reference GAN optimizer parity (VERDICT r2 #7): the reference builds
    ONE optimizer per discriminator (reference trainer.py:156-157,209-217),
    so with max_grad_norm a huge multiscale gradient must NOT shrink the main
    discriminator's update. A single shared clip-chain would scale the main
    discriminator's gradients by max_norm/global_norm ~ 0 and Adam's eps
    would crush its update."""
    import jax
    import jax.numpy as jnp

    model = _model(
        use_gan=True,
        multiscale_discrs=(dict(dim=4, max_dim=16, downscale_factor=2),),
    )
    trainer = _trainer(model, tmp_path, max_grad_norm=1.0)
    opt = trainer.discr_optimizer
    tree = trainer._discr_tree()

    def updates_for(ms_scale):
        grads = {
            'discr': jax.tree.map(lambda p: jnp.full_like(p, 1e-2),
                                  tree['discr']),
            'multiscale': tuple(
                jax.tree.map(lambda p: jnp.full_like(p, ms_scale), p)
                for p in tree['multiscale']),
        }
        state = opt.init(tree)
        updates, _ = opt.update(grads, state, tree)
        return updates

    small = updates_for(1e-2)
    huge = updates_for(1e8)

    # main-discr update identical whether the multiscale grads are tiny or
    # enormous — per-discriminator clipping
    for a, b in zip(jax.tree.leaves(small['discr']),
                    jax.tree.leaves(huge['discr'])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)
    # and the huge multiscale grad was itself clipped, not applied raw
    ms_leaves = jax.tree.leaves(huge['multiscale'])
    assert max(float(np.abs(np.asarray(l)).max()) for l in ms_leaves) < 1.0


def test_tensor_parallel_matches_data_parallel(tmp_path):
    """TP honesty audit (round-2 review weak #5): the dp2xtp2 generator step
    must (a) compute the SAME update as plain dp4 from identical state — TP
    is a layout, not a different algorithm — and (b) actually partition:
    its compiled HLO must contain more collectives than the pure-DP program
    (GSPMD inserts the channel-dim all-gathers/reduces TP implies)."""
    import jax

    from magvit2_pytorch_tpu.parallel import make_mesh

    def one_step(tensor_parallel, tag):
        mesh = (make_mesh(data=2, tensor=2, devices=jax.devices()[:4])
                if tensor_parallel else
                make_mesh(data=4, devices=jax.devices()[:4]))
        # dims large enough to pass tensor_parallel_shardings' min_elements
        # gate (1<<14) — the default test model would shard NOTHING and make
        # this audit vacuous
        model = VideoTokenizer(
            image_size=SIZE, init_dim=32, codebook_size=64,
            layers=('residual', ('compress_space', 64)),
            use_gan=False, perceptual_loss_weight=0.0, seed=0)
        trainer = _trainer(model, tmp_path / tag, batch_size=4, mesh=mesh,
                           tensor_parallel=tensor_parallel)
        if tensor_parallel:
            # at least one leaf must really be partitioned over 'tensor'
            n_sharded = sum(
                1 for leaf in jax.tree.leaves(model.params)
                if 'tensor' in str(getattr(leaf, 'sharding', '')))
            assert n_sharded > 0, 'TP placement sharded no parameters'
        m = trainer.train_step(cycle(trainer.dataloader))
        assert np.isfinite(m['total_loss'])
        # compiled HLO of the jitted generator step, for the collective
        # audit — lower with the trainer's REAL (sharded) arrays so GSPMD
        # sees the actual placements (bare ShapeDtypeStructs would compile a
        # single-device program with no collectives at all)
        fn = trainer._gen_step_fn(False)
        import jax.numpy as jnp

        batches = trainer._put_global(
            np.zeros((trainer.grad_accum_every, 4, FRAMES, SIZE, SIZE, 3),
                     np.dtype(trainer.policy.compute_dtype)),
            leading_none=1)
        txt = fn.lower(
            model.params, trainer.opt_state, trainer.ema_params,
            model.discr_params, tuple(model.multiscale_params),
            model.vgg_params, batches,
            jax.random.PRNGKey(0), jnp.asarray(0, jnp.int32),
            trainer._code_seen,
        ).compile().as_text()
        ncoll = sum(txt.count(op) for op in
                    ('all-reduce', 'all-gather', 'reduce-scatter',
                     'collective-permute'))
        return jax.device_get(model.params), ncoll

    params_dp, coll_dp = one_step(False, 'dp')
    params_tp, coll_tp = one_step(True, 'tp')

    # (a) same math: one optimizer step from identical state/batch/rng
    flat_dp = jax.tree_util.tree_leaves_with_path(params_dp)
    flat_tp = jax.tree_util.tree_leaves_with_path(params_tp)
    for (pa, a), (_, b) in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-4, atol=2e-5,
            err_msg=f'dp4 vs dp2xtp2 diverged at {jax.tree_util.keystr(pa)}')

    # (b) TP really partitions: strictly more collectives than pure DP
    assert coll_tp > coll_dp, (coll_tp, coll_dp)


class SyntheticImages:
    """In-memory images dataset: items are (H, W, C) like ImageDataset
    (data/datasets.py ImageDataset.__getitem__)."""

    def __init__(self, n=24, size=SIZE, c=3, seed=0):
        rng = np.random.default_rng(seed)
        self.items = rng.uniform(size=(n, size, size, c)).astype(np.float32)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_trainer_images_mode(tmp_path):
    """Regression for the r3 images-mode fix (commit 55cb66e): 4D image
    batches must flow through _next_batches (lift to single-frame videos —
    reference magvit2_pytorch.py:1675-1687 images-mode rearrange) into
    train_step AND valid_step without crashing. Before the fix this raised in
    the jitted step on the 5D stacked batch."""
    model = _model(use_gan=False)
    trainer = _trainer(model, tmp_path, dataset=SyntheticImages(),
                       grad_accum_every=2, valid_frac=0.25)
    dl_iter = cycle(trainer.dataloader)

    m1 = trainer.train_step(dl_iter)
    m2 = trainer.train_step(dl_iter)
    assert np.isfinite(m1['total_loss']) and np.isfinite(m2['total_loss'])

    # validation over 4D batches: recon losses, PSNR/utilization aggregation,
    # and the 4D->5D GIF-grid lift (trainer.py valid_step ndim==4 branch)
    valid_iter = cycle(trainer.valid_dataloader)
    recon_loss, ema_loss = trainer.valid_step(valid_iter)
    assert np.isfinite(recon_loss) and np.isfinite(ema_loss)
    assert len(list((tmp_path / 'results').glob('*.gif'))) == 1


def test_split_grad_accum_matches_monolithic(tmp_path):
    """grad_accum_split=True (one compiled micro-grad program dispatched per
    micro-batch + one apply program) must produce the same training
    trajectory and the same metric keys as the monolithic unrolled-accum
    step — split accum is a compile-size/memory strategy, not different
    math. Covers gen + discr + GP paths by crossing discr_start mid-run."""
    import jax

    data = SyntheticVideos(n=32, seed=3).items

    def batch_iter():
        i = 0
        while True:
            lo = (i * 8) % 32
            yield (data[lo:lo + 8],)
            i += 1

    def run(split, tag):
        model = _model(use_gan=True)
        tr = _trainer(model, tmp_path / tag, batch_size=8,
                      grad_accum_every=2, grad_accum_split=split,
                      discr_start_after_step=1, num_train_steps=3)
        assert tr.grad_accum_split is split
        it = batch_iter()
        last = None
        for _ in range(3):   # step 0 gen-only; steps 1-2 adversarial (+GP)
            last = tr.train_step(it)
        return (jax.device_get(model.params),
                jax.device_get(model.discr_params),
                {k: float(v) for k, v in last.items()})

    p_mono, d_mono, m_mono = run(False, 'mono')
    p_split, d_split, m_split = run(True, 'split')

    assert set(m_mono) == set(m_split), (set(m_mono), set(m_split))
    for k in m_mono:
        np.testing.assert_allclose(m_mono[k], m_split[k], rtol=2e-3,
                                   atol=2e-4, err_msg=f'metric {k}')
    for name, (a, b) in {'gen': (p_mono, p_split),
                         'discr': (d_mono, d_split)}.items():
        fa = jax.tree_util.tree_leaves_with_path(a)
        fb = jax.tree_util.tree_leaves_with_path(b)
        assert len(fa) == len(fb)
        for (pa, la), (_, lb) in zip(fa, fb):
            np.testing.assert_allclose(
                np.asarray(la, np.float32), np.asarray(lb, np.float32),
                rtol=2e-4, atol=2e-5,
                err_msg=f'{name} diverged at {jax.tree_util.keystr(pa)}')


def test_large_codebook_parity_temperature_warns():
    """Constructing an LFQ tokenizer with codebook_size >= 2^14 at the
    reference-parity inv_temperature emits the collapse warning (measured:
    results/codebook_2e18_t2.log); tempered knob stays silent."""
    import warnings

    kw = dict(image_size=SIZE, init_dim=8,
              layers=('residual', ('compress_space', 12)),
              use_gan=False, perceptual_loss_weight=0.0)
    with pytest.warns(UserWarning, match='collapses permanently'):
        VideoTokenizer(codebook_size=2 ** 14, **kw, seed=0)
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        VideoTokenizer(codebook_size=2 ** 14,
                       lfq_entropy_inv_temperature=2.0, **kw, seed=0)
        VideoTokenizer(codebook_size=512, **kw, seed=0)
