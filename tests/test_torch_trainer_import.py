"""Trainer-level torch-checkpoint resume (reference trainer.py:291-330).

Builds a real reference VideoTokenizer (GAN on) via the fixture loader, runs
its actual torch Adam optimizers (reference optimizer.py get_optimizer) for a
couple of steps so the moments are non-trivial, assembles the exact package
layout ``VideoTokenizerTrainer.save`` writes (trainer.py:291-310), and imports
it with ``load_torch_checkpoint`` — checking weights, EMA, discriminator
logits parity, Adam moment tensors, and the step counter.
"""

import importlib.util
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent))

from magvit2_pytorch_tpu.models import VideoTokenizer
from magvit2_pytorch_tpu.training.trainer import (
    VideoTokenizerTrainer,
    _fill_adam_state,
)

REF = pathlib.Path('/root/reference')

TOK_KWARGS = dict(
    image_size=16,
    init_dim=8,
    codebook_size=64,
    layers=('residual', 'compress_space'),
    use_gan=True,
    perceptual_loss_weight=0.0,
)


def _load_ref_optimizer_module():
    spec = importlib.util.spec_from_file_location(
        'ref_optimizer', REF / 'magvit2_pytorch' / 'optimizer.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _cl(x):  # torch channel-first -> channels-last
    return np.moveaxis(np.asarray(x), 1, -1)


class _Clips:
    def __init__(self, arr):
        self.arr = arr

    def __len__(self):
        return len(self.arr)

    def __getitem__(self, i):
        return self.arr[i]


@pytest.fixture(scope='module')
def torch_pkg(tmp_path_factory):
    """A reference trainer `.pt` package with stepped Adam optimizers."""
    import torch

    from fixtures.ref_loader import load_reference_module

    ref = load_reference_module()
    ref_opt = _load_ref_optimizer_module()

    torch.manual_seed(0)
    ref_tok = ref.VideoTokenizer(**TOK_KWARGS, flash_attn=False)
    ref_tok.train()

    # step the real optimizers with synthetic (seeded, per-tensor random)
    # gradients: Adam moments become non-trivial and layout-sensitive, so a
    # mis-mapped transpose in the importer cannot cancel out
    gen = torch.Generator().manual_seed(1)
    opt = ref_opt.get_optimizer(ref_tok.parameters(), lr=1e-4, wd=1e-2)
    dopt = ref_opt.get_optimizer(ref_tok.discr_parameters(), lr=1e-4, wd=1e-2)
    for _ in range(2):
        for p in ref_tok.parameters():
            p.grad = torch.randn(p.shape, generator=gen)
        for p in ref_tok.discr_parameters():
            p.grad = torch.randn(p.shape, generator=gen)
        opt.step()
        dopt.step()
        opt.zero_grad()
        dopt.zero_grad()

    # EMA state_dict as ema_pytorch's EMA(include_online_model=False) lays it
    # out (reference trainer.py:109-113): 'initted'/'step' buffers plus the
    # shadow copy under 'ema_model.'. Perturb the shadow so the test can tell
    # EMA params from online params after import.
    ema_sd = {'initted': torch.tensor(True), 'step': torch.tensor(2)}
    for k, v in ref_tok.state_dict().items():
        ema_sd[f'ema_model.{k}'] = (
            v * 1.5 if torch.is_floating_point(v) else v)

    pkg = dict(
        model=ref_tok.state_dict(),
        ema_model=ema_sd,
        optimizer=opt.state_dict(),
        discr_optimizer=dopt.state_dict(),
        warmup={}, scheduler={}, discr_warmup={}, discr_scheduler={},
        step=17,
    )
    path = tmp_path_factory.mktemp('torch_ckpt') / 'trainer.pt'
    torch.save(pkg, str(path))
    return dict(path=path, ref_tok=ref_tok, pkg=pkg)


@pytest.fixture(scope='module')
def loaded_trainer(torch_pkg):
    tok = VideoTokenizer(**TOK_KWARGS, seed=0)
    rng = np.random.default_rng(0)
    data = rng.random((16, 5, 16, 16, 3), np.float32)
    trainer = VideoTokenizerTrainer(
        tok, batch_size=8, num_train_steps=100, warmup_steps=10,
        dataset=_Clips(data), valid_frac=0.0, use_wandb_tracking=False)
    trainer.load_torch_checkpoint(torch_pkg['path'])
    return trainer


def _adam_states(opt_state):
    import optax
    found = []

    def rec(s):
        if isinstance(s, optax.ScaleByAdamState):
            found.append(s)
        elif hasattr(s, '_fields'):
            for f in s._fields:
                rec(getattr(s, f))
        elif isinstance(s, (tuple, list)):
            for x in s:
                rec(x)
        elif isinstance(s, dict):
            for x in s.values():
                rec(x)

    rec(opt_state)
    return found


def test_weights_and_step_imported(torch_pkg, loaded_trainer):
    trainer = loaded_trainer
    ref_sd = torch_pkg['pkg']['model']
    # conv_in kernel: (o, i, kt, kh, kw) -> (kt, kh, kw, i, o)
    want = np.asarray(ref_sd['conv_in.conv.weight']).transpose(2, 3, 4, 1, 0)
    got = np.asarray(trainer.model.params['conv_in']['kernel'])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # EMA shadow was 1.5x the online weights
    ema = np.asarray(trainer.ema_params['conv_in']['kernel'])
    np.testing.assert_allclose(ema, want * 1.5, rtol=1e-6)
    assert trainer.step == 17


def test_generator_adam_moments_imported(torch_pkg, loaded_trainer):
    import torch

    trainer = loaded_trainer
    ref_tok = torch_pkg['ref_tok']
    opt_sd = torch_pkg['pkg']['optimizer']

    # rebuild the index -> param-name map independently (wd>0 => two groups,
    # ndim>=2 first — reference optimizer.py:3-10,35-42)
    names = [k for k, _ in ref_tok.state_dict().items()]
    param_names = [n for n in names
                   if n in {k for k, v in ref_tok.named_parameters()}]
    named = dict(ref_tok.named_parameters())
    gen_names = [n for n, p in named.items()
                 if not n.startswith(('discr.', 'multiscale_discrs.', 'vgg.'))]
    # parameters() order: explicit module list (magvit2_pytorch.py:1460-1471)
    mod_order = ('conv_in', 'conv_in_first_frame', 'conv_out_first_frame',
                 'conv_out', 'encoder_layers', 'decoder_layers',
                 'encoder_cond_in', 'decoder_cond_in', 'quantizers')
    ordered = [n for m in mod_order for n in gen_names
               if n.split('.', 1)[0] == m]
    seq = ([n for n in ordered if named[n].ndim >= 2]
           + [n for n in ordered if named[n].ndim < 2])
    idxs = [i for g in opt_sd['param_groups'] for i in g['params']]
    name_of = dict(zip(idxs, seq))

    # cross-check: every torch param's exp_avg must equal the param-shaped
    # tensor the optimizer actually holds (sanity of the mapping itself)
    for i, st in opt_sd['state'].items():
        assert st['exp_avg'].shape == named[name_of[int(i)]].shape

    # conv_in kernel moment, converted with the conv transform
    i_conv = next(i for i, n in name_of.items() if n == 'conv_in.conv.weight')
    want_mu = np.asarray(
        opt_sd['state'][i_conv]['exp_avg']).transpose(2, 3, 4, 1, 0)
    want_nu = np.asarray(
        opt_sd['state'][i_conv]['exp_avg_sq']).transpose(2, 3, 4, 1, 0)

    adams = _adam_states(trainer.opt_state)
    assert len(adams) == 1
    st = adams[0]
    np.testing.assert_allclose(
        np.asarray(st.mu['conv_in']['kernel']), want_mu, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st.nu['conv_in']['kernel']), want_nu, rtol=1e-6)
    assert int(st.count) == 2
    assert torch is not None


def test_discr_logits_parity(torch_pkg, loaded_trainer):
    """Converted discriminator weights produce the reference's logits."""
    import torch

    trainer = loaded_trainer
    ref_tok = torch_pkg['ref_tok']
    rng = np.random.default_rng(2)
    img = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)

    with torch.no_grad():
        want = ref_tok.discr(torch.from_numpy(img)).numpy().reshape(-1)

    discr_params = jax.tree.map(
        lambda x: np.asarray(x), trainer.model.discr_params)
    got = trainer.model.discr.apply(
        {'params': discr_params}, jnp.asarray(_cl(img)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_discr_adam_moments_imported(torch_pkg, loaded_trainer):
    trainer = loaded_trainer
    dopt_sd = torch_pkg['pkg']['discr_optimizer']
    ref_tok = torch_pkg['ref_tok']

    dnamed = [(n, p) for n, p in ref_tok.discr.named_parameters()]
    seq = ([n for n, p in dnamed if p.ndim >= 2]
           + [n for n, p in dnamed if p.ndim < 2])
    idxs = [i for g in dopt_sd['param_groups'] for i in g['params']]
    name_of = dict(zip(idxs, seq))
    i_conv = next(i for i, n in name_of.items()
                  if n == 'blocks.0.0.conv_res.weight')
    want_mu = np.asarray(
        dopt_sd['state'][i_conv]['exp_avg']).transpose(2, 3, 1, 0)

    adams = _adam_states(trainer.discr_opt_state)
    assert len(adams) == 1
    st = adams[0]
    np.testing.assert_allclose(
        np.asarray(st.mu['discr']['block_0']['conv_res']['kernel']),
        want_mu, rtol=1e-6)
    assert int(st.count) == 2


@pytest.fixture(scope='module')
def ms_torch_pkg(tmp_path_factory):
    """A reference trainer package whose tokenizer carries TWO multiscale
    discriminators: scale 0 is the reference's own ``Discriminator`` (the
    convertible common case), scale 1 is an arbitrary user Module (must fall
    back to initialized params). Per-scale Adam optimizers are stepped and
    saved as ``multiscale_discr_optimizer_{i}`` (reference trainer.py:307-308).
    """
    import torch

    from fixtures.ref_loader import load_reference_module

    ref = load_reference_module()
    ref_opt = _load_ref_optimizer_module()

    torch.manual_seed(0)
    ms0 = ref.Discriminator(dim=4, image_size=8, max_dim=16,
                            antialiased_downsample=True)
    ms1 = torch.nn.Conv2d(3, 1, 3)  # arbitrary user module
    ref_tok = ref.VideoTokenizer(
        **TOK_KWARGS, flash_attn=False, multiscale_discrs=(ms0, ms1))
    ref_tok.train()

    gen = torch.Generator().manual_seed(1)
    opt = ref_opt.get_optimizer(ref_tok.parameters(), lr=1e-4, wd=1e-2)
    dopt = ref_opt.get_optimizer(ref_tok.discr_parameters(), lr=1e-4, wd=1e-2)
    ms_opts = [ref_opt.get_optimizer(d.parameters(), lr=1e-4, wd=1e-2)
               for d in ref_tok.multiscale_discrs]
    for _ in range(2):
        for p in ref_tok.parameters():
            p.grad = torch.randn(p.shape, generator=gen)
        for d in ref_tok.multiscale_discrs:
            for p in d.parameters():
                p.grad = torch.randn(p.shape, generator=gen)
        for o in (opt, dopt, *ms_opts):
            o.step()
            o.zero_grad()

    pkg = dict(
        model=ref_tok.state_dict(),
        ema_model={'initted': torch.tensor(True), 'step': torch.tensor(2),
                   **{f'ema_model.{k}': v
                      for k, v in ref_tok.state_dict().items()}},
        optimizer=opt.state_dict(),
        discr_optimizer=dopt.state_dict(),
        warmup={}, scheduler={}, discr_warmup={}, discr_scheduler={},
        step=5,
    )
    for i, o in enumerate(ms_opts):
        pkg[f'multiscale_discr_optimizer_{i}'] = o.state_dict()
    path = tmp_path_factory.mktemp('ms_torch_ckpt') / 'trainer.pt'
    torch.save(pkg, str(path))
    return dict(path=path, ref_tok=ref_tok, pkg=pkg)


def test_multiscale_discr_import(ms_torch_pkg):
    """Scale 0 (reference-Discriminator-shaped) imports weights + Adam
    moments; scale 1 (arbitrary module) keeps initialized params with a
    warning."""
    import torch

    tok = VideoTokenizer(
        **TOK_KWARGS, seed=0,
        multiscale_discrs=(
            dict(dim=4, max_dim=16, downscale_factor=2),
            dict(dim=4, max_dim=16, downscale_factor=4),
        ))
    rng = np.random.default_rng(0)
    data = rng.random((16, 5, 16, 16, 3), np.float32)
    trainer = VideoTokenizerTrainer(
        tok, batch_size=8, num_train_steps=100, warmup_steps=10,
        dataset=_Clips(data), valid_frac=0.0, use_wandb_tracking=False)
    init_ms1 = jax.tree.map(np.asarray, trainer.model.multiscale_params[1])

    with pytest.warns(UserWarning, match='multiscale discriminator 1'):
        trainer.load_torch_checkpoint(ms_torch_pkg['path'])

    ref_sd = ms_torch_pkg['pkg']['model']
    want = np.asarray(
        ref_sd['multiscale_discrs.0.blocks.0.0.conv_res.weight']
    ).transpose(2, 3, 1, 0)
    got = np.asarray(
        trainer.model.multiscale_params[0]['discr']['block_0']['conv_res']
        ['kernel'])
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # scale 1 untouched
    for a, b in zip(jax.tree.leaves(init_ms1),
                    jax.tree.leaves(jax.tree.map(
                        np.asarray, trainer.model.multiscale_params[1]))):
        np.testing.assert_array_equal(a, b)

    # scale-0 Adam moments landed in the multiscale slot of the discr
    # optimizer state (multi_transform: one adam per scale + the main discr)
    ms0_sd = ms_torch_pkg['pkg']['multiscale_discr_optimizer_0']
    dnamed = list(ms_torch_pkg['ref_tok'].multiscale_discrs[0]
                  .named_parameters())
    seq = ([n for n, p in dnamed if p.ndim >= 2]
           + [n for n, p in dnamed if p.ndim < 2])
    idxs = [i for g in ms0_sd['param_groups'] for i in g['params']]
    name_of = dict(zip(idxs, seq))
    i_conv = next(i for i, n in name_of.items()
                  if n == 'blocks.0.0.conv_res.weight')
    want_mu = np.asarray(
        ms0_sd['state'][i_conv]['exp_avg']).transpose(2, 3, 1, 0)

    adams = _adam_states(trainer.discr_opt_state)
    got_mus = [np.asarray(jax.tree.leaves(st.mu)[0]) for st in adams
               if jax.tree.leaves(st.mu)]
    match = [m for st in adams
             for m in [_find_leaf(st.mu, ('multiscale', 0, 'discr', 'block_0',
                                          'conv_res', 'kernel'))]
             if m is not None]
    assert match, f'no multiscale adam state found ({len(adams)} adams)'
    np.testing.assert_allclose(match[0], want_mu, rtol=1e-6)
    assert got_mus  # structure sanity
    assert torch is not None


def _find_leaf(tree, path):
    """Walk ``tree`` by mixed dict-key / sequence-index path; None if any
    step is missing (e.g. a MaskedNode from multi_transform)."""
    import optax

    cur = tree
    for p in path:
        if isinstance(cur, optax.MaskedNode):
            return None
        try:
            cur = cur[p]
        except (KeyError, IndexError, TypeError):
            return None
    if isinstance(cur, optax.MaskedNode):
        return None
    return np.asarray(cur)


def test_fill_adam_state_unit():
    """_fill_adam_state reaches adam + schedule counts through clip /
    apply_if_finite nesting and leaves other leaves alone."""
    import optax

    params = {'w': jnp.ones((2, 3)), 'b': jnp.zeros((3,))}
    tx = optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(1.0),
                    optax.adamw(optax.linear_schedule(0.0, 1.0, 10))),
        max_consecutive_errors=10)
    state = tx.init(params)
    mu = {'w': jnp.full((2, 3), 2.0), 'b': jnp.full((3,), 3.0)}
    nu = {'w': jnp.full((2, 3), 4.0), 'b': jnp.full((3,), 5.0)}
    new = _fill_adam_state(state, mu, nu, 7)

    adams = _adam_states(new)
    assert len(adams) == 1
    np.testing.assert_array_equal(np.asarray(adams[0].mu['w']), 2.0)
    np.testing.assert_array_equal(np.asarray(adams[0].nu['b']), 5.0)
    assert int(adams[0].count) == 7
    # apply_if_finite bookkeeping untouched
    assert int(new.notfinite_count) == 0
    # updates still apply (state remains structurally valid)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, new, params)
    assert jnp.all(jnp.isfinite(updates['w']))
