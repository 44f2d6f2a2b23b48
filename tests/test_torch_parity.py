"""Golden-fixture parity: the JAX rebuild vs the ACTUAL PyTorch reference.

Fixtures in tests/fixtures/data/ were generated (tests/fixtures/generate.py)
by running the real reference implementation (/root/reference) on CPU with
stubbed external deps (see tests/fixtures/ref_loader.py), plus a torch
re-derivation of the ``vector_quantize_pytorch`` LFQ/FSQ semantics
(tests/fixtures/vqp_torch.py — assumed-semantics ledger in its docstring).

Asserted here (the BASELINE.json parity contract):
- quantizer code indices match EXACTLY (LFQ bit order, FSQ mixed radix);
- quantized outputs / aux losses match numerically;
- ``load_torch_tokenizer_state_dict`` imports a reference checkpoint and the
  converted model reproduces the reference's latents, code indices (exact)
  and reconstructions (<= 1e-3, comfortably tighter in practice).
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magvit2_pytorch_tpu.models import VideoTokenizer
from magvit2_pytorch_tpu.models.torch_import import (
    load_torch_tokenizer_state_dict,
)
from magvit2_pytorch_tpu.ops.quantizers import FSQ, LFQ

DATA = Path(__file__).parent / 'fixtures' / 'data'


def _load(name):
    f = np.load(DATA / f'{name}.npz')
    out = {k: f[k] for k in f.files}
    meta_key = 'meta' if 'meta' in out else 'config'
    meta = json.loads(bytes(out.pop(meta_key)).decode())
    sd = {k[3:]: out.pop(k) for k in list(out) if k.startswith('sd.')}
    return meta, sd, out


def _cl(x):  # torch channel-first (b, d, ...) -> channels-last
    return np.moveaxis(x, 1, -1)


# ------------------------------------------------------------------ LFQ/FSQ

LFQ_CASES = ['lfq_noproj', 'lfq_noproj_eval', 'lfq_proj_clamp',
             'lfq_spherical', 'lfq_multicb']


@pytest.mark.parametrize('name', LFQ_CASES)
def test_lfq_matches_torch_oracle(name):
    meta, sd, arr = _load(name)
    lfq = LFQ(dim=meta['dim'], codebook_size=meta['codebook_size'],
              num_codebooks=meta['num_codebooks'],
              entropy_loss_weight=0.1, commitment_loss_weight=1.0,
              diversity_gamma=2.5, soft_clamp_input_value=meta['soft_clamp'],
              spherical=meta['spherical'])

    params = {}
    if 'project_in.weight' in sd:
        params = {
            'project_in': {'kernel': sd['project_in.weight'].T,
                           'bias': sd['project_in.bias']},
            'project_out': {'kernel': sd['project_out.weight'].T,
                            'bias': sd['project_out.bias']},
        }

    x = jnp.asarray(_cl(arr['x']))
    out = lfq.apply({'params': params}, x, train=meta['train'])

    np.testing.assert_array_equal(np.asarray(out.indices), arr['indices'])
    np.testing.assert_allclose(np.asarray(out.quantized), _cl(arr['quantized']),
                               atol=1e-5)
    if meta['train']:
        np.testing.assert_allclose(float(out.aux_loss), arr['aux'],
                                   rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(float(out.breakdown.per_sample_entropy),
                                   arr['per_sample_entropy'],
                                   rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(float(out.breakdown.codebook_entropy),
                                   arr['batch_entropy'], rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(float(out.breakdown.commitment),
                                   arr['commitment'], rtol=2e-4, atol=1e-5)
    else:
        assert float(out.aux_loss) == 0.0

    decoded = lfq.apply({'params': params}, jnp.asarray(arr['indices']),
                        method=LFQ.indices_to_codes)
    np.testing.assert_allclose(np.asarray(decoded), _cl(arr['decoded']),
                               atol=1e-5)


FSQ_CASES = ['fsq_basic', 'fsq_proj', 'fsq_multicb']


@pytest.mark.parametrize('name', FSQ_CASES)
def test_fsq_matches_torch_oracle(name):
    meta, sd, arr = _load(name)
    fsq = FSQ(levels=tuple(meta['levels']), dim=meta['dim'],
              num_codebooks=meta['num_codebooks'])

    params = {}
    if 'project_in.weight' in sd:
        params = {
            'project_in': {'kernel': sd['project_in.weight'].T,
                           'bias': sd['project_in.bias']},
            'project_out': {'kernel': sd['project_out.weight'].T,
                            'bias': sd['project_out.bias']},
        }

    x = jnp.asarray(_cl(arr['x']))
    out = fsq.apply({'params': params}, x)

    np.testing.assert_array_equal(np.asarray(out.indices), arr['indices'])
    np.testing.assert_allclose(np.asarray(out.quantized), _cl(arr['quantized']),
                               atol=1e-5)

    decoded = fsq.apply({'params': params}, jnp.asarray(arr['indices']),
                        method=FSQ.indices_to_codes)
    np.testing.assert_allclose(np.asarray(decoded), _cl(arr['decoded']),
                               atol=1e-5)


# --------------------------------------------------------- end-to-end model

TOK_CASES = ['tok_lfq', 'tok_fsq', 'tok_cond', 'tok_sff', 'tok_gateloop']


def _build_converted(config, sd):
    cfg = dict(config)
    cfg['layers'] = tuple(
        tuple(l) if isinstance(l, list) else l for l in cfg['layers'])
    if cfg.get('fsq_levels'):
        cfg['fsq_levels'] = tuple(cfg['fsq_levels'])
    tok = VideoTokenizer(seed=0, **cfg)
    converted = load_torch_tokenizer_state_dict(tok.config, sd)

    # converted tree must align leaf-for-leaf with the initialized template
    ref_paths = jax.tree_util.tree_structure(tok.params)
    conv_paths = jax.tree_util.tree_structure(converted)
    assert ref_paths == conv_paths, (
        f'param tree mismatch:\n{ref_paths}\nvs\n{conv_paths}')
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(tok.params),
            jax.tree_util.tree_leaves_with_path(converted)):
        assert a.shape == b.shape, f'{pa}: {a.shape} vs {b.shape}'

    tok.params = jax.tree.map(jnp.asarray, converted)
    return tok


@pytest.mark.parametrize('name', TOK_CASES)
def test_reference_checkpoint_import_end_to_end(name):
    _, sd, arr = _load(name)
    f = np.load(DATA / f'{name}.npz')
    config = json.loads(bytes(f['config']).decode())

    tok = _build_converted(config, sd)

    video = jnp.asarray(_cl(arr['video']))      # (b, t, h, w, c)
    cond = jnp.asarray(arr['cond']) if 'cond' in arr else None

    # 1. encoder latents match the reference encoder exactly (conv + attn path)
    latents = tok.encode(video, cond=cond)
    np.testing.assert_allclose(np.asarray(latents), _cl(arr['latents']),
                               atol=2e-4, rtol=1e-3)

    # 2. code indices match the reference EXACTLY
    codes = tok.tokenize(video, cond=cond)
    np.testing.assert_array_equal(np.asarray(codes), arr['codes'])

    # 3. reconstruction within the BASELINE contract (<= 1e-3)
    recon = tok.forward(video, cond=cond, return_recon=True, train=False)
    np.testing.assert_allclose(np.asarray(recon), _cl(arr['recon']), atol=1e-3)

    # 4. decode_from_code_indices round trip matches the reference's
    flat = np.asarray(codes).reshape(codes.shape[0], -1)
    recon_rt = tok.decode_from_code_indices(flat, cond=cond)
    np.testing.assert_allclose(np.asarray(recon_rt),
                               _cl(arr['recon_from_codes']), atol=1e-3)


def test_importer_strict_flags_unknown_keys():
    _, sd, _ = _load('tok_lfq')
    f = np.load(DATA / 'tok_lfq.npz')
    config = json.loads(bytes(f['config']).decode())
    sd['encoder_layers.999.bogus'] = np.zeros((1,), np.float32)
    cfg = dict(config)
    cfg['layers'] = tuple(
        tuple(l) if isinstance(l, list) else l for l in cfg['layers'])
    tok_cfg = VideoTokenizer(seed=0, **cfg).config
    with pytest.raises(AssertionError, match='unconverted'):
        load_torch_tokenizer_state_dict(tok_cfg, sd)


def _code_bits(codes, nbits):
    mask = (1 << np.arange(nbits - 1, -1, -1)).astype(np.int64)
    return (np.asarray(codes).astype(np.int64)[..., None] & mask) != 0


@pytest.mark.parametrize('name', ['tok_lfq', 'tok_fsq'])
def test_reference_parity_margin_contract(name):
    """Environment-robust parity: fp32 conv reduction order differs across
    XLA configurations (measured up to ~2e-3 per layer on CPU), so code bits
    may legitimately flip — but ONLY where the pre-quantization decision
    margin is within that noise. A conversion/layout bug flips bits at LARGE
    margins; this test distinguishes the two. (The strict exact-index test
    above is deterministic under the pinned conftest environment.)"""
    _, sd, arr = _load(name)
    f = np.load(DATA / f'{name}.npz')
    config = json.loads(bytes(f['config']).decode())

    tok = _build_converted(config, sd)
    video = jnp.asarray(_cl(arr['video']))
    codes = np.asarray(tok.tokenize(video))

    latents = jnp.asarray(_cl(arr['latents']))    # the REFERENCE's latents

    if name == 'tok_lfq':
        from magvit2_pytorch_tpu.ops.quantizers import LFQ
        z = tok.module.apply(
            {'params': tok.params}, latents,
            method=lambda m, x: m.quantizers.sign_values(x))
        margins = np.abs(np.asarray(z))[..., 0, :]        # (b,t,h,w,d)
        nbits = int(np.log2(tok.codebook_size))
        mismatch = _code_bits(codes, nbits) != _code_bits(arr['codes'], nbits)
    else:
        z = tok.module.apply(
            {'params': tok.params}, latents,
            method=lambda m, x: m.quantizers.bounded_values(x))
        b = np.asarray(z)[..., 0, :]
        margins = 0.5 - np.abs(b - np.round(b))           # dist to the boundary
        levels = np.asarray(config['fsq_levels'])
        basis = np.concatenate([[1], np.cumprod(levels[:-1])])
        my_digits = (np.asarray(codes)[..., None] // basis) % levels
        ref_digits = (arr['codes'][..., None] // basis) % levels
        mismatch = my_digits != ref_digits

    frac = mismatch.mean()
    assert frac <= 0.01, f'{frac:.2%} of code bits/digits flipped'
    if mismatch.any():
        worst = margins[mismatch].max()
        assert worst <= 5e-3, (
            f'bit flipped at margin {worst:.4f} — conversion bug, not '
            f'floating-point noise')

    # decoder driven by the REFERENCE's own codes: recon must track the
    # reference reconstruction without any flip confound
    recon_rt = tok.decode_from_code_indices(
        arr['codes'].reshape(arr['codes'].shape[0], -1))
    diff = np.abs(np.asarray(recon_rt) - _cl(arr['recon_from_codes']))
    # the decoder accumulates the same per-layer reduction-order noise
    # (~1e-2 tail observed across XLA CPU configs); the strict <=1e-3 bound
    # is asserted by the pinned-env test above
    assert np.quantile(diff, 0.999) <= 2e-2, np.quantile(diff, 0.999)
    assert diff.max() <= 1e-1, diff.max()


# ------------------------------------------------- one-call .pt import

@pytest.mark.skipif(not Path('/root/reference').exists(),
                    reason='reference checkout unavailable')
def test_init_and_load_from_torch_pt_package(tmp_path):
    """Save a real reference `.pt` package via the reference's own .save()
    (magvit2_pytorch.py:1495-1505) and import it with ONE call — config
    parsed from the embedded pickle, weights converted — then check exact
    code-index parity against the torch oracle."""
    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    import torch
    from fixtures.ref_loader import load_reference_module

    ref = load_reference_module()
    torch.manual_seed(0)
    ref_tok = ref.VideoTokenizer(
        image_size=32,
        init_dim=16,
        codebook_size=256,
        layers=('residual', 'compress_space', ('consecutive_residual', 2)),
        use_gan=False,
        perceptual_loss_weight=0.0,
        flash_attn=False,
    )
    ref_tok.eval()
    pt = tmp_path / 'ref_tok.pt'
    ref_tok.save(str(pt))

    tok = VideoTokenizer.init_and_load_from_torch(pt)
    assert tok.config.image_size == 32
    assert tok.config.init_dim == 16
    assert tok.config.codebook_size == 256
    assert tok.config.use_gan is False

    video_t = torch.randn(1, 3, 5, 32, 32)
    with torch.no_grad():
        codes_ref = ref_tok.tokenize(video_t)
    video_j = jnp.asarray(_cl(video_t.numpy()))
    codes = tok.tokenize(video_j)
    np.testing.assert_array_equal(np.asarray(codes), codes_ref.numpy())
