"""int8 inference path (ops/conv.py int8 branches + static calibration).

VERDICT r4 #3: the int8 path (MAGVIT2_TPU_INT8_CONV=1) shipped with zero CI
coverage — quantizer round-trip, conv numerics, code agreement on a small
config, static-calibration consistency, and the trainer's inference-only
guard are covered here. Reference has no int8 path; this is a TPU-native
extension gated off by default (reference conv: magvit2_pytorch.py:892-928).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magvit2_pytorch_tpu.models import VideoTokenizer
from magvit2_pytorch_tpu.ops.conv import (
    CausalConv3d,
    _quantize_per_channel_out,
    _quantize_per_tensor,
    int8_conv_enabled,
)

KW = dict(
    image_size=16,
    init_dim=128,
    codebook_size=64,
    layers=(('residual', 128), ('compress_space', 128)),
    use_gan=False,
    perceptual_loss_weight=0.0,
)


def test_quantize_per_tensor_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 3.0
    xq, xs = _quantize_per_tensor(x)
    assert xq.dtype == jnp.int8
    recon = xq.astype(jnp.float32) * xs
    # absmax symmetric quantization: error bounded by half a step
    assert float(jnp.max(jnp.abs(recon - x))) <= float(xs) * 0.5 + 1e-6


def test_quantize_per_channel_roundtrip():
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 16, 8)) * 0.2
    kq, ks = _quantize_per_channel_out(k)
    assert kq.dtype == jnp.int8 and ks.shape == (8,)
    recon = kq.astype(jnp.float32) * ks
    step = np.asarray(ks)
    err = np.abs(np.asarray(recon - k))
    assert (err <= step[None, None, None, None, :] * 0.5 + 1e-7).all()


def test_int8_gate_respects_channel_minimum(monkeypatch):
    monkeypatch.setenv('MAGVIT2_TPU_INT8_CONV', '1')
    assert int8_conv_enabled(128, 128)
    assert not int8_conv_enabled(64, 128)   # measured 0.96x at C=64 — stays bf16
    assert not int8_conv_enabled(128, 64)
    monkeypatch.delenv('MAGVIT2_TPU_INT8_CONV')
    assert not int8_conv_enabled(128, 128)


def test_int8_conv_numerics_bound(monkeypatch):
    """Dynamic int8 conv vs f32 conv on an eligible shape: bounded error."""
    conv = CausalConv3d(features=128, kernel_size=3)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 8, 8, 128)) * 0.5
    params = conv.init(jax.random.PRNGKey(3), x)
    want = conv.apply(params, x)
    monkeypatch.setenv('MAGVIT2_TPU_INT8_CONV', '1')
    got = conv.apply(params, x)
    scale = float(jnp.max(jnp.abs(want)))
    rel = float(jnp.max(jnp.abs(got - want))) / scale
    assert rel < 2e-2, rel


def test_int8_code_agreement_small_config(monkeypatch):
    """The whole tokenizer with int8 engaged agrees with bf16/f32 on most
    code indices (the headline-bench fidelity contract, in miniature)."""
    tok = VideoTokenizer(**KW, seed=0)
    v = jnp.asarray(np.random.default_rng(0).uniform(
        size=(2, 2, 16, 16, 3)).astype(np.float32))
    codes_ref = np.asarray(tok.forward(v, return_codes=True,
                                       return_recon=False))
    monkeypatch.setenv('MAGVIT2_TPU_INT8_CONV', '1')
    tok._jit_cache.clear()   # env gate is read at trace time
    codes_int8 = np.asarray(tok.forward(v, return_codes=True,
                                        return_recon=False))
    agreement = (codes_ref == codes_int8).mean()
    assert agreement >= 0.85, agreement


def test_int8_static_calibration_matches_dynamic(monkeypatch):
    """calibrate_int8 + static scales reproduce the dynamic path closely
    (same batch => the static per-tensor scale IS the dynamic one)."""
    monkeypatch.setenv('MAGVIT2_TPU_INT8_CONV', '1')
    tok = VideoTokenizer(**KW, seed=0)
    v = jnp.asarray(np.random.default_rng(1).uniform(
        size=(2, 2, 16, 16, 3)).astype(np.float32))
    r_dyn = np.asarray(tok.forward(v))
    n_sites = tok.calibrate_int8(v)
    assert n_sites >= 2   # the two eligible convs of the residual stage
    assert tok._int8_vars is not None
    r_static = np.asarray(tok.forward(v))
    assert np.abs(r_static - r_dyn).max() < 0.05
    # static collection carries pre-quantized kernels for raw-layout convs
    leaves = jax.tree.leaves(tok._int8_vars)
    assert any(l.dtype == jnp.int8 for l in leaves)


def test_int8_env_off_means_bf16_even_after_calibration(monkeypatch):
    monkeypatch.setenv('MAGVIT2_TPU_INT8_CONV', '1')
    tok = VideoTokenizer(**KW, seed=0)
    v = jnp.asarray(np.random.default_rng(2).uniform(
        size=(1, 2, 16, 16, 3)).astype(np.float32))
    tok.calibrate_int8(v)
    monkeypatch.delenv('MAGVIT2_TPU_INT8_CONV')
    assert tok._int8_active is None
    tok._jit_cache.clear()
    r_off = np.asarray(tok.forward(v))
    tok2 = VideoTokenizer(**KW, seed=0)
    r_ref = np.asarray(tok2.forward(v))
    np.testing.assert_allclose(r_off, r_ref, atol=1e-6)


def test_trainer_refuses_int8_env(monkeypatch, tmp_path):
    from magvit2_pytorch_tpu.training.trainer import VideoTokenizerTrainer

    monkeypatch.setenv('MAGVIT2_TPU_INT8_CONV', '1')
    tok = VideoTokenizer(**KW, seed=0)

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return np.zeros((2, 16, 16, 3), np.float32)

    with pytest.raises(RuntimeError, match='inference-only'):
        VideoTokenizerTrainer(
            tok, batch_size=8, num_train_steps=1, dataset=DS(),
            valid_frac=0.0, warmup_steps=1,
            checkpoints_folder=str(tmp_path / 'ck'),
            results_folder=str(tmp_path / 'res'))


def test_calibration_with_no_eligible_convs_is_a_noop(monkeypatch):
    """A config whose dims are all < 128 has no int8-eligible conv:
    calibrate_int8 returns 0 sites and leaves the dynamic path in place."""
    monkeypatch.setenv('MAGVIT2_TPU_INT8_CONV', '1')
    tok = VideoTokenizer(
        image_size=16, init_dim=8, codebook_size=64,
        layers=(('residual', 8), ('compress_space', 16)),
        use_gan=False, perceptual_loss_weight=0.0, seed=0)
    v = jnp.asarray(np.random.default_rng(3).uniform(
        size=(1, 2, 16, 16, 3)).astype(np.float32))
    assert tok.calibrate_int8(v) == 0
    assert tok._int8_vars is None
    assert np.isfinite(np.asarray(tok.forward(v))).all()


def test_packed_int8_gate_and_numerics(monkeypatch):
    """MAGVIT2_TPU_INT8_PACKED=1: a w-blocked c64 conv (physical 128-wide)
    takes the int8 path and stays within quantization-noise of the f32
    blocked conv; without the flag the blocked conv is untouched bf16."""
    from magvit2_pytorch_tpu.ops.conv import w_block, w_unblock

    conv = CausalConv3d(features=64, kernel_size=3)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 8, 8, 64)) * 0.5
    xb = w_block(x)
    params = conv.init(jax.random.PRNGKey(6), xb,
                       w_blocked_in=True, w_blocked_out=True)
    want = conv.apply(params, xb, w_blocked_in=True, w_blocked_out=True)

    monkeypatch.setenv('MAGVIT2_TPU_INT8_CONV', '1')
    # gate respects the PHYSICAL (blocked) widths only under INT8_PACKED
    got_off = conv.apply(params, xb, w_blocked_in=True, w_blocked_out=True)
    np.testing.assert_allclose(np.asarray(got_off, np.float32),
                               np.asarray(want, np.float32), atol=1e-6)

    monkeypatch.setenv('MAGVIT2_TPU_INT8_PACKED', '1')
    got = conv.apply(params, xb, w_blocked_in=True, w_blocked_out=True)
    assert not np.allclose(np.asarray(got, np.float32),
                           np.asarray(want, np.float32), atol=1e-7), (
        'int8 did not engage on the packed conv')
    scale = float(jnp.max(jnp.abs(want)))
    rel = float(jnp.max(jnp.abs(got - want))) / scale
    assert rel < 2e-2, rel
    # layout identity: unblocking the packed-int8 output matches running the
    # same int8 conv... (packed and unpacked int8 differ in quantization
    # grouping, so compare against the f32 UNPACKED conv at the same bound)
    got_unb = w_unblock(got)
    want_unb = conv.apply(params, x)
    rel_u = float(jnp.max(jnp.abs(got_unb - want_unb))) / scale
    assert rel_u < 2e-2, rel_u


def test_percentile_calibration_tightens_scales(monkeypatch):
    """calibrate_int8(percentile=...) records a clip statistic <= the absmax
    one, and the static forward stays finite/close (the clipped outliers
    saturate at the int8 rails instead of dilating every scale)."""
    monkeypatch.setenv('MAGVIT2_TPU_INT8_CONV', '1')
    tok = VideoTokenizer(**KW, seed=0)
    v = jnp.asarray(np.random.default_rng(4).uniform(
        size=(2, 2, 16, 16, 3)).astype(np.float32))
    tok.calibrate_int8(v)
    absmax_scales = {k: np.asarray(l) for k, l in
                     zip(range(10**6), jax.tree.leaves(tok._int8_vars))}
    r_absmax = np.asarray(tok.forward(v))
    tok.calibrate_int8(v, percentile=99.0)
    pct_leaves = jax.tree.leaves(tok._int8_vars)
    # every float scale under percentile-99 calibration is <= absmax's
    for i, l in enumerate(pct_leaves):
        a = absmax_scales[i]
        if np.asarray(l).dtype == np.int8:
            continue   # pre-quantized kernels (weight path is unaffected)
        assert (np.asarray(l) <= a + 1e-12).all()
    r_pct = np.asarray(tok.forward(v))
    assert np.isfinite(r_pct).all()
    assert np.abs(r_pct - r_absmax).max() < 0.1
