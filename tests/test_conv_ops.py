"""Golden-numerics tests: our XLA conv ops vs torch CPU ops with identical
weights. Validates the causal-padding-folded-into-conv lowering against the
reference's pad-then-conv semantics (magvit2_pytorch.py:892-928) without
copying any reference code."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from magvit2_pytorch_tpu.ops import (
    CausalConv3d,
    CausalConvTranspose3d,
    SameConv2d,
    blur,
)


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize('kernel', [(7, 7, 7), (3, 3, 3), (3, 1, 1)])
@pytest.mark.parametrize('stride,dilation', [(1, 1), (2, 1), (1, 2)])
def test_causal_conv3d_matches_torch(kernel, stride, dilation):
    rng = np.random.default_rng(0)
    b, t, h, w, cin, cout = 2, 8, 6, 6, 5, 7
    kt, kh, kw = kernel

    x = rng.normal(size=(b, t, h, w, cin)).astype(np.float32)
    mod = CausalConv3d(cout, kernel, stride=stride, dilation=dilation)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))

    # torch path: channel-first, pad front of time, then conv
    wt = _np(params['params']['kernel']).transpose(4, 3, 0, 1, 2)  # O I kt kh kw
    bias = _np(params['params']['bias'])
    xt = torch.tensor(x.transpose(0, 4, 1, 2, 3))
    time_pad = dilation * (kt - 1) + (1 - stride)
    xt = F.pad(xt, (kw // 2, kw // 2, kh // 2, kh // 2, time_pad, 0))
    ref = F.conv3d(xt, torch.tensor(wt), torch.tensor(bias),
                   stride=(stride, 1, 1), dilation=(dilation, 1, 1))
    ref = ref.numpy().transpose(0, 2, 3, 4, 1)

    np.testing.assert_allclose(_np(out), ref, atol=2e-5)


def test_causal_conv3d_is_causal():
    """Future frames must not influence past outputs."""
    mod = CausalConv3d(4, (3, 3, 3))
    x = np.random.default_rng(1).normal(size=(1, 8, 4, 4, 3)).astype(np.float32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out1 = mod.apply(params, jnp.asarray(x))

    x2 = x.copy()
    x2[:, 5:] += 100.0  # perturb only frames >= 5
    out2 = mod.apply(params, jnp.asarray(x2))

    np.testing.assert_allclose(_np(out1[:, :5]), _np(out2[:, :5]), atol=1e-5)
    assert np.abs(_np(out1[:, 5:]) - _np(out2[:, 5:])).max() > 1.0


def test_same_conv2d_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 9, 9, 3)).astype(np.float32)
    mod = SameConv2d(6, (7, 7))
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))

    wt = _np(params['params']['kernel']).transpose(3, 2, 0, 1)
    bias = _np(params['params']['bias'])
    ref = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(wt),
                   torch.tensor(bias), padding=3)
    np.testing.assert_allclose(_np(out), ref.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_causal_conv_transpose3d_matches_torch():
    rng = np.random.default_rng(3)
    b, t, h, w, cin, cout = 1, 4, 5, 5, 3, 4
    kernel, time_stride = (3, 3, 3), 2

    x = rng.normal(size=(b, t, h, w, cin)).astype(np.float32)
    mod = CausalConvTranspose3d(cout, kernel, time_stride=time_stride)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))

    # torch ConvTranspose3d weight is (I, O, kt, kh, kw); ours (kt,kh,kw,O,I)
    wt = _np(params['params']['kernel']).transpose(4, 3, 0, 1, 2)
    bias = _np(params['params']['bias'])
    ref = F.conv_transpose3d(
        torch.tensor(x.transpose(0, 4, 1, 2, 3)), torch.tensor(wt),
        torch.tensor(bias), stride=(time_stride, 1, 1), padding=(0, 1, 1))
    ref = ref.numpy().transpose(0, 2, 3, 4, 1)[:, :t * time_stride]

    assert _np(out).shape == ref.shape
    np.testing.assert_allclose(_np(out), ref, atol=2e-5)


def test_blur_matches_direct_3d_filter():
    """Separable [1,2,1] blur == dense binomial 3D filter with replicate pad
    (kornia filter3d(normalized=True) semantics)."""
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 5, 6, 6, 3)).astype(np.float32)

    out = blur(jnp.asarray(x))

    f1 = np.array([1.0, 2.0, 1.0])
    k3 = np.einsum('i,j,k->ijk', f1, f1, f1)
    k3 /= k3.sum()
    xt = torch.tensor(x.transpose(0, 4, 1, 2, 3))
    xt = F.pad(xt, (1, 1, 1, 1, 1, 1), mode='replicate')
    kt = torch.tensor(k3, dtype=torch.float32).expand(3, 1, 3, 3, 3).clone()
    ref = F.conv3d(xt, kt, groups=3).numpy().transpose(0, 2, 3, 4, 1)

    np.testing.assert_allclose(_np(out), ref, atol=2e-5)


def test_blur_space_only_matches_2d_filter():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, 6, 6, 2)).astype(np.float32)
    out = blur(jnp.asarray(x), space_only=True)

    f1 = np.array([1.0, 2.0, 1.0])
    k2 = np.outer(f1, f1)
    k2 /= k2.sum()
    xt = torch.tensor(x.transpose(0, 1, 4, 2, 3).reshape(-1, 2, 6, 6))
    xt = F.pad(xt, (1, 1, 1, 1), mode='replicate')
    kt = torch.tensor(k2, dtype=torch.float32).expand(2, 1, 3, 3).clone()
    ref = F.conv2d(xt, kt, groups=2).numpy().reshape(2, 3, 2, 6, 6).transpose(0, 1, 3, 4, 2)

    np.testing.assert_allclose(_np(out), ref, atol=2e-5)


class TestMxuLowerings:
    """r4 MXU-occupancy conv lowerings (ops/conv.py module comment): w-pair
    im2col for 64-ch convs and output space-to-depth for the tiny head.
    Forced on via MAGVIT2_TPU_FORCE_CONV_TRICKS (they are TPU-gated) and
    compared against the plain lowering."""

    def _compare(self, monkeypatch, module, x, **kw):
        import jax

        params = module.init(jax.random.PRNGKey(0), x, **kw)
        monkeypatch.setenv('MAGVIT2_TPU_NO_CONV_TRICKS', '1')
        want = module.apply(params, x, **kw)
        monkeypatch.delenv('MAGVIT2_TPU_NO_CONV_TRICKS')
        monkeypatch.setenv('MAGVIT2_TPU_FORCE_CONV_TRICKS', '1')
        jax.clear_caches()
        got = module.apply(params, x, **kw)
        monkeypatch.delenv('MAGVIT2_TPU_FORCE_CONV_TRICKS')
        jax.clear_caches()
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-5, atol=2e-5)
        return got

    def test_wpair_interior_conv(self, monkeypatch):
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 3, 8, 10, 64)) * 0.5,
            jnp.float32)
        self._compare(monkeypatch, CausalConv3d(64, (3, 3, 3)), x)

    def test_wpair_strided_dilated(self, monkeypatch):
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 6, 8, 10, 64)),
            jnp.float32)
        self._compare(monkeypatch,
                      CausalConv3d(96, (3, 3, 3), stride=2), x)
        self._compare(monkeypatch,
                      CausalConv3d(96, (3, 3, 3), dilation=2), x)

    def test_cout_block_head(self, monkeypatch):
        # W=16 -> G=16 (16*3=48 lanes); W=24 -> G=8
        for w in (16, 24):
            x = jnp.asarray(
                np.random.default_rng(2).normal(size=(1, 3, 8, w, 64)),
                jnp.float32)
            self._compare(monkeypatch, CausalConv3d(3, (3, 3, 3)), x)

    def test_cout_block_indivisible_width_falls_back(self, monkeypatch):
        # W=10: no admissible G — must silently use the plain path
        x = jnp.asarray(
            np.random.default_rng(3).normal(size=(1, 3, 8, 10, 64)),
            jnp.float32)
        self._compare(monkeypatch, CausalConv3d(3, (3, 3, 3)), x)

    def test_output_pair_interior_odd_width_falls_back(self, monkeypatch):
        # r4 output-pair lowering (64 <= f < 128) needs W % 2 == 0; odd W
        # must silently use the plain path
        monkeypatch.setenv('MAGVIT2_TPU_WPAIR_OUT', '1')
        x = jnp.asarray(
            np.random.default_rng(6).normal(size=(1, 3, 8, 9, 64)),
            jnp.float32)
        self._compare(monkeypatch, CausalConv3d(64, (3, 3, 3)), x)

    def test_output_pair_interior_optin(self, monkeypatch):
        # opt-in (MAGVIT2_TPU_WPAIR_OUT=1): even-W c64 conv takes the
        # output-pair lowering and must match the plain path exactly
        monkeypatch.setenv('MAGVIT2_TPU_WPAIR_OUT', '1')
        x = jnp.asarray(
            np.random.default_rng(7).normal(size=(2, 3, 8, 10, 64)) * 0.5,
            jnp.float32)
        self._compare(monkeypatch, CausalConv3d(64, (3, 3, 3)), x)
        self._compare(monkeypatch, CausalConv3d(96, (3, 3, 3)), x)

    def test_cout_blocked_in_head(self, monkeypatch):
        # blocked-in conv_out head (r4): G-strided output space-to-depth
        # consuming the w-blocked layout must match the plain conv on the
        # unblocked input — both the head trick (W=32 -> G=32) and the
        # dense+unblock fallback (W=24 -> G=8; W=20 -> no G)
        import jax

        from magvit2_pytorch_tpu.ops.conv import w_block

        mod = CausalConv3d(3, (3, 3, 3))
        for w in (32, 24, 20):
            x = jnp.asarray(
                np.random.default_rng(8).normal(size=(1, 3, 8, w, 64)),
                jnp.float32)
            params = mod.init(jax.random.PRNGKey(0), x)
            want = mod.apply(params, x)           # plain path (tricks off)
            monkeypatch.setenv('MAGVIT2_TPU_FORCE_CONV_TRICKS', '1')
            jax.clear_caches()
            got = mod.apply(params, w_block(x), w_blocked_in=True)
            monkeypatch.delenv('MAGVIT2_TPU_FORCE_CONV_TRICKS')
            jax.clear_caches()
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(want, np.float32),
                rtol=2e-5, atol=2e-5)

    def test_cout_blocked_in_fallback_no_tricks(self, monkeypatch):
        # with tricks disabled the blocked-in call must take the dense
        # blocked conv + in-graph unblock and still match
        import jax

        from magvit2_pytorch_tpu.ops.conv import w_block

        mod = CausalConv3d(3, (3, 3, 3))
        x = jnp.asarray(
            np.random.default_rng(9).normal(size=(1, 3, 8, 32, 64)),
            jnp.float32)
        params = mod.init(jax.random.PRNGKey(0), x)
        want = mod.apply(params, x)
        got = mod.apply(params, w_block(x), w_blocked_in=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-5, atol=2e-5)
        assert jax is not None

    def test_wpair_downsample(self, monkeypatch):
        from magvit2_pytorch_tpu.ops.resample import SpatialDownsample2x
        x = jnp.asarray(
            np.random.default_rng(4).normal(size=(1, 3, 8, 12, 64)),
            jnp.float32)
        self._compare(monkeypatch, SpatialDownsample2x(64, 128), x)

    def test_wpair_vs_reference_oracle(self, monkeypatch):
        """The forced lowering must still match the torch reference conv
        semantics (causal pad, reference kernel layout)."""
        monkeypatch.setenv('MAGVIT2_TPU_FORCE_CONV_TRICKS', '1')
        import jax
        jax.clear_caches()
        try:
            x = jnp.asarray(
                np.random.default_rng(5).normal(size=(1, 4, 8, 8, 64)),
                jnp.float32)
            mod = CausalConv3d(64, (3, 3, 3))
            params = mod.init(jax.random.PRNGKey(1), x)
            out = mod.apply(params, x)
            assert out.shape == (1, 4, 8, 8, 64)
            assert np.isfinite(np.asarray(out)).all()
        finally:
            monkeypatch.delenv('MAGVIT2_TPU_FORCE_CONV_TRICKS')
            jax.clear_caches()
