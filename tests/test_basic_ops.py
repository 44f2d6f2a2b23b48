"""Golden tests for norms, squeeze-excite, token shift, resamplers and the
modulated conv — cross-checked against torch CPU math with shared weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from magvit2_pytorch_tpu.ops import (
    AdaptiveRMSNorm,
    Conv3DMod,
    LayerNorm,
    RMSNorm,
    SpatialDownsample2x,
    SpatialUpsample2x,
    SqueezeExcite,
    TimeDownsample2x,
    TimeUpsample2x,
    TokenShift,
)
from magvit2_pytorch_tpu.ops.basic import Linear


def _np(x):
    return np.asarray(x)


def test_rmsnorm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 4, 4, 16)).astype(np.float32)
    mod = RMSNorm(16)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))

    xt = torch.tensor(x)
    ref = F.normalize(xt, dim=-1) * (16 ** 0.5)  # gamma = ones at init
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-5)


def test_adaptive_rmsnorm_identity_at_init():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 4, 4, 8)).astype(np.float32)
    cond = rng.normal(size=(2, 6)).astype(np.float32)
    mod = AdaptiveRMSNorm(8, dim_cond=6)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(cond))
    out = mod.apply(params, jnp.asarray(x), jnp.asarray(cond))

    plain = RMSNorm(8)
    pparams = plain.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = plain.apply(pparams, jnp.asarray(x))
    # to_gamma starts as weight=0, bias=1 => identical to plain RMSNorm
    np.testing.assert_allclose(_np(out), _np(ref), atol=1e-6)


def test_layernorm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 7, 16)).astype(np.float32)
    mod = LayerNorm(16)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))
    ref = F.layer_norm(torch.tensor(x), (16,))
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-5)


def test_squeeze_excite_starts_near_zero_gate():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 3, 4, 4, 8)).astype(np.float32)
    mod = SqueezeExcite(8)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))
    # init bias -10 => sigmoid ~ 4.5e-5 => output ~ 0
    assert np.abs(_np(out)).max() < 1e-3
    assert out.shape == x.shape

    # image input works too
    xi = x[:, 0]
    out_i = mod.apply(params, jnp.asarray(xi))
    assert out_i.shape == xi.shape


def test_token_shift():
    class Id(torch.nn.Module):
        pass

    from flax import linen as nn

    class Identity(nn.Module):
        @nn.compact
        def __call__(self, x):
            return x

    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 4, 2, 2, 6)).astype(np.float32)
    mod = TokenShift(Identity())
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = _np(mod.apply(params, jnp.asarray(x)))

    # first half of channels untouched
    np.testing.assert_allclose(out[..., :3], x[..., :3])
    # second half shifted one frame forward in time; frame 0 zero-padded
    np.testing.assert_allclose(out[:, 0, ..., 3:], 0.0)
    np.testing.assert_allclose(out[:, 1:, ..., 3:], x[:, :-1, ..., 3:])


def test_spatial_downsample_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, 8, 8, 4)).astype(np.float32)
    mod = SpatialDownsample2x(4, 6)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))
    assert out.shape == (2, 3, 4, 4, 6)

    w = _np(params['params']['kernel'])[0].transpose(3, 2, 0, 1)  # O I kh kw
    b = _np(params['params']['bias'])
    xt = torch.tensor(x.reshape(6, 8, 8, 4).transpose(0, 3, 1, 2))
    ref = F.conv2d(xt, torch.tensor(w), torch.tensor(b), stride=2, padding=1)
    ref = ref.numpy().transpose(0, 2, 3, 1).reshape(2, 3, 4, 4, 6)
    np.testing.assert_allclose(_np(out), ref, atol=2e-5)


def test_time_downsample_matches_torch():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 8, 3, 3, 4)).astype(np.float32)
    mod = TimeDownsample2x(4, 6)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))
    assert out.shape == (2, 4, 3, 3, 6)

    w = _np(params['params']['kernel'])[:, 0, 0].transpose(2, 1, 0)  # O I k
    b = _np(params['params']['bias'])
    # torch path: (b h w) c t with causal pad then stride-2 conv1d
    xt = torch.tensor(x.transpose(0, 2, 3, 4, 1).reshape(-1, 4, 8))
    xt = F.pad(xt, (2, 0))
    ref = F.conv1d(xt, torch.tensor(w), torch.tensor(b), stride=2)
    ref = ref.numpy().reshape(2, 3, 3, 6, 4).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(_np(out), ref, atol=2e-5)


def test_spatial_upsample_nearest_at_init():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 2, 3, 3, 8)).astype(np.float32)
    mod = SpatialUpsample2x(8, 4)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = _np(mod.apply(params, jnp.asarray(x)))
    assert out.shape == (1, 2, 6, 6, 4)
    # replicated init => each 2x2 output block is constant (nearest-neighbor)
    np.testing.assert_allclose(out[:, :, 0::2, 0::2], out[:, :, 1::2, 0::2], atol=1e-6)
    np.testing.assert_allclose(out[:, :, 0::2, 0::2], out[:, :, 0::2, 1::2], atol=1e-6)
    np.testing.assert_allclose(out[:, :, 0::2, 0::2], out[:, :, 1::2, 1::2], atol=1e-6)


def test_time_upsample_nearest_at_init():
    rng = np.random.default_rng(8)
    x = rng.normal(size=(1, 3, 2, 2, 8)).astype(np.float32)
    mod = TimeUpsample2x(8, 4)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = _np(mod.apply(params, jnp.asarray(x)))
    assert out.shape == (1, 6, 2, 2, 4)
    np.testing.assert_allclose(out[:, 0::2], out[:, 1::2], atol=1e-6)


def test_conv3dmod_matches_torch_grouped():
    rng = np.random.default_rng(9)
    b, t, h, w, c = 2, 4, 5, 5, 6
    x = rng.normal(size=(b, t, h, w, c)).astype(np.float32)
    cond = rng.normal(size=(b, c)).astype(np.float32)

    mod = Conv3DMod(dim=c, spatial_kernel=3, time_kernel=3)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(cond))
    out = mod.apply(params, jnp.asarray(x), jnp.asarray(cond))
    assert out.shape == (b, t, h, w, c)

    # torch oracle: per-sample modulated/demodulated weights, grouped conv
    wj = _np(params['params']['weights'])          # (kt,kh,kw,in,out)
    wt = torch.tensor(wj.transpose(4, 3, 0, 1, 2))  # (out,in,kt,kh,kw)
    ct = torch.tensor(cond)
    weights = wt[None] * (ct[:, None, :, None, None, None] + 1)
    inv_norm = weights.pow(2).sum(dim=(2, 3, 4, 5), keepdim=True).clamp(min=1e-8).rsqrt()
    weights = weights * inv_norm
    xt = torch.tensor(x.transpose(0, 4, 1, 2, 3)).reshape(1, b * c, t, h, w)
    weights = weights.reshape(b * c, c, 3, 3, 3)
    xt = F.pad(xt, (1, 1, 1, 1, 2, 0))
    ref = F.conv3d(xt, weights, groups=b).reshape(b, c, t, h, w)
    ref = ref.numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(_np(out), ref, atol=1e-4)


def test_linear_matches_torch():
    rng = np.random.default_rng(10)
    x = rng.normal(size=(3, 5)).astype(np.float32)
    mod = Linear(7)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))
    w = torch.tensor(_np(params['params']['kernel']).T)
    b = torch.tensor(_np(params['params']['bias']))
    ref = F.linear(torch.tensor(x), w, b)
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-5)
