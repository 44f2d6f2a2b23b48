"""The conv_transpose depth-to-space/-time lowering must match the naive
conv -> SiLU -> pixel-shuffle formulation of the reference
(magvit2_pytorch.py:811-883) bit-for-bit on the same stored weights."""

import jax
import jax.numpy as jnp
import numpy as np

from magvit2_pytorch_tpu.ops import SpatialUpsample2x, TimeUpsample2x


def _naive_spatial(x, kernel, bias, dim_out):
    # reference math: 1x1 conv (channel order (c,p1,p2)) -> SiLU ->
    # 'b (c p1 p2) h w -> b c (h p1) (w p2)'
    out = np.einsum('bthwi,io->bthwo', x, kernel) + bias
    out = out * (1.0 / (1.0 + np.exp(-out)))  # silu
    b, t, h, w, _ = out.shape
    out = out.reshape(b, t, h, w, dim_out, 2, 2)
    out = out.transpose(0, 1, 2, 5, 3, 6, 4)
    return out.reshape(b, t, h * 2, w * 2, dim_out)


def _naive_time(x, kernel, bias, dim_out):
    out = np.einsum('bthwi,io->bthwo', x, kernel) + bias
    out = out * (1.0 / (1.0 + np.exp(-out)))
    b, t, h, w, _ = out.shape
    out = out.reshape(b, t, h, w, dim_out, 2)
    out = out.transpose(0, 1, 5, 2, 3, 4)
    return out.reshape(b, t * 2, h, w, dim_out)


def test_spatial_upsample_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 4, 4, 6)).astype(np.float32)
    mod = SpatialUpsample2x(6, 5)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # use non-trivial bias to catch position-dependent bias bugs
    params = jax.tree.map(lambda p: p, params)
    kernel = np.asarray(params['params']['kernel'])
    bias = rng.normal(size=kernel.shape[1]).astype(np.float32)
    params = {'params': {'kernel': kernel, 'bias': bias}}

    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    ref = _naive_spatial(x, kernel, bias, 5)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_time_upsample_matches_naive():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 2, 2, 6)).astype(np.float32)
    mod = TimeUpsample2x(6, 4)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kernel = np.asarray(params['params']['kernel'])
    bias = rng.normal(size=kernel.shape[1]).astype(np.float32)
    params = {'params': {'kernel': kernel, 'bias': bias}}

    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    ref = _naive_time(x, kernel, bias, 4)
    np.testing.assert_allclose(out, ref, atol=1e-5)
