"""Fused Pallas Taylor-attention kernel vs the XLA reference path (interpret
mode on CPU) — values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from magvit2_pytorch_tpu.ops.pallas.taylor_attention import (
    _taylor_fused,
    _taylor_reference,
    taylor_linear_attention,
)

HEADS, D = 4, 8


def _setup(n=256, c=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(2, n, c)).astype(np.float32))
    wqkv = jnp.asarray(
        rng.normal(size=(c, 3 * HEADS * D)).astype(np.float32) * 0.1)
    wout = jnp.asarray(
        rng.normal(size=(HEADS * D, c)).astype(np.float32) * 0.1)
    return x, wqkv, wout


def test_fused_matches_reference():
    x, wqkv, wout = _setup()
    gamma = jnp.ones((x.shape[-1],), x.dtype)
    out_fused = _taylor_fused(x, gamma, wqkv, wout, HEADS, D, 1e-5, D ** -0.5,
                              True, False)
    out_ref = _taylor_reference(x, wqkv, wout, HEADS, D, 1e-5, D ** -0.5)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=2e-4, rtol=1e-3)


def test_fused_gradients_match_reference():
    x, wqkv, wout = _setup(n=128, c=16)

    gamma = jnp.ones((x.shape[-1],), x.dtype)

    def loss_fused(x, wqkv, wout):
        return jnp.sum(_taylor_fused(x, gamma, wqkv, wout, HEADS, D, 1e-5,
                                     D ** -0.5, True, False) ** 2)

    def loss_ref(x, wqkv, wout):
        return jnp.sum(_taylor_reference(x, wqkv, wout, HEADS, D, 1e-5,
                                         D ** -0.5) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, wqkv, wout)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, wqkv, wout)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-2)


def test_wrapper_falls_back_on_small_n():
    x, wqkv, wout = _setup(n=20)  # < 128 -> XLA path
    out = taylor_linear_attention(x, wqkv, wout, HEADS, D)
    ref = _taylor_reference(x, wqkv, wout, HEADS, D, 1e-5, D ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_with_norm_matches_reference():
    x, wqkv, wout = _setup(n=128, c=16, seed=7)
    gamma = jnp.asarray(np.random.default_rng(8).uniform(
        0.5, 1.5, size=(16,)).astype(np.float32))
    out_fused = _taylor_fused(x, gamma, wqkv, wout, HEADS, D, 1e-5,
                              D ** -0.5, True, True)
    from magvit2_pytorch_tpu.ops.pallas.taylor_attention import _rmsnorm_ref
    out_ref = _taylor_reference(_rmsnorm_ref(x, gamma), wqkv, wout, HEADS, D,
                                1e-5, D ** -0.5)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=2e-4, rtol=1e-3)
