"""Pallas flash-attention kernel vs the XLA einsum path (interpret mode on
CPU). Small shapes — the kernel itself is exercised for real on TPU by
bench.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magvit2_pytorch_tpu.ops.attend import _attend_xla
from magvit2_pytorch_tpu.ops.pallas.flash_attention import flash_attention


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32))


@pytest.mark.parametrize('causal', [False, True])
def test_flash_matches_xla(causal):
    q = _rand((1, 2, 130, 32), 0)   # n not a multiple of the block size
    k = _rand((1, 2, 134, 32), 1)   # m = n + 4 memory-kv layout
    v = _rand((1, 2, 134, 32), 2)

    out = flash_attention(q, k, v, causal=causal, interpret=True)
    ref = _attend_xla(q, k, v, causal=causal, mask=None, scale=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_gradients_match_xla():
    q = _rand((1, 1, 128, 16), 3)
    k = _rand((1, 1, 128, 16), 4)
    v = _rand((1, 1, 128, 16), 5)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_attend_xla(q, k, v, causal=True, mask=None,
                                   scale=None) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize('causal', [False, True])
def test_flash_backward_kernel_ragged_memory_kv(causal):
    """Pallas backward kernels (round 2): gradients must match XLA with
    right-aligned causal masking, memory-KV (m > n), and n/m that are NOT
    multiples of the block size (padded rows/cols must contribute zero)."""
    q = _rand((2, 2, 130, 32), 6)
    k = _rand((2, 2, 134, 32), 7)
    v = _rand((2, 2, 134, 32), 8)
    g_out = _rand((2, 2, 130, 32), 9)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal,
                                       interpret=True) * g_out)

    def f_ref(q, k, v):
        return jnp.sum(_attend_xla(q, k, v, causal=causal, mask=None,
                                   scale=None) * g_out)

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)
