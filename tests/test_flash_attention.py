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


@pytest.mark.parametrize('bias_shape', ['hnm', 'bhnm', 'nm'])
@pytest.mark.parametrize('causal', [False, True])
def test_flash_bias_matches_xla(causal, bias_shape):
    """Bias tile (round-3 review #8): additive pre-softmax bias — the
    reference folds the same bias into SDPA's mask (attend.py:149-167).
    Broadcast shapes (h,n,m)/(n,m) must match a materialized XLA bias."""
    b, h, n, m, d = 2, 2, 130, 134, 32
    q, k, v = _rand((b, h, n, d), 0), _rand((b, h, m, d), 1), _rand(
        (b, h, m, d), 2)
    bias = {'hnm': _rand((h, n, m), 3), 'bhnm': _rand((b, h, n, m), 3),
            'nm': _rand((n, m), 3)}[bias_shape]

    out = flash_attention(q, k, v, causal=causal, interpret=True, bias=bias)
    bias4 = jnp.broadcast_to(
        bias.reshape((1,) * (4 - bias.ndim) + bias.shape), (b, h, n, m))
    ref = _attend_xla(q, k, v, causal=causal, mask=None, scale=None,
                      attn_bias=bias4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize('bias_shape', ['hnm', 'bhnm'])
def test_flash_bias_gradients_match_xla(bias_shape):
    """d_bias = dS, incl. the broadcast-group reduction for (h,n,m) bias."""
    b, h, n, m, d = 2, 2, 130, 134, 16
    q, k, v = _rand((b, h, n, d), 4), _rand((b, h, m, d), 5), _rand(
        (b, h, m, d), 6)
    bias = _rand((h, n, m) if bias_shape == 'hnm' else (b, h, n, m), 7)

    def loss_flash(q, k, v, bias):
        return jnp.sum(flash_attention(
            q, k, v, causal=True, interpret=True, bias=bias) ** 2)

    def loss_ref(q, k, v, bias):
        bias4 = jnp.broadcast_to(
            bias.reshape((1,) * (4 - bias.ndim) + bias.shape), (b, h, n, m))
        return jnp.sum(_attend_xla(q, k, v, causal=True, mask=None,
                                   scale=None, attn_bias=bias4) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=1e-3)


def test_attend_flash_backend_with_bias():
    """attend(backend='flash', attn_bias=...) is a working path now
    (previously raised NotImplementedError)."""
    from magvit2_pytorch_tpu.ops.attend import attend
    q, k, v = _rand((1, 2, 130, 32), 8), _rand((1, 2, 130, 32), 9), _rand(
        (1, 2, 130, 32), 10)
    bias = _rand((2, 130, 130), 11)
    out = attend(q, k, v, backend='flash', attn_bias=bias)
    ref = attend(q, k, v, backend='xla', attn_bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
