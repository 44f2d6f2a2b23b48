"""Attention stack tests: einsum-path numerics vs torch SDPA, causal
right-alignment with memory KV, axial wrapper shapes, linear attention
normalization, gateloop recurrence vs sequential loop."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from magvit2_pytorch_tpu.ops import (
    Attention,
    LinearSpaceAttention,
    SpaceAttention,
    TaylorSeriesLinearAttn,
    TimeAttention,
    attend,
    gated_linear_recurrence,
    SimpleGateLoopLayer,
    ToTimeSequence,
)


def _np(x):
    return np.asarray(x)


def test_attend_matches_torch_sdpa():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 3, 8, 16)).astype(np.float32)
    k = rng.normal(size=(2, 3, 8, 16)).astype(np.float32)
    v = rng.normal(size=(2, 3, 8, 16)).astype(np.float32)

    out = attend(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), backend='xla')
    ref = F.scaled_dot_product_attention(
        torch.tensor(q), torch.tensor(k), torch.tensor(v))
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-5)


def test_attend_causal_right_aligned():
    """With k_len = q_len + m (memory KV), query i must see the m left keys
    plus keys up to its own position — reference attend.py:109-129."""
    rng = np.random.default_rng(1)
    n, mem = 6, 3
    q = rng.normal(size=(1, 1, n, 8)).astype(np.float32)
    k = rng.normal(size=(1, 1, n + mem, 8)).astype(np.float32)
    v = rng.normal(size=(1, 1, n + mem, 8)).astype(np.float32)

    out = attend(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                 causal=True, backend='xla')

    # torch oracle with explicit right-aligned mask
    i = torch.arange(n)[:, None]
    j = torch.arange(n + mem)[None, :]
    allow = j <= (i + mem)
    ref = F.scaled_dot_product_attention(
        torch.tensor(q), torch.tensor(k), torch.tensor(v),
        attn_mask=allow[None, None])
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-5)


def test_attention_module_with_memory_kv():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 10, 32)).astype(np.float32)
    mod = Attention(dim=32, dim_head=8, heads=4)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))
    assert out.shape == (2, 10, 32)
    assert params['params']['mem_kv'].shape == (2, 4, 4, 8)


def test_causal_time_attention_is_causal():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 6, 2, 2, 16)).astype(np.float32)
    mod = TimeAttention(dim=16, dim_head=8, heads=2, causal=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out1 = _np(mod.apply(params, jnp.asarray(x)))

    x2 = x.copy()
    x2[:, 4:] += 10.0
    out2 = _np(mod.apply(params, jnp.asarray(x2)))
    np.testing.assert_allclose(out1[:, :4], out2[:, :4], atol=1e-5)
    assert np.abs(out1[:, 4:] - out2[:, 4:]).max() > 1e-3


def test_space_attention_shapes_video_and_acts_per_frame():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 3, 4, 4, 16)).astype(np.float32)
    mod = SpaceAttention(dim=16, dim_head=8, heads=2)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))
    assert out.shape == x.shape

    # frames are independent: permuting frames permutes outputs
    perm = [2, 0, 1]
    out_perm = _np(mod.apply(params, jnp.asarray(x[:, perm])))
    np.testing.assert_allclose(out_perm, _np(out)[:, perm], atol=1e-5)


def test_linear_space_attention_shapes():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, 4, 4, 16)).astype(np.float32)
    mod = LinearSpaceAttention(dim=16, dim_head=8, heads=2)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))
    assert out.shape == x.shape

    # image input
    xi = x[:, 0]
    out_i = mod.apply(params, jnp.asarray(xi))
    assert out_i.shape == xi.shape


def test_taylor_linear_attn_approximates_softmax_weights():
    """phi(q).phi(k) = 1 + qk + (qk)^2/2 — check the kernel identity."""
    rng = np.random.default_rng(6)
    q = rng.normal(size=(4,)).astype(np.float64) * 0.3
    k = rng.normal(size=(4,)).astype(np.float64) * 0.3

    def phi(x):
        return np.concatenate([[1.0], x, np.outer(x, x).ravel() / np.sqrt(2)])

    qk = q @ k
    np.testing.assert_allclose(phi(q) @ phi(k), 1 + qk + qk ** 2 / 2, rtol=1e-10)

    x = rng.normal(size=(1, 7, 16)).astype(np.float32)
    mod = TaylorSeriesLinearAttn(dim=16, dim_head=8, heads=2)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))
    assert out.shape == x.shape


def test_gated_linear_recurrence_matches_loop():
    rng = np.random.default_rng(7)
    a = rng.uniform(0.1, 0.9, size=(2, 9, 5)).astype(np.float32)
    x = rng.normal(size=(2, 9, 5)).astype(np.float32)

    out = _np(gated_linear_recurrence(jnp.asarray(a), jnp.asarray(x)))

    s = np.zeros((2, 5), np.float32)
    for t in range(9):
        s = a[:, t] * s + x[:, t]
        np.testing.assert_allclose(out[:, t], s, atol=1e-5)


def test_gateloop_layer_and_totimesequence():
    rng = np.random.default_rng(8)
    x = rng.normal(size=(1, 5, 2, 2, 8)).astype(np.float32)
    mod = ToTimeSequence(SimpleGateLoopLayer(dim=8))
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))
    assert out.shape == x.shape

    # causality: future frames cannot affect past
    x2 = x.copy()
    x2[:, 3:] += 5.0
    out2 = mod.apply(params, jnp.asarray(x2))
    np.testing.assert_allclose(_np(out)[:, :3], _np(out2)[:, :3], atol=1e-5)


def test_attention_dropout_gated_by_rng():
    """dropout active only when a 'dropout' rng is provided; deterministic
    otherwise (reference attn_dropout parity)."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(1, 12, 16)).astype(np.float32))
    mod = Attention(dim=16, dim_head=8, heads=2, dropout=0.5)
    params = mod.init(jax.random.PRNGKey(0), x)

    # no rng -> deterministic, equal across calls
    o1 = np.asarray(mod.apply(params, x))
    o2 = np.asarray(mod.apply(params, x))
    np.testing.assert_array_equal(o1, o2)

    # with rngs -> stochastic
    oa = np.asarray(mod.apply(params, x, rngs={'dropout': jax.random.PRNGKey(1)}))
    ob = np.asarray(mod.apply(params, x, rngs={'dropout': jax.random.PRNGKey(2)}))
    assert np.abs(oa - ob).max() > 1e-6


def test_attend_bias_and_prev_attn_paths():
    """attn_bias / prev_attn parity (reference attend.py:149-167,214-224):
    logits = qk*scale + prev_attn + attn_bias, then mask/causal/softmax."""
    import numpy as np
    import torch

    from magvit2_pytorch_tpu.ops.attend import attend

    rng = np.random.default_rng(0)
    b, h, n, d = 2, 3, 8, 16
    q = rng.normal(size=(b, h, n, d)).astype(np.float32)
    k = rng.normal(size=(b, h, n, d)).astype(np.float32)
    v = rng.normal(size=(b, h, n, d)).astype(np.float32)
    bias = rng.normal(size=(h, n, n)).astype(np.float32)
    prev = rng.normal(size=(b, h, n, n)).astype(np.float32)

    for causal in (False, True):
        ours = np.asarray(attend(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            causal=causal, attn_bias=jnp.asarray(bias),
            prev_attn=jnp.asarray(prev)))

        dots = torch.einsum(
            'bhid,bhjd->bhij', torch.tensor(q), torch.tensor(k)) * d ** -0.5
        dots = dots + torch.tensor(prev) + torch.tensor(bias)[None]
        if causal:
            mask = torch.ones(n, n, dtype=torch.bool).triu(1)
            dots = dots.masked_fill(mask, -torch.finfo(torch.float32).max)
        ref = torch.einsum('bhij,bhjd->bhid', dots.softmax(-1),
                           torch.tensor(v)).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)

    # bnhd layout agrees with bhnd
    ours_bnhd = np.asarray(attend(
        jnp.asarray(q.transpose(0, 2, 1, 3)),
        jnp.asarray(k.transpose(0, 2, 1, 3)),
        jnp.asarray(v.transpose(0, 2, 1, 3)),
        causal=True, layout='bnhd', attn_bias=jnp.asarray(bias),
        prev_attn=jnp.asarray(prev))).transpose(0, 2, 1, 3)
    ours_bhnd = np.asarray(attend(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=True, attn_bias=jnp.asarray(bias),
        prev_attn=jnp.asarray(prev)))
    np.testing.assert_allclose(ours_bnhd, ours_bhnd, atol=1e-5, rtol=1e-5)
