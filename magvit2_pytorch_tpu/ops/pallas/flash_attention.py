"""Pallas TPU flash attention for the tokenizer's axial attention.

TPU-native replacement for the reference's CUDA SDPA flash path
(attend.py:89-184; SURVEY.md §2.9 row 1). Online-softmax tiling: each grid
program owns one (batch*head, q-block) tile, streams K/V blocks through VMEM,
and keeps the running max / normalizer in registers — O(n) memory instead of
materializing the (n, m) score matrix in HBM.

Supports the reference's attention semantics:
- right-aligned causal masking for memory-KV (k_len > q_len: query i sees the
  ``m - n`` left keys plus keys up to its position; attend.py:109-129)
- arbitrary k_len via padding + validity masking

Backward pass: custom VJP that recomputes attention with the XLA einsum path
and differentiates through that — exact gradients, flash-speed forward. (A
dedicated Pallas backward kernel is a later optimization.)
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magvit2_pytorch_tpu.utils.helpers import default

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool,
                  kv_len: int, offset: int, block_q: int, block_k: int):
    """One (bh, q-block) program. q_ref: (1, block_q, d); k_ref/v_ref:
    (1, m_pad, d); o_ref: (1, block_q, d)."""
    qi = pl.program_id(1)
    d = q_ref.shape[-1]
    m_pad = k_ref.shape[1]
    num_kb = m_pad // block_k

    q = q_ref[0].astype(jnp.float32) * scale

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)

    row_ids = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)

    def body(kb, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (block_q, block_k)

        col_ids = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = col_ids < kv_len
        if causal:
            mask = jnp.logical_and(mask, col_ids <= row_ids + offset)
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_i - m_new)
        l_new = alpha * l_i + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc, _, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    l = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)


def _flash_forward(q, k, v, causal: bool, scale: float,
                   block_q: int, block_k: int, interpret: bool):
    b, h, n, d = q.shape
    m = k.shape[-2]
    offset = m - n

    n_pad = _round_up(n, block_q)
    m_pad = _round_up(m, block_k)

    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, m, d)
    vf = v.reshape(b * h, m, d)

    if n_pad != n:
        qf = jnp.pad(qf, ((0, 0), (0, n_pad - n), (0, 0)))
    if m_pad != m:
        kf = jnp.pad(kf, ((0, 0), (0, m_pad - m), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, m_pad - m), (0, 0)))

    grid = (b * h, n_pad // block_q)

    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, kv_len=m, offset=offset,
        block_q=block_q, block_k=block_k)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_pad * m_pad * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * n_pad * m_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)

    return out[:, :n].reshape(b, h, n, d)


def _reference_attention(q, k, v, causal: bool, scale: float):
    """XLA einsum path used for the backward recompute."""
    n, m = q.shape[-2], k.shape[-2]
    dots = jnp.einsum('bhid,bhjd->bhij', q, k,
                      preferred_element_type=jnp.float32) * scale
    if causal:
        i = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
        dots = jnp.where(j > (i + (m - n)), jnp.finfo(jnp.float32).min, dots)
    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum('bhij,bhjd->bhid', attn.astype(v.dtype), v)
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_attention(q, k, v, causal, scale, block_q, block_k, interpret):
    return _flash_forward(q, k, v, causal, scale, block_q, block_k, interpret)


def _fwd(q, k, v, causal, scale, block_q, block_k, interpret):
    out = _flash_forward(q, k, v, causal, scale, block_q, block_k, interpret)
    return out, (q, k, v)


def _bwd(causal, scale, block_q, block_k, interpret, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: _reference_attention(q, k, v, causal, scale), q, k, v)
    return vjp(g)


_flash_attention.defvjp(_fwd, _bwd)


def flash_attention(q, k, v, causal: bool = False,
                    scale: Optional[float] = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: Optional[bool] = None):
    """q: (b, h, n, d); k, v: (b, h, m, d) with m >= n. Returns (b, h, n, d)."""
    scale = default(scale, q.shape[-1] ** -0.5)
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    n, m = q.shape[-2], k.shape[-2]
    block_q = min(block_q, _round_up(n, 128))
    block_k = min(block_k, _round_up(m, 128))
    return _flash_attention(q, k, v, causal, scale, block_q, block_k,
                            interpret)
