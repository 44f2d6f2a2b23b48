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

Backward pass: dedicated Pallas kernels (round-2; round 1 recomputed through
XLA). The forward also emits the per-row logsumexp; backward runs two kernels
with the standard flash decomposition — per q-block for dQ, per k-block for
dK/dV — recomputing P = exp(S - lse) tile-by-tile so the (n, m) score matrix
is never materialized in HBM in either direction:

    D  = rowsum(dO * O)                     (XLA, elementwise)
    dV = P^T dO
    dP = dO V^T;  dS = P * (dP - D)
    dQ = dS K * scale;  dK = dS^T Q * scale
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

# v5e-tuned (round 2): 512x512 blocks keep the MXU fed (the 128x128 round-1
# default lost to XLA at every shape; 512 wins 2-5x at n=1024-4096 and ~50x
# at n=8192 where XLA's materialized score matrix thrashes HBM).
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, *rest, scale: float,
                  causal: bool, kv_len: int, offset: int, block_q: int,
                  block_k: int, has_bias: bool):
    """One (bh, q-block) program. q_ref: (1, block_q, d); k_ref/v_ref:
    (1, m_pad, d); o_ref: (1, block_q, d); lse_ref: (1, 1, block_q) —
    the per-row logsumexp saved for the Pallas backward. lse rides in a
    (bh, 1, n_pad) array because TPU block specs need the trailing two block
    dims to tile as (8k, 128k) or equal the array dims — (1, block_q) on a
    2-D (bh, n_pad) array is not lowerable. With ``has_bias`` an extra
    bias_ref (1, block_q, m_pad) precedes the outputs: the additive
    pre-softmax bias of reference attend.py:149-167, sliced per k-block."""
    if has_bias:
        bias_ref, o_ref, lse_ref = rest
    else:
        o_ref, lse_ref = rest
        bias_ref = None
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
        if has_bias:
            s = s + bias_ref[0, :, pl.ds(kb * block_k, block_k)].astype(
                jnp.float32)

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

    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    l = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)
    lse_ref[0, 0] = m + jnp.log(l)


def _pad_bias(bias, n, m, n_pad, m_pad):
    """(G, n, m) -> (G, n_pad, m_pad); padded cells are dead (validity mask)."""
    if n_pad != n or m_pad != m:
        bias = jnp.pad(bias, ((0, 0), (0, n_pad - n), (0, m_pad - m)))
    return bias


def _flash_forward(q, k, v, bias, causal: bool, scale: float,
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

    has_bias = bias is not None
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m_pad, d), lambda bh, qi: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m_pad, d), lambda bh, qi: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qf, kf, vf]
    if has_bias:
        g = bias.shape[0]  # b*h, or h broadcast over batch via index map
        bias = _pad_bias(bias, n, m, n_pad, m_pad)
        in_specs.append(pl.BlockSpec(
            (1, block_q, m_pad), lambda bh, qi: (bh % g, qi, 0),
            memory_space=pltpu.VMEM))
        operands.append(bias)

    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, kv_len=m, offset=offset,
        block_q=block_q, block_k=block_k, has_bias=has_bias)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, qi: (bh, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, n_pad), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_pad * m_pad * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * n_pad * m_pad,
        ),
        interpret=interpret,
    )(*operands)

    return out[:, :n].reshape(b, h, n, d), lse


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest,
                   scale: float, causal: bool, kv_len: int, offset: int,
                   block_q: int, block_k: int, has_bias: bool):
    """dQ for one (bh, q-block): stream k-blocks, recompute P row-block.
    With ``has_bias``: bias_ref (1, block_q, m_pad) joins the recompute and
    a dbias_ref (1, block_q, m_pad) output collects dS tiles — d_bias = dS
    exactly (s = qk*scale + bias, so ∂s/∂bias = 1)."""
    if has_bias:
        bias_ref, dq_ref, dbias_ref = rest
    else:
        (dq_ref,) = rest
        bias_ref = dbias_ref = None
    qi = pl.program_id(1)
    d = q_ref.shape[-1]
    m_pad = k_ref.shape[1]
    num_kb = m_pad // block_k

    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0]                                  # (block_q,)
    delta = delta_ref[0, 0]                              # (block_q,)

    row_ids = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)

    def body(kb, dq):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if has_bias:
            s = s + bias_ref[0, :, pl.ds(kb * block_k, block_k)].astype(
                jnp.float32)

        col_ids = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = col_ids < kv_len
        if causal:
            mask = jnp.logical_and(mask, col_ids <= row_ids + offset)
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (block_q, block_k)
        ds = p * (dp - delta[:, None])
        if has_bias:
            dbias_ref[0, :, pl.ds(kb * block_k, block_k)] = ds.astype(
                dbias_ref.dtype)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(
        0, num_kb, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    *rest, scale: float, causal: bool,
                    kv_len: int, q_len: int, offset: int, block_q: int,
                    block_k: int, has_bias: bool):
    """dK/dV for one (bh, k-block): stream q-blocks, recompute P^T."""
    if has_bias:
        bias_ref, dk_ref, dv_ref = rest
    else:
        dk_ref, dv_ref = rest
        bias_ref = None
    ki = pl.program_id(1)
    d = q_ref.shape[-1]
    n_pad = q_ref.shape[1]
    num_qb = n_pad // block_q

    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    col_ids = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)]
        delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q)]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (block_q, block_k)
        if has_bias:
            s = s + bias_ref[0, pl.ds(qb * block_q, block_q), :].astype(
                jnp.float32)

        row_ids = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        mask = jnp.logical_and(col_ids < kv_len, row_ids < q_len)
        if causal:
            mask = jnp.logical_and(mask, col_ids <= row_ids + offset)
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)

        dv_new = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (block_k, d)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (block_q, block_k)
        ds = p * (dp - delta[:, None])
        dk_new = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (block_k, d)
        return dk_new, dv_new

    zeros = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (zeros, zeros))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward(q, k, v, bias, out, lse, g, causal: bool, scale: float,
                    block_q: int, block_k: int, interpret: bool):
    b, h, n, d = q.shape
    m = k.shape[-2]
    offset = m - n
    n_pad = _round_up(n, block_q)
    m_pad = _round_up(m, block_k)
    has_bias = bias is not None

    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, m, d)
    vf = v.reshape(b * h, m, d)
    dof = g.reshape(b * h, n, d)
    of = out.reshape(b * h, n, d)

    # delta = rowsum(dO * O) — cheap elementwise, stays in XLA
    delta = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32), axis=-1)

    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        qf = jnp.pad(qf, pad)
        dof = jnp.pad(dof, pad)
        delta = jnp.pad(delta, ((0, 0), (0, n_pad - n)))
        # lse from the kernel is already n_pad long
    delta = delta[:, None, :]                            # (bh, 1, n_pad)
    if m_pad != m:
        pad = ((0, 0), (0, m_pad - m), (0, 0))
        kf = jnp.pad(kf, pad)
        vf = jnp.pad(vf, pad)

    gdim = bias.shape[0] if has_bias else 0
    if has_bias:
        bias_p = _pad_bias(bias, n, m, n_pad, m_pad)

    dq_kernel = functools.partial(
        _bwd_dq_kernel, scale=scale, causal=causal, kv_len=m, offset=offset,
        block_q=block_q, block_k=block_k, has_bias=has_bias)
    dq_in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m_pad, d), lambda bh, qi: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m_pad, d), lambda bh, qi: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q), lambda bh, qi: (bh, 0, qi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q), lambda bh, qi: (bh, 0, qi),
                     memory_space=pltpu.VMEM),
    ]
    dq_operands = [qf, kf, vf, dof, lse, delta]
    dq_out_specs = pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                                memory_space=pltpu.VMEM)
    dq_out_shape = jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype)
    if has_bias:
        dq_in_specs.append(pl.BlockSpec(
            (1, block_q, m_pad), lambda bh, qi: (bh % gdim, qi, 0),
            memory_space=pltpu.VMEM))
        dq_operands.append(bias_p)
        # d_bias = dS, materialized per (bh, q-block) row slab. O(n*m) HBM —
        # unavoidable: d_bias itself is (n, m)-shaped.
        dq_out_specs = (dq_out_specs, pl.BlockSpec(
            (1, block_q, m_pad), lambda bh, qi: (bh, qi, 0),
            memory_space=pltpu.VMEM))
        dq_out_shape = (dq_out_shape, jax.ShapeDtypeStruct(
            (b * h, n_pad, m_pad), jnp.float32))
    dq_out = pl.pallas_call(
        dq_kernel,
        grid=(b * h, n_pad // block_q),
        in_specs=dq_in_specs,
        out_specs=dq_out_specs,
        out_shape=dq_out_shape,
        interpret=interpret,
    )(*dq_operands)
    dbias = None
    if has_bias:
        dq, dbias_full = dq_out
        dbias = dbias_full[:, :n, :m]                    # (b*h, n, m)
        if gdim != b * h:
            # forward read bias[bh % gdim]: cotangent sums the groups that
            # shared each slice (bh = q*gdim + r -> group index r)
            dbias = dbias.reshape(b * h // gdim, gdim, n, m).sum(axis=0)
        dbias = dbias.astype(bias.dtype)
    else:
        dq = dq_out

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, scale=scale, causal=causal, kv_len=m, q_len=n,
        offset=offset, block_q=block_q, block_k=block_k, has_bias=has_bias)
    dkv_in_specs = [
        pl.BlockSpec((1, n_pad, d), lambda bh, ki: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad, d), lambda bh, ki: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_pad), lambda bh, ki: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_pad), lambda bh, ki: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    dkv_operands = [qf, kf, vf, dof, lse, delta]
    if has_bias:
        dkv_in_specs.append(pl.BlockSpec(
            (1, n_pad, block_k), lambda bh, ki: (bh % gdim, 0, ki),
            memory_space=pltpu.VMEM))
        dkv_operands.append(bias_p)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b * h, m_pad // block_k),
        in_specs=dkv_in_specs,
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, m_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, m_pad, d), v.dtype),
        ),
        interpret=interpret,
    )(*dkv_operands)

    dq = dq[:, :n].reshape(b, h, n, d)
    dk = dk[:, :m].reshape(b, h, m, d)
    dv = dv[:, :m].reshape(b, h, m, d)
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_attention(q, k, v, bias, causal, scale, block_q, block_k,
                     interpret):
    out, _ = _flash_forward(q, k, v, bias, causal, scale, block_q, block_k,
                            interpret)
    return out


def _fwd(q, k, v, bias, causal, scale, block_q, block_k, interpret):
    out, lse = _flash_forward(q, k, v, bias, causal, scale, block_q, block_k,
                              interpret)
    return out, (q, k, v, bias, out, lse)


def _bwd(causal, scale, block_q, block_k, interpret, residuals, g):
    q, k, v, bias, out, lse = residuals
    return _flash_backward(q, k, v, bias, out, lse, g, causal, scale,
                           block_q, block_k, interpret)


_flash_attention.defvjp(_fwd, _bwd)


def flash_attention(q, k, v, causal: bool = False,
                    scale: Optional[float] = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: Optional[bool] = None,
                    bias=None):
    """q: (b, h, n, d); k, v: (b, h, m, d) with m >= n. Returns (b, h, n, d).

    ``bias``: optional additive pre-softmax bias — (n, m), (h, n, m), or
    (b, h, n, m) (reference attend.py:149-167 folds the same bias into
    SDPA's mask). Differentiable; broadcast shapes stay unmaterialized via
    the kernel's index map (a (h, n, m) bias is read per-head, not tiled
    batch-times in HBM) — on the FORWARD pass. The BACKWARD pass for a
    biased call materializes d_bias as a full (b*h, n, m) f32 array in HBM
    before reducing broadcast groups on the host side: at flash-engaged
    sizes (n, m >= 1024) that is the whole quadratic score matrix — budget
    b*h*n*m*4 bytes of HBM for training with a bias, or keep biased
    attention at sizes where the XLA path dispatches instead."""
    scale = default(scale, q.shape[-1] ** -0.5)
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, h, n, d = q.shape
    m = k.shape[-2]
    block_q = min(block_q, _round_up(n, 128))
    block_k = min(block_k, _round_up(m, 128))
    if bias is not None:
        if bias.ndim == 2:
            bias = bias[None]
        elif bias.ndim == 4:
            assert bias.shape[:2] == (b, h), (bias.shape, q.shape)
            bias = bias.reshape(b * h, n, m)
        assert bias.shape[-2:] == (n, m), (bias.shape, (n, m))
        assert bias.shape[0] in (1, h, b * h), bias.shape
    return _flash_attention(q, k, v, bias, causal, scale, block_q, block_k,
                            interpret)
