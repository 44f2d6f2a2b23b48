"""Fused Pallas kernel: small-n softmax attention block in one VMEM pass.

Target: the flagship's ``attend_space`` blocks — 16x16 spatial attention at
512 channels (reference SpaceAttention, magvit2_pytorch.py:444-454; core
Attention at :327-388). tools/flop_audit.py shows these run at their
per-HLO BYTES roofline under XLA (79 FLOP/byte; measured 2.95 ms at batch 8
vs a 2.4 GB / 819 GB/s = 2.9 ms memory bound): the time is intermediate
materialization (qkv, per-head splits, scores, probs), not math.

Per (frames-tile) grid step, entirely in VMEM:

    x -> RMSNorm -> qkv matmul -> per-(frame, head) softmax attention with
    the learned memory KV (joint softmax over sequence+memory logits,
    matching ops/attend.attend_with_memory / reference attend.py:109-129)
    -> out projection

ONE read of x, ONE write of the block output. The +x residual stays in the
XLA `Residual` wrapper (it fuses with neighbors). Supports the causal
(right-aligned, memory-always-visible) mask for time attention.

Backward: custom VJP recomputing through `_attention_block_xla` — the
numerics twin below (also the correctness oracle in
tests/test_fused_attention.py). Gradients are exact for the twin's math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _rmsnorm(x, gamma, dim):
    # l2-normalize * sqrt(dim) * gamma, f32 accumulation (ops/norms.RMSNorm)
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True) + 1e-24)
    out32 = x32 * inv * (dim ** 0.5)
    return out32.astype(x.dtype) * gamma


# -- the kernel ---------------------------------------------------------------


def _kernel(x_ref, g1_ref, wqkv_ref, memk_ref, memv_ref, wout_ref, o_ref,
            *, N: int, C: int, H: int, D: int, M: int, F: int, causal: bool):
    dtype = x_ref.dtype
    inner = H * D
    scale = D ** -0.5

    x = x_ref[...].reshape(F * N, C)                   # (F*N, C)
    xn = _rmsnorm(x, g1_ref[0], C)
    qkv = jnp.dot(xn, wqkv_ref[...],
                  preferred_element_type=jnp.float32).astype(dtype)

    neg = jnp.finfo(jnp.float32).min
    outs = []
    for f in range(F):
        rows = qkv[f * N:(f + 1) * N]
        heads = []
        for h in range(H):
            q = rows[:, h * D:(h + 1) * D]             # (N, D)
            k = rows[:, inner + h * D:inner + (h + 1) * D]
            v = rows[:, 2 * inner + h * D:2 * inner + (h + 1) * D]
            mk = memk_ref[h]                           # (M, D)
            mv = memv_ref[h]
            dots = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale     # (N, N)
            if causal:
                i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
                j = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
                dots = jnp.where(j > i, neg, dots)
            dots_m = jax.lax.dot_general(
                q, mk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale     # (N, M)
            mx = jnp.maximum(jnp.max(dots, axis=-1, keepdims=True),
                             jnp.max(dots_m, axis=-1, keepdims=True))
            e = jnp.exp(dots - mx)
            em = jnp.exp(dots_m - mx)
            den = (jnp.sum(e, axis=-1, keepdims=True)
                   + jnp.sum(em, axis=-1, keepdims=True))
            o = (jnp.dot(e.astype(dtype), v,
                         preferred_element_type=jnp.float32)
                 + jnp.dot(em.astype(dtype), mv,
                           preferred_element_type=jnp.float32))
            heads.append((o / den).astype(dtype))
        outs.append(jnp.concatenate(heads, axis=-1))   # (N, inner)
    attn = jnp.concatenate(outs, axis=0)               # (F*N, inner)
    out = jnp.dot(attn, wout_ref[...],
                  preferred_element_type=jnp.float32).astype(dtype)
    o_ref[...] = out.reshape(F, N, C)


# -- XLA twin (VJP recompute target + oracle) ---------------------------------


def _attention_block_xla(x, g1, wqkv, mem_kv, wout,
                         heads: int, dim_head: int, causal: bool = False):
    """Identical math in XLA on (BT, N, C); mirrors the module path
    (RMSNorm + to_qkv + attend_with_memory + to_out, no residual)."""
    from magvit2_pytorch_tpu.ops.attend import attend_with_memory

    dtype = x.dtype
    C = x.shape[-1]
    bt, n, _ = x.shape
    inner = heads * dim_head

    xn = _rmsnorm(x, g1.astype(dtype), C)
    qkv = jnp.einsum('bnc,cf->bnf', xn, wqkv.astype(dtype))
    qkv = qkv.reshape(bt, n, 3, heads, dim_head)
    out = attend_with_memory(
        qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
        mem_kv[0].astype(dtype), mem_kv[1].astype(dtype), causal=causal)
    out = out.reshape(bt, n, inner)
    return jnp.einsum('bnf,fc->bnc', out, wout.astype(dtype))


# -- public entry -------------------------------------------------------------


def fused_eligible(n: int, c: int, heads: int, dim_head: int,
                   *, has_cond: bool, dropout: float, use_rotary: bool,
                   streaming: bool = False, has_mask: bool = False) -> bool:
    """Static gate: the fused block covers the flagship's plain axial
    attention (no cond / dropout-rng / rotary / mask / kv-cache), small n,
    lane-friendly dims."""
    import os
    if os.environ.get('MAGVIT2_TPU_NO_FUSED_ATTN', '') == '1':
        return False
    if has_cond or dropout > 0 or use_rotary or streaming or has_mask:
        return False
    if n > 1024 or n % 8:
        return False
    if c % LANE or (heads * dim_head) % LANE:
        return False
    return jax.default_backend() == 'tpu'


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_attention_block(x, g1, wqkv, mem_kv, wout,
                          heads: int, dim_head: int, causal: bool = False,
                          interpret: bool = False):
    """Pre-norm attention block on (BT, N, C). Params in module layout:
    g1 (C,) [RMSNorm gamma], wqkv (C, 3*inner), mem_kv (2, heads, M,
    dim_head), wout (inner, C)."""
    BT, N, C = x.shape
    dtype = x.dtype
    inner = heads * dim_head
    M = mem_kv.shape[2]

    # frames per grid step: keep the x tile around ~1MB
    F = max(1, min(BT, (1 << 20) // (N * C * jnp.dtype(dtype).itemsize)))
    while BT % F:
        F -= 1
    grid = BT // F

    kernel = functools.partial(_kernel, N=N, C=C, H=heads, D=dim_head,
                               M=M, F=F, causal=causal)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((F, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, C)),
            const((C, 3 * inner)),
            const((heads, M, dim_head)),
            const((heads, M, dim_head)),
            const((inner, C)),
        ],
        out_specs=pl.BlockSpec((F, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * BT * N * C * 4 * inner + 4 * BT * N * N * inner,
            bytes_accessed=2 * BT * N * C * jnp.dtype(dtype).itemsize,
            transcendentals=BT * N * N,
        ),
        interpret=interpret,
    )(x, g1.astype(dtype).reshape(1, C), wqkv.astype(dtype),
      mem_kv[0].astype(dtype), mem_kv[1].astype(dtype), wout.astype(dtype))


def _fwd(x, g1, wqkv, mem_kv, wout, heads, dim_head, causal, interpret):
    out = fused_attention_block(x, g1, wqkv, mem_kv, wout, heads, dim_head,
                                causal, interpret)
    return out, (x, g1, wqkv, mem_kv, wout)


def _bwd(heads, dim_head, causal, interpret, residuals, g):
    _, vjp = jax.vjp(
        lambda *a: _attention_block_xla(*a, heads=heads, dim_head=dim_head,
                                        causal=causal),
        *residuals)
    return vjp(g)


fused_attention_block.defvjp(_fwd, _bwd)


# -- time-axis variant (layout-native attend_time) ----------------------------
#
# TimeAttention's XLA path pays a whole-tensor (b,t,h,w,c)->(b*h*w,t,c)
# relayout on each side of a tiny (t ~ 5) attention — layer_bench flags the
# block as transpose-bound. This kernel attends over t directly in the conv
# layout: per (batch, spatial-tile) grid step it loads a (T, S_BLK, C) slab,
# treats it as T*S_BLK rows, and masks attention to same-pixel pairs
# (block-diagonal in s) with causality in t. The masked (L, L) score matrix
# wastes S_BLK x the logical T^2 FLOPs, but T is tiny and the matrix never
# leaves VMEM — the win is removing both relayouts (2 reads + 2 writes of the
# full activation).


def _time_kernel(x_ref, g1_ref, wqkv_ref, memk_ref, memv_ref, wout_ref, o_ref,
                 *, T: int, S_BLK: int, C: int, H: int, D: int, M: int,
                 causal: bool):
    dtype = x_ref.dtype
    inner = H * D
    scale = D ** -0.5
    L = T * S_BLK

    x = x_ref[...].reshape(L, C)                       # (T*S_BLK, C)
    xn = _rmsnorm(x, g1_ref[0], C)
    qkv = jnp.dot(xn, wqkv_ref[...],
                  preferred_element_type=jnp.float32).astype(dtype)

    # row-major (t, s) position index; S_BLK is a power of two, so same-pixel
    # and frame-order tests are pure bitwise ops (mask / arithmetic shift) —
    # guaranteed-lowerable elementwise vector ops on the VPU. Two's-complement
    # AND computes (p - q) mod S_BLK correctly for negative differences.
    shift = S_BLK.bit_length() - 1
    p = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    q = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    vis = ((p - q) & (S_BLK - 1)) == 0                 # same pixel
    if causal:
        vis = vis & ((q >> shift) <= (p >> shift))     # t_q <= t_p

    neg = jnp.finfo(jnp.float32).min
    heads = []
    for h in range(H):
        qh = qkv[:, h * D:(h + 1) * D]                 # (L, D)
        kh = qkv[:, inner + h * D:inner + (h + 1) * D]
        vh = qkv[:, 2 * inner + h * D:2 * inner + (h + 1) * D]
        dots = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale          # (L, L)
        dots = jnp.where(vis, dots, neg)
        dots_m = jax.lax.dot_general(
            qh, memk_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale          # (L, M)
        mx = jnp.maximum(jnp.max(dots, axis=-1, keepdims=True),
                         jnp.max(dots_m, axis=-1, keepdims=True))
        e = jnp.exp(dots - mx)
        em = jnp.exp(dots_m - mx)
        den = (jnp.sum(e, axis=-1, keepdims=True)
               + jnp.sum(em, axis=-1, keepdims=True))
        o = (jnp.dot(e.astype(dtype), vh,
                     preferred_element_type=jnp.float32)
             + jnp.dot(em.astype(dtype), memv_ref[h],
                       preferred_element_type=jnp.float32))
        heads.append((o / den).astype(dtype))
    attn = jnp.concatenate(heads, axis=-1)             # (L, inner)
    out = jnp.dot(attn, wout_ref[...],
                  preferred_element_type=jnp.float32).astype(dtype)
    o_ref[...] = out.reshape(1, T, S_BLK, C)


def _time_block_xla(x, g1, wqkv, mem_kv, wout,
                    heads: int, dim_head: int, causal: bool = True):
    """Numerics twin on (B, T, S, C): the module path's transpose + per-pixel
    attention + transpose back."""
    b, t, s, c = x.shape
    xt = x.transpose(0, 2, 1, 3).reshape(b * s, t, c)
    o = _attention_block_xla(xt, g1, wqkv, mem_kv, wout,
                             heads=heads, dim_head=dim_head, causal=causal)
    return o.reshape(b, s, t, c).transpose(0, 2, 1, 3)


def _time_s_blk(t: int, s: int) -> int:
    blk = 16
    while blk * 2 <= 64 and s % (blk * 2) == 0 and t * blk * 2 <= 1024:
        blk *= 2
    return blk


def fused_time_eligible(t: int, s: int, c: int, heads: int, dim_head: int,
                        *, has_cond: bool, dropout: float, use_rotary: bool,
                        streaming: bool = False,
                        has_mask: bool = False) -> bool:
    """Static gate for the layout-native time kernel: plain causal time
    attention (no cond / dropout-rng / rotary / kv-cache / mask), tiny t,
    lane-friendly dims, spatial extent divisible by the 16-wide tile."""
    import os
    if os.environ.get('MAGVIT2_TPU_NO_FUSED_ATTN', '') == '1':
        return False
    if has_cond or dropout > 0 or use_rotary or streaming or has_mask:
        return False
    if t > 16 or s % 16:
        return False
    if c % LANE or (heads * dim_head) % LANE:
        return False
    return jax.default_backend() == 'tpu'


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_time_attention_block(x, g1, wqkv, mem_kv, wout,
                               heads: int, dim_head: int, causal: bool = True,
                               interpret: bool = False):
    """Pre-norm TIME attention block on (B, T, S, C) — no relayout; attends
    over t per spatial position s. Params in module layout (see
    fused_attention_block)."""
    B, T, S, C = x.shape
    dtype = x.dtype
    inner = heads * dim_head
    M = mem_kv.shape[2]
    S_BLK = _time_s_blk(T, S)
    L = T * S_BLK

    kernel = functools.partial(_time_kernel, T=T, S_BLK=S_BLK, C=C,
                               H=heads, D=dim_head, M=M, causal=causal)
    const = lambda shape: pl.BlockSpec(
        shape, lambda b, s: (0,) * len(shape), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(B, S // S_BLK),
        in_specs=[
            pl.BlockSpec((1, T, S_BLK, C), lambda b, s: (b, 0, s, 0),
                         memory_space=pltpu.VMEM),
            const((1, C)),
            const((C, 3 * inner)),
            const((heads, M, dim_head)),
            const((heads, M, dim_head)),
            const((inner, C)),
        ],
        out_specs=pl.BlockSpec((1, T, S_BLK, C), lambda b, s: (b, 0, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * S * C * 4 * inner
            + B * (S // S_BLK) * 4 * L * L * inner,
            bytes_accessed=2 * B * T * S * C * jnp.dtype(dtype).itemsize,
            transcendentals=B * (S // S_BLK) * L * L,
        ),
        interpret=interpret,
    )(x, g1.astype(dtype).reshape(1, C), wqkv.astype(dtype),
      mem_kv[0].astype(dtype), mem_kv[1].astype(dtype), wout.astype(dtype))


def _time_fwd(x, g1, wqkv, mem_kv, wout, heads, dim_head, causal, interpret):
    out = fused_time_attention_block(x, g1, wqkv, mem_kv, wout, heads,
                                     dim_head, causal, interpret)
    return out, (x, g1, wqkv, mem_kv, wout)


def _time_bwd(heads, dim_head, causal, interpret, residuals, g):
    _, vjp = jax.vjp(
        lambda *a: _time_block_xla(*a, heads=heads, dim_head=dim_head,
                                   causal=causal),
        *residuals)
    return vjp(g)


fused_time_attention_block.defvjp(_time_fwd, _time_bwd)
