"""Attention core: backend-dispatched scaled-dot-product attention.

TPU-native rebuild of the reference's ``Attend``
(/root/reference/magvit2_pytorch/attend.py:57-243). Two backends behind one
interface, mirroring the reference's flash/math dual path (attend.py:84,214-216):

- ``'xla'``   — einsum + fp32 softmax; XLA fuses this well for the short axial
  sequence lengths the tokenizer uses.
- ``'flash'`` — Pallas TPU flash-attention kernel (ops/pallas/flash_attention.py)
  for the quadratic axes at larger resolutions.
- ``'auto'``  — flash on TPU when shapes are tile-friendly, else xla.

Semantics preserved from the reference:
- right-aligned causal mask when ``k_len > q_len`` (memory-KV tokens are
  visible to every query; attend.py:109-129)
- causal disabled for single-query decode (attend.py:112-114)
- fully-masked-row protection returns zeros (attend.py:133-143,181-182)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from magvit2_pytorch_tpu.utils.helpers import default, exists

_DEFAULT_BACKEND = 'auto'


def set_default_attend_backend(backend: str):
    assert backend in ('auto', 'xla', 'flash')
    global _DEFAULT_BACKEND
    _DEFAULT_BACKEND = backend


def get_default_attend_backend() -> str:
    return _DEFAULT_BACKEND


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == 'tpu'
    except Exception:  # pragma: no cover
        return False


def _flash_friendly_nm(n: int, m: int, d: int) -> bool:
    # re-profiled on v5e (round 2, chained-dispatch slope timing, bf16,
    # block_q=block_k=512): flash beats the XLA einsum+softmax path from
    # n>=1024 for both d=32 and d=64 — fwd 2-3.5x, fwd+bwd 2-5x (Pallas
    # backward kernels) — and by ~50-95x at n=8192 where XLA's materialized
    # (n, m) score matrix spills to HBM. Below n=1024 both are sub-ms and
    # XLA's fusion wins on kernel-launch overhead.
    return 32 <= d <= 256 and n >= 1024 and m >= 1024


def attend(
    q, k, v,
    causal: bool = False,
    mask=None,
    scale: Optional[float] = None,
    backend: Optional[str] = None,
    layout: str = 'bhnd',
    attn_bias=None,
    prev_attn=None,
):
    """Scaled-dot-product attention.

    ``layout='bhnd'``: q (b, h, n, d); k, v (b, h, m, d).
    ``layout='bnhd'``: q (b, n, h, d); k, v (b, m, h, d) — the projection
    layout; avoids whole-tensor head transposes (which profiled as pure
    layout copies on v5e).
    mask: (b, h, n, m) bool (True=keep). Softmax accumulates in fp32.
    attn_bias: additive pre-softmax bias, (h, n, m) or (b, h, n, m) — the
    alibi-style hook of reference attend.py:149-167,218-221.
    prev_attn: residual pre-softmax logits (b, h, n, m), added before the
    bias (reference attend.py:214-218); incompatible with flash, like the
    reference's assert (attend.py:211).
    """
    assert layout in ('bhnd', 'bnhd')
    backend = default(backend, _DEFAULT_BACKEND)
    seq_axis = -2 if layout == 'bhnd' else -3
    n, m = q.shape[seq_axis], k.shape[seq_axis]

    if n == 1 and causal:
        causal = False

    if backend == 'auto':
        backend = 'flash' if (
            _on_tpu() and _flash_friendly_nm(n, m, q.shape[-1])
            and not exists(mask) and not exists(attn_bias)
            and not exists(prev_attn)) else 'xla'
    assert not (backend == 'flash' and exists(prev_attn)), (
        'residual attention not compatible with flash attention')
    if exists(prev_attn):
        backend = 'xla'

    if backend == 'flash' and not exists(mask):
        # the Pallas kernel carries an additive-bias tile (differentiable,
        # broadcast-aware) matching the reference's biased-SDPA path
        # (attend.py:149-167). 'auto' still routes biased attention to XLA —
        # the per-row bias slab adds O(n*m) HBM reads, which erodes flash's
        # advantage at the sizes where auto would pick it.
        from magvit2_pytorch_tpu.ops.pallas.flash_attention import flash_attention
        if layout == 'bnhd':
            q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        out = flash_attention(q, k, v, causal=causal, scale=scale,
                              bias=attn_bias)
        if layout == 'bnhd':
            out = out.transpose(0, 2, 1, 3)
        return out

    if layout == 'bnhd':
        return _attend_xla_bnhd(q, k, v, causal=causal, mask=mask, scale=scale,
                                attn_bias=attn_bias, prev_attn=prev_attn)
    return _attend_xla(q, k, v, causal=causal, mask=mask, scale=scale,
                       attn_bias=attn_bias, prev_attn=prev_attn)


def _apply_bias(dots, attn_bias, prev_attn):
    """Reference ordering (attend.py:214-221): prev_attn first, then bias."""
    if exists(prev_attn):
        dots = dots + prev_attn.astype(dots.dtype)
    if exists(attn_bias):
        if attn_bias.ndim == 3:
            attn_bias = attn_bias[None]
        dots = dots + attn_bias.astype(dots.dtype)
    return dots


def _attend_xla(q, k, v, causal, mask, scale, attn_bias=None, prev_attn=None):
    d = q.shape[-1]
    n, m = q.shape[-2], k.shape[-2]
    scale = default(scale, d ** -0.5)

    dots = jnp.einsum('bhid,bhjd->bhij', q, k,
                      preferred_element_type=jnp.float32) * scale
    dots = _apply_bias(dots, attn_bias, prev_attn)

    mask_value = jnp.finfo(jnp.float32).min

    if causal:
        # right-aligned: query i sees keys j <= i + (m - n); the m-n extra
        # keys on the left (memory KV) are visible to everyone
        i = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
        causal_mask = j > (i + (m - n))
        dots = jnp.where(causal_mask, mask_value, dots)

    row_all_masked = None
    if exists(mask):
        dots = jnp.where(mask, dots, mask_value)
        row_all_masked = ~jnp.any(mask, axis=-1)

    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum('bhij,bhjd->bhid', attn.astype(v.dtype), v)

    if exists(row_all_masked):
        out = jnp.where(row_all_masked[..., None], 0.0, out)

    return out.astype(q.dtype)


def attend_with_memory(q, k, v, mem_k, mem_v, causal: bool = False,
                       scale: Optional[float] = None):
    """Attention with learned memory key/values WITHOUT concatenating them
    into k/v: the concat produced pad+relayout copies dominating small axial
    attentions on v5e. Joint softmax over two logit tensors instead.

    q, k, v: (b, n, h, d); mem_k, mem_v: (h, m, d). Memory tokens are visible
    to every query (right-aligned causal semantics of the reference,
    attend.py:109-129)."""
    d = q.shape[-1]
    n = q.shape[1]
    scale = default(scale, d ** -0.5)

    dots = jnp.einsum('bihd,bjhd->bhij', q, k,
                      preferred_element_type=jnp.float32) * scale
    dots_mem = jnp.einsum('bihd,hmd->bhim', q, mem_k,
                          preferred_element_type=jnp.float32) * scale

    m_seq = k.shape[1]
    if causal and n > 1:
        # right-aligned for kv-cache streaming (m_seq >= n)
        i = jax.lax.broadcasted_iota(jnp.int32, (n, m_seq), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (n, m_seq), 1)
        dots = jnp.where(j > i + (m_seq - n), jnp.finfo(jnp.float32).min, dots)

    mx = jnp.maximum(jnp.max(dots, axis=-1), jnp.max(dots_mem, axis=-1))
    e_seq = jnp.exp(dots - mx[..., None])
    e_mem = jnp.exp(dots_mem - mx[..., None])
    den = e_seq.sum(axis=-1) + e_mem.sum(axis=-1)         # (b, h, i)

    out = (jnp.einsum('bhij,bjhd->bihd', e_seq.astype(v.dtype), v)
           + jnp.einsum('bhim,hmd->bihd', e_mem.astype(v.dtype), mem_v))
    out = out / den.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def _attend_xla_bnhd(q, k, v, causal, mask, scale, attn_bias=None,
                     prev_attn=None):
    """Same math as _attend_xla with heads kept in-place: q (b,n,h,d),
    k/v (b,m,h,d) -> out (b,n,h,d). No input/output transposes — the head
    axis rides along as an einsum batch dim."""
    d = q.shape[-1]
    n, m = q.shape[1], k.shape[1]
    scale = default(scale, d ** -0.5)

    dots = jnp.einsum('bihd,bjhd->bhij', q, k,
                      preferred_element_type=jnp.float32) * scale
    dots = _apply_bias(dots, attn_bias, prev_attn)

    mask_value = jnp.finfo(jnp.float32).min

    if causal:
        i = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
        causal_mask = j > (i + (m - n))
        dots = jnp.where(causal_mask, mask_value, dots)

    row_all_masked = None
    if exists(mask):
        dots = jnp.where(mask, dots, mask_value)
        row_all_masked = ~jnp.any(mask, axis=-1)  # (b, h, n)

    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum('bhij,bjhd->bihd', attn.astype(v.dtype), v)

    if exists(row_all_masked):
        out = jnp.where(row_all_masked.transpose(0, 2, 1)[..., None], 0.0, out)

    return out.astype(q.dtype)
