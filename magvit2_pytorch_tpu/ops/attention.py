"""Attention modules: full attention with learned memory KV, axial space/time
wrappers, Taylor-series linear attention.

Rebuild of reference magvit2_pytorch.py:325-464 on channels-last video
``(B, T, H, W, C)``. Axial factorization is the long-context strategy (space
attention per frame, causal time attention per pixel — never the full t*h*w
sequence; SURVEY.md §5.7), so the quadratic cost stays bounded and maps to
dense MXU matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from magvit2_pytorch_tpu.ops.attend import attend
from magvit2_pytorch_tpu.ops.basic import Linear
from magvit2_pytorch_tpu.ops.norms import AdaptiveRMSNorm, RMSNorm
from magvit2_pytorch_tpu.utils.helpers import exists, l2norm


class Attention(nn.Module):
    """Pre-norm multi-head attention with ``num_memory_kv`` learned key/values
    prepended (reference magvit2_pytorch.py:327-388). Operates on sequences
    ``(B, N, C)``."""

    dim: int
    dim_cond: Optional[int] = None
    causal: bool = False
    dim_head: int = 32
    heads: int = 8
    num_memory_kv: int = 4
    backend: Optional[str] = None
    use_rotary: bool = False
    dropout: float = 0.0   # attention-prob dropout (reference attn_dropout);
                           # active only when a 'dropout' rng is provided
    # streaming-mode kv-cache bound (SURVEY §5.7 long-video streaming): keep
    # at most this many past tokens in the cache. None = unbounded (exact,
    # but the cache grows with every chunk — a genuinely long stream
    # eventually OOMs on it). Exactness boundary: each chunk attends to the
    # last <= kv_window cached tokens plus itself, so results are bit-exact
    # vs the whole-clip forward whenever kv_window >= total_len - chunk_len;
    # beyond that it is sliding-window attention (memory KV always visible).
    kv_window: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask=None, cond=None, streaming: bool = False,
                 rope=None):
        assert self.num_memory_kv > 0
        dim_inner = self.dim_head * self.heads

        from magvit2_pytorch_tpu.ops.pallas.axial_attention import (
            fused_eligible)
        if fused_eligible(
                x.shape[1], self.dim, self.heads, self.dim_head,
                has_cond=exists(self.dim_cond), dropout=self.dropout,
                use_rotary=self.use_rotary, streaming=streaming,
                has_mask=exists(mask)):
            # Fused Pallas path (ops/pallas/axial_attention.py): norm + qkv
            # + memory-KV softmax attention + out projection in one VMEM
            # pass. Children are constructed identically to the XLA path so
            # the param tree matches (checkpoints are interchangeable).
            from magvit2_pytorch_tpu.ops.pallas.axial_attention import (
                fused_attention_block)
            gamma = RMSNorm(self.dim, name='norm').gamma
            wqkv, _ = Linear(dim_inner * 3, use_bias=False,
                             name='to_qkv')._params(self.dim)
            mem_kv_p = self.param(
                'mem_kv', nn.initializers.normal(stddev=1.0),
                (2, self.heads, self.num_memory_kv, self.dim_head))
            wout, _ = Linear(self.dim, use_bias=False,
                             name='to_out')._params(dim_inner)
            return fused_attention_block(
                x, gamma, wqkv, mem_kv_p, wout, self.heads, self.dim_head,
                self.causal, jax.default_backend() != 'tpu')

        if exists(self.dim_cond):
            x = AdaptiveRMSNorm(self.dim, dim_cond=self.dim_cond, name='norm')(x, cond)
        else:
            x = RMSNorm(self.dim, name='norm')(x)

        b, n, _ = x.shape
        qkv = Linear(dim_inner * 3, use_bias=False, name='to_qkv')(x)
        # channel layout (qkv, heads, dim_head) — qkv slowest, matching the
        # reference's 'b n (qkv h d) -> qkv b h n d'. Heads STAY in axis 2:
        # transposing to (b, h, n, d) profiled as pure layout copies on v5e.
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q = qkv[:, :, 0]
        k = qkv[:, :, 1]
        v = qkv[:, :, 2]                            # (b, n, h, d) each

        if streaming:
            # causal kv-cache: chunked calls attend over the full past; the
            # right-aligned mask in attend() (k_len > q_len) gives exactly
            # whole-sequence causal semantics
            assert self.causal and not exists(mask)
            cache = self.variable(
                'cache', 'kv_state',
                lambda: jnp.zeros((2, b, 0, self.heads, self.dim_head),
                                  x.dtype))
            if self.use_rotary:
                # rotate with absolute positions offset by the total stream
                # length so far (NOT the cache length — a kv_window-capped
                # cache is shorter than the history); cached keys were
                # rotated when first seen
                from magvit2_pytorch_tpu.ops.rotary import apply_rope, rope_angles
                pos = self.variable(
                    'cache', 'stream_pos', lambda: jnp.zeros((), jnp.int32))
                cos, sin = rope_angles(
                    jnp.arange(n) + pos.value, self.dim_head)
                pos.value = pos.value + n
                q = apply_rope(q, cos, sin)
                k = apply_rope(k, cos, sin)
            k = jnp.concatenate([cache.value[0].astype(x.dtype), k], axis=1)
            v = jnp.concatenate([cache.value[1].astype(x.dtype), v], axis=1)
            new_cache = jnp.stack([k, v])
            if exists(self.kv_window):
                new_cache = new_cache[:, :, -self.kv_window:]
            cache.value = new_cache
        elif self.use_rotary:
            from magvit2_pytorch_tpu.ops.rotary import apply_rope, rope_angles
            if rope is None:
                rope = rope_angles(jnp.arange(n), self.dim_head)
            cos, sin = rope
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)

        mem_kv = self.param(
            'mem_kv', nn.initializers.normal(stddev=1.0),
            (2, self.heads, self.num_memory_kv, self.dim_head))

        use_dropout = self.dropout > 0 and self.has_rng('dropout')

        if use_dropout:
            # explicit-probs path so dropout applies to attention weights
            # (reference Attend attn_dropout, attend.py:79-80,239)
            mem = jnp.broadcast_to(
                mem_kv.transpose(0, 2, 1, 3)[:, None],
                (2, b, self.num_memory_kv, self.heads, self.dim_head),
            ).astype(x.dtype)
            kd = jnp.concatenate((mem[0], k), axis=1)
            vd = jnp.concatenate((mem[1], v), axis=1)
            m_len = kd.shape[1]
            dots = jnp.einsum('bihd,bjhd->bhij', q, kd,
                              preferred_element_type=jnp.float32)
            dots = dots * (self.dim_head ** -0.5)
            if self.causal:
                i = jax.lax.broadcasted_iota(jnp.int32, (n, m_len), 0)
                j = jax.lax.broadcasted_iota(jnp.int32, (n, m_len), 1)
                dots = jnp.where(j > i + (m_len - n),
                                 jnp.finfo(jnp.float32).min, dots)
            probs = jax.nn.softmax(dots, axis=-1)
            keep = jax.random.bernoulli(
                self.make_rng('dropout'), 1.0 - self.dropout, probs.shape)
            probs = jnp.where(keep, probs / (1.0 - self.dropout), 0.0)
            out = jnp.einsum('bhij,bjhd->bihd', probs.astype(x.dtype), vd)
        elif not exists(mask) and self.backend != 'flash':
            # joint softmax over (sequence, memory) logits — no concat, no
            # pad/relayout copies (profiled hotspot on v5e)
            from magvit2_pytorch_tpu.ops.attend import attend_with_memory
            out = attend_with_memory(
                q, k, v, mem_kv[0].astype(x.dtype), mem_kv[1].astype(x.dtype),
                causal=self.causal)
        else:
            mem = jnp.broadcast_to(
                mem_kv.transpose(0, 2, 1, 3)[:, None],
                (2, b, self.num_memory_kv, self.heads, self.dim_head),
            ).astype(x.dtype)
            k = jnp.concatenate((mem[0], k), axis=1)
            v = jnp.concatenate((mem[1], v), axis=1)

            if exists(mask):
                # key padding mask (b, m) -> (b, h, n, m); memory always visible
                mask = jnp.pad(mask, ((0, 0), (self.num_memory_kv, 0)),
                               constant_values=True)
                mask = mask[:, None, None, :]
                mask = jnp.broadcast_to(
                    mask, (b, self.heads, n, mask.shape[-1]))

            out = attend(q, k, v, causal=self.causal, mask=mask,
                         backend=self.backend, layout='bnhd')

        out = out.reshape(b, n, dim_inner)
        return Linear(self.dim, use_bias=False, name='to_out')(out)


class TaylorSeriesLinearAttn(nn.Module):
    """Second-order Taylor-softmax linear attention, first-party JAX
    (behavioral equivalent of the external ``taylor_series_linear_attention``
    package the reference wraps at magvit2_pytorch.py:34,415-419; arXiv
    2312.04927 'Zoology'/Based-style feature map).

    Feature map phi(x) = [1, x, vec(x (x) x)/sqrt(2)] makes
    phi(q).phi(k) = 1 + q.k + (q.k)^2/2 — the 2nd-order Taylor expansion of
    exp(q.k). Linear O(n) cost: out = phi(q) @ (phi(k)^T v) / phi(q) @ sum phi(k).
    With dim_head=8 the feature dim is 73 — small dense matmuls the MXU eats.
    """

    dim: int
    dim_head: int = 8
    heads: int = 8
    eps: float = 1e-5
    impl: str = 'auto'   # 'auto' | 'interleaved' | 'fused' | 'reference'

    @nn.compact
    def __call__(self, x, gamma=None):
        from magvit2_pytorch_tpu.ops.pallas.taylor_attention import (
            taylor_linear_attention,
        )
        from magvit2_pytorch_tpu.utils.init import torch_kernel_init

        dim_inner = self.dim_head * self.heads
        c = x.shape[-1]
        # raw kernels (no Linear wrapper) so the fused implementations can
        # take them directly; column layout (qkv, head, d) as in the reference
        wqkv = self.param('to_qkv_kernel', torch_kernel_init,
                          (c, dim_inner * 3))
        wout = self.param('to_out_kernel', torch_kernel_init,
                          (dim_inner, self.dim))

        # gamma: fuse the preceding RMSNorm into the attention block (saves a
        # full-tensor fp32 relayout at the kernel boundary)
        return taylor_linear_attention(
            x, wqkv, wout, self.heads, self.dim_head, self.eps,
            impl=self.impl, gamma=gamma)


class LinearAttention(nn.Module):
    """(Adaptive)RMSNorm pre-norm around TaylorSeriesLinearAttn (reference
    magvit2_pytorch.py:390-430). The plain-RMSNorm case hands gamma to the
    attention block so the norm fuses into the Pallas kernel."""

    dim: int
    dim_cond: Optional[int] = None
    dim_head: int = 8
    heads: int = 8

    def setup(self):
        if exists(self.dim_cond):
            self.norm = AdaptiveRMSNorm(self.dim, dim_cond=self.dim_cond,
                                        name='norm')
        else:
            self.norm = RMSNorm(self.dim, name='norm')
        self.attn = TaylorSeriesLinearAttn(
            self.dim, dim_head=self.dim_head, heads=self.heads, name='attn')

    def _attend(self, x, cond):
        if exists(self.dim_cond):
            return self.attn(self.norm(x, cond))
        return self.attn(x, gamma=self.norm.gamma)

    def __call__(self, x, cond=None):
        return self._attend(x, cond)


def _space_to_seq(x):
    """(b, t, h, w, c) or (b, h, w, c) -> (b*t, h*w, c) + restore fn."""
    if x.ndim == 4:
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c), lambda o: o.reshape(b, h, w, -1)
    b, t, h, w, c = x.shape
    return (x.reshape(b * t, h * w, c),
            lambda o: o.reshape(b, t, h, w, -1))


def _time_to_seq(x):
    """(b, t, h, w, c) -> (b*h*w, t, c) + restore fn."""
    b, t, h, w, c = x.shape
    xt = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)

    def restore(o):
        return o.reshape(b, h, w, t, -1).transpose(0, 3, 1, 2, 4)

    return xt, restore


class SpaceAttention(Attention):
    """Axial full attention over h*w per (batch, frame) (reference
    magvit2_pytorch.py:444-454). With ``use_rotary``, positions are axial 2D
    RoPE over (row, col)."""

    @nn.compact
    def __call__(self, x, mask=None, cond=None):
        h, w = x.shape[-3], x.shape[-2]
        rope = None
        if self.use_rotary:
            from magvit2_pytorch_tpu.ops.rotary import rope_angles_2d
            rope = rope_angles_2d(h, w, self.dim_head)
        seq, restore = _space_to_seq(x)
        if exists(cond):
            cond = jnp.repeat(cond, seq.shape[0] // cond.shape[0], axis=0)
        out = super().__call__(seq, mask=mask, cond=cond, rope=rope)
        return restore(out)


class TimeAttention(Attention):
    """Axial attention over t per (batch, pixel), causal in the layer stack
    (reference magvit2_pytorch.py:456-464)."""

    @nn.compact
    def __call__(self, x, mask=None, cond=None, streaming: bool = False):
        from magvit2_pytorch_tpu.ops.pallas.axial_attention import (
            fused_time_eligible)
        b, t, h, w, c = x.shape
        if fused_time_eligible(
                t, h * w, self.dim, self.heads, self.dim_head,
                has_cond=exists(self.dim_cond), dropout=self.dropout,
                use_rotary=self.use_rotary, streaming=streaming,
                has_mask=exists(mask)):
            # Layout-native fused Pallas path: attends over t directly in the
            # (b, t, h, w, c) conv layout — the XLA path below pays a
            # whole-tensor relayout on each side of a tiny-t attention.
            # Children are constructed with the same names as the XLA path
            # so the param tree matches (checkpoints interchangeable).
            from magvit2_pytorch_tpu.ops.pallas.axial_attention import (
                fused_time_attention_block)
            dim_inner = self.dim_head * self.heads
            gamma = RMSNorm(self.dim, name='norm').gamma
            wqkv, _ = Linear(dim_inner * 3, use_bias=False,
                             name='to_qkv')._params(self.dim)
            mem_kv_p = self.param(
                'mem_kv', nn.initializers.normal(stddev=1.0),
                (2, self.heads, self.num_memory_kv, self.dim_head))
            wout, _ = Linear(self.dim, use_bias=False,
                             name='to_out')._params(dim_inner)
            out = fused_time_attention_block(
                x.reshape(b, t, h * w, c), gamma, wqkv, mem_kv_p, wout,
                self.heads, self.dim_head, self.causal,
                jax.default_backend() != 'tpu')
            return out.reshape(b, t, h, w, c)

        seq, restore = _time_to_seq(x)
        if exists(cond):
            cond = jnp.repeat(cond, seq.shape[0] // cond.shape[0], axis=0)
        out = super().__call__(seq, mask=mask, cond=cond, streaming=streaming)
        return restore(out)


class LinearSpaceAttention(LinearAttention):
    """Axial linear attention over h*w (reference magvit2_pytorch.py:432-442).
    Works on video (b,t,h,w,c) and images (b,h,w,c)."""

    def __call__(self, x, cond=None):
        seq, restore = _space_to_seq(x)
        if exists(cond):
            cond = jnp.repeat(cond, seq.shape[0] // cond.shape[0], axis=0)
        out = self._attend(seq, cond)
        return restore(out)
