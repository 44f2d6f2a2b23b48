"""Normalization & conditioning layers.

Rebuild of reference magvit2_pytorch.py:256-323 (RMSNorm / AdaptiveRMSNorm) and
the final encoder LayerNorm (magvit2_pytorch.py:1322-1326). Channels-LAST: the
normalized axis is always the trailing channel axis, so the reference's
``channel_first`` broadcast gymnastics disappear — on TPU the trailing axis is
the lane dimension and these reductions vectorize on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from magvit2_pytorch_tpu.utils.helpers import l2norm


class RMSNorm(nn.Module):
    """``F.normalize(x, dim=channel) * sqrt(dim) * gamma (+ beta)``
    (reference magvit2_pytorch.py:258-276). Note this is *l2*-normalize — not
    the 1/rms variant — matching the reference exactly.

    setup-based so fused kernels can read ``gamma`` without applying the
    module (norm-inside-kernel path)."""

    dim: int
    bias: bool = False

    def setup(self):
        self.gamma = self.param('gamma', nn.initializers.ones, (self.dim,))
        if self.bias:
            self.beta = self.param('beta', nn.initializers.zeros, (self.dim,))

    def __call__(self, x):
        out32 = l2norm(x.astype(jnp.float32)) * (self.dim ** 0.5)
        out = out32.astype(x.dtype) * self.gamma.astype(x.dtype)
        if self.bias:
            out = out + self.beta.astype(x.dtype)
        return out


class AdaptiveRMSNorm(nn.Module):
    """gamma/beta predicted from a per-sample cond vector; identity at init
    (gamma-proj weight=0, bias=1; reference magvit2_pytorch.py:278-323)."""

    dim: int
    dim_cond: int
    bias: bool = False

    @nn.compact
    def __call__(self, x, cond):
        assert cond.shape == (x.shape[0], self.dim_cond)

        gamma = nn.Dense(
            self.dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.ones,
            name='to_gamma',
        )(cond)

        out = l2norm(x.astype(jnp.float32)) * (self.dim ** 0.5)
        out = out.astype(x.dtype)

        # broadcast (b, dim) over any middle axes
        extra = x.ndim - 2
        gamma = gamma.reshape(gamma.shape[0], *((1,) * extra), self.dim)
        out = out * gamma.astype(x.dtype)

        if self.bias:
            beta = nn.Dense(
                self.dim,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                name='to_bias',
            )(cond)
            beta = beta.reshape(beta.shape[0], *((1,) * extra), self.dim)
            out = out + beta.astype(x.dtype)
        return out


class LayerNorm(nn.Module):
    """Standard LayerNorm over the trailing channel axis with learned
    scale+bias — the final encoder norm (reference magvit2_pytorch.py:1322-1326,
    torch ``nn.LayerNorm(dim)`` semantics, eps=1e-5)."""

    dim: int
    eps: float = 1e-5

    def setup(self):
        # setup-based (not compact) so the tokenizer can register these params
        # without applying the norm — the reference appends this norm but never
        # runs it (quirk #10, see TokenizerConfig.apply_final_norm), yet its
        # checkpoints still carry the weights
        self.gamma = self.param('gamma', nn.initializers.ones, (self.dim,))
        self.beta = self.param('beta', nn.initializers.zeros, (self.dim,))

    def __call__(self, x):
        gamma, beta = self.gamma, self.beta
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        out = out.astype(x.dtype)
        return out * gamma.astype(x.dtype) + beta.astype(x.dtype)
