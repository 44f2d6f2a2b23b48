"""Basic blocks: Linear (torch-init), GEGLU FeedForward, TokenShift,
SqueezeExcite (global-context), residual combinators.

Rebuild of reference magvit2_pytorch.py:159-254 (combinators, ToTimeSequence,
SqueezeExcite, TokenShift) and :466-508 (GEGLU / FeedForward). Channels-last;
the 1x1(x1) convs of the reference become Dense layers over the trailing axis —
identical math, and XLA maps them straight onto the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from magvit2_pytorch_tpu.ops.norms import AdaptiveRMSNorm, RMSNorm
from magvit2_pytorch_tpu.utils.helpers import default, exists
from magvit2_pytorch_tpu.utils.init import torch_bias_init, torch_kernel_init


class Linear(nn.Module):
    """Dense layer with torch nn.Linear's default init distributions (or
    explicit ``kernel_init`` / ``bias_init`` overrides — used where the
    reference customizes an nn.Conv's init, e.g. SqueezeExcite's gate head)."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[object] = None
    bias_init: Optional[object] = None

    @nn.compact
    def _params(self, fan_in: int):
        """Create/fetch this layer's params without running compute — lets
        fused Pallas kernels (ops/pallas/residual_unit.py) pull child params
        while keeping the param tree identical to the called path. This is
        the module's single compact method; ``__call__`` is a plain method so
        either entry point works (once per instance per trace)."""
        kernel = self.param('kernel', default(self.kernel_init, torch_kernel_init),
                            (fan_in, self.features))
        bias = self.param(
            'bias', default(self.bias_init, torch_bias_init(fan_in)),
            (self.features,)) if self.use_bias else None
        return kernel, bias

    def __call__(self, x):
        kernel, bias = self._params(x.shape[-1])
        out = jnp.einsum('...i,io->...o', x, kernel.astype(x.dtype))
        if bias is not None:
            out = out + bias.astype(x.dtype)
        return out


def _linear_apply(x, kernel, bias):
    """Functional core of ``Linear`` (params passed explicitly)."""
    out = jnp.einsum('...i,io->...o', x, kernel.astype(x.dtype))
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def leaky_relu(x, negative_slope: float = 0.1):
    # reference leaky_relu(p=0.1), magvit2_pytorch.py:117-118
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)


def elu(x):
    """Select-free ELU: ``max(x,0) + expm1(min(x,0))`` — identical to
    ``where(x>0, x, expm1(x))`` for every input, but with no predicate.
    jax.nn.elu's select form made XLA bit-pack the shared ``x>0`` mask over
    the time axis into u32 words and re-expand it in every consumer fusion
    (~27 ms/iter of the flagship roundtrip on v5e, pure overhead)."""
    return jnp.maximum(x, 0) + jnp.expm1(jnp.minimum(x, 0))


class GEGLU(nn.Module):
    """Split trailing channels in half; ``gelu(gate) * x``
    (reference magvit2_pytorch.py:466-469, which splits on the channel dim)."""

    @nn.compact
    def __call__(self, x):
        x, gate = jnp.split(x, 2, axis=-1)
        return jax.nn.gelu(gate) * x


class FeedForward(nn.Module):
    """(Adaptive)RMSNorm -> 1x1 GEGLU MLP; inner dim ``int(dim*mult*2/3)``
    (reference magvit2_pytorch.py:471-508). The reference's Conv2d/Conv3d 1x1
    become Dense on channels-last."""

    dim: int
    dim_cond: Optional[int] = None
    mult: float = 4.0
    images: bool = False  # kept for signature parity; layout makes it moot

    @nn.compact
    def __call__(self, x, cond=None):
        dim_inner = int(self.dim * self.mult * 2 / 3)

        if exists(self.dim_cond):
            x = AdaptiveRMSNorm(self.dim, dim_cond=self.dim_cond, name='norm')(x, cond)
        else:
            x = RMSNorm(self.dim, name='norm')(x)

        x = Linear(dim_inner * 2, name='proj_in')(x)
        x = GEGLU()(x)
        return Linear(self.dim, name='proj_out')(x)


class TokenShift(nn.Module):
    """Temporal token shift: second half of channels shifted +1 frame
    (reference magvit2_pytorch.py:244-254; pad (1,-1) on the time axis).

    Operates on ``(B, T, H, W, C)``; inner fn applied to the concat.
    """

    fn: nn.Module

    @nn.compact
    def __call__(self, x, streaming: bool = False, **kwargs):
        x_main, x_shift = jnp.split(x, 2, axis=-1)
        if streaming:
            cache = self.variable(
                'cache', 'shift_state',
                lambda: jnp.zeros((x.shape[0], 1, *x.shape[2:-1],
                                   x_shift.shape[-1]), x.dtype))
            shifted = jnp.concatenate(
                [cache.value.astype(x.dtype), x_shift], axis=1)
            cache.value = x_shift[:, -1:]
            x_shift = shifted[:, :-1]
        else:
            x_shift = jnp.pad(
                x_shift, [(0, 0), (1, 0)] + [(0, 0)] * (x.ndim - 2))[:, :-1]
        x = jnp.concatenate((x_main, x_shift), axis=-1)
        if streaming:
            kwargs = {**kwargs, 'streaming': True}
        return self.fn(x, **_filter_kwargs(self.fn, kwargs))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _se_context(x, attn, spatial_rank):
    """f32-accumulated attention-weighted spatial mean with a compute-dtype
    backward. The plain einsum with ``preferred_element_type=f32`` makes XLA
    emit the ``dx`` cotangent — a FULL activation-sized tensor — in f32: the
    training-step OOM dump showed ~11 such 178MB buffers live at once. The
    f32 accumulation only matters for the (tiny) context output; ``dx`` is
    mathematically ``attn ⊗ g`` and is exact in the compute dtype."""
    eq = {2: '...hwc,...hw->...c', 3: '...hwpc,...hwp->...c'}[spatial_rank]
    return jnp.einsum(eq, x, attn, preferred_element_type=jnp.float32)


def _se_context_fwd(x, attn, spatial_rank):
    return _se_context(x, attn, spatial_rank), (x, attn)


def _se_context_bwd(spatial_rank, res, g):
    x, attn = res
    gx = g.astype(x.dtype)
    gb = gx
    for _ in range(spatial_rank):
        gb = gb[..., None, :]                     # (..., 1, ..., 1, c)
    dx = (attn[..., None] * gb).astype(x.dtype)   # compute dtype, not f32
    eq_t = {2: '...hwc,...c->...hw', 3: '...hwpc,...c->...hwp'}[spatial_rank]
    dattn = jnp.einsum(eq_t, x, gx,
                       preferred_element_type=jnp.float32).astype(attn.dtype)
    return dx, dattn


_se_context.defvjp(_se_context_fwd, _se_context_bwd)


class SqueezeExcite(nn.Module):
    """Global-context attention-style squeeze-excite (GCNet, arXiv 2012.13375;
    reference magvit2_pytorch.py:194-240).

    Context = softmax(1x1-conv logits over h*w) - weighted spatial mean, gated
    through a sigmoid MLP whose last bias inits at -10 so the block starts near
    identity*sigmoid(-10)*x ~= 0 residual contribution.
    Input ``(B, T, H, W, C)`` video or ``(B, H, W, C)`` image; context is
    per-frame (the reference folds frames into batch).
    """

    dim: int
    dim_out: Optional[int] = None
    dim_hidden_min: int = 16
    init_bias: float = -10.0

    @nn.compact
    def _params(self, c_in: int):
        """All params of the block, without compute (see Linear._params):
        ``(to_k_k, to_k_b), (gate_in_k, gate_in_b), (gate_out_k, gate_out_b)``.
        Child construction mirrors ``__call__`` exactly so the param tree is
        identical whichever entry point runs."""
        dim_out = default(self.dim_out, self.dim)
        dim_hidden = max(self.dim_hidden_min, dim_out // 2)
        to_k = Linear(1, name='to_k')._params(c_in)
        gate_in = Linear(dim_hidden, name='gate_in')._params(c_in)
        gate_out = Linear(
            dim_out,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.constant(self.init_bias),
            name='gate_out')._params(dim_hidden)
        return to_k, gate_in, gate_out

    def __call__(self, x, w_blocked: bool = False):
        c_in = x.shape[-1] // 2 if w_blocked else x.shape[-1]
        to_k, gate_in, gate_out = self._params(c_in)

        if w_blocked:
            # lane packing (ops/conv.py): x is (..., h, w/2, 2c) with channel
            # order (phase, c). Splitting the minor dim (..., 2, c) is free
            # (c stays minor); softmax then runs jointly over (h, w/2, phase)
            # == the original (h, w) positions, and the context contraction
            # sums over the same set — numerics match the unblocked path.
            assert default(self.dim_out, self.dim) == self.dim, (
                'blocked SE requires dim_out == dim')
            c = x.shape[-1] // 2
            xv = x.reshape(*x.shape[:-1], 2, c)
            k = _linear_apply(xv, *to_k).astype(jnp.float32)[..., 0]
            sp_axes = (-3, -2, -1)  # (h, w/2, phase)
            k = k - jnp.max(k, axis=sp_axes, keepdims=True)
            attn = jnp.exp(k)
            attn = attn / jnp.sum(attn, axis=sp_axes, keepdims=True)
            context = _se_context(xv, attn.astype(x.dtype), 3)
            context = context[..., None, None, :].astype(x.dtype)

            g = leaky_relu(_linear_apply(context, *gate_in))
            gates = jax.nn.sigmoid(_linear_apply(g, *gate_out))
            return jnp.concatenate([gates, gates], axis=-1) * x

        sp_axes = (-3, -2)  # (h, w); per-frame context for video

        # attention logits over space: 1x1 conv -> softmax over (h, w),
        # computed IN the conv layout with keepdims reductions — flattening to
        # (bt, hw, c) forced whole-tensor relayouts at the largest feature
        # maps (~10% of roundtrip time on v5e)
        k = _linear_apply(x, *to_k).astype(jnp.float32)   # (..., h, w, 1)
        k = k - jnp.max(k, axis=sp_axes, keepdims=True)
        attn = jnp.exp(k)
        attn = attn / jnp.sum(attn, axis=sp_axes, keepdims=True)
        # weighted spatial mean as an einsum contraction (f32 accumulate): the
        # previous `x.astype(f32) * attn` materialized the FULL activation in
        # f32 — at the 128px stage that one temp (plus its backward cotangent)
        # was the largest allocation in the training step's OOM dump
        context = _se_context(x, attn[..., 0].astype(x.dtype), 2)
        context = context[..., None, None, :].astype(x.dtype)  # (...,1,1,c)

        g = leaky_relu(_linear_apply(context, *gate_in))
        gates = jax.nn.sigmoid(_linear_apply(g, *gate_out))  # (..., 1, 1, c)

        return gates * x


class Residual(nn.Module):
    """y = fn(x) + x (reference magvit2_pytorch.py:167-174)."""

    fn: nn.Module

    @nn.compact
    def __call__(self, x, **kwargs):
        kwargs = _filter_kwargs(self.fn, kwargs)
        return self.fn(x, **kwargs) + x


class Sequential(nn.Module):
    """Exists-filtering sequential that forwards supported kwargs
    (reference Sequential, magvit2_pytorch.py:159-165)."""

    fns: Sequence[nn.Module]

    @nn.compact
    def __call__(self, x, **kwargs):
        for fn in self.fns:
            x = fn(x, **_filter_kwargs(fn, kwargs))
        return x


def _accepts_kwargs(mod, kwargs) -> bool:
    import inspect
    try:
        sig = inspect.signature(type(mod).__call__)
    except (TypeError, ValueError):
        return False
    params = sig.parameters
    if any(p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()):
        return True
    return all(k in params for k in kwargs)


def _filter_kwargs(mod, kwargs) -> dict:
    """Keep only the kwargs ``mod.__call__`` accepts — per key, so e.g. a
    cond-layer without a streaming path still receives ``cond``."""
    import inspect
    try:
        sig = inspect.signature(type(mod).__call__)
    except (TypeError, ValueError):
        return {}
    params = sig.parameters
    if any(p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()):
        return dict(kwargs)
    return {k: v for k, v in kwargs.items() if k in params}
