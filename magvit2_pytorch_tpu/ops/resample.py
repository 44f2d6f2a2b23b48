"""Space/time down- and up-sampling + residual units.

Rebuild of reference magvit2_pytorch.py:757-883 (strided-conv downsamplers,
depth-to-space upsamplers) and :930-988 (ResidualUnit / ResidualUnitMod),
TPU-native:

- The reference loops per-frame 2D / per-pixel 1D convs via einops reshapes; we
  express each as ONE 3D ``conv_general_dilated`` with a (1,k,k) or (k,1,1)
  kernel — a single fused XLA op that tiles onto the MXU.
- Depth-to-space/-time upsampling keeps the reference's channel ordering
  ``(c, p1, p2)`` and its replicate-N kaiming init (magvit2_pytorch.py:829-836,
  866-872), which makes the upsampler start as nearest-neighbor — an off-by-one
  in this ordering silently breaks checkpoint-conversion parity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from magvit2_pytorch_tpu.ops.basic import Linear, Residual, SqueezeExcite, elu
from magvit2_pytorch_tpu.ops.conv import (
    DN_3D,
    CausalConv3d,
    Conv3DMod,
    Conv3d1x1,
    _w_block_kernel_in_down2,
    blur,
)
from magvit2_pytorch_tpu.utils.helpers import cast_tuple, default
from magvit2_pytorch_tpu.utils.init import (
    kaiming_uniform_init,
    torch_bias_init,
    torch_kernel_init,
)


class SpatialDownsample2x(nn.Module):
    """Optional blur -> stride-2 spatial conv (reference
    magvit2_pytorch.py:757-780). One 3D conv with a (1,k,k) kernel."""

    dim: int
    dim_out: Optional[int] = None
    kernel_size: int = 3
    antialias: bool = False

    @nn.compact
    def __call__(self, x, w_blocked_in: bool = False):
        dim_out = default(self.dim_out, self.dim)
        k = self.kernel_size
        if self.antialias:
            assert not w_blocked_in, 'lane packing does not support antialias'
            x = blur(x, space_only=True)

        c_in = x.shape[-1] // 2 if w_blocked_in else x.shape[-1]
        kernel = self.param('kernel', torch_kernel_init, (1, k, k, c_in, dim_out))
        bias = self.param('bias', torch_bias_init(k * k * c_in), (dim_out,))
        kernel = kernel.astype(x.dtype)

        if w_blocked_in:
            # lane packing (ops/conv.py): consume the w-blocked stage output
            # directly — the stride-2 conv emits one (unblocked) output per
            # input block, so this layer is where the stage's blocked layout
            # naturally ends
            kernel, (wplo, wphi) = _w_block_kernel_in_down2(kernel)
            strides, wp = (1, 2, 1), (wplo, wphi)
        else:
            strides, wp = (1, 2, 2), (k // 2, k // 2)

        from magvit2_pytorch_tpu.ops.conv import (
            _quantize_per_channel_out, _quantize_per_tensor,
            int8_conv_enabled)
        if int8_conv_enabled(c_in, dim_out):
            if (not self.is_initializing()
                    and self.is_mutable_collection('int8_calib')):
                calib = self.variable('int8_calib', 'absmax',
                                      lambda: jnp.zeros((), jnp.float32))
                calib.value = jnp.maximum(
                    calib.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
            if self.has_variable('int8', 'act_scale'):
                xs = self.get_variable('int8', 'act_scale')
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                              -127, 127).astype(jnp.int8)
            else:
                xq, xs = _quantize_per_tensor(x)
            if (self.has_variable('int8', 'kernel_q') and
                    self.get_variable('int8', 'kernel_q').shape == kernel.shape):
                kq = self.get_variable('int8', 'kernel_q')
                ks = self.get_variable('int8', 'kernel_scale')
            else:
                kq, ks = _quantize_per_channel_out(kernel)
            acc = jax.lax.conv_general_dilated(
                xq, kq,
                window_strides=strides,
                padding=[(0, 0), (k // 2, k // 2), wp],
                dimension_numbers=DN_3D,
                preferred_element_type=jnp.int32,
            )
            out = (acc.astype(jnp.float32) * (xs * ks)).astype(x.dtype)
        else:
            out = jax.lax.conv_general_dilated(
                x, kernel,
                window_strides=strides,
                padding=[(0, 0), (k // 2, k // 2), wp],
                dimension_numbers=DN_3D,
            )
        return out + bias.astype(x.dtype)


class TimeDownsample2x(nn.Module):
    """Optional blur -> causal-pad (k-1,0) -> stride-2 temporal conv
    (reference magvit2_pytorch.py:782-807). One 3D conv with a (k,1,1) kernel."""

    dim: int
    dim_out: Optional[int] = None
    kernel_size: int = 3
    antialias: bool = False

    @nn.compact
    def __call__(self, x, streaming: bool = False):
        dim_out = default(self.dim_out, self.dim)
        k = self.kernel_size
        if self.antialias:
            assert not streaming, (
                'time-blur peeks one frame ahead (replicate pad both sides) — '
                'not streamable')
            x = blur(x, time_only=True)

        c_in = x.shape[-1]
        kernel = self.param('kernel', torch_kernel_init, (k, 1, 1, c_in, dim_out))
        bias = self.param('bias', torch_bias_init(k * c_in), (dim_out,))

        if streaming:
            b, _, h, w, _ = x.shape
            cache = self.variable(
                'cache', 'time_state',
                lambda: jnp.zeros((b, k - 1, h, w, c_in), x.dtype))
            x = jnp.concatenate([cache.value.astype(x.dtype), x], axis=1)
            cache.value = x[:, -(k - 1):]
            padding = [(0, 0), (0, 0), (0, 0)]
        else:
            padding = [(k - 1, 0), (0, 0), (0, 0)]

        out = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=(2, 1, 1),
            padding=padding,
            dimension_numbers=DN_3D,
        )
        return out + bias.astype(x.dtype)


def _replicated_kaiming_init(dim_out: int, replicate: int):
    """Kaiming-uniform base kernel replicated ``replicate``x along the output
    channel axis (reference init_conv_, magvit2_pytorch.py:829-836): output
    channel ``c*replicate + r`` shares the base weight of channel ``c``, so the
    depth-to-space starts as a nearest-neighbor upsampler."""

    def init(key, shape, dtype=jnp.float32):
        c_in, total_out = shape
        assert total_out == dim_out * replicate
        base = kaiming_uniform_init(key, (c_in, dim_out), dtype)
        return jnp.repeat(base, replicate, axis=-1)

    return init


class SpatialUpsample2x(nn.Module):
    """1x1 conv dim -> 4*dim_out, SiLU, depth-to-space p1=p2=2 (reference
    magvit2_pytorch.py:811-846).

    The parameter keeps the reference's ``(c, p1, p2)`` output-channel
    ordering (checkpoint-convertible), but compute permutes the kernel columns
    to ``(p1, p2, c)`` — a free matmul-column shuffle — so the depth-to-space
    transpose keeps the channel axis minor. The naive ordering cost ~6% of
    the whole roundtrip in lane-crossing layout copies on v5e."""

    dim: int
    dim_out: Optional[int] = None

    @nn.compact
    def __call__(self, x, w_blocked_out: bool = False):
        dim_out = default(self.dim_out, self.dim)
        c_in = x.shape[-1]

        kernel = self.param('kernel', _replicated_kaiming_init(dim_out, 4),
                            (c_in, dim_out * 4))
        bias = self.param('bias', nn.initializers.zeros, (dim_out * 4,))

        if w_blocked_out:
            # lane packing (ops/conv.py): the upsample ALREADY computes the
            # w-phase as channels — emitting the blocked layout just skips
            # the w-interleave: transpose-conv over h only, channels (p2, c)
            kr = kernel.reshape(c_in, dim_out, 2, 2)     # (cin, c, p1, p2)
            kt = kr.transpose(2, 0, 3, 1).reshape(2, c_in, 2 * dim_out)
            kt = kt[None, :, None].astype(x.dtype)       # (1,2,1,cin,2c)
            out = jax.lax.conv_transpose(
                x, kt, strides=(1, 2, 1), padding='VALID',
                dimension_numbers=DN_3D)
            b2 = bias.reshape(dim_out, 2, 2).transpose(1, 2, 0).reshape(
                2, 2 * dim_out).astype(x.dtype)          # (p1, (p2, c))
            h2 = out.shape[2]
            out = out + jnp.tile(b2, (h2 // 2, 1))[None, None, :, None, :]
            return jax.nn.silu(out)

        # depth-to-space == stride-2 transposed conv with a 2x2 kernel:
        # out[2h+p1, 2w+p2, c] = sum_cin x[h,w,cin] * K[p1,p2,cin,c].
        # XLA lowers this as one MXU conv — no whole-tensor reshape/transpose
        # (the naive depth-to-space shuffle cost ~23% of roundtrip on v5e).
        kt = kernel.reshape(c_in, dim_out, 2, 2).transpose(2, 3, 0, 1)
        kt = kt[None].astype(x.dtype)                    # (1,2,2,cin,cout)

        from magvit2_pytorch_tpu.ops.conv import (
            _quantize_per_channel_out, _quantize_per_tensor,
            int8_conv_enabled)
        if int8_conv_enabled(c_in, dim_out):
            xq, xs = _quantize_per_tensor(x)
            kq, ks = _quantize_per_channel_out(kt)
            acc = jax.lax.conv_transpose(
                xq, kq, strides=(1, 2, 2), padding='VALID',
                dimension_numbers=DN_3D,
                preferred_element_type=jnp.int32)
            out = (acc.astype(jnp.float32) * (xs * ks)).astype(x.dtype)
        else:
            out = jax.lax.conv_transpose(
                x, kt, strides=(1, 2, 2), padding='VALID',
                dimension_numbers=DN_3D)

        # position-dependent bias: slot (p1,p2,c) tiles over the 2x2 grid
        btile = bias.reshape(dim_out, 2, 2).transpose(1, 2, 0).astype(x.dtype)
        h2, w2 = out.shape[2], out.shape[3]
        out = out + jnp.tile(btile, (h2 // 2, w2 // 2, 1))
        return jax.nn.silu(out)


class TimeUpsample2x(nn.Module):
    """1x1 conv dim -> 2*dim_out, SiLU, depth-to-time p=2 (reference
    magvit2_pytorch.py:848-883)."""

    dim: int
    dim_out: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        dim_out = default(self.dim_out, self.dim)
        c_in = x.shape[-1]

        kernel = self.param('kernel', _replicated_kaiming_init(dim_out, 2),
                            (c_in, dim_out * 2))
        bias = self.param('bias', nn.initializers.zeros, (dim_out * 2,))

        # depth-to-time as a stride-2 transposed conv over the time axis
        # (see SpatialUpsample2x): out[2t+p, c] = sum_cin x[t,cin]*K[p,cin,c]
        kt = kernel.reshape(c_in, dim_out, 2).transpose(2, 0, 1)
        kt = kt[:, None, None].astype(x.dtype)           # (2,1,1,cin,cout)

        out = jax.lax.conv_transpose(
            x, kt, strides=(2, 1, 1), padding='VALID',
            dimension_numbers=DN_3D)

        btile = bias.reshape(dim_out, 2).T.astype(x.dtype)  # (2, c)
        t2 = out.shape[1]
        out = out + jnp.tile(btile, (t2 // 2, 1))[None, :, None, None, :]
        return jax.nn.silu(out)


class _ResidualUnitInner(nn.Module):
    dim: int
    kernel_size: object
    pad_mode: str = 'constant'

    def _use_fused(self, x, streaming: bool, w_blocked: bool) -> bool:
        from magvit2_pytorch_tpu.ops.pallas.residual_unit import fused_eligible
        if self.pad_mode not in ('constant', 'zeros'):
            return False    # the ring's zero pad IS the conv pad
        return fused_eligible(x, self.dim, self.kernel_size, streaming,
                              w_blocked)

    def _use_fused_wide(self, x, streaming: bool, w_blocked: bool) -> bool:
        from magvit2_pytorch_tpu.ops.pallas.residual_unit_wide import (
            wide_eligible)
        if w_blocked or self.pad_mode not in ('constant', 'zeros'):
            return False
        return wide_eligible(x, self.dim, self.kernel_size, streaming)

    @nn.compact
    def __call__(self, x, streaming: bool = False, w_blocked: bool = False):
        if self._use_fused_wide(x, streaming, w_blocked):
            # Wide-channel fused Pallas path (residual_unit_wide.py): the
            # C%128==0 stages on the native unpacked layout — one VMEM pass,
            # +x included, no layout boundary. Param tree matches unfused.
            from magvit2_pytorch_tpu.ops.pallas.residual_unit_wide import (
                fused_residual_unit_wide)
            conv_k, conv_b, _, _ = CausalConv3d(
                self.dim, self.kernel_size, pad_mode=self.pad_mode,
                name='conv')._params(self.dim)
            pw_k, pw_b, _ = Conv3d1x1(
                self.dim, name='conv_pointwise')._params(self.dim)
            (tok_k, tok_b), (gi_k, gi_b), (go_k, go_b) = SqueezeExcite(
                self.dim, name='se')._params(self.dim)
            return fused_residual_unit_wide(
                x, conv_k, conv_b, pw_k, pw_b, tok_k, tok_b,
                gi_k, gi_b, go_k, go_b,
                jax.default_backend() != 'tpu')   # interpret off-TPU (tests)
        if self._use_fused(x, streaming, w_blocked):
            # Fused Pallas path (ops/pallas/residual_unit.py): whole unit —
            # INCLUDING the +x residual — in one VMEM pass. Child modules
            # are constructed identically so the param tree matches the
            # unfused path (checkpoints are interchangeable). From the
            # default unpacked layout the packed view is a cheap reshape.
            from magvit2_pytorch_tpu.ops.pallas.residual_unit import (
                fused_residual_unit)
            conv_k, conv_b, _, _ = CausalConv3d(
                self.dim, self.kernel_size, pad_mode=self.pad_mode,
                name='conv')._params(self.dim)
            pw_k, pw_b, _ = Conv3d1x1(
                self.dim, name='conv_pointwise')._params(self.dim)
            (tok_k, tok_b), (gi_k, gi_b), (go_k, go_b) = SqueezeExcite(
                self.dim, name='se')._params(self.dim)
            # unpacked input engages the kernel's packed_io=False mode: the
            # pack to pair layout happens in VMEM (r4) — the XLA boundary
            # relayout that made unpacked engagement a net loss is gone
            return fused_residual_unit(
                x, conv_k, conv_b, pw_k, pw_b, tok_k, tok_b,
                gi_k, gi_b, go_k, go_b,
                jax.default_backend() != 'tpu',   # interpret off-TPU (tests)
                w_blocked)                        # packed_io
        x = CausalConv3d(self.dim, self.kernel_size, pad_mode=self.pad_mode,
                         name='conv')(x, streaming=streaming,
                                      w_blocked_in=w_blocked,
                                      w_blocked_out=w_blocked)
        x = elu(x)
        x = Conv3d1x1(self.dim, name='conv_pointwise')(x, w_blocked=w_blocked)
        x = elu(x)
        return SqueezeExcite(self.dim, name='se')(x, w_blocked=w_blocked)


class _ResidualUnitOuter(nn.Module):
    """`Residual` twin for ResidualUnit that knows the fused Pallas kernel
    already applied the +x inside VMEM (saves one HBM round-trip of the
    largest activation). Param scope matches `Residual` (child named 'fn')."""

    fn: _ResidualUnitInner

    @nn.compact
    def __call__(self, x, streaming: bool = False, w_blocked: bool = False):
        out = self.fn(x, streaming=streaming, w_blocked=w_blocked)
        if (self.fn._use_fused_wide(x, streaming, w_blocked)
                or self.fn._use_fused(x, streaming, w_blocked)):
            return out
        return out + x


def ResidualUnit(dim, kernel_size, pad_mode: str = 'constant', name=None):
    """Residual( CausalConv3d -> ELU -> 1x1x1 conv -> ELU -> SqueezeExcite )
    (reference magvit2_pytorch.py:930-944)."""
    return _ResidualUnitOuter(_ResidualUnitInner(dim, kernel_size, pad_mode),
                              name=name)


class ResidualUnitMod(nn.Module):
    """Conditioned residual unit with StyleGAN2-modulated conv (reference
    magvit2_pytorch.py:946-988)."""

    dim: int
    kernel_size: object
    dim_cond: int
    pad_mode: str = 'constant'
    demod: bool = True

    @nn.compact
    def __call__(self, x, cond, streaming: bool = False):
        kt, kh, kw = cast_tuple(self.kernel_size, 3)
        assert kh == kw

        res = x
        c = Linear(self.dim, name='to_cond')(cond)
        x = Conv3DMod(
            dim=self.dim, spatial_kernel=kh, time_kernel=kt, causal=True,
            demod=self.demod, pad_mode=self.pad_mode, name='conv',
        )(x, c, streaming=streaming)
        x = elu(x)
        x = Conv3d1x1(self.dim, name='conv_out')(x)
        x = elu(x)
        return x + res
