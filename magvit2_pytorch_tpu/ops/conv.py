"""Causal 3D convolutions and friends, TPU-native.

Rebuild of the conv layer family of the reference
(/root/reference/magvit2_pytorch/magvit2_pytorch.py:680-1024) designed for XLA
on TPU:

- channels-LAST layouts everywhere: video ``(B, T, H, W, C)``, images
  ``(B, H, W, C)`` — the native TPU conv layout; the reference's channel-first
  einops reshuffling disappears.
- time-causal padding is folded straight into ``lax.conv_general_dilated``'s
  explicit padding ``[(k_t-1, 0), (p, p), (p, p)]`` — one fused XLA conv op, no
  separate pad (reference pads then convs, magvit2_pytorch.py:924-928).
- strides/dilations apply to the time axis only, mirroring the reference
  (magvit2_pytorch.py:920-921).

Reference semantics preserved:
- ``CausalConv3d`` front-pads time by ``dilation*(k_t-1) + (1-stride)`` and
  falls back to zero padding when the clip is shorter than the pad
  (magvit2_pytorch.py:913,925).
- ``CausalConvTranspose3d`` time-strided transpose conv sliced to
  ``t*time_stride`` output frames (magvit2_pytorch.py:990-1024).
- ``Conv3DMod``: StyleGAN2 weight (de)modulation, implemented with a batched
  einsum-style vmap instead of torch's ``groups=b`` grouped-conv trick
  (magvit2_pytorch.py:746-753).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from magvit2_pytorch_tpu.utils.helpers import cast_tuple, default, is_odd
from magvit2_pytorch_tpu.utils.init import (
    kaiming_normal_selu_init,
    torch_bias_init,
    torch_kernel_init,
)

# XLA dimension numbers for channels-last video / image convs
DN_3D = ('NDHWC', 'DHWIO', 'NDHWC')
DN_2D = ('NHWC', 'HWIO', 'NHWC')
DN_1D = ('NWC', 'WIO', 'NWC')

_TORCH_TO_JAX_PAD_MODE = {
    'constant': 'constant',
    'zeros': 'constant',
    'reflect': 'reflect',
    'replicate': 'edge',
    'circular': 'wrap',
}


def _maybe_explicit_pad(x, pads, pad_mode: str):
    """Pad with a non-constant mode ahead of a VALID conv. ``pads`` is a list of
    (lo, hi) per spatial dim of x (time/height/width for video)."""
    mode = _TORCH_TO_JAX_PAD_MODE[pad_mode]
    full = [(0, 0)] + list(pads) + [(0, 0)]
    return jnp.pad(x, full, mode=mode)


# -- int8 inference path ------------------------------------------------------
#
# v5e's MXU runs int8 at 394 TOPS — 2x the 197 bf16 TFLOPS that cap the
# flagship roundtrip at ~2055 fps (tools/flop_audit.py). The env gate
# MAGVIT2_TPU_INT8_CONV=1 switches every CausalConv3d to dynamic int8:
# per-tensor activation scale (absmax/127, computed on the fly), per-output-
# channel weight scale, s8 x s8 -> s32 conv, dequantized back to the compute
# dtype before bias/nonlinearity. Inference-only (the straight-through
# quantization here is NOT a QAT path); recon deviates from bf16 by the
# quantization noise — measured in tools/int8_bench.py, not silently
# substituted into the headline bench.


def int8_conv_enabled(c_in: int = 128, c_out: int = 128) -> bool:
    """Gate: int8 engages only where the MXU actually runs int8 fast.
    Measured on v5e (tools/int8_probe.py): s8xs8->s32 conv is 1.85x bf16 at
    C>=128 but 0.96x (a slight LOSS) at C=64 — the sub-128-lane stage gains
    nothing from int8, so it stays bf16 and keeps full fidelity."""
    import os
    return (os.environ.get('MAGVIT2_TPU_INT8_CONV', '') == '1'
            and min(c_in, c_out) >= 128)


def _quantize_per_tensor(x):
    """x -> (int8 x, f32 scale). Symmetric absmax; scale guards against
    all-zero tensors."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127,
                  127).astype(jnp.int8)
    return xq, scale


def _quantize_per_channel_out(kernel):
    """kernel (..., F) -> (int8 kernel, f32 (F,) scales) over the output-
    channel (minor) axis."""
    k32 = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(k32), axis=tuple(range(kernel.ndim - 1)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    kq = jnp.clip(jnp.round(k32 / scale), -127, 127).astype(jnp.int8)
    return kq, scale


# -- lane packing (w-blocked layout) ------------------------------------------
#
# TPU vector lanes are 128 wide and the MXU is 128x128; a stage with C < 128
# (the flagship's 64-channel 128px stage) pads every activation's minor dim to
# 128 — HALF the lanes (and HBM bytes) are dead on every op. Lane packing
# folds the width axis's parity phase into channels, ``(B,T,H,W,C) ->
# (B,T,H,W/2,2C)``, so the stage runs with a full-width minor dim: measured on
# v5e, the 3^3 conv goes 9.4 -> 7.1 ms and elementwise ops 1.8 -> 0.8 ms at
# (8,17,128,128,64). The layout persists across the whole stage (a one-off
# re-tiling shuffle costs ~1.8 ms, so per-op blocking would lose); convs
# consume/produce the blocked layout directly via compile-time kernel
# rearrangements below — parameters stay in the reference's unblocked layout,
# so checkpoints are unaffected.


def w_block(x):
    """(..., W, C) -> (..., W/2, 2C), channel order (phase, c). Free reshape
    in logical terms (C stays minor)."""
    *lead, w, c = x.shape
    return x.reshape(*lead, w // 2, 2 * c)


def w_unblock(x):
    """(..., W/2, 2C) -> (..., W, C)."""
    *lead, w2, c2 = x.shape
    return x.reshape(*lead, w2 * 2, c2 // 2)


def _w_block_kernel_dense(kernel):
    """Rearrange ``(kt, kh, kw, ci, f)`` into the dense w-blocked kernel
    ``(kt, kh, ku, 2ci, 2f)`` computing the SAME stride-1 conv on a w-blocked
    tensor. Output phase ``p`` at block ``u`` needs original tap
    ``w = 2u + p + dw``; entries outside any (p, dw) pair are structural
    zeros (they multiply to exact 0, so numerics match the direct conv up to
    reduction-order). Returns (blocked_kernel, (w2_pad_lo, w2_pad_hi))."""
    kt, kh, kw, ci, f = kernel.shape
    r = kw // 2
    lo = -((r + 1) // 2)
    hi = (1 + r) // 2
    ku = hi - lo + 1
    wb = jnp.zeros((kt, kh, ku, 2 * ci, 2 * f), kernel.dtype)
    for p in range(2):
        for dw in range(-r, r + 1):
            pos = p + dw
            du, pin = pos // 2, pos % 2
            wb = wb.at[:, :, du - lo, pin * ci:(pin + 1) * ci,
                       p * f:(p + 1) * f].set(kernel[:, :, dw + r])
    return wb, (-lo, hi)


def _w_block_kernel_in_down2(kernel):
    """Rearrange ``(kt, kh, kw, ci, f)`` into the blocked-INPUT kernel for a
    stride-2-in-w conv: consumes the w-blocked layout at w2 stride 1 and
    produces the UNBLOCKED downsampled output (one output per input block).
    Returns (kernel ``(kt, kh, ku, 2ci, f)``, (w2_pad_lo, w2_pad_hi))."""
    kt, kh, kw, ci, f = kernel.shape
    r = kw // 2
    lo, hi = (-r) // 2, r // 2
    ku = hi - lo + 1
    wb = jnp.zeros((kt, kh, ku, 2 * ci, f), kernel.dtype)
    for dw in range(-r, r + 1):
        du, pin = dw // 2, dw % 2
        wb = wb.at[:, :, du - lo, pin * ci:(pin + 1) * ci, :].set(
            kernel[:, :, dw + r])
    return wb, (-lo, hi)


# -- MXU-occupancy conv lowerings (r4) ----------------------------------------
#
# tools/stem_bench.py + tools/int8_probe.py measured the flagship's three
# slowest convs as pure lowering problems, not FLOP problems:
#   conv_out (3^3, 64->3):       12.25 ms @  1% of peak  (3-lane output)
#   interior 3^3 c64 convs:       7.70 ms @ 32% of peak  (64-lane contraction)
#   c128 convs for comparison:            @ 85% of peak
# Both fixes below re-express the conv as a c>=96-wide MXU conv in plain XLA
# (no Pallas, no persistent layout change, structural zeros in the kernel):
#
# * w-pair im2col: x2[w] = concat(x[w], x[w+1]) (one XLA concat), kernel
#   (kt, kh, 2, 2C, F) — 1.33x logical FLOPs at full-contraction efficiency.
# * output space-to-depth: a G-strided conv emitting G positions x F channels
#   per step ((kt, kh, G+kw-1, C, G*F) kernel), so a 3-channel head becomes a
#   96-lane output; (G+2)/3 x logical FLOPs of a tiny total.
#
# Gated to TPU (MAGVIT2_TPU_NO_CONV_TRICKS=1 kills; _FORCE_CONV_TRICKS=1
# engages off-TPU for tests) — they permute reduction order, and the CPU
# test suite asserts bit-exact streaming-vs-whole-clip equality.


def _conv_tricks_enabled() -> bool:
    import os
    if os.environ.get('MAGVIT2_TPU_NO_CONV_TRICKS', '') == '1':
        return False
    if os.environ.get('MAGVIT2_TPU_FORCE_CONV_TRICKS', '') == '1':
        return True
    return jax.default_backend() == 'tpu'


def _wpair_kernel(kernel):
    """(kt, kh, 3, C, F) -> (kt, kh, 2, 2C, F) kernel over the w-paired
    input x2[w] = [x[w], x[w+1]]: tap k2=0 reads x2[w-1], k2=1 reads x2[w].
    1/4 structural zeros -> 1.33x logical FLOPs."""
    kt, kh, kw, c, f = kernel.shape
    assert kw == 3
    k2 = jnp.zeros((kt, kh, 2, 2 * c, f), kernel.dtype)
    k2 = k2.at[:, :, 0, :c].set(kernel[:, :, 0])    # x[w-1]
    k2 = k2.at[:, :, 1, :c].set(kernel[:, :, 1])    # x[w]
    k2 = k2.at[:, :, 1, c:].set(kernel[:, :, 2])    # x[w+1]
    return k2


def _w_pair(x):
    """(B, T, H, W, C) -> (B, T, H, W, 2C): channel-concat of x and its
    left-shifted (w+1) copy, zero at the right edge."""
    x_sh = jnp.concatenate(
        [x[:, :, :, 1:], jnp.zeros_like(x[:, :, :, :1])], axis=3)
    return jnp.concatenate([x, x_sh], axis=-1)


def _cout_block_kernel(kernel, G: int):
    """(kt, kh, kw, C, F) -> (kt, kh, G+kw-1, C, G*F): a G-strided conv
    whose output channel j*F+c is original output (w = G*u + j, channel c).
    Structural zeros outside 0 <= k - j <= kw-1."""
    kt, kh, kw, c, f = kernel.shape
    kb = jnp.zeros((kt, kh, G + kw - 1, c, G * f), kernel.dtype)
    for j in range(G):
        kb = jax.lax.dynamic_update_slice(
            kb, kernel, (0, 0, j, 0, j * f))
    return kb


def _cout_block_kernel_bin(kernel, G: int):
    """Blocked-INPUT variant of ``_cout_block_kernel``: consumes the
    w-blocked layout ``(..., W/2, 2C)`` with a stride-G/2 conv over blocks
    and emits G positions x F channels per step — output channel ``j*F + c``
    is original output ``(w = G*u + j, channel c)``, UNPACKED after the
    trailing reshape. Original input tap ``w_in = G*u + j + k - kw//2`` lives
    at block tap ``du = (j+k-r)//2``, phase ``q = (j+k-r)%2``. Returns
    (kernel ``(kt, kh, ku, 2C, G*F)``, (w2_pad_lo, w2_pad_hi))."""
    kt, kh, kw, c, f = kernel.shape
    r = kw // 2
    g2 = G // 2
    lo = (0 - r) // 2
    hi = (G - 1 + kw - 1 - r) // 2
    ku = hi - lo + 1
    kb = jnp.zeros((kt, kh, ku, 2 * c, G * f), kernel.dtype)
    for j in range(G):
        for k in range(kw):
            pos = j + k - r
            du, q = pos // 2, pos % 2
            kb = kb.at[:, :, du - lo, q * c:(q + 1) * c,
                       j * f:(j + 1) * f].set(kernel[:, :, k])
    return kb, (-lo, hi - (g2 - 1))


def _w_block_kernel_out(kernel):
    """Rearrange ``(kt, kh, kw, ci, f)`` into the blocked-OUTPUT kernel
    ``(kt, kh, kw+1, ci, 2f)``: a stride-2-in-w conv over the UNBLOCKED input
    producing the w-blocked output (both phases as channels, so the output's
    minor dim is 2f instead of f). Returns (kernel, (w_pad_lo, w_pad_hi))."""
    kt, kh, kw, ci, f = kernel.shape
    r = kw // 2
    wb = jnp.zeros((kt, kh, kw + 1, ci, 2 * f), kernel.dtype)
    for p in range(2):
        wb = wb.at[:, :, p:p + kw, :, p * f:(p + 1) * f].set(kernel)
    return wb, (r, r + 1)


class CausalConv3d(nn.Module):
    """Time-causal 3D conv on ``(B, T, H, W, C)``.

    Parity target: reference ``CausalConv3d`` (magvit2_pytorch.py:892-928).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int, int]]
    stride: int = 1              # time axis only
    dilation: int = 1            # time axis only
    pad_mode: str = 'constant'
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def _params(self, c_in: int, cache_init=None, int8_calib: bool = False):
        """Params (and, when ``cache_init`` is given, the streaming cache
        variable) without compute — single compact method; ``__call__`` is
        plain. Lets the fused residual-unit kernel pull this conv's params
        directly (ops/pallas/residual_unit.py). ``int8_calib`` additionally
        creates the int8-calibration absmax recorder (see
        VideoTokenizer.calibrate_int8)."""
        kt, kh, kw = cast_tuple(self.kernel_size, 3)
        kernel = self.param(
            'kernel', torch_kernel_init, (kt, kh, kw, c_in, self.features))
        bias = self.param(
            'bias', torch_bias_init(kt * kh * kw * c_in), (self.features,)
        ) if self.use_bias else None
        cache = (self.variable('cache', 'time_state', cache_init)
                 if cache_init is not None else None)
        calib = (self.variable('int8_calib', 'absmax',
                               lambda: jnp.zeros((), jnp.float32))
                 if int8_calib else None)
        return kernel, bias, cache, calib

    def _mxu_lowering(self, x, kernel, bias, time_pad, hp):
        """MXU-occupancy lowerings (module comment above _conv_tricks_enabled):
        returns the conv output, or None when neither scheme applies. bf16
        only — these paths skip the int8 gate (their lane widths are already
        the thing being fixed)."""
        import os

        kt, kh, kw, c_in, f = kernel.shape
        W = x.shape[3]
        dtype = x.dtype
        tstrides = (self.stride, 1)
        tdil = (self.dilation, 1, 1)
        base_pad = [(time_pad, 0), (hp, hp)]

        G = 0
        if f < 8 and c_in >= 8:
            # tiny head (conv_out): output space-to-depth — emit G positions
            # x f channels per G-strided step (12.25 -> ~3.5 ms measured at
            # the flagship shape, tools/stem_bench.py)
            G = next((g for g in (32, 16, 8)
                      if W % g == 0 and g * f <= 128), 0)
        elif (64 <= f < 128 and W % 2 == 0
              and os.environ.get('MAGVIT2_TPU_WPAIR_OUT') == '1'):
            # sub-128-lane interior conv (the flagship's c64 stage, 32% of
            # peak direct): output-PAIR lowering — emit both w-phases as 2f
            # output channels from a w-stride-2 conv. 4/3 logical FLOPs
            # (2 of 8 kernel w-slots are structural zeros), full-width
            # output, NO input relayout — faster STANDALONE
            # (tools/s2d_probe.py), but e2e the (W/2,2f)->(W,f) un-block
            # reshape is a full-activation copy per c64 conv: batch 128
            # OOMs and the stepped-down batch-96 run lands at 1325 fps vs
            # 1532 unpaired (measured r4). OPT-IN only.
            G = 2
        if G:
            kb = _cout_block_kernel(kernel, G)
            out = jax.lax.conv_general_dilated(
                x, kb, window_strides=tstrides + (G,),
                padding=base_pad + [(kw // 2, kw // 2)],
                rhs_dilation=tdil, dimension_numbers=DN_3D)
            out = out.reshape(*out.shape[:3], W, f)
            if bias is not None:
                out = out + bias.astype(dtype)
            return out

        # NOTE: a w-pair im2col variant for the 64-ch interior convs
        # (full-width contraction, 1.33x logical FLOPs) measured SLOWER than
        # the direct conv on v5e — 10.6 vs 7.5 ms (tools/wpair_probe.py): the
        # 64-wide OUTPUT, not just the contraction, caps XLA's c64 conv, and
        # pairing only fixes the input side. Removed; kept in the probe tool
        # as the negative result.
        return None

    def __call__(self, x, streaming: bool = False,
                 w_blocked_in: bool = False, w_blocked_out: bool = False):
        """``streaming=True`` carries the causal time history in a flax
        'cache' variable (apply with ``mutable=['cache']``): chunked calls
        produce bit-identical outputs to one whole-clip call — the carried
        conv state of SURVEY.md §5.7's long-video streaming design.

        ``w_blocked_in`` / ``w_blocked_out``: lane-packing layout flags (see
        module-level note). Blocked-in expects ``x`` as ``(B,T,H,W/2,2C)``;
        blocked-out emits that layout. Param layout is unchanged — the kernel
        is rearranged at trace time."""
        kt, kh, kw = cast_tuple(self.kernel_size, 3)
        assert is_odd(kh) and is_odd(kw)
        if w_blocked_in or w_blocked_out:
            assert self.pad_mode in ('constant', 'zeros'), (
                'lane packing supports zero w-padding only')

        time_pad = self.dilation * (kt - 1) + (1 - self.stride)
        hp, wp = kh // 2, kw // 2

        c_raw = x.shape[-1]
        c_in = c_raw // 2 if w_blocked_in else c_raw

        dtype = default(self.dtype, x.dtype)
        cache_init = None
        if streaming and time_pad > 0:
            b, _, h, w, c_last = x.shape
            cache_init = (lambda: jnp.zeros(
                (b, time_pad, h, w, c_last), dtype))
        int8_ok = (int8_conv_enabled(c_in, self.features) and not streaming
                   and self.pad_mode in ('constant', 'zeros'))
        if (not int8_ok and (w_blocked_in or w_blocked_out) and not streaming
                and self.pad_mode in ('constant', 'zeros')):
            # packed-int8 (opt-in, MAGVIT2_TPU_INT8_PACKED=1): in the
            # w-blocked layout the physical conv contracts 2*c_in -> 2*f, so
            # the measured C>=128 int8 gate (tools/int8_probe.py: 1.85x at
            # C>=128, a LOSS below) applies to the PHYSICAL widths — the
            # flagship's c64 stage becomes int8-eligible only when packed.
            import os
            if os.environ.get('MAGVIT2_TPU_INT8_PACKED') == '1':
                int8_ok = int8_conv_enabled(
                    c_in * (2 if w_blocked_in else 1),
                    self.features * (2 if w_blocked_out else 1))
        calibrating = (int8_ok and not self.is_initializing()
                       and self.is_mutable_collection('int8_calib'))
        kernel, bias, cache, calib = self._params(
            c_in, cache_init=cache_init, int8_calib=calibrating)
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        if calib is not None:
            # calibration pass (VideoTokenizer.calibrate_int8): record the
            # running absmax of this conv's input; padding only adds zeros,
            # so the pre-pad absmax is the post-pad absmax. With
            # MAGVIT2_TPU_INT8_CALIB_PCT set (calibrate_int8(percentile=...))
            # record that |x| percentile instead — outlier activations stop
            # dilating the scale (the few clipped values saturate at +-127,
            # everything else quantizes finer).
            import os
            ax = jnp.abs(x.astype(jnp.float32))
            pct = os.environ.get('MAGVIT2_TPU_INT8_CALIB_PCT')
            stat = jnp.percentile(ax, float(pct)) if pct else jnp.max(ax)
            calib.value = jnp.maximum(calib.value, stat)

        if (not streaming and not w_blocked_in and not w_blocked_out
                and self.pad_mode in ('constant', 'zeros') and kw == 3
                and not (kt > 1 and self.stride == 1 and self.dilation == 1
                         and c_in * kt <= 32)     # tiny-C_in unfold wins there
                and _conv_tricks_enabled()):
            out = self._mxu_lowering(x, kernel, bias, time_pad, hp)
            if out is not None:
                return out

        unblock_after = False
        if w_blocked_in and not w_blocked_out:
            # blocked-in, UNPACKED-out (the packed decode stage's conv_out):
            # first try the G-strided output-space-to-depth head directly on
            # the blocked layout — no XLA unblock relayout, full-lane output
            f = self.features
            W2b = x.shape[3]
            W = W2b * 2
            if (not streaming and kw == 3 and f < 8 and c_in >= 8
                    and _conv_tricks_enabled()):
                G = next((g for g in (32, 16, 8)
                          if W % g == 0 and g * f <= 128
                          and W2b % (g // 2) == 0), 0)
                if G:
                    kb, (plo, phi) = _cout_block_kernel_bin(kernel, G)
                    out = jax.lax.conv_general_dilated(
                        x, kb, window_strides=(self.stride, 1, G // 2),
                        padding=[(time_pad, 0), (hp, hp), (plo, phi)],
                        rhs_dilation=(self.dilation, 1, 1),
                        dimension_numbers=DN_3D)
                    out = out.reshape(*out.shape[:3], W, f)
                    if bias is not None:
                        out = out + bias.astype(dtype)
                    return out
            # generic fallback: dense blocked conv, unblock in-graph
            unblock_after = True
            w_blocked_out = True

        w_strides = (1, 1)
        if w_blocked_in:                     # blocked -> blocked, w stride 1
            kernel, (wplo, wphi) = _w_block_kernel_dense(kernel)
        elif w_blocked_out:                  # unblocked -> blocked, w stride 2
            kernel, (wplo, wphi) = _w_block_kernel_out(kernel)
            w_strides = (1, 2)
        else:
            wplo = wphi = wp
        if bias is not None and (w_blocked_in or w_blocked_out):
            bias = jnp.concatenate([bias, bias])

        unfold_taps = 0     # set by the tiny-C_in unfold branch below

        if streaming and time_pad > 0:
            assert self.pad_mode in ('constant', 'zeros'), (
                'streaming requires zero pad_mode (the zero-initialized cache '
                'IS the causal pad)')
            x = jnp.concatenate([cache.value.astype(dtype), x], axis=1)
            cache.value = x[:, -time_pad:]
            padding = [(0, 0), (hp, hp), (wplo, wphi)]
        elif (not streaming and kt > 1 and self.stride == 1
                and self.dilation == 1 and c_in * kt <= 32):
            # tiny-C_in stem (conv_in: C=3): the MXU contracts over input
            # channels, so a 3-channel conv runs at ~10% utilization. Unfold
            # the kt time taps into channels (kt*C_in contraction) — on the
            # flagship config this cut conv_in from 54 ms to the memory
            # roofline ballpark. The unfolded copy costs kt x the (small)
            # input's bandwidth, repaid many times over in MXU occupancy.
            pad_mode = self.pad_mode if time_pad < x.shape[1] else 'constant'
            x = _maybe_explicit_pad(
                x, [(time_pad, 0), (0, 0), (0, 0)],
                pad_mode if pad_mode != 'zeros' else 'constant')
            # generic over the (possibly w-blocked) kernel's actual dims
            _, k_h, k_w, k_ci, k_f = kernel.shape
            kernel = kernel.transpose(1, 2, 0, 3, 4).reshape(
                1, k_h, k_w, kt * k_ci, k_f)
            padding = [(0, 0), (hp, hp), (wplo, wphi)]
            unfold_taps = kt
        else:
            # reference falls back to zero padding when the clip is shorter
            # than the causal pad (magvit2_pytorch.py:925)
            pad_mode = self.pad_mode if time_pad < x.shape[1] else 'constant'
            if pad_mode in ('constant', 'zeros'):
                padding = [(time_pad, 0), (hp, hp), (wplo, wphi)]
            else:
                x = _maybe_explicit_pad(
                    x, [(time_pad, 0), (hp, hp), (wplo, wphi)], pad_mode)
                padding = [(0, 0)] * 3

        # tiny-C_out head (conv_out: C=3): XLA lowers 3-lane-output convs as a
        # slow kLoop fusion (~30 ms on the flagship roundtrip); zero-padding
        # the output channels to a sublane multiple flips it onto the MXU
        # conv path, then a cheap slice drops the dead lanes
        out_features = kernel.shape[-1]
        out_pad = 0
        if out_features < 8 and kernel.shape[-2] >= 8:
            out_pad = 8 - out_features
            kernel = jnp.pad(
                kernel, [(0, 0)] * (kernel.ndim - 1) + [(0, out_pad)])

        use_int8 = int8_ok

        def do_conv(xi):
            if unfold_taps > 1:
                t_out = xi.shape[1] - (unfold_taps - 1)
                xi = jnp.concatenate(
                    [xi[:, i:i + t_out] for i in range(unfold_taps)], axis=-1)
            if use_int8:
                # static calibrated path (VideoTokenizer.calibrate_int8):
                # the per-call absmax reduce pass disappears and quantize is
                # a pure elementwise op XLA fuses into the producer chain;
                # pre-quantized weights ride along in the same collection
                xq = xs = None
                if self.has_variable('int8', 'act_scale'):
                    xs = self.get_variable('int8', 'act_scale')
                    xq = jnp.clip(
                        jnp.round(xi.astype(jnp.float32) / xs),
                        -127, 127).astype(jnp.int8)
                if xq is None:
                    xq, xs = _quantize_per_tensor(xi)
                kq = ks = None
                if self.has_variable('int8', 'kernel_q'):
                    kq_s = self.get_variable('int8', 'kernel_q')
                    if kq_s.shape == kernel.shape:   # raw-layout kernels only
                        kq = kq_s
                        ks = self.get_variable('int8', 'kernel_scale')
                if kq is None:
                    kq, ks = _quantize_per_channel_out(kernel)
                acc = jax.lax.conv_general_dilated(
                    xq, kq,
                    window_strides=(self.stride, 1, w_strides[1]),
                    padding=padding,
                    rhs_dilation=(self.dilation, 1, 1),
                    dimension_numbers=DN_3D,
                    preferred_element_type=jnp.int32,
                )
                return (acc.astype(jnp.float32) * (xs * ks)).astype(dtype)
            return jax.lax.conv_general_dilated(
                xi, kernel,
                window_strides=(self.stride, 1, w_strides[1]),
                padding=padding,
                rhs_dilation=(self.dilation, 1, 1),
                dimension_numbers=DN_3D,
            )

        out = do_conv(x)
        if out_pad:
            out = out[..., :out_features]
        if bias is not None:
            out = out + bias.astype(dtype)
        if unblock_after:
            out = w_unblock(out)
        return out


class Conv3d1x1(nn.Module):
    """Pointwise 3D conv. Expressed as a 1x1x1 ``conv_general_dilated`` rather
    than an einsum: profiling on v5e showed einsum-pointwise ops pick the
    C-minor layout while neighbouring 3D convs prefer W-minor, and XLA inserts
    full-tensor layout copies between them (~15% of step time). As a conv, the
    whole chain keeps one layout. Parity: reference ``nn.Conv3d(dim, dim, 1)``."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def _params(self, c_in: int, int8_calib: bool = False):
        """Params without compute (see CausalConv3d._params)."""
        kernel = self.param('kernel', torch_kernel_init, (c_in, self.features))
        bias = self.param(
            'bias', torch_bias_init(c_in), (self.features,)
        ) if self.use_bias else None
        calib = (self.variable('int8_calib', 'absmax',
                               lambda: jnp.zeros((), jnp.float32))
                 if int8_calib else None)
        return kernel, bias, calib

    def __call__(self, x, w_blocked: bool = False):
        c_in = x.shape[-1] // 2 if w_blocked else x.shape[-1]
        use_int8 = int8_conv_enabled(c_in, self.features)
        calibrating = (use_int8 and not self.is_initializing()
                       and self.is_mutable_collection('int8_calib'))
        kernel, bias, calib = self._params(c_in, int8_calib=calibrating)
        dtype = default(self.dtype, x.dtype)
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        if calib is not None:
            calib.value = jnp.maximum(
                calib.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
        f = self.features
        if w_blocked:
            # lane packing (see module note): per-phase application == one
            # block-diagonal (2c, 2f) pointwise conv — keeps the blocked
            # layout flowing; the op is memory-bound so the zero half-blocks
            # cost nothing that matters
            kb = jnp.zeros((2 * c_in, 2 * f), dtype)
            kb = kb.at[:c_in, :f].set(kernel).at[c_in:, f:].set(kernel)
            kernel, f = kb, 2 * f
        if use_int8:
            xq = xs = None
            if self.has_variable('int8', 'act_scale'):
                xs = self.get_variable('int8', 'act_scale')
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                              -127, 127).astype(jnp.int8)
            if xq is None:
                xq, xs = _quantize_per_tensor(x)
            kq = ks = None
            if self.has_variable('int8', 'kernel_q'):
                kq_s = self.get_variable('int8', 'kernel_q')
                if kq_s.shape == kernel.shape:   # raw-layout kernels only
                    kq = kq_s
                    ks = self.get_variable('int8', 'kernel_scale')
            if kq is None:
                kq, ks = _quantize_per_channel_out(kernel)
            acc = jax.lax.conv_general_dilated(
                xq, kq.reshape(1, 1, 1, kernel.shape[0], f),
                window_strides=(1, 1, 1),
                padding=[(0, 0)] * 3,
                dimension_numbers=DN_3D,
                preferred_element_type=jnp.int32,
            )
            out = (acc.astype(jnp.float32) * (xs * ks)).astype(dtype)
        else:
            out = jax.lax.conv_general_dilated(
                x, kernel.reshape(1, 1, 1, kernel.shape[0], f),
                window_strides=(1, 1, 1),
                padding=[(0, 0)] * 3,
                dimension_numbers=DN_3D,
            )
        if bias is not None:
            if w_blocked:
                bias = jnp.concatenate([bias, bias])
            out = out + bias.astype(dtype)
        return out


class SameConv2d(nn.Module):
    """Same-padded 2D conv on ``(B, H, W, C)`` (reference SameConv2d,
    magvit2_pytorch.py:887-890)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = cast_tuple(self.kernel_size, 2)
        c_in = x.shape[-1]
        kernel = self.param('kernel', torch_kernel_init, (kh, kw, c_in, self.features))
        dtype = default(self.dtype, x.dtype)
        out = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=(1, 1),
            padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=DN_2D,
        )
        if self.use_bias:
            bias = self.param('bias', torch_bias_init(kh * kw * c_in), (self.features,))
            out = out + bias.astype(dtype)
        return out


class Conv2d(nn.Module):
    """Plain strided 2D conv with explicit symmetric padding (channels-last)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = cast_tuple(self.kernel_size, 2)
        c_in = x.shape[-1]
        kernel = self.param('kernel', torch_kernel_init, (kh, kw, c_in, self.features))
        dtype = default(self.dtype, x.dtype)
        out = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=DN_2D,
        )
        if self.use_bias:
            bias = self.param('bias', torch_bias_init(kh * kw * c_in), (self.features,))
            out = out + bias.astype(dtype)
        return out


class CausalConvTranspose3d(nn.Module):
    """Time-strided transpose conv, output sliced to ``t * time_stride`` frames
    (reference magvit2_pytorch.py:990-1024; defined-but-unused there — kept for
    component parity)."""

    features: int
    kernel_size: Union[int, Tuple[int, int, int]]
    time_stride: int = 2
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = cast_tuple(self.kernel_size, 3)
        assert is_odd(kh) and is_odd(kw)
        hp, wp = kh // 2, kw // 2
        t = x.shape[1]
        c_in = x.shape[-1]

        # transpose_kernel=True swaps the I/O slots of the DHWIO spec, so the
        # kernel is stored (kt, kh, kw, out, in) — mirroring torch's
        # ConvTranspose3d (in, out, kt, kh, kw) layout.
        kernel = self.param('kernel', torch_kernel_init, (kt, kh, kw, self.features, c_in))
        dtype = default(self.dtype, x.dtype)

        # torch ConvTranspose3d(stride=(s,1,1), padding=(0,hp,wp)) ==
        # lax.conv_transpose with padding (k-1-p_lo, k-1-p_hi) per dim and the
        # kernel flipped (transpose_kernel=True matches torch weight semantics).
        out = jax.lax.conv_transpose(
            x.astype(dtype), kernel.astype(dtype),
            strides=(self.time_stride, 1, 1),
            padding=[(kt - 1, kt - 1), (kh - 1 - hp, kh - 1 - hp), (kw - 1 - wp, kw - 1 - wp)],
            dimension_numbers=DN_3D,
            transpose_kernel=True,
        )
        if self.use_bias:
            bias = self.param('bias', torch_bias_init(kt * kh * kw * self.features), (self.features,))
            out = out + bias.astype(dtype)
        return out[:, :t * self.time_stride]


class Conv3DMod(nn.Module):
    """StyleGAN2-style modulated causal 3D conv (reference Conv3DMod,
    magvit2_pytorch.py:680-753).

    Per-sample conv weights ``w_b = W * (cond_b + 1)`` demodulated by the
    per-output-channel rms. The reference lowers this as one grouped conv with
    ``groups=batch``; on TPU we vmap the conv over the batch — XLA batches the
    per-sample convs onto the MXU without materializing the grouped layout.
    """

    dim: int
    spatial_kernel: int
    time_kernel: int
    causal: bool = True
    dim_out: Optional[int] = None
    demod: bool = True
    eps: float = 1e-8
    pad_mode: str = 'constant'
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, fmap, cond, streaming: bool = False):
        assert is_odd(self.spatial_kernel) and is_odd(self.time_kernel)
        dim_out = default(self.dim_out, self.dim)
        kt, ks = self.time_kernel, self.spatial_kernel
        sp = ks // 2

        # layout (kt, kh, kw, in, out) to match our conv convention
        weights = self.param(
            'weights', kaiming_normal_selu_init, (kt, ks, ks, self.dim, dim_out))

        dtype = default(self.dtype, fmap.dtype)
        weights = weights.astype(dtype)
        fmap = fmap.astype(dtype)
        cond = cond.astype(dtype)

        # modulate: cond (b, in) broadcasts over (kt, kh, kw, in, out)
        w = weights[None] * (cond[:, None, None, None, :, None] + 1.0)

        if self.demod:
            inv_norm = jax.lax.rsqrt(
                jnp.maximum(jnp.sum(w.astype(jnp.float32) ** 2, axis=(1, 2, 3, 4),
                                    keepdims=True), self.eps))
            w = w * inv_norm.astype(dtype)

        if self.causal:
            time_pad = (kt - 1, 0)
        else:
            time_pad = (kt // 2, kt // 2)

        if streaming and self.causal and kt > 1:
            # carry the causal time history across chunks (same contract as
            # CausalConv3d streaming above)
            assert self.pad_mode in ('constant', 'zeros'), (
                'streaming requires zero pad_mode')
            b, _, fh, fw, c_in = fmap.shape
            cache = self.variable(
                'cache', 'time_state',
                lambda: jnp.zeros((b, kt - 1, fh, fw, c_in), dtype))
            fmap = jnp.concatenate([cache.value.astype(dtype), fmap], axis=1)
            cache.value = fmap[:, -(kt - 1):]
            time_pad = (0, 0)

        pads = [time_pad, (sp, sp), (sp, sp)]
        if self.pad_mode in ('constant', 'zeros'):
            padding = pads
            x = fmap
        else:
            x = _maybe_explicit_pad(fmap, pads, self.pad_mode)
            padding = [(0, 0)] * 3

        def single(sample, kernel):
            return jax.lax.conv_general_dilated(
                sample[None], kernel,
                window_strides=(1, 1, 1),
                padding=padding,
                dimension_numbers=DN_3D,
            )[0]

        return jax.vmap(single)(x, w)


def blur_kernel_1d(dtype=jnp.float32):
    return jnp.asarray([1.0, 2.0, 1.0], dtype=dtype)


def blur(x, space_only: bool = False, time_only: bool = False):
    """Binomial [1,2,1] anti-aliasing filter (reference Blur,
    magvit2_pytorch.py:512-547; kornia.filter3d(normalized=True) semantics —
    normalized kernel, replicate border).

    Accepts ``(B, T, H, W, C)`` video or ``(B, H, W, C)`` images. Implemented as
    separable depthwise 1D convs along each filtered axis — cheaper than a
    dense 3D kernel and fuses into one XLA loop nest.
    """
    assert not (space_only and time_only)

    is_images = x.ndim == 4
    if is_images:
        x = x[:, None]  # (b, 1, h, w, c)

    f = blur_kernel_1d(jnp.float32) / 4.0
    axes = []
    if not time_only:
        axes += [2, 3]   # h, w
    if not space_only:
        axes += [1]      # t

    c = x.shape[-1]
    for axis in axes:
        # replicate-pad the filtered axis then depthwise conv
        pad = [(0, 0)] * x.ndim
        pad[axis] = (1, 1)
        xp = jnp.pad(x, pad, mode='edge')
        # move the filtered axis to W position of an NWC view
        perm = [a for a in range(x.ndim) if a not in (axis, x.ndim - 1)] + [axis, x.ndim - 1]
        inv = [perm.index(i) for i in range(x.ndim)]
        xt = jnp.transpose(xp, perm)
        lead = xt.shape[:-2]
        xt = xt.reshape((-1,) + xt.shape[-2:])  # (N, W+2, C)
        kernel = jnp.tile(f.reshape(3, 1, 1), (1, 1, c)).astype(x.dtype)
        out = jax.lax.conv_general_dilated(
            xt.astype(x.dtype), kernel,
            window_strides=(1,),
            padding=[(0, 0)],
            dimension_numbers=DN_1D,
            feature_group_count=c,
        )
        out = out.reshape(lead + out.shape[-2:])
        x = jnp.transpose(out, inv)

    if is_images:
        x = x[:, 0]
    return x
