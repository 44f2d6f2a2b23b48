"""Fused Pallas kernel: the full lane-packed ResidualUnit in one VMEM pass.

Target: the flagship's 64-channel 128px stage (reference ResidualUnit,
/root/reference/magvit2_pytorch/magvit2_pytorch.py:930-944) — the layer
tools/layer_bench.py measures at ~23% of MXU peak under XLA. Two structural
problems cap the XLA lowering:

1. C=64 wastes half the 128-wide MXU contraction AND half of every vector
   lane/HBM tile. Lane packing (ops/conv.py) fixes the layout but its dense
   w-blocked conv kernel is 50% structural zeros -> 2x the logical FLOPs.
2. The conv -> ELU -> 1x1 -> ELU -> SqueezeExcite -> +residual chain makes
   5 HBM round-trips of the largest activation in the network.

This kernel runs the whole unit per (batch, frame) grid step with ONE read
of x and ONE write of out:

- NO im2col patch. Each frame is written once into TWO causal ring buffers
  in a "pair" layout of 2*C2 = 256 lanes per row: ringE pair m holds
  x_flat[m*2C2 - C : (m+1)*2C2 - C) (shift left by C) and ringO pair m
  holds x_flat[m*2C2 + C : ...) (shift right by C). In the w-flattened row
  the 4C tap window of output block u — [phase1 of block u-1 | block u |
  phase0 of block u+1] in original coordinates — is x_flat[u*C2 - C :
  (u+2)*C2 - C), which is EXACTLY pair u/2 of ringE for even u and pair
  (u-1)/2 of ringO for odd u: every conv operand is a direct lane-aligned
  contiguous VMEM view. The conv is 9 matmuls per parity (one per (dt, dh)
  tap), contraction 2*C2 = 256, against (2C2, C2) weights whose structural
  zeros put the scheme at 1.33x logical FLOPs (vs 2.0x for the dense
  blocked conv XLA can express) at full 128-lane MXU occupancy, and the
  output-phase recombination happens INSIDE the MXU accumulation.
  (A materialized-im2col variant measured patch-copy-bound: 9.7ms/apply vs
  5.0ms for its matmuls alone; a 9-aligned-view variant with post-hoc
  phase recombination spilled its 2x-wide f32 accumulator: 12.3ms. This
  scheme measures 5.3ms conv-only at the flagship shape — the copies, not
  the MXU, were the bottleneck, and this deletes them.)
- causal time taps come from 3-slot ring buffers carried across the
  sequential grid (scratch persists across grid steps on TPU); rings are
  (H+2) row-padded and zero-filled at the shift edges (zero padding == the
  conv's zero pad; stale slots are zeroed at each batch start).
- ELU / 1x1 (block-diagonal, both phases in one matmul) / SqueezeExcite
  (frame-global softmax context + sigmoid gate, reference
  magvit2_pytorch.py:194-240) all happen in VMEM on the parity-split
  layout (B, T, H, 2, W2/2, C2); the wrapper un-splits with one cheap XLA
  swapaxes fused into the +x residual add.

Backward: custom VJP recomputing through `_residual_unit_xla_blocked` — the
bit-for-layout XLA twin below (also the correctness oracle in
tests/test_fused_residual.py). Gradients are exact for the twin's math;
forward uses the kernel.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _elu(x):
    # select-free ELU, same formulation as ops/basic.elu
    return jnp.maximum(x, 0) + jnp.expm1(jnp.minimum(x, 0))


def _elu_kernel(x):
    # Mosaic has no expm1 lowering; exp(x)-1 (x<=0 here, so no catastrophic
    # cancellation beyond bf16's own rounding)
    return jnp.maximum(x, 0) + (jnp.exp(jnp.minimum(x, 0)) - 1.0)


def _leaky_relu(x, negative_slope=0.1):
    # select-free: Mosaic lacks bf16 cmpf; max/min lower to native maxf/minf
    return jnp.maximum(x, 0) + negative_slope * jnp.minimum(x, 0)


# -- weight packing (trace-time, params stay in reference layout) -------------


def _build_wcat(k3):
    """(3,3,3,C,C) conv kernel -> (9*2C2, C2) per-tap weight stack.

    Tap (dt, dh) occupies rows [ti*2C2, (ti+1)*2C2), ti = dt*3+dh. Within a
    tap: contraction row r = j*C2 + q*C + c reads lane r of the ring pair
    for output block u, which holds x_flat[(u+j)*C2 + q*C + c - C], i.e.
    original input w_in = 2(u+j) + q - 1, channel c. Output column
    p*C + f is output (phase p, channel f); the conv tap index is
    kw_i = w_in - w_out + 1 = 2j + q - p, a structural zero unless
    0 <= kw_i <= 2. Filled fraction 6/8 -> 1.33x logical FLOPs."""
    kt, kh, kw, c, f = k3.shape
    assert (kt, kh, kw) == (3, 3, 3) and c == f
    c2 = 2 * c
    wm = jnp.zeros((9 * 2 * c2, c2), k3.dtype)
    for dt in range(3):
        for dh in range(3):
            ti = dt * 3 + dh
            for j in range(2):
                for q in range(2):
                    for p in range(2):
                        kw_i = 2 * j + q - p
                        if not 0 <= kw_i <= 2:
                            continue
                        wm = jax.lax.dynamic_update_slice(
                            wm, k3[dt, dh, kw_i],
                            (ti * 2 * c2 + j * c2 + q * c, p * c))
    return wm


def _block_diag2(k):
    """(C, F) pointwise kernel -> (2C, 2F) block-diagonal (per-phase)."""
    c, f = k.shape
    kb = jnp.zeros((2 * c, 2 * f), k.dtype)
    kb = jax.lax.dynamic_update_slice(kb, k, (0, 0))
    return jax.lax.dynamic_update_slice(kb, k, (c, f))


# -- the kernel ---------------------------------------------------------------


def _kernel(x_ref, wm_ref, cb_ref, w1_ref, pb_ref, k2_ref, kb_ref,
            gi_ref, gib_ref, go_ref, gob_ref, o_ref, ringE, ringO, logits,
            *, H: int, W2: int, C: int, R: int, packed_io: bool = True):
    """``packed_io=False``: x_ref/o_ref blocks carry the UNPACKED
    (1, 1, H, W, C) layout; the pack to the (W2, C2) pair layout happens in
    VMEM via in-kernel reshapes (vector shuffles), so the XLA-level HBM
    relayout that made unpacked engagement a net loss (r3: 1175 -> 1077 fps)
    never exists. The flattened row x_flat[h, w*C + c] is IDENTICAL for both
    views, so all interior math is unchanged."""
    C2 = 2 * C
    M = H * W2
    W2h = W2 // 2
    NW = W2 * C2
    b = pl.program_id(0)
    t = pl.program_id(1)
    dtype = x_ref.dtype

    # --- ring maintenance (frame f lives in slot f mod 3) --------------------
    # ring[slot] is (H+2, W2h, 2C2) in pair layout: ringE pair-row i holds
    # x_flat[i - C], ringO pair-row i holds x_flat[i + C] (zero outside).
    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _zero_all():
        ringE[...] = jnp.zeros_like(ringE)
        ringO[...] = jnp.zeros_like(ringO)

    @pl.when(jnp.logical_and(b > 0, t == 0))
    def _zero_stale():
        # frames -1 (slot 2) and -2 (slot 1) of the new batch element
        z = jnp.zeros((H, W2h, 2 * C2), dtype)
        for s in (1, 2):
            ringE[s, 1:H + 1] = z
            ringO[s, 1:H + 1] = z

    slot_t = jax.lax.rem(t, 3)
    # the one rotation pass per frame (two shifted writes)
    xr = x_ref[0, 0].reshape(H, NW)
    re = jnp.concatenate([jnp.zeros((H, C), dtype), xr[:, :NW - C]],
                         axis=1).reshape(H, W2h, 2 * C2)
    ro = jnp.concatenate([xr[:, C:], jnp.zeros((H, C), dtype)],
                         axis=1).reshape(H, W2h, 2 * C2)
    ringE[slot_t, 1:H + 1] = re
    ringO[slot_t, 1:H + 1] = ro

    # --- conv (9 aligned-view K=256 matmuls per parity) + ELU + 1x1 + ELU ----
    def chunk(ci, _):
        h0 = ci * R
        h2s = []
        for ring in (ringE, ringO):
            acc = jnp.zeros((R * W2h, C2), jnp.float32)
            for dt in range(3):                      # tap frame t-2+dt
                slot = jax.lax.rem(t + 1 + dt, 3)    # (t-2+dt) mod 3
                for dh in range(3):                  # tap row h-1+dh
                    ti = dt * 3 + dh
                    v = ring[slot, pl.ds(h0 + dh, R)].reshape(
                        R * W2h, 2 * C2)
                    acc = acc + jnp.dot(
                        v, wm_ref[ti * 2 * C2:(ti + 1) * 2 * C2],
                        preferred_element_type=jnp.float32)
            h = _elu_kernel(acc.astype(dtype) + cb_ref[0])
            acc2 = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
            h2 = _elu_kernel(acc2.astype(dtype) + pb_ref[0])
            h2s.append(h2.reshape(R, W2h, C2))
        # interleave parities in VREGs (u = 2m + e), store once, contiguous
        comb = jnp.stack(h2s, axis=2).reshape(R, W2, C2)
        # SE logits on the interleaved chunk (bf16 matmul result + bias,
        # then f32 — matches the XLA path's Linear -> astype(f32) order).
        # Stored (M, 2) — the old (2, M) layout cost a (R*W2, 2)
        # transpose per chunk (sublane<->lane flip)
        lg = jnp.dot(comb.reshape(R * W2, C2), k2_ref[:],
                     preferred_element_type=jnp.float32)
        lg = lg.astype(dtype) + kb_ref[0]
        logits[pl.ds(h0 * W2, R * W2), :] = lg.astype(jnp.float32)
        if packed_io:
            o_ref[0, 0, pl.ds(h0, R)] = comb
        else:
            o_ref[0, 0, pl.ds(h0, R)] = comb.reshape(R, 2 * W2, C)

    jax.lax.fori_loop(0, H // R, chunk, None, unroll=False)

    # --- SqueezeExcite (global over the frame) -------------------------------
    lg = logits[...]                                     # (M, 2) f32
    m = jnp.max(lg)
    ex = jnp.exp(lg - m)
    attn = (ex / jnp.sum(ex)).astype(dtype)              # (M, 2)
    y = o_ref[0, 0].reshape(M, C2)
    # ctx2[p, c] = sum_m attn[m, p] * y[m, c] — contract over M without an
    # explicit transpose (MXU takes the contraction dim on either side)
    ctx2 = jax.lax.dot_general(
        attn, y, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (2, C2)
    context = (ctx2[0, :C] + ctx2[1, C:]).astype(dtype).reshape(1, C)
    # tiny (1,C) dots: explicit f32 operands — Mosaic mis-verifies
    # preferred_element_type upcasts on sub-tile matmuls (f32->bf16 broadcast)
    g32 = jnp.dot(context.astype(jnp.float32), gi_ref[:].astype(jnp.float32))
    g = _leaky_relu(g32.astype(dtype) + gib_ref[0])
    gt32 = jnp.dot(g.astype(jnp.float32), go_ref[:].astype(jnp.float32))
    # manual sigmoid: Mosaic's logistic lowering emits a mistyped f32->bf16
    # broadcast on sub-tile vectors
    z = gt32.astype(dtype) + gob_ref[0]
    gates = 1.0 / (1.0 + jnp.exp(-z))                    # (1, C)
    if packed_io:
        gates_b = jnp.concatenate([gates, gates], axis=-1).reshape(1, 1, C2)
    else:
        # both phases share the gate, so the unpacked (H, W, C) view needs
        # only the plain per-channel broadcast
        gates_b = gates.reshape(1, 1, C)
    # gating + residual in one in-place pass (no layout change needed)
    o_ref[0, 0] = o_ref[0, 0] * gates_b + x_ref[0, 0]


# -- XLA twin (VJP recompute target + oracle) ---------------------------------


def _residual_unit_xla_blocked(xb, conv_k, conv_b, pw_k, pw_b,
                               tok_k, tok_b, gi_k, gi_b, go_k, go_b):
    """Identical math to the kernel, expressed in XLA on the blocked layout.
    Mirrors the module path (_ResidualUnitInner with w_blocked=True) —
    tests assert both equivalences."""
    from magvit2_pytorch_tpu.ops.conv import DN_3D, _w_block_kernel_dense

    dtype = xb.dtype
    c = conv_k.shape[-1]

    kern, (wplo, wphi) = _w_block_kernel_dense(conv_k.astype(dtype))
    y = jax.lax.conv_general_dilated(
        xb, kern, window_strides=(1, 1, 1),
        padding=[(2, 0), (1, 1), (wplo, wphi)],
        dimension_numbers=DN_3D)
    y = _elu(y + jnp.concatenate([conv_b, conv_b]).astype(dtype))

    kb = _block_diag2(pw_k.astype(dtype))
    y = jax.lax.conv_general_dilated(
        y, kb.reshape(1, 1, 1, 2 * c, 2 * c), window_strides=(1, 1, 1),
        padding=[(0, 0)] * 3, dimension_numbers=DN_3D)
    y = _elu(y + jnp.concatenate([pw_b, pw_b]).astype(dtype))

    # blocked SqueezeExcite (see ops/basic.SqueezeExcite w_blocked branch)
    yv = y.reshape(*y.shape[:-1], 2, c)
    k = (jnp.einsum('...i,io->...o', yv, tok_k.astype(dtype))
         + tok_b.astype(dtype)).astype(jnp.float32)[..., 0]
    sp = (-3, -2, -1)
    k = k - jnp.max(k, axis=sp, keepdims=True)
    attn = jnp.exp(k)
    attn = attn / jnp.sum(attn, axis=sp, keepdims=True)
    context = jnp.einsum('...hwpc,...hwp->...c', yv, attn.astype(dtype),
                         preferred_element_type=jnp.float32)
    context = context[..., None, None, :].astype(dtype)
    g = jnp.einsum('...i,io->...o', context, gi_k.astype(dtype))
    g = _leaky_relu(g + gi_b.astype(dtype))
    gates = jax.nn.sigmoid(
        jnp.einsum('...i,io->...o', g, go_k.astype(dtype))
        + go_b.astype(dtype))
    se = jnp.concatenate([gates, gates], axis=-1) * y
    return se + xb


# -- public entry -------------------------------------------------------------


def fused_eligible(x, dim: int, kernel_size, streaming: bool,
                   w_blocked: bool) -> bool:
    """Static gate for the fused kernel on the product path.

    Engaged only from the lane-packed layout (w_blocked, (..., W/2, 2C)),
    where neighbors already produce/consume the packed form and the kernel
    is boundary-free. The unpacked (B,T,H,W,C) layout is NOT engaged on TPU:
    r3 measured XLA pack-boundary relayouts costing more than the kernel
    saves (1175 -> 1077 fps), and the r4 packed_io=False mode (pack in VMEM)
    fails to lower — Mosaic rejects the (H, W, C) -> (H, W*C) shape cast
    ("infer-vector-layout: unsupported shape cast", 2026-08-19). The
    unpacked 64-ch stage instead uses the XLA w-pair im2col lowering in
    ops/conv.py (c128-efficiency conv, 1.33x logical FLOPs, no layout
    boundary). packed_io=False remains exercised in interpret mode by
    tests/test_fused_residual.py against the twin."""
    import os

    from magvit2_pytorch_tpu.utils.helpers import cast_tuple
    if os.environ.get('MAGVIT2_TPU_NO_FUSED_RU', '') == '1':
        return False    # bench/debug kill switch
    if not w_blocked:
        return False
    if streaming:
        return False
    if cast_tuple(kernel_size, 3) != (3, 3, 3):
        return False
    if x.ndim != 5 or dim % 64:
        return False
    if w_blocked:
        if x.shape[-1] != 2 * dim:
            return False
        b, t, h, w2, c2 = x.shape
    else:
        if x.shape[-1] != dim or x.shape[-2] % 2:
            return False
        b, t, h, w, c = x.shape
        w2, c2 = w // 2, 2 * c
    if c2 != 128:          # one full lane tile; wider stages don't need this
        return False
    if h % 16 or h < 16 or w2 < 4 or w2 % 2:
        return False
    # VMEM budget (2 rings + in/out blocks x2 double buffering + f32 conv acc)
    it = jnp.dtype(x.dtype).itemsize
    frame = h * w2 * c2 * it
    rings = 2 * 3 * (h + 2) * (w2 // 2) * 2 * c2 * it
    acc = 16 * (w2 // 2) * c2 * 4
    if rings + acc + 4 * frame > 28 * 1024 * 1024:
        return False
    return jax.default_backend() == 'tpu'


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def fused_residual_unit(xb, conv_k, conv_b, pw_k, pw_b,
                        tok_k, tok_b, gi_k, gi_b, go_k, go_b,
                        interpret: bool = False, packed_io: bool = True):
    """Blocked-layout fused ResidualUnit. xb: (B, T, H, W2, 2C) with channel
    order (phase, c); params in the reference (unblocked) layout:
    conv_k (3,3,3,C,C), pw_k (C,C), tok_k (C,1), gi_k (C,Ch), go_k (Ch,C).

    ``packed_io=False``: xb is the UNPACKED (B, T, H, W, C) activation; the
    kernel reads/writes that layout directly and repacks in VMEM — no XLA
    boundary relayout (see _kernel docstring)."""
    if packed_io:
        B, T, H, W2, C2 = xb.shape
        C = C2 // 2
    else:
        B, T, H, W, C = xb.shape
        W2, C2 = W // 2, 2 * C
    dtype = xb.dtype
    R = 16 if H % 16 == 0 else 8
    if os.environ.get('MAGVIT2_TPU_RU_R32') == '1' and H % 32 == 0:
        R = 32     # bigger per-chunk matmuls, half the loop trips (measure)
    hidden = gi_k.shape[1]

    wm = _build_wcat(conv_k).astype(dtype)               # (9*C2, 2*C2)
    cb2 = jnp.concatenate([conv_b, conv_b]).astype(dtype).reshape(1, C2)
    w1 = _block_diag2(pw_k).astype(dtype)                # (2C, 2C)
    pb2 = jnp.concatenate([pw_b, pw_b]).astype(dtype).reshape(1, C2)
    # per-phase to_k columns: (2C, 2) with k in (phase-matching) blocks
    k2 = jnp.zeros((C2, 2), tok_k.dtype)
    k2 = jax.lax.dynamic_update_slice(k2, tok_k, (0, 0))
    k2 = jax.lax.dynamic_update_slice(k2, tok_k, (C, 1))
    k2 = k2.astype(dtype)
    kb2 = jnp.broadcast_to(tok_b.astype(dtype), (2,)).reshape(1, 2)

    kernel = functools.partial(_kernel, H=H, W2=W2, C=C, R=R,
                               packed_io=packed_io)
    const = lambda spec_shape: pl.BlockSpec(
        spec_shape, lambda b, t: (0,) * len(spec_shape),
        memory_space=pltpu.VMEM)
    W2h = W2 // 2
    io_block = (1, 1, H, W2, C2) if packed_io else (1, 1, H, 2 * W2, C)

    y = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(io_block,
                         lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const((9 * 2 * C2, C2)),
            const((1, C2)),
            const((C2, C2)),
            const((1, C2)),
            const((C2, 2)),
            const((1, 2)),
            const((C, hidden)),
            const((1, hidden)),
            const((hidden, C)),
            const((1, C)),
        ],
        out_specs=pl.BlockSpec(io_block,
                               lambda b, t: (b, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T) + io_block[2:], dtype),
        input_output_aliases={0: 0},
        scratch_shapes=[
            pltpu.VMEM((3, H + 2, W2h, 2 * C2), dtype),    # even-parity ring
            pltpu.VMEM((3, H + 2, W2h, 2 * C2), dtype),    # odd-parity ring
            pltpu.VMEM((H * W2, 2), jnp.float32),          # SE logits
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * H * W2 * C2 * (36 * C + C2),
            bytes_accessed=2 * B * T * H * W2 * C2 * jnp.dtype(dtype).itemsize,
            transcendentals=2 * B * T * H * W2 * C2,
        ),
        interpret=interpret,
    )(xb, wm, cb2, w1, pb2, k2, kb2,
      gi_k.astype(dtype), gi_b.astype(dtype).reshape(1, hidden),
      go_k.astype(dtype), go_b.astype(dtype).reshape(1, C))
    # residual + gating applied in-kernel; the input buffer is donated to
    # the output (input_output_aliases), so inference adds no extra HBM
    return y


def _fwd(xb, conv_k, conv_b, pw_k, pw_b, tok_k, tok_b, gi_k, gi_b,
         go_k, go_b, interpret, packed_io):
    out = fused_residual_unit(xb, conv_k, conv_b, pw_k, pw_b, tok_k, tok_b,
                              gi_k, gi_b, go_k, go_b, interpret, packed_io)
    return out, (xb, conv_k, conv_b, pw_k, pw_b, tok_k, tok_b,
                 gi_k, gi_b, go_k, go_b)


def _bwd(interpret, packed_io, residuals, g):
    if packed_io:
        _, vjp = jax.vjp(_residual_unit_xla_blocked, *residuals)
        return vjp(g)
    # unpacked I/O: the XLA recompute twin is blocked-layout; round-trip
    # through the (free-in-logical-terms) reshape. The backward therefore
    # pays the XLA relayout the forward avoids — training with the unpacked
    # kernel engaged is correct but not the fast path.
    xb, *rest = residuals
    shp = xb.shape
    xbb = xb.reshape(*shp[:3], shp[3] // 2, 2 * shp[4])
    _, vjp = jax.vjp(_residual_unit_xla_blocked, xbb, *rest)
    grads = vjp(g.reshape(xbb.shape))
    return (grads[0].reshape(shp),) + tuple(grads[1:])


fused_residual_unit.defvjp(_fwd, _bwd)
