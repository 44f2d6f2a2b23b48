#!/usr/bin/env python
"""conv_in lowering probe: the 7^3 3->64 stem is contraction-starved.

Current path (t-unfold): contraction 7*3=21 of 128 MXU lanes -> measured
138.5 ms unpacked / 106.3 ms packed-out at b128 (tools/packed_stem_probe).
Candidate: 2x2 space-to-depth the INPUT (channels 3 -> 12), keep the
t-unfold (contraction 7*12=84), kernel taps (4,4) over s2d cells computing
all four (h-phase, w-phase) outputs as 256 channels — 1.31x logical FLOPs
at a 84-deep contraction — then scatter phases back to pixels:
  - unpacked target: depth-to-space both axes (XLA reshape/transpose)
  - packed target: scatter h only (w-phase IS the packed layout)

This probe measures the pieces at the flagship shape so the lowering only
lands in ops/conv.py if the e2e arithmetic wins.

Usage: python tools/convin_probe.py [--batch 32]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

DN_3D = ('NDHWC', 'DHWIO', 'NDHWC')
PEAK = 197e12


def bench(fn, *args, n_short=2, n_long=8):
    fn = jax.jit(fn)

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        float(np.asarray(
            jax.tree.leaves(out)[0].reshape(-1)[:1]).astype(np.float32)[0])
        return time.perf_counter() - t0

    run(n_short)
    t_s = min(run(n_short), run(n_short))
    t_l = min(run(n_long), run(n_long))
    return (t_l - t_s) / (n_long - n_short)


def s2d_kernel(k, G):
    """(kt,7,7,3,64) -> (kt, kh', kw', G*G*3, G*G*64) dense s2d kernel.
    Output channel block (ph, pw) at s2d cell (y, x) is original output
    pixel (G*y+ph, G*x+pw); input channel block (qh, qw) of tap (dh, dw)
    reads original pixel (G*(y+dh)+qh - lo_h, ...)."""
    kt, kh, kw, c, f = k.shape
    rh, rw = kh // 2, kw // 2
    lo_h, hi_h = (0 - rh) // G, (G - 1 + kh - 1 - rh) // G
    lo_w, hi_w = (0 - rw) // G, (G - 1 + kw - 1 - rw) // G
    nh, nw = hi_h - lo_h + 1, hi_w - lo_w + 1
    kb = np.zeros((kt, nh, nw, G * G * c, G * G * f), np.float32)
    kk = np.asarray(k, np.float32)
    for ph in range(G):
        for pw in range(G):
            for i in range(kh):
                for j in range(kw):
                    # input pixel offset relative to output pixel
                    y = ph + i - rh
                    x = pw + j - rw
                    dh, qh = y // G, y % G
                    dw, qw = x // G, x % G
                    ci = (qh * G + qw) * c
                    co = (ph * G + pw) * f
                    kb[:, dh - lo_h, dw - lo_w, ci:ci + c, co:co + f] = \
                        kk[:, i, j]
    return (jnp.asarray(kb), (-lo_h, hi_h - 0), (-lo_w, hi_w - 0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)

    B, T, S, C, F = args.batch, 17, 128, 3, 64
    KT = 7
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.random((B, T, S, S, C)), dtype)
    k = jnp.asarray(rng.normal(size=(KT, 7, 7, C, F)) * 0.05, dtype)

    useful = 2 * B * T * S * S * KT * 7 * 7 * C * F

    # --- current path: t-unfold, contraction 21 ------------------------------
    def t_unfold(v):
        v = jnp.pad(v, [(0, 0), (KT - 1, 0), (0, 0), (0, 0), (0, 0)])
        t_out = v.shape[1] - (KT - 1)
        vu = jnp.concatenate([v[:, i:i + t_out] for i in range(KT)], axis=-1)
        ku = k.transpose(1, 2, 0, 3, 4).reshape(1, 7, 7, KT * C, F)
        return jax.lax.conv_general_dilated(
            vu, ku, window_strides=(1, 1, 1),
            padding=[(0, 0), (3, 3), (3, 3)], dimension_numbers=DN_3D)

    t_cur = bench(t_unfold, video)
    print(f'current t-unfold (K=21)     : {t_cur*1e3:7.1f} ms '
          f'{useful/t_cur/1e12:5.1f} TFLOP/s ({useful/t_cur/PEAK*100:4.1f}%)')

    # --- candidate: s2d 2x2 + t-unfold, contraction 84 ------------------------
    G = 2
    kb, (ph_lo, ph_hi), (pw_lo, pw_hi) = s2d_kernel(
        k.transpose(0, 1, 2, 3, 4), G)
    kb = kb.astype(dtype)
    # fold t into channels too: (1, nh, nw, KT*G*G*C, G*G*F)
    nh, nw = kb.shape[1], kb.shape[2]
    kbu = kb.reshape(KT, nh, nw, G * G * C, G * G * F)
    # unfold concat makes input channel dt*(G*G*C) + g -> kt must be the
    # OUTER channel factor
    kbu = jnp.moveaxis(kbu, 0, 2).reshape(1, nh, nw, KT * G * G * C,
                                          G * G * F)

    def s2d_conv(v):
        b, t, h, w, c = v.shape
        vs = v.reshape(b, t, h // G, G, w // G, G, c)
        vs = vs.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            b, t, h // G, w // G, G * G * c)
        vs = jnp.pad(vs, [(0, 0), (KT - 1, 0), (0, 0), (0, 0), (0, 0)])
        t_out = vs.shape[1] - (KT - 1)
        vu = jnp.concatenate([vs[:, i:i + t_out] for i in range(KT)],
                             axis=-1)
        out = jax.lax.conv_general_dilated(
            vu, kbu, window_strides=(1, 1, 1),
            padding=[(0, 0), (ph_lo, ph_hi - (1 - 1)), (pw_lo, pw_hi)],
            dimension_numbers=DN_3D)
        return out          # (B, T, S/2, S/2, 4F) phases-as-channels

    # correctness vs current (scatter phases back)
    small = video[:2, :5]
    want = np.asarray(t_unfold(small), np.float32)
    got_p = np.asarray(s2d_conv(small), np.float32)
    b2, t2 = got_p.shape[:2]
    got = got_p.reshape(b2, t2, S // G, S // G, G, G, F)
    got = got.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b2, t2, S, S, F)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    print(f's2d rel err vs current: {err:.2e} '
          f'({"OK" if err < 3e-2 else "FAIL"})')

    t_s2d = bench(s2d_conv, video)
    print(f's2d2x2+t-unfold (K=84) conv : {t_s2d*1e3:7.1f} ms '
          f'{useful/t_s2d/1e12:5.1f} TFLOP/s logical+31%')

    # phase scatter to unpacked pixels (the cost the unpacked path adds)
    lat = s2d_conv(video)

    def scatter_full(o):
        b, t = o.shape[:2]
        o = o.reshape(b, t, S // G, S // G, G, G, F)
        return o.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, S, S, F)

    t_sc = bench(scatter_full, lat)
    print(f'phase scatter (unpacked)    : {t_sc*1e3:7.1f} ms')

    # phase scatter to the w-packed layout (h only; (S, S/2, 2F))
    def scatter_packed(o):
        b, t = o.shape[:2]
        o = o.reshape(b, t, S // G, S // G, G, G * F)
        return o.transpose(0, 1, 2, 4, 3, 5).reshape(b, t, S, S // G, G * F)

    t_scp = bench(scatter_packed, lat)
    print(f'phase scatter (packed)      : {t_scp*1e3:7.1f} ms')

    print(f'TOTAL unpacked: {1e3*(t_s2d+t_sc):7.1f} ms vs {t_cur*1e3:7.1f}'
          f' current ({t_cur/(t_s2d+t_sc):4.2f}x)')
    print(f'TOTAL packed  : {1e3*(t_s2d+t_scp):7.1f} ms')

    # --- candidate: t-unfold THEN h-unfold, contraction 147, no FLOP overhead
    # (phases stay pixels: output is natively unpacked). Costs one extra
    # materialization of the 147-channel input (~7x the video's bytes).
    def th_unfold(v):
        v = jnp.pad(v, [(0, 0), (KT - 1, 0), (0, 0), (0, 0), (0, 0)])
        t_out = v.shape[1] - (KT - 1)
        vu = jnp.concatenate([v[:, i:i + t_out] for i in range(KT)], axis=-1)
        vu = jnp.pad(vu, [(0, 0), (0, 0), (3, 3), (0, 0), (0, 0)])
        vh = jnp.concatenate([vu[:, :, i:i + S] for i in range(7)], axis=-1)
        # channel order: h-tap OUTER, then t-tap, then c; the conv window is
        # W — kernel dims must be (kw window, [kh, kt, c] channels, f)
        kh = k.transpose(1, 0, 2, 3, 4).transpose(2, 0, 1, 3, 4).reshape(
            1, 1, 7, 7 * KT * C, F)
        return jax.lax.conv_general_dilated(
            vh, kh, window_strides=(1, 1, 1),
            padding=[(0, 0), (0, 0), (3, 3)], dimension_numbers=DN_3D)

    want = np.asarray(t_unfold(small), np.float32)
    got = np.asarray(th_unfold(small), np.float32)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    print(f'th-unfold rel err vs current: {err:.2e} '
          f'({"OK" if err < 3e-2 else "FAIL"})')
    t_th = bench(th_unfold, video)
    print(f'th-unfold (K=147) conv      : {t_th*1e3:7.1f} ms '
          f'{useful/t_th/1e12:5.1f} TFLOP/s ({useful/t_th/PEAK*100:4.1f}%)'
          f'   vs current {t_cur/t_th:4.2f}x')


if __name__ == '__main__':
    main()
