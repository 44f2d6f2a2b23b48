#!/usr/bin/env python
"""Probe: does int8 actually beat bf16 on this chip through XLA?

v5e's MXU does 394 int8 TOPS vs 197 bf16 TFLOPS (public spec) — the only
lever past the bf16 compute roofline (VERDICT r3 #2). But the speedup only
materializes if XLA lowers s8xs8->s32 matmul/conv onto the int8 MXU path.
This measures matmul and the flagship's two conv shapes in both precisions
before we invest in a quantized inference path.

Usage: python tools/int8_probe.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

DN_3D = jax.lax.ConvDimensionNumbers(
    lhs_spec=(0, 4, 1, 2, 3), rhs_spec=(4, 3, 0, 1, 2),
    out_spec=(0, 4, 1, 2, 3))


def bench(fn, x0, *rest, n_short=2, n_long=10):
    """Slope timing over chained iterations with a REAL serial dependency:
    the first operand is recycled from each iteration's output (cast back to
    the input dtype), so XLA cannot hoist the compute out of the loop (the
    first version of this probe produced negative slopes — the loop body was
    loop-invariant and ran once)."""
    @jax.jit
    def chained(n, x, *rest):
        def body(i, v):
            out = fn(v, *rest)
            out = out.reshape(v.shape)
            if v.dtype == jnp.int8:
                return jax.lax.rem(out, jnp.asarray(121, out.dtype)).astype(
                    jnp.int8)
            return out.astype(v.dtype) * 1e-3
        return jax.lax.fori_loop(0, n, body, x)

    def run(n):
        t0 = time.perf_counter()
        out = chained(n, x0, *rest)
        float(np.asarray(out.reshape(-1)[:1]).astype(np.float32).sum())
        return time.perf_counter() - t0

    run(n_short)
    t_s = run(n_short)
    t_l = run(n_long)
    return (t_l - t_s) / (n_long - n_short)


def main():
    rng = np.random.default_rng(0)
    print(f'# backend={jax.default_backend()}')

    # -- matmul: 4096x4096x4096 ------------------------------------------
    n = 4096
    a8 = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
    abf = jnp.asarray(rng.normal(size=(n, n)), jnp.bfloat16)
    bbf = jnp.asarray(rng.normal(size=(n, n)), jnp.bfloat16)

    flops = 2 * n ** 3
    t_bf = bench(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32), abf, bbf)
    print(f'matmul {n}^3 bf16: {t_bf*1e3:.3f} ms, '
          f'{flops/t_bf/1e12:.1f} TFLOP/s')
    t_i8 = bench(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32), a8, b8)
    print(f'matmul {n}^3 int8: {t_i8*1e3:.3f} ms, '
          f'{flops/t_i8/1e12:.1f} TOP/s  (speedup {t_bf/t_i8:.2f}x)')

    # quantize-compute-dequant roundtrip (the realistic int8 inference op:
    # dynamic per-tensor act scale + per-col weight scale)
    w_scale = jnp.asarray(rng.uniform(0.5, 2.0, (n,)), jnp.float32)
    def qdq(a, b8, w_scale):
        amax = jnp.max(jnp.abs(a)).astype(jnp.float32)
        s = amax / 127.0
        ai = jnp.clip(jnp.round(a.astype(jnp.float32) / s), -127,
                      127).astype(jnp.int8)
        o = jax.lax.dot_general(ai, b8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (o.astype(jnp.float32) * (s * w_scale)).astype(jnp.bfloat16)
    t_qdq = bench(qdq, abf, b8, w_scale)
    print(f'matmul {n}^3 int8+q/dq: {t_qdq*1e3:.3f} ms '
          f'({flops/t_qdq/1e12:.1f} eff TOP/s, speedup {t_bf/t_qdq:.2f}x)')

    # -- the flagship's two heavy conv shapes -----------------------------
    # (batch 8 proxies; bench.py batch 128 scales linearly)
    for (shape, cin, cout, k) in [
        ((8, 17, 128, 128, 64), 64, 64, (3, 3, 3)),     # 64-ch stage, 22% pk
        ((8, 17, 64, 64, 128), 128, 128, (3, 3, 3)),    # 128-ch stage
    ]:
        xbf = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        kbf = jnp.asarray(rng.normal(size=(*k, cin, cout)) * 0.05,
                          jnp.bfloat16)
        x8 = jnp.asarray(rng.integers(-127, 127, shape), jnp.int8)
        k8 = jnp.asarray(rng.integers(-127, 127, (*k, cin, cout)), jnp.int8)
        t, h, w = shape[1:4]
        cflops = 2 * shape[0] * t * h * w * cout * cin * k[0] * k[1] * k[2]

        def conv(x, kern, pt):
            return jax.lax.conv_general_dilated(
                x, kern, window_strides=(1, 1, 1),
                padding=[(k[0] - 1, 0), (k[1] // 2, k[1] // 2),
                         (k[2] // 2, k[2] // 2)],
                dimension_numbers=DN_3D, preferred_element_type=pt)

        t_bf = bench(lambda x, kk: conv(x, kk, jnp.float32), xbf, kbf)
        print(f'conv {shape} c{cin}->c{cout} bf16: {t_bf*1e3:.2f} ms, '
              f'{cflops/t_bf/1e12:.1f} TFLOP/s ({cflops/t_bf/197e12*100:.0f}% pk)')
        try:
            t_i8 = bench(lambda x, kk: conv(x, kk, jnp.int32), x8, k8)
            print(f'conv {shape} c{cin}->c{cout} int8: {t_i8*1e3:.2f} ms, '
                  f'{cflops/t_i8/1e12:.1f} TOP/s (speedup {t_bf/t_i8:.2f}x)')
        except Exception as e:  # noqa: BLE001
            print(f'conv int8 FAILED: {type(e).__name__}: '
                  f'{str(e).splitlines()[0][:120]}')


if __name__ == '__main__':
    main()
