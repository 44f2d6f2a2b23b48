#!/usr/bin/env python
"""Microbenchmark: Pallas flash attention vs the XLA einsum path at the
sequence lengths the tokenizer actually uses (VERDICT round-1 item: the flash
dispatch threshold n>=2048 was asserted from profiling but the evidence was
never committed — this produces it).

Shapes swept: the flagship 16^2 space attention (n=256, d=32), the 256px
32^2 one (n=1024), time attention (n=5..20), and the >=2048 regime where the
kernel is expected to win.

Usage: python tools/attn_bench.py
Prints one JSON line per (shape, backend).
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def bench_one(b, h, n, d, backend, causal=False, iters=50):
    import jax
    import jax.numpy as jnp

    from magvit2_pytorch_tpu.ops.attend import attend

    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32),
                           dtype=jnp.bfloat16) for _ in range(3))

    @jax.jit
    def run(q, k, v):
        # chained: each iteration consumes the previous output so XLA cannot
        # hoist the attention out of the loop
        def body(i, cur):
            return attend(cur + i * 1e-6, k, v, causal=causal,
                          backend=backend, layout='bnhd').astype(cur.dtype)
        return jax.lax.fori_loop(0, iters, body, q)

    out = run(q, k, v)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(q, k, v)
    jax.block_until_ready(out)
    elapsed = (time.perf_counter() - t0) / iters
    return elapsed


def main():
    shapes = [
        # (b, h, n, d, causal, label)
        (640, 8, 256, 32, False, 'flagship 16^2 space (b=128x5)'),
        (128, 8, 1024, 32, False, '256px 32^2 space'),
        (32768, 8, 8, 64, True, 'flagship time attention (s=16^2, t=5->8)'),
        (16, 8, 2048, 64, False, 'large seq 2048'),
        (8, 8, 4096, 64, False, 'large seq 4096'),
        (2, 8, 8192, 64, False, 'large seq 8192'),
    ]
    for b, h, n, d, causal, label in shapes:
        row = {'label': label, 'b': b, 'h': h, 'n': n, 'd': d,
               'causal': causal}
        for backend in ('xla', 'flash'):
            try:
                row[backend + '_ms'] = round(
                    bench_one(b, h, n, d, backend, causal) * 1e3, 3)
            except Exception as e:  # noqa: BLE001
                row[backend + '_ms'] = f'error: {type(e).__name__}'
        print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
