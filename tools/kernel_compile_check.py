#!/usr/bin/env python
"""Fast real-TPU compile+run check for every fused Pallas kernel that is
default-engaged on the TPU path. Run FIRST when the tunnel returns: these
kernels were landed with interpret-mode tests only (tunnel was down), and a
Mosaic lowering failure would take down the driver's bench/compile checks."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == 'tpu', jax.default_backend()
C, H, D = 512, 8, 64

from magvit2_pytorch_tpu.ops.pallas.axial_attention import (
    _attention_block_xla, _time_block_xla,
    fused_attention_block, fused_time_attention_block)

k = jax.random.PRNGKey(0)
g1 = 1.0 + 0.1 * jax.random.normal(k, (C,), jnp.float32)
wqkv = 0.05 * jax.random.normal(k, (C, 3 * H * D), jnp.float32)
mem = jax.random.normal(k, (2, H, 4, D), jnp.float32)
wout = 0.05 * jax.random.normal(k, (H * D, C), jnp.float32)

for dt in (jnp.bfloat16, jnp.float32):
    cast = lambda t: t.astype(dt)
    x = jax.random.normal(k, (4, 256, C)).astype(dt)
    got = jax.jit(lambda x: fused_attention_block(
        x, cast(g1), cast(wqkv), cast(mem), cast(wout), H, D, False))(x)
    want = _attention_block_xla(x, cast(g1), cast(wqkv), cast(mem),
                                cast(wout), heads=H, dim_head=D)
    # f32 tolerance is loose because TPU matmuls default to bf16-ish
    # precision even for f32 inputs (both the kernel and the XLA twin do,
    # but their accumulation orders differ); measured 1.4e-3 on v5e.
    tol = 0.1 if dt == jnp.bfloat16 else 2e-2
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    print(f'space kernel {dt.__name__}: max abs err {err:.2e}')
    assert err < tol, err

    xt = jax.random.normal(k, (2, 5, 256, C)).astype(dt)
    got = jax.jit(lambda x: fused_time_attention_block(
        x, cast(g1), cast(wqkv), cast(mem), cast(wout), H, D, True))(xt)
    want = _time_block_xla(xt, cast(g1), cast(wqkv), cast(mem), cast(wout),
                           heads=H, dim_head=D, causal=True)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    print(f'time kernel {dt.__name__}: max abs err {err:.2e}')
    assert err < tol, err

print('KERNEL-COMPILE-CHECK PASSED')
