"""Fused Pallas ResidualUnit kernel (ops/pallas/residual_unit.py).

Three-level equivalence, all in interpret mode on the CPU mesh:
  1. kernel (interpret) == `_residual_unit_xla_blocked` (the XLA twin)
  2. XLA twin on packed x == the module ResidualUnit on unblocked x (+x incl.)
  3. custom VJP grads == grads through the twin (exact: the VJP recomputes
     through the twin)
Reference semantics: ResidualUnit at magvit2_pytorch.py:930-944.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magvit2_pytorch_tpu.ops.conv import w_block, w_unblock
from magvit2_pytorch_tpu.ops.pallas.residual_unit import (
    _residual_unit_xla_blocked, fused_residual_unit)
from magvit2_pytorch_tpu.ops.resample import ResidualUnit


C = 64
HIDDEN = max(4, C // 2)  # SqueezeExcite dim_hidden = max(dim_hidden_min, c//2)


def _params(key, dtype=jnp.float32):
    ks = jax.random.split(key, 11)
    p = dict(
        conv_k=jax.random.normal(ks[0], (3, 3, 3, C, C)) * 0.08,
        conv_b=jax.random.normal(ks[1], (C,)) * 0.1,
        pw_k=jax.random.normal(ks[2], (C, C)) * 0.12,
        pw_b=jax.random.normal(ks[3], (C,)) * 0.1,
        tok_k=jax.random.normal(ks[4], (C, 1)) * 0.3,
        tok_b=jax.random.normal(ks[5], (1,)) * 0.1,
        gi_k=jax.random.normal(ks[6], (C, HIDDEN)) * 0.2,
        gi_b=jax.random.normal(ks[7], (HIDDEN,)) * 0.1,
        go_k=jax.random.normal(ks[8], (HIDDEN, C)) * 0.2,
        go_b=jax.random.normal(ks[9], (C,)) * 0.1 - 2.0,
    )
    return {k: v.astype(dtype) for k, v in p.items()}


def _args(p):
    return (p['conv_k'], p['conv_b'], p['pw_k'], p['pw_b'], p['tok_k'],
            p['tok_b'], p['gi_k'], p['gi_b'], p['go_k'], p['go_b'])


@pytest.mark.parametrize('shape', [(2, 3, 16, 4), (1, 4, 32, 8)])
@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_kernel_matches_xla_twin(shape, dtype):
    b, t, h, w2 = shape
    key = jax.random.PRNGKey(0)
    p = _params(key, dtype)
    xb = (jax.random.normal(jax.random.PRNGKey(1), (b, t, h, w2, 2 * C))
          .astype(dtype))

    got = fused_residual_unit(xb, *_args(p), True)  # interpret
    want = _residual_unit_xla_blocked(xb, *_args(p))
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


def test_kernel_batch_ring_reset():
    """Frames of batch element b>0 must not see b-1's ring slots."""
    p = _params(jax.random.PRNGKey(2))
    x1 = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 16, 4, 2 * C))
    x2 = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 16, 4, 2 * C))
    both = jnp.concatenate([x1, x2], axis=0)
    got = fused_residual_unit(both, *_args(p), True)
    solo = fused_residual_unit(x2, *_args(p), True)
    np.testing.assert_allclose(np.asarray(got[1:]), np.asarray(solo),
                               rtol=1e-5, atol=1e-5)


def test_twin_matches_module():
    """XLA twin on w-blocked x == product ResidualUnit (incl. its +x) on
    unblocked x, with the module's own initialized params."""
    mod = ResidualUnit(C, 3)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 16, 8, C))
    params = mod.init(jax.random.PRNGKey(6), x)
    want = mod.apply(params, x)

    inner = params['params']['fn']
    args = (inner['conv']['kernel'], inner['conv']['bias'],
            inner['conv_pointwise']['kernel'], inner['conv_pointwise']['bias'],
            inner['se']['to_k']['kernel'], inner['se']['to_k']['bias'],
            inner['se']['gate_in']['kernel'], inner['se']['gate_in']['bias'],
            inner['se']['gate_out']['kernel'], inner['se']['gate_out']['bias'])
    got = w_unblock(_residual_unit_xla_blocked(w_block(x), *args))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_module_fused_wiring_matches_unfused(monkeypatch):
    """Force the eligibility gate on (it requires a TPU backend) and check
    the module's fused wiring — params pulled via _params, pack/unpack
    reshapes, interpret kernel — against the module's unfused path."""
    import magvit2_pytorch_tpu.ops.pallas.residual_unit as ru

    mod = ResidualUnit(C, 3)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 3, 16, 8, C))
    params = mod.init(jax.random.PRNGKey(10), x)
    want = mod.apply(params, x)          # gate off on CPU -> unfused

    real = ru.fused_eligible
    monkeypatch.setattr(
        ru, 'fused_eligible',
        lambda x, dim, ks, streaming, w_blocked: not streaming)
    got = mod.apply(params, x)           # fused wiring, interpret kernel
    monkeypatch.setattr(ru, 'fused_eligible', real)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_vjp_exact_vs_twin():
    p = _params(jax.random.PRNGKey(7))
    xb = jax.random.normal(jax.random.PRNGKey(8), (1, 3, 16, 4, 2 * C))

    def loss_fused(xb, p):
        out = fused_residual_unit(xb, *_args(p), True)
        return jnp.sum(out ** 2)

    def loss_twin(xb, p):
        out = _residual_unit_xla_blocked(xb, *_args(p))
        return jnp.sum(out ** 2)

    # The VJP itself recomputes through the twin, but the incoming cotangent
    # (2*out) carries the kernel-vs-twin forward reduction-order delta, so
    # compare at slightly loosened f32 tolerance.
    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(xb, p)
    gx_t, gp_t = jax.grad(loss_twin, argnums=(0, 1))(xb, p)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_t),
                               rtol=1e-2, atol=1e-3)
    for k in gp_f:
        np.testing.assert_allclose(np.asarray(gp_f[k]), np.asarray(gp_t[k]),
                                   rtol=1e-2, atol=1e-3, err_msg=k)


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_kernel_unpacked_io_matches_packed(dtype):
    """packed_io=False (r4): the kernel consumes/produces the UNPACKED
    (B,T,H,W,C) layout, packing in VMEM — results must equal the packed
    kernel on the w-blocked view of the same data, and its VJP must equal
    grads through the twin (mod the forward's reduction-order delta)."""
    p = _params(jax.random.PRNGKey(11), dtype)
    x = (jax.random.normal(jax.random.PRNGKey(12), (2, 3, 16, 8, C))
         .astype(dtype))

    got = fused_residual_unit(x, *_args(p), True, False)   # unpacked io
    want = w_unblock(fused_residual_unit(w_block(x), *_args(p), True))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def loss_unpacked(x, p):
        return jnp.sum(fused_residual_unit(x, *_args(p), True, False)
                       .astype(jnp.float32) ** 2)

    def loss_twin(x, p):
        out = w_unblock(_residual_unit_xla_blocked(w_block(x), *_args(p)))
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g1 = jax.grad(loss_unpacked)(x, p)
    g2 = jax.grad(loss_twin)(x, p)
    # bf16: the incoming cotangent (2*out) carries the kernel-vs-twin
    # forward reduction-order delta, which the conv then amplifies on a few
    # elements — compare against the gradient's own scale
    a1, a2 = np.asarray(g1, np.float32), np.asarray(g2, np.float32)
    scale = np.abs(a2).max()
    tol = 2e-3 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(a1 / scale, a2 / scale, atol=tol)
