"""Wide fused Pallas ResidualUnit kernel (ops/pallas/residual_unit_wide.py).

Three-level equivalence, all in interpret mode on the CPU mesh:
  1. kernel (interpret) == `_residual_unit_xla_plain` (the XLA twin)
  2. XLA twin == the module ResidualUnit (+x incl.) with its own init params
  3. custom VJP grads == grads through the twin (exact: the VJP recomputes
     through the twin)
Reference semantics: ResidualUnit at magvit2_pytorch.py:930-944.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magvit2_pytorch_tpu.ops.pallas.residual_unit_wide import (
    _residual_unit_xla_plain, fused_residual_unit_wide)
from magvit2_pytorch_tpu.ops.resample import ResidualUnit


C = 128
HIDDEN = max(16, C // 2)  # SqueezeExcite dim_hidden = max(dim_hidden_min, c//2)


def _params(key, dtype=jnp.float32, c=C):
    hidden = max(16, c // 2)
    ks = jax.random.split(key, 11)
    p = dict(
        conv_k=jax.random.normal(ks[0], (3, 3, 3, c, c)) * 0.05,
        conv_b=jax.random.normal(ks[1], (c,)) * 0.1,
        pw_k=jax.random.normal(ks[2], (c, c)) * 0.09,
        pw_b=jax.random.normal(ks[3], (c,)) * 0.1,
        tok_k=jax.random.normal(ks[4], (c, 1)) * 0.3,
        tok_b=jax.random.normal(ks[5], (1,)) * 0.1,
        gi_k=jax.random.normal(ks[6], (c, hidden)) * 0.15,
        gi_b=jax.random.normal(ks[7], (hidden,)) * 0.1,
        go_k=jax.random.normal(ks[8], (hidden, c)) * 0.15,
        go_b=jax.random.normal(ks[9], (c,)) * 0.1 - 2.0,
    )
    return {k: v.astype(dtype) for k, v in p.items()}


def _args(p):
    return (p['conv_k'], p['conv_b'], p['pw_k'], p['pw_b'], p['tok_k'],
            p['tok_b'], p['gi_k'], p['gi_b'], p['go_k'], p['go_b'])


@pytest.mark.parametrize('shape', [(2, 3, 16, 8), (1, 4, 8, 16)])
@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_kernel_matches_xla_twin(shape, dtype):
    b, t, h, w = shape
    p = _params(jax.random.PRNGKey(0), dtype)
    x = (jax.random.normal(jax.random.PRNGKey(1), (b, t, h, w, C))
         .astype(dtype))

    got = fused_residual_unit_wide(x, *_args(p), True)  # interpret
    want = _residual_unit_xla_plain(x, *_args(p))
    # bf16: the kernel sums the 27 taps in (dt,dh)-then-dw order vs the
    # conv's contraction order — rare single-element outliers are rounding
    tol, atol = (1e-5, 1e-5) if dtype == jnp.float32 else (3e-2, 6e-2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=atol)


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_kernel_c64_pair_taps(dtype):
    """The 64-channel stem stage: tap-paired K=128 contraction path."""
    c = 64
    p = _params(jax.random.PRNGKey(20), dtype, c=c)
    x = (jax.random.normal(jax.random.PRNGKey(21), (2, 3, 16, 8, c))
         .astype(dtype))
    got = fused_residual_unit_wide(x, *_args(p), True)
    want = _residual_unit_xla_plain(x, *_args(p))
    tol, atol = (1e-5, 1e-5) if dtype == jnp.float32 else (3e-2, 6e-2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=atol)


def test_module_fused_wiring_c64(monkeypatch):
    """Module wiring at C=64 (the stem stage the pair-tap path targets)."""
    import magvit2_pytorch_tpu.ops.pallas.residual_unit_wide as ruw
    import magvit2_pytorch_tpu.ops.resample as resample

    mod = ResidualUnit(64, 3)
    x = jax.random.normal(jax.random.PRNGKey(22), (1, 3, 16, 8, 64))
    params = mod.init(jax.random.PRNGKey(23), x)
    want = mod.apply(params, x)

    fake = lambda x, dim, ks, streaming: not streaming
    monkeypatch.setattr(ruw, 'wide_eligible', fake)
    monkeypatch.setattr(resample, 'wide_eligible', fake, raising=False)
    got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_kernel_c256():
    """The 256-channel stage shape (R=8 path via h=8)."""
    c = 256
    p = _params(jax.random.PRNGKey(2), c=c)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 8, 8, c))
    got = fused_residual_unit_wide(x, *_args(p), True)
    want = _residual_unit_xla_plain(x, *_args(p))
    # f32 tap-order-vs-conv-contraction-order accumulation noise at depth 256
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_kernel_batch_ring_reset():
    """Frames of batch element b>0 must not see b-1's ring slots."""
    p = _params(jax.random.PRNGKey(4))
    x1 = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 16, 8, C))
    x2 = jax.random.normal(jax.random.PRNGKey(6), (1, 3, 16, 8, C))
    both = jnp.concatenate([x1, x2], axis=0)
    got = fused_residual_unit_wide(both, *_args(p), True)
    solo = fused_residual_unit_wide(x2, *_args(p), True)
    np.testing.assert_allclose(np.asarray(got[1:]), np.asarray(solo),
                               rtol=1e-5, atol=1e-5)


def test_twin_matches_module():
    """XLA twin == product ResidualUnit (incl. its +x) with the module's own
    initialized params."""
    mod = ResidualUnit(C, 3)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 3, 16, 8, C))
    params = mod.init(jax.random.PRNGKey(8), x)
    want = mod.apply(params, x)

    inner = params['params']['fn']
    args = (inner['conv']['kernel'], inner['conv']['bias'],
            inner['conv_pointwise']['kernel'], inner['conv_pointwise']['bias'],
            inner['se']['to_k']['kernel'], inner['se']['to_k']['bias'],
            inner['se']['gate_in']['kernel'], inner['se']['gate_in']['bias'],
            inner['se']['gate_out']['kernel'], inner['se']['gate_out']['bias'])
    got = _residual_unit_xla_plain(x, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_module_fused_wiring_matches_unfused(monkeypatch):
    """Force the eligibility gate on (it requires a TPU backend) and check
    the module's fused wiring — params pulled via _params, interpret kernel —
    against the module's unfused path."""
    import magvit2_pytorch_tpu.ops.pallas.residual_unit_wide as ruw
    import magvit2_pytorch_tpu.ops.resample as resample

    mod = ResidualUnit(C, 3)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 3, 16, 8, C))
    params = mod.init(jax.random.PRNGKey(10), x)
    want = mod.apply(params, x)          # gate off on CPU -> unfused

    real = ruw.wide_eligible
    fake = lambda x, dim, ks, streaming: not streaming
    monkeypatch.setattr(ruw, 'wide_eligible', fake)
    monkeypatch.setattr(resample, 'wide_eligible', fake, raising=False)
    got = mod.apply(params, x)           # fused wiring, interpret kernel
    monkeypatch.setattr(ruw, 'wide_eligible', real)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_vjp_exact_vs_twin():
    p = _params(jax.random.PRNGKey(11))
    x = jax.random.normal(jax.random.PRNGKey(12), (1, 3, 16, 8, C))

    def loss_fused(x, p):
        out = fused_residual_unit_wide(x, *_args(p), True)
        return jnp.sum(out ** 2)

    def loss_twin(x, p):
        out = _residual_unit_xla_plain(x, *_args(p))
        return jnp.sum(out ** 2)

    # The VJP itself recomputes through the twin, but the incoming cotangent
    # (2*out) carries the kernel-vs-twin forward reduction-order delta, so
    # compare at slightly loosened f32 tolerance.
    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gx_t, gp_t = jax.grad(loss_twin, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_t),
                               rtol=1e-2, atol=1e-3)
    for k in gp_f:
        np.testing.assert_allclose(np.asarray(gp_f[k]), np.asarray(gp_t[k]),
                                   rtol=1e-2, atol=1e-3, err_msg=k)
