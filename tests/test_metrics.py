"""North-star metrics: PSNR, codebook utilization, code entropy; non-finite
update skipping in the optimizer."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from magvit2_pytorch_tpu.training.metrics import (
    code_entropy,
    codebook_utilization,
    psnr,
)
from magvit2_pytorch_tpu.training.optimizer import get_optimizer


def test_psnr():
    a = jnp.zeros((4, 4))
    assert float(psnr(a, a)) > 100  # identical -> clamped-high PSNR
    b = jnp.ones((4, 4)) * 0.1
    # mse = 0.01 -> psnr = 20
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)


def test_codebook_utilization():
    idx = jnp.asarray([0, 1, 2, 3, 0, 1])
    assert float(codebook_utilization(idx, 8)) == 0.5
    assert float(codebook_utilization(idx, 4)) == 1.0


def test_code_entropy():
    uniform = jnp.arange(16)
    np.testing.assert_allclose(
        float(code_entropy(uniform, 16)), np.log(16), rtol=1e-5)
    constant = jnp.zeros((16,), jnp.int32)
    np.testing.assert_allclose(float(code_entropy(constant, 16)), 0.0,
                               atol=1e-6)


def test_optimizer_skips_nonfinite_updates():
    params = {'w': jnp.ones((2,))}
    tx = get_optimizer(lr=0.1, wd=0.0, warmup_steps=0)
    state = tx.init(params)

    bad_grads = {'w': jnp.asarray([jnp.nan, 1.0])}
    updates, state = tx.update(bad_grads, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(new['w']), 1.0)  # step skipped

    good_grads = {'w': jnp.ones((2,))}
    updates, state = tx.update(good_grads, state, params)
    new = optax.apply_updates(params, updates)
    assert np.abs(np.asarray(new['w']) - 1.0).max() > 0  # step applied
