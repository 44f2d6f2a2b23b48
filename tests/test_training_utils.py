"""Optimizer factory (wd-mask parity with reference optimizer.py), EMA decay
schedule (ema_pytorch semantics), precision policy, VGG adaptive pooling vs
torch, native batch ops."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch
import torch.nn.functional as F

from magvit2_pytorch_tpu.models.vgg import adaptive_avg_pool_2d
from magvit2_pytorch_tpu.training.ema import EMAConfig, ema_decay, ema_update
from magvit2_pytorch_tpu.training.optimizer import get_optimizer, wd_mask
from magvit2_pytorch_tpu.utils.precision import bf16_policy


def test_wd_mask_excludes_low_ndim():
    params = {
        'kernel': jnp.zeros((3, 4)),
        'bias': jnp.zeros((4,)),
        'nested': {'gamma': jnp.zeros((8,)), 'w': jnp.zeros((2, 2, 3, 4))},
    }
    mask = wd_mask(params)
    assert mask['kernel'] is True
    assert mask['bias'] is False
    assert mask['nested']['gamma'] is False
    assert mask['nested']['w'] is True


def test_optimizer_weight_decay_only_on_matrices():
    """With zero gradients, AdamW moves only the wd-masked params."""
    params = {'w': jnp.ones((2, 2)), 'b': jnp.ones((2,))}
    tx = get_optimizer(lr=0.1, wd=0.5, warmup_steps=0)
    state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert float(jnp.abs(new['w'] - 1).max()) > 0    # decayed
    np.testing.assert_allclose(np.asarray(new['b']), 1.0)  # not decayed


def test_optimizer_adam_when_no_wd():
    params = {'w': jnp.ones((2, 2))}
    tx = get_optimizer(lr=0.1, wd=0.0, warmup_steps=0)
    state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(new['w']), 1.0)  # pure adam, no decay


def test_ema_schedule():
    cfg = EMAConfig(beta=0.9999, update_after_step=10, update_every=1)
    # before update_after_step: decay 0 (copy params)
    assert float(ema_decay(jnp.asarray(5), cfg)) == 0.0
    # long after: decay ~ beta
    assert abs(float(ema_decay(jnp.asarray(10_000_000), cfg)) - 0.9999) < 1e-4
    # monotonic ramp
    d1 = float(ema_decay(jnp.asarray(20), cfg))
    d2 = float(ema_decay(jnp.asarray(200), cfg))
    assert 0 < d1 < d2 < 0.9999


def test_ema_update_tracks():
    cfg = EMAConfig(beta=0.5, update_after_step=0, update_every=1)
    ema = {'w': jnp.zeros((2,))}
    params = {'w': jnp.ones((2,))}
    ema = ema_update(ema, params, jnp.asarray(100), cfg)
    # decay clamps to beta=0.5 quickly -> ema = 0.5*0 + 0.5*1
    np.testing.assert_allclose(np.asarray(ema['w']), 0.5, atol=1e-2)


def test_bf16_policy_casts_floats_only():
    p = bf16_policy()
    tree = {'w': jnp.ones((2,), jnp.float32), 'i': jnp.ones((2,), jnp.int32)}
    out = p.cast_to_compute(tree)
    assert out['w'].dtype == jnp.bfloat16
    assert out['i'].dtype == jnp.int32


def test_adaptive_avg_pool_matches_torch():
    rng = np.random.default_rng(0)
    for in_hw in [(4, 4), (7, 7), (9, 5), (14, 14)]:
        x = rng.normal(size=(2, *in_hw, 3)).astype(np.float32)
        ours = adaptive_avg_pool_2d(jnp.asarray(x), (7, 7))
        ref = F.adaptive_avg_pool2d(
            torch.tensor(x.transpose(0, 3, 1, 2)), (7, 7))
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1), atol=1e-5,
            err_msg=f'in_hw={in_hw}')


def test_native_batch_ops_fallback_and_parity():
    from magvit2_pytorch_tpu.native import assemble_batch, normalize_u8

    rng = np.random.default_rng(1)
    frames = (rng.uniform(size=(3, 4, 4, 3)) * 255).astype(np.uint8)
    out = normalize_u8(frames)
    np.testing.assert_allclose(out, frames.astype(np.float32) / 255.0,
                               atol=1e-6)

    videos = [(rng.uniform(size=(2, 4, 4, 3)) * 255).astype(np.uint8)
              for _ in range(3)]
    batch = assemble_batch(videos, num_threads=2)
    ref = np.stack([v.astype(np.float32) / 255.0 for v in videos])
    np.testing.assert_allclose(batch, ref, atol=1e-6)
