"""Exponential moving average of a param pytree.

First-party replacement for ``ema_pytorch.EMA`` (reference trainer.py:31,109;
SURVEY.md §2.9): one ``jax.tree.map`` lerp per update, fully jittable so it can
live inside the train step (the reference updates on host rank 0 only — on TPU
the EMA is just another replicated pytree).

Decay schedule matches ema_pytorch defaults: no updates before
``update_after_step``, update every ``update_every`` steps, decay ramp
``1 - (1 + k/inv_gamma)^(-power)`` clamped to [min_value, beta].
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    beta: float = 0.9999
    update_after_step: int = 100
    update_every: int = 10
    inv_gamma: float = 1.0
    power: float = 2.0 / 3.0
    min_value: float = 0.0


def ema_decay(step, config: EMAConfig):
    """Current decay value as a jnp scalar (step is the global train step)."""
    k = (step - config.update_after_step - 1).astype(jnp.float32)
    value = 1.0 - (1.0 + k / config.inv_gamma) ** (-config.power)
    value = jnp.clip(value, config.min_value, config.beta)
    return jnp.where(k <= 0.0, 0.0, value)


def ema_update(ema_params, params, step, config: EMAConfig = EMAConfig()):
    """Pure EMA step — call with the *global* step; handles warmup/cadence
    internally via jnp.where so it stays jittable."""
    step = jnp.asarray(step)
    decay = ema_decay(step, config)
    should_update = jnp.logical_or(
        step <= config.update_after_step,
        (step % config.update_every) == 0)
    # before update_after_step: track params exactly (decay=0 -> copy)
    eff_decay = jnp.where(should_update, decay, 1.0)

    def lerp(e, p):
        e32 = e.astype(jnp.float32)
        p32 = p.astype(jnp.float32)
        return (e32 * eff_decay + p32 * (1.0 - eff_decay)).astype(e.dtype)

    return jax.tree.map(lerp, ema_params, params)
