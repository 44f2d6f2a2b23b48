"""Optimizer factory — optax rebuild of reference optimizer.py:12-42.

Semantics preserved: Adam when weight-decay is 0, else AdamW with decoupled
decay; with ``group_wd_params`` (default) parameters of ndim < 2 (biases,
norm gains) are excluded from weight decay (reference
separate_weight_decayable_params, optimizer.py:3-10). Warmup is an optax
schedule instead of the reference's pytorch-warmup dampening
(trainer.py:159-162)."""

from __future__ import annotations

from typing import Optional

import jax
import optax

from magvit2_pytorch_tpu.utils.helpers import exists


def wd_mask(params):
    return jax.tree.map(lambda p: p.ndim >= 2, params)


def get_optimizer(
    lr: float = 1e-4,
    wd: float = 1e-2,
    betas=(0.9, 0.99),
    eps: float = 1e-8,
    group_wd_params: bool = True,
    warmup_steps: int = 0,
    max_grad_norm: Optional[float] = None,
    scheduler=None,
    skip_nonfinite_updates: bool = True,
) -> optax.GradientTransformation:
    """``skip_nonfinite_updates`` mirrors accelerate's skipped-step detection
    (reference trainer.py:379,440): a step whose gradients contain NaN/inf is
    dropped instead of poisoning the params."""
    b1, b2 = betas

    if exists(scheduler):
        learning_rate = scheduler
    elif warmup_steps > 1:
        learning_rate = optax.linear_schedule(
            init_value=lr / warmup_steps, end_value=lr,
            transition_steps=warmup_steps)
    else:
        learning_rate = lr

    if wd == 0:
        tx = optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)
    else:
        tx = optax.adamw(
            learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=wd,
            mask=wd_mask if group_wd_params else None)

    if exists(max_grad_norm):
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)

    if skip_nonfinite_updates:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10)

    return tx
