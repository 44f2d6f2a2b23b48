"""Mixed-precision policy for TPU.

TPU-native replacement for the reference's ``accelerator.autocast`` AMP
(/root/reference/magvit2_pytorch/trainer.py:355,415,471). On TPU the idiomatic
policy is: parameters and optimizer state in float32, matmul/conv compute in
bfloat16, reductions and losses in float32. Modules thread ``policy.compute_dtype``
into their heavy ops; losses are always accumulated in float32.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    def cast_to_param(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.param_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )


def default_policy() -> Policy:
    """Backend-appropriate default: bf16 compute on TPU (the production
    policy — fp32 training on v5e runs at half MXU rate and doubles
    activation HBM), plain fp32 elsewhere (CPU tests, exact numerics)."""
    try:
        if jax.default_backend() == 'tpu':
            return bf16_policy()
    except Exception:  # pragma: no cover - backend probe never fails in tests
        pass
    return Policy()


def bf16_policy() -> Policy:
    """The TPU production policy: fp32 params, bf16 compute."""
    return Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16,
                  output_dtype=jnp.float32)
