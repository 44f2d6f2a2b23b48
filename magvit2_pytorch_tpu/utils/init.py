"""Parameter initializers matching torch layer-init distributions.

The reference relies on torch's default ``kaiming_uniform_(a=sqrt(5))`` init for
``nn.Conv*``/``nn.Linear`` (bound = 1/sqrt(fan_in) for both kernel and bias).
Training-quality parity requires the same distributions, so we provide flax
initializers reproducing them. Specific layers in the reference override init
(e.g. replicate-N kaiming for upsamplers, magvit2_pytorch.py:829-836) — those
live next to their modules.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fan_in_from_shape(shape):
    # conv kernels are (..., in_features, out_features); dense are (in, out).
    # In both layouts fan_in = prod(shape[:-1]).
    fan_in = 1
    for s in shape[:-1]:
        fan_in *= s
    return max(fan_in, 1)


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) == torch kaiming_uniform_(a=sqrt(5))."""
    bound = 1.0 / math.sqrt(_fan_in_from_shape(shape))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(max(fan_in, 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def kaiming_uniform_init(key, shape, dtype=jnp.float32):
    """torch ``nn.init.kaiming_uniform_`` with default a=0 (leaky-relu gain sqrt(2)).

    Used by the depth-to-space upsampler replicate-init
    (reference magvit2_pytorch.py:829-836).
    """
    fan_in = _fan_in_from_shape(shape)
    gain = math.sqrt(2.0)
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def kaiming_normal_selu_init(key, shape, dtype=jnp.float32):
    """torch ``kaiming_normal_(mode='fan_in', nonlinearity='selu')`` (gain =
    3/4) — the Conv3DMod weight init (reference magvit2_pytorch.py:712)."""
    fan_in = _fan_in_from_shape(shape)
    std = (3.0 / 4.0) / math.sqrt(fan_in)
    return jax.random.normal(key, shape, dtype) * std
