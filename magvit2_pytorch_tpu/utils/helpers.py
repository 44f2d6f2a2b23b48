"""Small option/tensor helpers.

TPU-native rebuild of the helper layer of the reference
(/root/reference/magvit2_pytorch/magvit2_pytorch.py:42-98). Everything here is
framework-agnostic pure Python / jax.numpy; no torch.
"""

from __future__ import annotations

import jax.numpy as jnp


def exists(v):
    return v is not None


def default(v, d):
    return v if exists(v) else d


def identity(t, *args, **kwargs):
    return t


def pair(t):
    return t if isinstance(t, tuple) else (t, t)


def cast_tuple(t, length: int = 1):
    return t if isinstance(t, tuple) else ((t,) * length)


def divisible_by(num, den) -> bool:
    return (num % den) == 0


def is_odd(n) -> bool:
    return not divisible_by(n, 2)


def safe_get_index(it, ind, default=None):
    if ind < len(it):
        return it[ind]
    return default


def l2norm(t, axis: int = -1, eps: float = 1e-12):
    """L2-normalize along ``axis`` (matches F.normalize(p=2) semantics,
    reference magvit2_pytorch.py:83-84)."""
    norm = jnp.linalg.norm(t, axis=axis, keepdims=True)
    return t / jnp.maximum(norm, eps)


def append_dims(t, ndims: int):
    """Right-broadcast reshape (reference magvit2_pytorch.py:68-69)."""
    return t.reshape(*t.shape, *((1,) * ndims))
