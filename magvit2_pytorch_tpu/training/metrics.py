"""Evaluation metrics tied to the BASELINE.json north-star: reconstruction
PSNR and codebook utilization (plus per-batch code entropy)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(a, b, max_val: float = 1.0):
    """Peak signal-to-noise ratio between two [0, max_val] videos/images."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def codebook_utilization(indices, codebook_size: int):
    """Fraction of the codebook hit at least once in ``indices`` (int array,
    any shape). Computed with a scatter onto a one-hot histogram — O(K) memory,
    no sort; fine up to 2^18."""
    flat = indices.reshape(-1)
    counts = jnp.zeros((codebook_size,), jnp.int32).at[flat].add(1)
    return jnp.mean((counts > 0).astype(jnp.float32))


def code_entropy(indices, codebook_size: int):
    """Empirical entropy (nats) of the code distribution in the batch;
    max = log(codebook_size) at perfectly uniform usage."""
    flat = indices.reshape(-1)
    counts = jnp.zeros((codebook_size,), jnp.float32).at[flat].add(1.0)
    p = counts / jnp.maximum(flat.shape[0], 1)
    return -jnp.sum(jnp.where(p > 0, p * jnp.log(jnp.maximum(p, 1e-12)), 0.0))
