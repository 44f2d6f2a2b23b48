"""Axial rotary position embeddings (RoPE) for the tokenizer's attention.

A north-star extension (BASELINE.json: "spatial/temporal attention ... with
axial rotary embeddings"; the reference lists rotary as an unchecked TODO,
README.md:121-122):

- time attention: standard 1D RoPE over frame positions (with a position
  offset for kv-cache streaming chunks);
- space attention: axial 2D RoPE — the first half of each head's dim pairs
  rotates with the row index, the second half with the column index.

Learned memory-KV tokens stay unrotated (they carry no position); rotated
queries against them are norm-preserving, so the memory path is unaffected in
scale.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_angles(positions, dim: int, base: float = 10000.0):
    """positions: (n,) int/float -> (cos, sin) each (n, dim//2), fp32."""
    assert dim % 2 == 0
    half = dim // 2
    inv_freq = base ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.cos(angles), jnp.sin(angles)


def rope_angles_2d(h: int, w: int, dim: int, base: float = 10000.0):
    """Axial 2D angles for a flattened (h*w) row-major sequence: first dim//2
    pairs rotate with the row index, the rest with the column index.
    Returns (cos, sin) each (h*w, dim//2)."""
    assert dim % 4 == 0
    quarter = dim // 4
    rows = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
    cols = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)
    cos_r, sin_r = rope_angles(rows, 2 * quarter, base)
    cos_c, sin_c = rope_angles(cols, 2 * quarter, base)
    return (jnp.concatenate([cos_r, cos_c], axis=-1),
            jnp.concatenate([sin_r, sin_c], axis=-1))


def apply_rope(t, cos, sin):
    """Rotate consecutive pairs of the head dim. t: (b, n, heads, d);
    cos/sin: (n, d//2). Norm-preserving, fp32 rotation math."""
    b, n, heads, d = t.shape
    t32 = t.astype(jnp.float32).reshape(b, n, heads, d // 2, 2)
    t_even = t32[..., 0]
    t_odd = t32[..., 1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    rot_even = t_even * c - t_odd * s
    rot_odd = t_even * s + t_odd * c
    out = jnp.stack([rot_even, rot_odd], axis=-1).reshape(b, n, heads, d)
    return out.astype(t.dtype)
