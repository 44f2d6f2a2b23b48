"""GateLoop: data-dependent gated linear recurrence over time.

First-party JAX equivalent of the external ``gateloop_transformer.
SimpleGateLoopLayer`` the reference plugs in for the ``'gateloop_time'`` layer
(magvit2_pytorch.py:32,1216-1222; GateLoop arXiv 2311.01927, simplified
diagonal-state variant). The recurrence

    s_t = a_t * s_{t-1} + k_t * v_t        (elementwise, diagonal state)
    o_t = q_t * s_t

is computed with ``jax.lax.associative_scan`` — O(log T) depth on TPU instead
of a sequential loop, exactly the pattern SURVEY.md §2.9 prescribes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from magvit2_pytorch_tpu.ops.basic import Linear


def gated_linear_recurrence(a, x, initial_state=None):
    """Computes s_t = a_t * s_{t-1} + x_t along axis 1 via associative scan.

    a, x: (b, t, d). ``initial_state``: optional (b, d) carried state s_0 for
    chunked streaming. Returns s: (b, t, d).
    """

    def combine(carry1, carry2):
        a1, b1 = carry1
        a2, b2 = carry2
        return a1 * a2, a2 * b1 + b2

    cum_a, s = jax.lax.associative_scan(combine, (a, x), axis=1)
    if initial_state is not None:
        s = s + cum_a * initial_state[:, None, :]
    return s


class SimpleGateLoopLayer(nn.Module):
    """Sequence layer ``(B, N, C) -> (B, N, C)`` with per-channel
    data-dependent forget gates. ``use_heinsen`` kept for signature parity with
    the reference's external dep (both paths compute the same recurrence; the
    heinsen log-space path trades accuracy for fewer flops — on TPU the
    associative scan is already optimal, so it is the only implementation)."""

    dim: int
    use_heinsen: bool = False

    @nn.compact
    def __call__(self, x, streaming: bool = False):
        qkva = Linear(self.dim * 4, use_bias=False, name='to_qkva')(x)
        q, k, v, a = jnp.split(qkva, 4, axis=-1)

        a = jax.nn.sigmoid(a.astype(jnp.float32))
        kv = (k * v).astype(jnp.float32)

        if streaming:
            # carried recurrence state: chunked calls == one long scan
            cache = self.variable(
                'cache', 'scan_state',
                lambda: jnp.zeros((x.shape[0], self.dim), jnp.float32))
            s = gated_linear_recurrence(a, kv, initial_state=cache.value)
            cache.value = s[:, -1]
        else:
            s = gated_linear_recurrence(a, kv)
        out = (q.astype(jnp.float32) * s).astype(x.dtype)

        return Linear(self.dim, use_bias=False, name='to_out')(out)


class ToTimeSequence(nn.Module):
    """Adapter: apply a sequence fn over the time axis per spatial position
    (reference ToTimeSequence, magvit2_pytorch.py:178-191).
    (b, t, h, w, c) -> fn on (b*h*w, t, c) -> back."""

    fn: nn.Module

    @nn.compact
    def __call__(self, x, **kwargs):
        b, t, h, w, c = x.shape
        seq = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
        out = self.fn(seq, **kwargs)
        return out.reshape(b, h, w, t, -1).transpose(0, 3, 1, 2, 4)
