"""Fused Pallas small-n attention block (ops/pallas/axial_attention.py).

Three-level equivalence, interpret mode on CPU:
  1. kernel (interpret) == `_attention_block_xla` (the XLA twin)
  2. XLA twin == the product Attention module (same params, fused gate off)
  3. custom VJP grads == grads through the twin
Reference semantics: Attention at magvit2_pytorch.py:327-388 with memory KV,
right-aligned causal masking per attend.py:109-129.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magvit2_pytorch_tpu.ops.attention import Attention
from magvit2_pytorch_tpu.ops.pallas.axial_attention import (
    _attention_block_xla, fused_attention_block)

C, HEADS, DH = 128, 4, 32
INNER = HEADS * DH


def _params(key, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return dict(
        g1=1.0 + 0.1 * jax.random.normal(ks[0], (C,)).astype(dtype),
        wqkv=(jax.random.normal(ks[1], (C, 3 * INNER)) * 0.05).astype(dtype),
        mem_kv=jax.random.normal(ks[2], (2, HEADS, 4, DH)).astype(dtype),
        wout=(jax.random.normal(ks[3], (INNER, C)) * 0.05).astype(dtype),
    )


@pytest.mark.parametrize('shape', [(3, 16), (2, 64)])
@pytest.mark.parametrize('causal', [False, True])
@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_kernel_matches_xla_twin(shape, causal, dtype):
    bt, n = shape
    p = _params(jax.random.PRNGKey(0), dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (bt, n, C)).astype(dtype)

    got = fused_attention_block(x, p['g1'], p['wqkv'], p['mem_kv'], p['wout'],
                                HEADS, DH, causal, True)   # interpret
    want = _attention_block_xla(x, p['g1'], p['wqkv'], p['mem_kv'], p['wout'],
                                heads=HEADS, dim_head=DH, causal=causal)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


def test_twin_matches_module():
    """XLA twin == product Attention (minus the module's residual — the
    Attention module itself has none) with the module's own params."""
    mod = Attention(dim=C, heads=HEADS, dim_head=DH)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, C))
    params = mod.init(jax.random.PRNGKey(3), x)['params']
    want = mod.apply({'params': params}, x)

    got = _attention_block_xla(
        x, params['norm']['gamma'], params['to_qkv']['kernel'],
        params['mem_kv'], params['to_out']['kernel'],
        heads=HEADS, dim_head=DH, causal=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_module_fused_wiring_matches_unfused(monkeypatch):
    """Force the gate on (it requires TPU) and check the module's fused
    wiring — params via _params, interpret kernel — against the XLA path."""
    import magvit2_pytorch_tpu.ops.pallas.axial_attention as ax

    mod = Attention(dim=C, heads=HEADS, dim_head=DH)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, C))
    params = mod.init(jax.random.PRNGKey(5), x)
    want = mod.apply(params, x)          # gate off on CPU -> XLA path

    monkeypatch.setattr(ax, 'fused_eligible', lambda *a, **k: True)
    got = mod.apply(params, x)           # fused wiring, interpret kernel
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_vjp_exact_vs_twin():
    p = _params(jax.random.PRNGKey(6))
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, C))

    def loss_fused(x, p):
        out = fused_attention_block(x, p['g1'], p['wqkv'], p['mem_kv'],
                                    p['wout'], HEADS, DH, False, True)
        return jnp.sum(out ** 2)

    def loss_twin(x, p):
        out = _attention_block_xla(x, p['g1'], p['wqkv'], p['mem_kv'],
                                   p['wout'], heads=HEADS, dim_head=DH)
        return jnp.sum(out ** 2)

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gx_t, gp_t = jax.grad(loss_twin, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_t),
                               rtol=1e-2, atol=1e-3)
    for k in gp_f:
        np.testing.assert_allclose(np.asarray(gp_f[k]), np.asarray(gp_t[k]),
                                   rtol=1e-2, atol=1e-3, err_msg=k)


# -- time-axis variant (layout-native attend_time) ----------------------------

from magvit2_pytorch_tpu.ops.pallas.axial_attention import (  # noqa: E402
    _time_block_xla, fused_time_attention_block)


@pytest.mark.parametrize('shape', [(2, 5, 32), (1, 4, 64)])
@pytest.mark.parametrize('causal', [True, False])
@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_time_kernel_matches_twin(shape, causal, dtype):
    b, t, s = shape
    p = _params(jax.random.PRNGKey(10), dtype)
    x = jax.random.normal(jax.random.PRNGKey(11), (b, t, s, C)).astype(dtype)

    got = fused_time_attention_block(
        x, p['g1'], p['wqkv'], p['mem_kv'], p['wout'], HEADS, DH, causal,
        True)  # interpret
    want = _time_block_xla(x, p['g1'], p['wqkv'], p['mem_kv'], p['wout'],
                           heads=HEADS, dim_head=DH, causal=causal)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


def test_time_module_fused_wiring_matches_unfused(monkeypatch):
    """TimeAttention with the gate forced on (interpret kernel) must equal
    its default XLA path, sharing one param tree."""
    import magvit2_pytorch_tpu.ops.pallas.axial_attention as ax
    from magvit2_pytorch_tpu.ops.attention import TimeAttention

    mod = TimeAttention(dim=C, heads=HEADS, dim_head=DH, causal=True)
    x = jax.random.normal(jax.random.PRNGKey(12), (2, 5, 4, 8, C))
    params = mod.init(jax.random.PRNGKey(13), x)
    want = mod.apply(params, x)          # gate off on CPU -> XLA path

    monkeypatch.setattr(ax, 'fused_time_eligible', lambda *a, **k: True)
    got = mod.apply(params, x)           # fused wiring, interpret kernel
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_time_vjp_exact_vs_twin():
    p = _params(jax.random.PRNGKey(14))
    x = jax.random.normal(jax.random.PRNGKey(15), (2, 5, 32, C))

    def loss_fused(x, p):
        out = fused_time_attention_block(x, p['g1'], p['wqkv'], p['mem_kv'],
                                         p['wout'], HEADS, DH, True, True)
        return jnp.sum(out ** 2)

    def loss_twin(x, p):
        out = _time_block_xla(x, p['g1'], p['wqkv'], p['mem_kv'], p['wout'],
                              heads=HEADS, dim_head=DH, causal=True)
        return jnp.sum(out ** 2)

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gx_t, gp_t = jax.grad(loss_twin, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_t),
                               rtol=1e-2, atol=1e-3)
    for k in gp_f:
        np.testing.assert_allclose(np.asarray(gp_f[k]), np.asarray(gp_t[k]),
                                   rtol=1e-2, atol=1e-3, err_msg=k)


def test_all_fused_kernels_integration(monkeypatch):
    """Full tokenizer forward with EVERY fused Pallas kernel forced on
    (interpret mode) — residual unit, space attention, time attention —
    must match the default XLA path end-to-end: same codes, close recon.
    Catches cross-kernel wiring interactions the per-kernel tests cannot."""
    import magvit2_pytorch_tpu.ops.pallas.axial_attention as ax
    import magvit2_pytorch_tpu.ops.pallas.residual_unit as ru
    from magvit2_pytorch_tpu.models import VideoTokenizer

    tok = VideoTokenizer(
        image_size=16, init_dim=64, codebook_size=256,
        layers=('residual', 'compress_space', 'attend_space',
                'compress_time', 'attend_time'),
        use_gan=False, perceptual_loss_weight=0.0, seed=0)
    x = jax.random.normal(jax.random.PRNGKey(20), (1, 5, 16, 16, 3))

    codes_want = np.asarray(tok.tokenize(x))
    recon_want = np.asarray(tok.forward(x, return_recon=True))

    monkeypatch.setattr(
        ru, 'fused_eligible',
        lambda x, dim, ks, streaming, w_blocked: not streaming)
    monkeypatch.setattr(ax, 'fused_eligible', lambda *a, **k: True)
    monkeypatch.setattr(ax, 'fused_time_eligible', lambda *a, **k: True)

    codes_got = np.asarray(tok.tokenize(x))
    recon_got = np.asarray(tok.forward(x, return_recon=True))

    np.testing.assert_array_equal(codes_got, codes_want)
    np.testing.assert_allclose(recon_got, recon_want, rtol=2e-4, atol=2e-4)
