"""LFQ / FSQ contracts: bit order, index round-trip, STE gradients, aux
losses. The key invariant (SURVEY.md §7.2): indices_to_codes ∘ quantize = id
on codes."""

import jax
import jax.numpy as jnp
import numpy as np

from magvit2_pytorch_tpu.ops.quantizers import FSQ, LFQ


def _np(x):
    return np.asarray(x)


def test_lfq_bit_order_msb_first():
    lfq = LFQ(dim=4, codebook_size=16, soft_clamp_input_value=None)
    x = jnp.asarray([[[3.0, -2.0, 1.0, -0.5]]])  # bits (+,-,+,-) -> 1010b = 10
    params = lfq.init(jax.random.PRNGKey(0), x)
    out = lfq.apply(params, x)
    assert int(out.indices[0, 0]) == 0b1010
    np.testing.assert_allclose(_np(out.quantized), [[[1.0, -1.0, 1.0, -1.0]]])


def test_lfq_roundtrip_codes():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 4, 4, 9)).astype(np.float32)
    lfq = LFQ(dim=9, codebook_size=512)
    params = lfq.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = lfq.apply(params, jnp.asarray(x))
    assert out.indices.shape == (2, 3, 4, 4)
    assert out.quantized.shape == x.shape

    codes = lfq.apply(params, out.indices, method=LFQ.indices_to_codes)
    np.testing.assert_allclose(_np(codes), _np(out.quantized), atol=1e-6)


def test_lfq_roundtrip_with_projection():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 7, 16)).astype(np.float32)
    lfq = LFQ(dim=16, codebook_size=256)  # codebook_dim 8 != 16 -> projections
    params = lfq.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = lfq.apply(params, jnp.asarray(x))
    assert out.quantized.shape == x.shape

    codes = lfq.apply(params, out.indices, method=LFQ.indices_to_codes)
    np.testing.assert_allclose(_np(codes), _np(out.quantized), atol=1e-5)


def test_lfq_multi_codebook():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 5, 8)).astype(np.float32)
    lfq = LFQ(dim=8, codebook_size=16, num_codebooks=2)
    params = lfq.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = lfq.apply(params, jnp.asarray(x))
    assert out.indices.shape == (1, 5, 2)
    codes = lfq.apply(params, out.indices, method=LFQ.indices_to_codes)
    np.testing.assert_allclose(_np(codes), _np(out.quantized), atol=1e-6)


def test_lfq_ste_gradient_flows():
    lfq = LFQ(dim=6, codebook_size=64)
    x = jnp.ones((1, 2, 6)) * 0.3
    params = lfq.init(jax.random.PRNGKey(0), x)

    def f(x):
        # STE is train-only (eval returns the exact hard codes, package parity)
        return jnp.sum(lfq.apply(params, x, train=True).quantized ** 2)

    g = jax.grad(f)(x)
    assert np.all(np.isfinite(_np(g)))
    assert np.abs(_np(g)).max() > 0  # STE passes gradient through


def test_lfq_aux_losses_train_mode():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 16, 10)).astype(np.float32)
    lfq = LFQ(dim=10, codebook_size=1024)
    params = lfq.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = lfq.apply(params, jnp.asarray(x), train=True)
    assert np.isfinite(float(out.aux_loss))
    assert float(out.breakdown.commitment) > 0
    # codebook entropy should be positive for random inputs
    assert float(out.breakdown.codebook_entropy) > 0

    # eval mode: zero aux
    out_eval = lfq.apply(params, jnp.asarray(x), train=False)
    assert float(out_eval.aux_loss) == 0.0


def test_lfq_factorized_entropy_large_codebook():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 8, 18)).astype(np.float32)
    lfq = LFQ(dim=18, codebook_size=2 ** 18)  # Open-MAGVIT2 scale
    params = lfq.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = lfq.apply(params, jnp.asarray(x), train=True)
    assert np.isfinite(float(out.aux_loss))
    codes = lfq.apply(params, out.indices, method=LFQ.indices_to_codes)
    np.testing.assert_allclose(_np(codes), _np(out.quantized), atol=1e-6)


def test_lfq_entropy_modes_agree_on_per_sample():
    """The factorized per-sample entropy is exact — must match the full-codebook
    computation."""
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 32, 6)).astype(np.float32) * 0.02
    full = LFQ(dim=6, codebook_size=64, entropy_full_max_size=4096,
               soft_clamp_input_value=None)
    fact = LFQ(dim=6, codebook_size=64, entropy_full_max_size=1,
               soft_clamp_input_value=None)
    p1 = full.init(jax.random.PRNGKey(0), jnp.asarray(x))
    o_full = full.apply(p1, jnp.asarray(x), train=True)
    o_fact = fact.apply(p1, jnp.asarray(x), train=True)
    np.testing.assert_allclose(
        float(o_full.breakdown.per_sample_entropy),
        float(o_fact.breakdown.per_sample_entropy), rtol=1e-3, atol=1e-4)


def test_fsq_quantizes_to_levels():
    fsq = FSQ(levels=[8, 5, 5, 5])
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 6, 4)).astype(np.float32) * 3
    params = fsq.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = fsq.apply(params, jnp.asarray(x))
    assert out.indices.shape == (2, 6)
    assert int(np.max(_np(out.indices))) < 8 * 5 * 5 * 5
    assert int(np.min(_np(out.indices))) >= 0
    # codes lie on the quantization grid in [-1, 1]
    q = _np(out.quantized)
    assert q.min() >= -1.0 - 1e-6 and q.max() <= 1.0 + 1e-6

    codes = fsq.apply(params, out.indices, method=FSQ.indices_to_codes)
    np.testing.assert_allclose(_np(codes), q, atol=1e-6)


def test_fsq_with_projection_roundtrip():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 3, 4, 4, 12)).astype(np.float32)
    fsq = FSQ(levels=[7, 5, 5, 5, 5], dim=12)
    params = fsq.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = fsq.apply(params, jnp.asarray(x))
    assert out.quantized.shape == x.shape
    codes = fsq.apply(params, out.indices, method=FSQ.indices_to_codes)
    np.testing.assert_allclose(_np(codes), _np(out.quantized), atol=1e-5)


def test_fsq_ste_gradient():
    fsq = FSQ(levels=[5, 5])
    x = jnp.asarray([[[0.2, -0.7]]])
    params = fsq.init(jax.random.PRNGKey(0), x)

    def f(x):
        return jnp.sum(fsq.apply(params, x).quantized)

    g = jax.grad(f)(x)
    assert np.all(np.isfinite(_np(g)))
    assert np.abs(_np(g)).max() > 0


# -- exact chunked codebook entropy (large-codebook diversity term) -----------


def test_chunked_codebook_entropy_matches_dense_exact():
    """The chunk-enumerated diversity entropy must equal the dense full-
    softmax path's codebook entropy (values AND gradients) on a codebook
    small enough to run both."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 8)).astype(np.float32))

    # inv_temperature lowered so probabilities are not one-hot (harder case)
    dense = LFQ(dim=8, codebook_size=256, inv_temperature=1.0)
    chunked = LFQ(dim=8, codebook_size=256, inv_temperature=1.0,
                  entropy_full_max_size=1, exact_codebook_entropy=True,
                  entropy_chunk_size=64)
    params = dense.init(jax.random.PRNGKey(0), x)

    def ent(mod, x):
        return mod.apply(params, x, train=True).breakdown

    bd_d = ent(dense, x)
    bd_c = ent(chunked, x)
    np.testing.assert_allclose(_np(bd_c.codebook_entropy),
                               _np(bd_d.codebook_entropy), rtol=1e-5)
    # per-sample entropy: factorized closed form == dense softmax entropy
    np.testing.assert_allclose(_np(bd_c.per_sample_entropy),
                               _np(bd_d.per_sample_entropy), rtol=1e-5)

    g_d = jax.grad(lambda x: dense.apply(params, x, train=True).aux_loss)(x)
    g_c = jax.grad(lambda x: chunked.apply(params, x, train=True).aux_loss)(x)
    np.testing.assert_allclose(_np(g_c), _np(g_d), rtol=2e-4, atol=1e-6)


def test_chunked_codebook_entropy_2e18_smoke():
    """2^18 codebook: the exact diversity term runs in chunked form (64
    matmul sweeps), stays finite, and is differentiable."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 2, 2, 2, 18)).astype(np.float32))
    lfq = LFQ(dim=18, codebook_size=2 ** 18, exact_codebook_entropy=True)
    params = lfq.init(jax.random.PRNGKey(0), x)

    out = lfq.apply(params, x, train=True)
    assert np.isfinite(_np(out.breakdown.codebook_entropy))
    # H(mixture of M per-sample dists) <= log(M) + mean per-sample entropy
    bound = np.log(8) + _np(out.breakdown.per_sample_entropy) + 1e-3
    assert _np(out.breakdown.codebook_entropy) <= bound

    g = jax.grad(lambda x: lfq.apply(params, x, train=True).aux_loss)(x)
    assert np.all(np.isfinite(_np(g)))
