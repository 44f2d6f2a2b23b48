"""Axial rotary embeddings: norm preservation, relative-position property,
streaming offset correctness, tokenizer integration."""

import jax
import jax.numpy as jnp
import numpy as np

from magvit2_pytorch_tpu.models import VideoTokenizer
from magvit2_pytorch_tpu.ops.attention import TimeAttention
from magvit2_pytorch_tpu.ops.rotary import apply_rope, rope_angles, rope_angles_2d


def test_rope_preserves_norm():
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.normal(size=(2, 10, 4, 16)).astype(np.float32))
    cos, sin = rope_angles(jnp.arange(10), 16)
    out = apply_rope(t, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(t), axis=-1), rtol=1e-5)


def test_rope_relative_property():
    """<R_m q, R_n k> depends only on (m - n)."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 1, 1, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 1, 1, 8)).astype(np.float32))

    def dot_at(m, n):
        cq, sq = rope_angles(jnp.asarray([m]), 8)
        ck, sk = rope_angles(jnp.asarray([n]), 8)
        qr = apply_rope(q, cq, sq)
        kr = apply_rope(k, ck, sk)
        return float(jnp.sum(qr * kr))

    assert abs(dot_at(3, 1) - dot_at(7, 5)) < 1e-4
    assert abs(dot_at(2, 2) - dot_at(9, 9)) < 1e-4


def test_rope_2d_shapes():
    cos, sin = rope_angles_2d(4, 6, 32)
    assert cos.shape == (24, 16) and sin.shape == (24, 16)


def test_time_attention_rotary_streaming_matches_full():
    """kv-cache streaming with rope must produce identical outputs to one
    whole-sequence pass (position offsets line up)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 6, 2, 2, 16)).astype(np.float32)
    mod = TimeAttention(dim=16, dim_head=8, heads=2, causal=True,
                        use_rotary=True, backend='xla')
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    full = np.asarray(mod.apply(params, jnp.asarray(x)))

    cache = {}
    outs = []
    for lo, hi in ((0, 2), (2, 4), (4, 6)):
        variables = {'params': params['params']}
        if cache:
            variables['cache'] = cache
        out, mut = mod.apply(variables, jnp.asarray(x[:, lo:hi]),
                             streaming=True, mutable=['cache'])
        cache = mut['cache']
        outs.append(np.asarray(out))
    stream = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(stream, full, atol=1e-5)


def test_tokenizer_with_rotary_roundtrip():
    tok = VideoTokenizer(
        image_size=16,
        init_dim=8,
        codebook_size=64,
        layers=('residual', ('compress_space', 16), 'attend_space',
                'attend_time'),
        attn_dim_head=8,
        attn_heads=2,
        use_rotary_pos_emb=True,
        flash_attn=False,
        use_gan=False,
        perceptual_loss_weight=0.0,
        seed=0,
    )
    rng = np.random.default_rng(3)
    video = rng.uniform(size=(1, 3, 16, 16, 3)).astype(np.float32)
    codes = tok.tokenize(video)
    recon = tok.decode_from_code_indices(codes)
    recon_direct = tok.forward(video, return_recon=True)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(recon_direct),
                               atol=1e-4)

    # config with rotary round-trips through save/load
    import tempfile
    from pathlib import Path
    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / 'tok.ckpt'
        tok.save(str(p))
        tok2 = VideoTokenizer.init_and_load_from(str(p))
        assert tok2.config.use_rotary_pos_emb
        np.testing.assert_array_equal(
            np.asarray(tok.tokenize(video)), np.asarray(tok2.tokenize(video)))
