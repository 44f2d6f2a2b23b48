"""Lane packing (w-blocked layout) equivalence tests.

ops/conv.py's lane packing runs sub-128-channel stages in a ``(W/2, 2C)``
layout with compile-time kernel rearrangements. The transform must be
numerically invisible: same params, same code indices, same reconstructions
(up to float reduction order), and streaming must stay chunk-exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magvit2_pytorch_tpu.models import VideoTokenizer
from magvit2_pytorch_tpu.models.streaming import tokenize_streaming

KW = dict(image_size=32, init_dim=8, codebook_size=64,
          layers=('residual', ('consecutive_residual', 2), 'compress_space',
                  'residual', 'compress_time', 'attend_space'),
          use_gan=False, perceptual_loss_weight=0.0, seed=0)


def _video(b=2, t=5, s=32):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((b, t, s, s, 3)).astype(np.float32))


@pytest.mark.parametrize('mode', ['encoder', True])
def test_lane_pack_matches_unpacked(mode):
    tok_on = VideoTokenizer(**KW, lane_pack=mode)
    tok_off = VideoTokenizer(**KW, lane_pack=False)
    # identical param trees (packing never changes parameter layout)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)),
        tok_on.params, tok_off.params))

    v = _video()
    r_on, q_on = tok_on.module.apply({'params': tok_on.params}, v)
    r_off, q_off = tok_off.module.apply({'params': tok_off.params}, v)
    assert bool(jnp.array_equal(q_on.indices, q_off.indices))
    np.testing.assert_allclose(np.asarray(r_on), np.asarray(r_off), atol=1e-5)


def test_lane_pack_streaming_exact():
    tok = VideoTokenizer(**KW, lane_pack=True)
    v = _video()
    c_stream = tokenize_streaming(tok, v, chunk_frames=2)
    c_full = tok.tokenize(v)
    assert np.array_equal(np.asarray(c_stream), np.asarray(c_full))


def test_lane_pack_grads_finite_and_close():
    tok_on = VideoTokenizer(**KW, lane_pack=True)
    tok_off = VideoTokenizer(**KW, lane_pack=False)
    v = _video()

    def loss(params, module):
        r, q = module.apply({'params': params}, v)
        return jnp.mean((r - v) ** 2) + q.aux_loss

    g_on = jax.grad(lambda p: loss(p, tok_on.module))(tok_on.params)
    g_off = jax.grad(lambda p: loss(p, tok_off.module))(tok_off.params)
    flat_on = jax.tree.leaves(g_on)
    flat_off = jax.tree.leaves(g_off)
    for a, b in zip(flat_on, flat_off):
        assert bool(jnp.all(jnp.isfinite(a)))
        # reduction-order differences compound through the deep backward
        # graph; require agreement, not bit-equality
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-2)


def test_lane_pack_auto_disables_for_ineligible_configs():
    from magvit2_pytorch_tpu.models.tokenizer_module import (
        TokenizerConfig, _compute_lane_pack_end)

    base = dict(image_size=32, init_dim=8, codebook_size=64,
                layers=('residual', 'compress_space'), lane_pack=True)
    assert _compute_lane_pack_end(TokenizerConfig(**base)) == 1
    # attention before the first compress_space -> no clean packed prefix
    cfg = TokenizerConfig(**{**base, 'layers': ('attend_space',
                                                'compress_space')})
    assert _compute_lane_pack_end(cfg) == -1
    # separate first-frame stem is not blocked-layout aware
    cfg = TokenizerConfig(**base, separate_first_frame_encoding=True)
    assert _compute_lane_pack_end(cfg) == -1
    # full lanes already
    cfg = TokenizerConfig(**{**base, 'init_dim': 128})
    assert _compute_lane_pack_end(cfg) == -1
    # non-zero pad mode
    cfg = TokenizerConfig(**base, pad_mode='reflect')
    assert _compute_lane_pack_end(cfg) == -1
    # no compress_space at all -> latents would stay blocked; disabled
    cfg = TokenizerConfig(**{**base, 'layers': ('residual',)})
    assert _compute_lane_pack_end(cfg) == -1
