"""Streaming (chunked causal) tokenize/decode must be bit-identical to the
whole-clip pass — the SURVEY.md §5.7 carried-conv-state contract."""

import numpy as np
import pytest

from magvit2_pytorch_tpu.models import VideoTokenizer
from magvit2_pytorch_tpu.models.streaming import (
    StreamingSession,
    decode_streaming,
    tokenize_streaming,
)


@pytest.fixture(scope='module')
def tok():
    return VideoTokenizer(
        image_size=16,
        init_dim=8,
        codebook_size=64,
        layers=(
            'residual',
            ('compress_space', 12),
            ('compress_time', 12),
            ('compress_time', 16),
        ),
        use_gan=False,
        perceptual_loss_weight=0.0,
        seed=0,
    )


def test_streaming_encode_matches_full(tok):
    assert tok.time_downsample_factor == 4
    rng = np.random.default_rng(0)
    video = rng.uniform(size=(1, 17, 16, 16, 3)).astype(np.float32)

    codes_full = np.asarray(tok.tokenize(video))
    codes_stream = np.asarray(tokenize_streaming(tok, video, chunk_frames=8))

    assert codes_stream.shape == codes_full.shape
    np.testing.assert_array_equal(codes_stream, codes_full)


def test_streaming_decode_matches_full(tok):
    rng = np.random.default_rng(1)
    video = rng.uniform(size=(1, 17, 16, 16, 3)).astype(np.float32)
    codes = tok.tokenize(video)

    recon_full = np.asarray(tok.decode_from_code_indices(codes))
    recon_stream = np.asarray(decode_streaming(tok, codes, chunk_latents=2))

    assert recon_stream.shape == recon_full.shape
    np.testing.assert_allclose(recon_stream, recon_full, atol=1e-5)


def test_streaming_session_incremental(tok):
    """Feed uneven chunk sizes; outputs must still agree with full pass."""
    rng = np.random.default_rng(2)
    video = rng.uniform(size=(2, 13, 16, 16, 3)).astype(np.float32)
    codes_full = np.asarray(tok.tokenize(video))

    sess = StreamingSession(tok)
    parts = [
        sess.encode_chunk(video[:, :5]),    # 1 + 4 frames
        sess.encode_chunk(video[:, 5:9]),   # 4
        sess.encode_chunk(video[:, 9:13]),  # 4
    ]
    codes_stream = np.concatenate([np.asarray(p) for p in parts], axis=1)
    np.testing.assert_array_equal(codes_stream, codes_full)


def test_streaming_with_spatial_attention():
    """attend_space / linear_attend_space are per-frame -> streamable."""
    tok = VideoTokenizer(
        image_size=16,
        init_dim=8,
        codebook_size=64,
        layers=(
            'residual',
            ('compress_space', 12),
            'linear_attend_space',
            ('compress_time', 12),
        ),
        use_gan=False,
        perceptual_loss_weight=0.0,
        seed=0,
    )
    rng = np.random.default_rng(3)
    video = rng.uniform(size=(1, 5, 16, 16, 3)).astype(np.float32)
    codes_full = np.asarray(tok.tokenize(video))
    codes_stream = np.asarray(tokenize_streaming(tok, video, chunk_frames=2))
    np.testing.assert_array_equal(codes_stream, codes_full)


def test_streaming_with_time_attention_kv_cache():
    """Causal time attention streams via a kv-cache; token-shift carries its
    frame — chunked output must equal whole-clip output."""
    tok = VideoTokenizer(
        image_size=8,
        init_dim=8,
        codebook_size=64,
        layers=('residual', 'attend_time', ('compress_time', 12)),
        attn_dim_head=8,
        attn_heads=2,
        use_gan=False,
        perceptual_loss_weight=0.0,
        flash_attn=False,
        seed=0,
    )
    rng = np.random.default_rng(4)
    video = rng.uniform(size=(1, 5, 8, 8, 3)).astype(np.float32)
    codes_full = np.asarray(tok.tokenize(video))
    codes_stream = np.asarray(tokenize_streaming(tok, video, chunk_frames=2))
    np.testing.assert_array_equal(codes_stream, codes_full)


def test_streaming_with_gateloop_state_carry():
    tok = VideoTokenizer(
        image_size=8,
        init_dim=8,
        codebook_size=64,
        layers=('residual', 'gateloop_time', ('compress_time', 12)),
        use_gan=False,
        perceptual_loss_weight=0.0,
        seed=0,
    )
    rng = np.random.default_rng(5)
    video = rng.uniform(size=(1, 5, 8, 8, 3)).astype(np.float32)
    codes_full = np.asarray(tok.tokenize(video))
    codes_stream = np.asarray(tokenize_streaming(tok, video, chunk_frames=2))
    np.testing.assert_array_equal(codes_stream, codes_full)


def test_streaming_with_cond_layers():
    """cond_* layers stream: per-stream cond vector, bit-exact vs full pass."""
    tok = VideoTokenizer(
        image_size=16,
        init_dim=8,
        codebook_size=64,
        dim_cond=6,
        layers=(
            'residual',
            'cond_residual',
            ('compress_time', 12),
        ),
        use_gan=False,
        perceptual_loss_weight=0.0,
        seed=0,
    )
    rng = np.random.default_rng(3)
    video = rng.uniform(size=(2, 9, 16, 16, 3)).astype(np.float32)
    cond = rng.uniform(size=(2, 6)).astype(np.float32)

    codes_full = np.asarray(tok.tokenize(video, cond=cond))
    codes_stream = np.asarray(
        tokenize_streaming(tok, video, chunk_frames=4, cond=cond))
    np.testing.assert_array_equal(codes_stream, codes_full)

    recon_full = np.asarray(
        tok.decode_from_code_indices(codes_full, cond=cond))
    recon_stream = np.asarray(
        decode_streaming(tok, codes_full, chunk_latents=2, cond=cond))
    np.testing.assert_allclose(recon_stream, recon_full, atol=1e-5)


def test_streaming_rejects_separate_first_frame_at_construction():
    tok = VideoTokenizer(
        image_size=16,
        init_dim=8,
        codebook_size=64,
        layers=(('compress_time', 12),),
        separate_first_frame_encoding=True,
        use_gan=False,
        perceptual_loss_weight=0.0,
        seed=0,
    )
    with pytest.raises(AssertionError, match='separate_first_frame'):
        StreamingSession(tok)


def test_streaming_cond_required_at_construction():
    tok = VideoTokenizer(
        image_size=16,
        init_dim=8,
        codebook_size=64,
        dim_cond=6,
        layers=('cond_residual', ('compress_time', 12)),
        use_gan=False,
        perceptual_loss_weight=0.0,
        seed=0,
    )
    with pytest.raises(AssertionError, match='cond'):
        StreamingSession(tok)


def _kv_window_tok(window):
    return VideoTokenizer(
        image_size=8,
        init_dim=8,
        codebook_size=64,
        layers=('residual', 'attend_time', ('compress_time', 12)),
        attn_dim_head=8,
        attn_heads=2,
        use_gan=False,
        perceptual_loss_weight=0.0,
        flash_attn=False,
        streaming_kv_window=window,
        seed=0,
    )


def test_streaming_kv_window_covering_is_exact():
    """kv_window >= stream length: bounded cache is bit-exact vs whole-clip
    (the documented exactness boundary of Attention.kv_window)."""
    tok = _kv_window_tok(window=64)
    rng = np.random.default_rng(7)
    video = rng.uniform(size=(1, 9, 8, 8, 3)).astype(np.float32)
    codes_full = np.asarray(tok.tokenize(video))
    codes_stream = np.asarray(tokenize_streaming(tok, video, chunk_frames=2))
    np.testing.assert_array_equal(codes_stream, codes_full)


def test_streaming_kv_window_bounds_cache():
    """Small kv_window: the attend_time cache stays capped at the window (the
    long-video memory bound) and the early frames still match the full pass
    (they saw full history when produced)."""
    import jax

    tok = _kv_window_tok(window=2)
    rng = np.random.default_rng(8)
    video = rng.uniform(size=(1, 13, 8, 8, 3)).astype(np.float32)

    session = StreamingSession(tok)
    chunks = [video[:, :3], video[:, 3:7], video[:, 7:11], video[:, 11:13]]
    outs = [np.asarray(session.encode_chunk(c)) for c in chunks]

    kv_shapes = [tuple(leaf.shape) for path, leaf in
                 jax.tree_util.tree_leaves_with_path(session._enc_cache)
                 if 'kv_state' in jax.tree_util.keystr(path)]
    assert kv_shapes, 'expected an attend_time kv cache'
    assert all(s[2] <= 2 for s in kv_shapes), kv_shapes

    codes_full = np.asarray(tok.tokenize(video))
    got = np.concatenate(outs, axis=1)
    assert got.shape == codes_full.shape
    # the first chunk's codes never see truncation — exact by construction
    np.testing.assert_array_equal(got[:, :1], codes_full[:, :1])
