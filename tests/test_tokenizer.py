"""VideoTokenizer integration tests: the README round-trip contract
(`decode_from_code_indices(tokenize(v)) ≈ forward(v, return_recon=True)`,
reference README.md:85-90), shape math for the canonical configs
(BASELINE.md), image/video polymorphism, save/load."""

import numpy as np
import pytest

from magvit2_pytorch_tpu.models import VideoTokenizer


def small_tokenizer(**overrides):
    kwargs = dict(
        image_size=32,
        init_dim=16,
        codebook_size=256,
        layers=(
            'residual',
            ('compress_space', 24),
            'residual',
            ('compress_time', 32),
            'residual',
        ),
        use_gan=False,
        perceptual_loss_weight=0.0,
        seed=0,
    )
    kwargs.update(overrides)
    return VideoTokenizer(**kwargs)


def test_shape_math_canonical_config():
    """README default config: 128px x 17f, 8x spatial / 4x temporal downsample
    => codes (b, 5, 16, 16) (BASELINE.md table; the README's (1,9,16,16)
    comment is stale)."""
    tok = small_tokenizer(
        image_size=64,
        layers=(
            'residual',
            ('compress_space', 24),
            ('compress_time', 24),
            ('compress_space', 32),
            ('compress_time', 32),
            ('compress_space', 32),
        ),
    )
    assert tok.time_downsample_factor == 4
    assert tok.time_padding == 3
    assert tok.fmap_size == 8

    video = np.random.default_rng(0).normal(
        size=(1, 5, 64, 64, 3)).astype(np.float32)
    codes = tok.tokenize(video)
    assert codes.shape == (1, 2, 8, 8)  # (5-1+... => (3+5)/4=2 latent frames


def test_roundtrip_contract_video():
    tok = small_tokenizer()
    rng = np.random.default_rng(1)
    video = rng.normal(size=(2, 3, 32, 32, 3)).astype(np.float32)

    codes = tok.tokenize(video)
    assert codes.shape == (2, 2, 16, 16)

    recon_from_codes = tok.decode_from_code_indices(codes)
    recon_direct = tok.forward(video, return_recon=True)

    assert recon_from_codes.shape == video.shape
    np.testing.assert_allclose(
        np.asarray(recon_from_codes), np.asarray(recon_direct), atol=1e-4)


def test_roundtrip_contract_flattened_codes():
    tok = small_tokenizer()
    rng = np.random.default_rng(2)
    video = rng.normal(size=(1, 3, 32, 32, 3)).astype(np.float32)

    codes = np.asarray(tok.tokenize(video))
    flat = codes.reshape(1, -1)
    recon = tok.decode_from_code_indices(flat)
    recon_direct = tok.forward(video, return_recon=True)
    np.testing.assert_allclose(
        np.asarray(recon), np.asarray(recon_direct), atol=1e-4)


def test_image_mode():
    """Image = video with one frame (curriculum pretraining; reference
    magvit2_pytorch.py:1679-1687)."""
    tok = small_tokenizer()
    rng = np.random.default_rng(3)
    images = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    recon = tok.forward(images, return_recon=True)
    assert recon.shape == images.shape

    codes = tok.tokenize(images)
    assert codes.shape == (2, 1, 16, 16)


def test_channel_first_compat():
    tok = small_tokenizer()
    rng = np.random.default_rng(4)
    video_cl = rng.normal(size=(1, 3, 32, 32, 3)).astype(np.float32)
    video_cf = video_cl.transpose(0, 4, 1, 2, 3)

    codes_cl = np.asarray(tok.tokenize(video_cl))
    codes_cf = np.asarray(tok.tokenize(video_cf, channel_first=True))
    np.testing.assert_array_equal(codes_cl, codes_cf)

    recon_cf = tok.forward(video_cf, return_recon=True, channel_first=True)
    assert recon_cf.shape == video_cf.shape


def test_fsq_variant_roundtrip():
    tok = small_tokenizer(codebook_size=None, use_fsq=True,
                          fsq_levels=(8, 5, 5, 5))
    rng = np.random.default_rng(5)
    video = rng.normal(size=(1, 3, 32, 32, 3)).astype(np.float32)

    codes = tok.tokenize(video)
    recon = tok.decode_from_code_indices(codes)
    recon_direct = tok.forward(video, return_recon=True)
    np.testing.assert_allclose(
        np.asarray(recon), np.asarray(recon_direct), atol=1e-4)


def test_separate_first_frame_encoding():
    tok = small_tokenizer(separate_first_frame_encoding=True)
    rng = np.random.default_rng(6)
    video = rng.normal(size=(1, 3, 32, 32, 3)).astype(np.float32)

    codes = tok.tokenize(video)
    recon = tok.decode_from_code_indices(codes)
    assert recon.shape == video.shape
    recon_direct = tok.forward(video, return_recon=True)
    np.testing.assert_allclose(
        np.asarray(recon), np.asarray(recon_direct), atol=1e-4)


def test_attention_and_gateloop_layers():
    tok = small_tokenizer(layers=(
        'residual',
        ('compress_space', 24),
        'attend_space',
        'linear_attend_space',
        'gateloop_time',
        'attend_time',
    ))
    rng = np.random.default_rng(7)
    video = rng.normal(size=(1, 2, 32, 32, 3)).astype(np.float32)
    recon = tok.forward(video, return_recon=True,
                        video_contains_first_frame=False)
    assert recon.shape == video.shape


def test_conditioned_layers():
    tok = small_tokenizer(
        layers=(
            'cond_residual',
            ('compress_space', 24),
            'cond_attend_space',
        ),
        dim_cond=8,
    )
    rng = np.random.default_rng(8)
    video = rng.normal(size=(2, 1, 32, 32, 3)).astype(np.float32)
    cond = rng.normal(size=(2, 8)).astype(np.float32)
    recon = tok.forward(video, cond=cond, return_recon=True)
    assert recon.shape == video.shape


def test_frames_divisibility_assert():
    tok = small_tokenizer()
    video = np.zeros((1, 4, 32, 32, 3), np.float32)  # (4-1) % 2 != 0
    with pytest.raises(AssertionError):
        tok.forward(video, return_recon=True)


def test_save_and_init_and_load_from(tmp_path):
    tok = small_tokenizer()
    rng = np.random.default_rng(9)
    video = rng.normal(size=(1, 3, 32, 32, 3)).astype(np.float32)
    codes_before = np.asarray(tok.tokenize(video))

    path = tmp_path / 'tokenizer.ckpt'
    tok.save(str(path))

    tok2 = VideoTokenizer.init_and_load_from(str(path))
    codes_after = np.asarray(tok2.tokenize(video))
    np.testing.assert_array_equal(codes_before, codes_after)

    recon1 = np.asarray(tok.forward(video, return_recon=True))
    recon2 = np.asarray(tok2.forward(video, return_recon=True))
    np.testing.assert_allclose(recon1, recon2, atol=1e-6)


def test_copy_for_eval():
    tok = small_tokenizer()
    ev = tok.copy_for_eval()
    rng = np.random.default_rng(10)
    video = rng.normal(size=(1, 3, 32, 32, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(tok.tokenize(video)), np.asarray(ev.tokenize(video)))


def test_remat_matches_no_remat():
    """Layer rematerialization must not change values or gradients."""
    import jax
    import jax.numpy as jnp

    common = dict(
        image_size=16, init_dim=8, codebook_size=64,
        layers=('residual', ('compress_space', 12), ('compress_time', 12)),
        use_gan=False, perceptual_loss_weight=0.0, seed=0,
    )
    tok_a = VideoTokenizer(**common)
    tok_b = VideoTokenizer(**common, remat=True)

    video = jnp.asarray(np.random.default_rng(0).uniform(
        size=(1, 3, 16, 16, 3)).astype(np.float32))

    def loss(module, params, v):
        recon, _ = module.apply({'params': params}, v)
        return jnp.mean((recon - v) ** 2)

    la, ga = jax.value_and_grad(
        lambda p: loss(tok_a.module, p, video))(tok_a.params)
    lb, gb = jax.value_and_grad(
        lambda p: loss(tok_b.module, p, video))(tok_b.params)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for x, y in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)
