"""GAN / perceptual loss stack: hinge losses vs torch formulas, R1 penalty on
an analytic discriminator, adaptive-weight finiteness, discriminator +
multiscale forward, full loss-mode forwards of VideoTokenizer."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from magvit2_pytorch_tpu.models import Discriminator, MultiscaleDiscriminator, VideoTokenizer
from magvit2_pytorch_tpu.training.losses import (
    gradient_penalty,
    hinge_discr_loss,
    hinge_gen_loss,
    pick_video_frame,
)


def test_hinge_losses_match_torch():
    rng = np.random.default_rng(0)
    fake = rng.normal(size=(8,)).astype(np.float32)
    real = rng.normal(size=(8,)).astype(np.float32)

    ours_d = float(hinge_discr_loss(jnp.asarray(fake), jnp.asarray(real)))
    ref_d = float((F.relu(1 + torch.tensor(fake))
                   + F.relu(1 - torch.tensor(real))).mean())
    assert abs(ours_d - ref_d) < 1e-6

    ours_g = float(hinge_gen_loss(jnp.asarray(fake)))
    assert abs(ours_g - float(-torch.tensor(fake).mean())) < 1e-6


def test_gradient_penalty_analytic():
    """D(x) = sum(a * x) has ∇_x D = a, so GP = (||a||_2)^2 exactly."""
    a = jnp.asarray(np.random.default_rng(1).normal(size=(4, 4, 3)).astype(np.float32))

    def discr(images):
        return jnp.sum(images * a, axis=(1, 2, 3))

    x = jnp.ones((2, 4, 4, 3))
    gp = float(gradient_penalty(discr, x))
    expected = float(jnp.sum(a ** 2))
    assert abs(gp - expected) < 1e-4


def test_pick_video_frame():
    video = jnp.arange(2 * 4 * 1 * 1 * 1, dtype=jnp.float32).reshape(2, 4, 1, 1, 1)
    idx = jnp.asarray([2, 0])
    frames = pick_video_frame(video, idx)
    assert float(frames[0, 0, 0, 0]) == 2.0
    assert float(frames[1, 0, 0, 0]) == 4.0


def test_discriminator_forward():
    d = Discriminator(dim=8, image_size=32, channels=3, max_dim=64)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 32, 32, 3)).astype(np.float32))
    params = d.init(jax.random.PRNGKey(0), x)
    logits = d.apply(params, x)
    assert logits.shape == (2,)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_multiscale_discriminator_on_video():
    d = MultiscaleDiscriminator(dim=8, image_size=32, channels=3, max_dim=64,
                                downscale_factor=2)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 3, 32, 32, 3)).astype(np.float32))
    params = d.init(jax.random.PRNGKey(0), x)
    logits = d.apply(params, x)
    assert logits.shape == (2,)


def _gan_tokenizer():
    return VideoTokenizer(
        image_size=32,
        init_dim=16,
        codebook_size=256,
        layers=('residual', ('compress_space', 24), ('compress_time', 24)),
        use_gan=True,
        discr_kwargs=dict(dim=8, image_size=32, channels=3, max_dim=64),
        perceptual_loss_weight=1e-1,
        seed=0,
    )


def test_forward_return_loss_full_gan():
    tok = _gan_tokenizer()
    rng = np.random.default_rng(4)
    video = rng.uniform(size=(2, 3, 32, 32, 3)).astype(np.float32)

    loss, breakdown = tok.forward(video, return_loss=True,
                                  rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert np.isfinite(float(breakdown.recon_loss))
    assert np.isfinite(float(breakdown.perceptual_loss))
    assert np.isfinite(float(breakdown.adversarial_gen_loss))
    assert np.isfinite(float(breakdown.adaptive_adversarial_weight))
    assert float(breakdown.adaptive_adversarial_weight) >= 0


def test_forward_return_discr_loss_with_gp():
    tok = _gan_tokenizer()
    rng = np.random.default_rng(5)
    video = rng.uniform(size=(2, 3, 32, 32, 3)).astype(np.float32)

    loss, breakdown = tok.forward(video, return_discr_loss=True,
                                  apply_gradient_penalty=True,
                                  rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert np.isfinite(float(breakdown.discr_loss))
    assert float(breakdown.gradient_penalty) > 0

    loss2, breakdown2 = tok.forward(video, return_discr_loss=True,
                                    apply_gradient_penalty=False,
                                    rng=jax.random.PRNGKey(0))
    assert float(breakdown2.gradient_penalty) == 0.0


def test_forward_recon_loss_only():
    tok = _gan_tokenizer()
    rng = np.random.default_rng(6)
    video = rng.uniform(size=(1, 3, 32, 32, 3)).astype(np.float32)
    recon_loss, recon = tok.forward(video, return_recon_loss_only=True)
    assert np.isfinite(float(recon_loss))
    assert recon.shape == video.shape


def test_forward_loss_gradients_flow():
    """jax.grad of the total loss w.r.t. generator params is finite & nonzero —
    including through the STE quantizer and the adaptive-weight machinery."""
    tok = _gan_tokenizer()
    from magvit2_pytorch_tpu.training.losses import tokenizer_loss

    rng = np.random.default_rng(7)
    video = jnp.asarray(rng.uniform(size=(1, 3, 32, 32, 3)).astype(np.float32))

    def loss_fn(params):
        total, _, _ = tokenizer_loss(
            tok.module, params, video, jax.random.PRNGKey(0),
            discr_module=tok.discr, discr_params=tok.discr_params,
            vgg_module=tok.vgg, vgg_params=tok.vgg_params,
            train=True, use_vgg=True, has_gan=True,
        )
        return total

    grads = jax.grad(loss_fn)(tok.params)
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    total_norm = sum(float(jnp.sum(l ** 2)) for l in leaves) ** 0.5
    assert total_norm > 0


def test_discr_loss_gradients_flow():
    tok = _gan_tokenizer()
    from magvit2_pytorch_tpu.training.losses import discriminator_loss

    rng = np.random.default_rng(8)
    video = jnp.asarray(rng.uniform(size=(1, 3, 32, 32, 3)).astype(np.float32))

    def loss_fn(discr_params):
        total, _ = discriminator_loss(
            tok.module, tok.params, tok.discr, discr_params, video,
            jax.random.PRNGKey(0), apply_gradient_penalty=True)
        return total

    grads = jax.grad(loss_fn)(tok.discr_params)
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    total_norm = sum(float(jnp.sum(l ** 2)) for l in leaves) ** 0.5
    assert total_norm > 0
