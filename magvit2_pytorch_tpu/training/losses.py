"""Loss machinery: reconstruction, quantizer aux, VGG perceptual, hinge GAN
with adaptive adversarial weight, R1 gradient penalty, multiscale GAN.

Pure-functional rebuild of reference forward's loss modes
(magvit2_pytorch.py:1656-1896) + the GAN primitives (:100-137). Everything is
jit-compatible: losses return (scalar, NamedTuple-of-scalars).

TPU-native details:
- The adaptive adversarial weight needs ∥∇_w L∥ for ONE conv kernel w (the
  final decoder conv; reference grad_layer_wrt_loss, :126-137,1815-1841). The
  reference pays two extra full backwards; here the decoder feature map is
  stop-gradiented and only the tiny pixels-head subgraph is differentiated —
  cost is two conv-out backward passes, nothing more.
- The R1 gradient penalty (:102-115) is grad-of-grad through the
  discriminator; computed in fp32 (the reference disables autocast for these,
  :126).
- Fixes reference quirk #1: the multiscale generator loss actually applies the
  discriminator (the reference hinge-losses raw pixels, :1856).

Randomness: frame picks use explicit threaded PRNG keys — per-replica folding
is done by the trainer (matches reference DDP semantics where each rank picks
its own frames; SURVEY.md §7 hard-parts).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from magvit2_pytorch_tpu.models.tokenizer_module import TokenizerModule
from magvit2_pytorch_tpu.utils.helpers import exists


class LossBreakdown(NamedTuple):
    """Mirrors reference LossBreakdown (magvit2_pytorch.py:1028-1037), plus
    codebook-health stats (mean bit entropy / batch seen-mask) — the r4
    collapse study showed LFQ at the parity default inv_temperature=100
    freezes utilization permanently within ~25 steps, invisibly unless these
    are surfaced (results/codebook_2e18_t2.log)."""
    recon_loss: jnp.ndarray
    lfq_aux_loss: jnp.ndarray
    quantizer_loss_breakdown: Any
    perceptual_loss: jnp.ndarray
    adversarial_gen_loss: jnp.ndarray
    adaptive_adversarial_weight: jnp.ndarray
    multiscale_gen_losses: Tuple
    multiscale_gen_adaptive_weights: Tuple
    mean_bit_entropy: jnp.ndarray = None     # LFQ only; None for FSQ
    codes_seen: jnp.ndarray = None           # (codebook_size,) bool, batch


def codebook_stats(indices, codebook_size: int, is_lfq: bool):
    """(mean_bit_entropy, seen_mask) from quantizer code indices.

    mean bit entropy: mean over the log2(codebook_size) bit positions of the
    binary entropy of that bit's empirical rate — the early-collapse canary
    (below ~0.1 in the first 50 steps means the LFQ diversity gradient is
    dead and utilization is frozen; see results/codebook_2e18_t2.log).
    seen_mask: which codes appear in this batch (for cumulative-unique
    tracking across steps)."""
    flat = indices.reshape(-1)
    seen = jnp.zeros((codebook_size,), jnp.bool_).at[flat].set(True)
    if not is_lfq:
        return None, seen
    num_bits = int(round(math.log2(codebook_size)))
    bits = ((flat[:, None] >> jnp.arange(num_bits)) & 1).astype(jnp.float32)
    p = bits.mean(axis=0)
    # xlogy, not p*log(p+eps): at the degenerate p in {0,1} (exactly the
    # collapse this metric exists to expose) the eps-form compiles to NaN
    # under XLA fusion; xlogy(0, 0) == 0 by definition
    from jax.scipy.special import xlogy
    h = -(xlogy(p, p) + xlogy(1 - p, 1 - p))
    return h.mean(), seen


class DiscrLossBreakdown(NamedTuple):
    """Mirrors reference DiscrLossBreakdown (magvit2_pytorch.py:1039-1043)."""
    discr_loss: jnp.ndarray
    multiscale_discr_losses: Tuple
    gradient_penalty: jnp.ndarray


def hinge_discr_loss(fake, real):
    return jnp.mean(jax.nn.relu(1 + fake) + jax.nn.relu(1 - real))


def hinge_gen_loss(fake):
    return -jnp.mean(fake)


def pick_video_frame(video, frame_indices):
    """(b, t, h, w, c) + (b,) int -> (b, h, w, c)."""
    return jax.vmap(lambda v, i: v[i])(video, frame_indices)


def gradient_penalty(discr_fn, images, center: float = 0.0):
    """Zero-centered R1-style penalty: mean((||∇_x D(x)||_2 - center)^2)."""
    def total_logit(im):
        return jnp.sum(discr_fn(im).astype(jnp.float32))

    grads = jax.grad(total_logit)(images.astype(jnp.float32))
    b = images.shape[0]
    norms = jnp.linalg.norm(grads.reshape(b, -1), axis=1)
    return jnp.mean((norms - center) ** 2)


def _replace_leaf(params: dict, path: Tuple[str, ...], value):
    """Return a copy of the nested params dict with one leaf replaced."""
    if len(path) == 1:
        out = dict(params)
        out[path[0]] = value
        return out
    out = dict(params)
    out[path[0]] = _replace_leaf(params[path[0]], path[1:], value)
    return out


def _grad_norm_wrt_conv_out(module: TokenizerModule, params, x_dec,
                            video_contains_first_frame, loss_of_recon):
    """∥∇_w loss(decode_pixels(sg(x_dec); w))∥₂ for w = conv_out kernel.

    Exact equivalent of the reference's grad_layer_wrt_loss: every path from
    the conv_out kernel to the loss goes through the reconstructed pixels, so
    stop-gradienting the decoder features changes nothing — but shrinks the
    backward to the pixels head."""
    x_sg = jax.lax.stop_gradient(x_dec)
    w0 = params['conv_out']['kernel']

    def f(w):
        p = _replace_leaf(params, ('conv_out', 'kernel'), w)
        recon = module.apply(
            {'params': p}, x_sg,
            video_contains_first_frame=video_contains_first_frame,
            method=TokenizerModule.decode_pixels)
        return loss_of_recon(recon).astype(jnp.float32)

    g = jax.grad(f)(w0.astype(jnp.float32))
    return jnp.linalg.norm(g.reshape(-1))


def tokenizer_loss(
    module: TokenizerModule,
    params,
    video,                      # (b, t, h, w, c)
    rng,
    *,
    discr_module=None,
    discr_params=None,
    multiscale_modules: Tuple = (),
    multiscale_params: Tuple = (),
    vgg_module=None,
    vgg_params=None,
    cond=None,
    video_contains_first_frame: bool = True,
    train: bool = True,
    use_vgg: bool = False,
    has_gan: bool = False,
    has_multiscale_gan: bool = False,
    perceptual_loss_weight: float = 1e-1,
    quantizer_aux_loss_weight: float = 1.0,
    adversarial_loss_weight: float = 1.0,
    multiscale_adversarial_loss_weight: float = 1.0,
):
    """Generator-side total loss (reference forward(return_loss=True),
    magvit2_pytorch.py:1695-1896). Returns (total, LossBreakdown, recon)."""
    b, frames, channels = video.shape[0], video.shape[1], video.shape[-1]

    rng, rng_drop_enc, rng_drop_dec = jax.random.split(rng, 3)
    # attention-prob dropout fires only when a 'dropout' rng is threaded in
    # (reference applies attn_dropout in training, magvit2_pytorch.py:374);
    # layers are keyed by module path so encoder/decoder masks differ
    enc_rngs = {'dropout': rng_drop_enc} if train else None
    dec_rngs = {'dropout': rng_drop_dec} if train else None

    latents = module.apply(
        {'params': params}, video, cond=cond,
        video_contains_first_frame=video_contains_first_frame,
        method=TokenizerModule.encode, rngs=enc_rngs)
    qout = module.apply(
        {'params': params}, latents, train=train,
        method=TokenizerModule.quantize)

    x_dec = module.apply(
        {'params': params}, qout.quantized, cond=cond,
        method=TokenizerModule.decode_features, rngs=dec_rngs)
    recon = module.apply(
        {'params': params}, x_dec,
        video_contains_first_frame=video_contains_first_frame,
        method=TokenizerModule.decode_pixels)

    recon_loss = jnp.mean(
        (video.astype(jnp.float32) - recon.astype(jnp.float32)) ** 2)
    aux_losses = qout.aux_loss

    zero = jnp.zeros((), jnp.float32)

    rng_percep, rng_gen = jax.random.split(rng)

    # perceptual loss on one random frame per sample (reference :1790-1808)
    if use_vgg:
        frame_idx = jax.random.randint(rng_percep, (b,), 0, frames)
        inp_frame = pick_video_frame(video, frame_idx)
        rec_frame = pick_video_frame(recon, frame_idx)

        def to_rgb(f):
            if channels == 1:
                f = jnp.repeat(f, 3, axis=-1)
            elif channels == 4:
                f = f[..., :3]
            # VGG16's five 2x2 max-pools need >=32px: below that the final
            # pool has zero extent, which silently yields NaN features (torch
            # errors loudly on the same input — reference :1806). Upscale tiny
            # frames so small-config training still gets a perceptual signal.
            fh, fw = f.shape[1], f.shape[2]
            if fh < 32 or fw < 32:
                f = jax.image.resize(
                    f, (f.shape[0], max(fh, 32), max(fw, 32), f.shape[-1]),
                    method='bilinear').astype(f.dtype)
            return f

        vgg_apply = lambda im: vgg_module.apply(vgg_params, to_rgb(im))
        inp_feats = vgg_apply(inp_frame)
        rec_feats = vgg_apply(rec_frame)
        perceptual_loss = jnp.mean(
            (inp_feats.astype(jnp.float32) - rec_feats.astype(jnp.float32)) ** 2)
    else:
        perceptual_loss = zero

    # adaptive adversarial weight needs ∥∇_w perceptual∥ (reference :1815-1820)
    norm_grad_wrt_perceptual = None
    if train and use_vgg and (has_gan or has_multiscale_gan):
        inp_feats_sg = jax.lax.stop_gradient(inp_feats)

        def perceptual_of_recon(r):
            rf = to_rgb(pick_video_frame(r, frame_idx))
            return jnp.mean((inp_feats_sg.astype(jnp.float32)
                             - vgg_apply(rf).astype(jnp.float32)) ** 2)

        norm_grad_wrt_perceptual = _grad_norm_wrt_conv_out(
            module, params, x_dec, video_contains_first_frame,
            perceptual_of_recon)

    # per-frame image discriminator generator loss (reference :1826-1841)
    if has_gan:
        gen_frame_idx = jax.random.randint(rng_gen, (b,), 0, frames)
        recon_frames = pick_video_frame(recon, gen_frame_idx)
        fake_logits = discr_module.apply({'params': discr_params}, recon_frames)
        gen_loss = hinge_gen_loss(fake_logits)

        adaptive_weight = jnp.ones((), jnp.float32)
        if exists(norm_grad_wrt_perceptual):
            def gen_of_recon(r):
                frames_r = pick_video_frame(r, gen_frame_idx)
                return hinge_gen_loss(
                    discr_module.apply({'params': discr_params}, frames_r))

            norm_grad_wrt_gen = _grad_norm_wrt_conv_out(
                module, params, x_dec, video_contains_first_frame, gen_of_recon)
            adaptive_weight = norm_grad_wrt_perceptual / jnp.clip(
                norm_grad_wrt_gen, 1e-3)
            adaptive_weight = jnp.clip(adaptive_weight, a_max=1e3)
            adaptive_weight = jnp.where(
                jnp.isnan(adaptive_weight), 1.0, adaptive_weight)
        adaptive_weight = jax.lax.stop_gradient(adaptive_weight)
    else:
        gen_loss = zero
        adaptive_weight = zero

    # multiscale generator losses (reference :1846-1868; quirk #1 fixed — the
    # discriminator IS applied to the recon)
    multiscale_gen_losses = []
    multiscale_gen_adaptive_weights = []
    if has_multiscale_gan and len(multiscale_modules) > 0:
        for ms_module, ms_params in zip(multiscale_modules, multiscale_params):
            ms_fake_logits = ms_module.apply({'params': ms_params}, recon)
            ms_gen_loss = hinge_gen_loss(ms_fake_logits)
            multiscale_gen_losses.append(ms_gen_loss)

            ms_adaptive = jnp.ones((), jnp.float32)
            if exists(norm_grad_wrt_perceptual):
                def ms_gen_of_recon(r, _mod=ms_module, _p=ms_params):
                    return hinge_gen_loss(_mod.apply({'params': _p}, r))

                ms_norm = _grad_norm_wrt_conv_out(
                    module, params, x_dec, video_contains_first_frame,
                    ms_gen_of_recon)
                ms_adaptive = norm_grad_wrt_perceptual / jnp.clip(ms_norm, 1e-5)
                ms_adaptive = jnp.clip(ms_adaptive, a_max=1e3)
            multiscale_gen_adaptive_weights.append(
                jax.lax.stop_gradient(ms_adaptive))

    total = (recon_loss
             + aux_losses * quantizer_aux_loss_weight
             + perceptual_loss * perceptual_loss_weight
             + gen_loss * adaptive_weight * adversarial_loss_weight)

    if multiscale_gen_losses:
        weighted = sum(l * w for l, w in zip(
            multiscale_gen_losses, multiscale_gen_adaptive_weights))
        total = total + weighted * multiscale_adversarial_loss_weight

    # codebook-health canaries (see codebook_stats): computed from indices
    # with stop_gradient semantics (indices are already non-differentiable)
    cfg = module.config
    cb_size = 1
    if cfg.use_fsq:
        for lv in cfg.fsq_levels:
            cb_size *= lv
    else:
        cb_size = cfg.codebook_size
    mean_bit_h, codes_seen = codebook_stats(
        qout.indices, cb_size, is_lfq=not cfg.use_fsq)

    breakdown = LossBreakdown(
        recon_loss=recon_loss,
        lfq_aux_loss=aux_losses,
        quantizer_loss_breakdown=qout.breakdown,
        perceptual_loss=perceptual_loss,
        adversarial_gen_loss=gen_loss,
        adaptive_adversarial_weight=adaptive_weight,
        multiscale_gen_losses=tuple(multiscale_gen_losses),
        multiscale_gen_adaptive_weights=tuple(multiscale_gen_adaptive_weights),
        mean_bit_entropy=mean_bit_h,
        codes_seen=codes_seen,
    )
    return total, breakdown, recon


def discriminator_loss(
    module: TokenizerModule,
    params,
    discr_module,
    discr_params,
    video,
    rng,
    *,
    multiscale_modules: Tuple = (),
    multiscale_params: Tuple = (),
    cond=None,
    video_contains_first_frame: bool = True,
    apply_gradient_penalty: bool = True,
    grad_penalty_loss_weight: float = 10.0,
    multiscale_adversarial_loss_weight: float = 1.0,
):
    """Discriminator-side loss (reference forward(return_discr_loss=True),
    magvit2_pytorch.py:1731-1786). Generator params are frozen (stop_gradient
    on the recon)."""
    b, frames = video.shape[0], video.shape[1]

    recon, _ = module.apply(
        {'params': jax.lax.stop_gradient(params)}, video, cond=cond,
        video_contains_first_frame=video_contains_first_frame)
    recon = jax.lax.stop_gradient(recon)

    frame_idx = jax.random.randint(rng, (b,), 0, frames)
    real = pick_video_frame(video, frame_idx)
    fake = pick_video_frame(recon, frame_idx)

    discr_fn = lambda im: discr_module.apply({'params': discr_params}, im)
    real_logits = discr_fn(real)
    fake_logits = discr_fn(fake)
    discr_loss_val = hinge_discr_loss(fake_logits, real_logits)

    # multiscale discriminators see the full videos (reference :1756-1763)
    multiscale_discr_losses = []
    for ms_module, ms_params in zip(multiscale_modules, multiscale_params):
        ms_fn = lambda v, _mod=ms_module, _p=ms_params: _mod.apply(
            {'params': _p}, v)
        ms_loss = hinge_discr_loss(ms_fn(recon), ms_fn(video))
        multiscale_discr_losses.append(ms_loss)

    zero = jnp.zeros((), jnp.float32)
    if apply_gradient_penalty:
        gp = gradient_penalty(discr_fn, real) + gradient_penalty(discr_fn, fake)
    else:
        gp = zero

    total = (discr_loss_val
             + gp * grad_penalty_loss_weight
             + sum(multiscale_discr_losses, zero)
             * multiscale_adversarial_loss_weight)

    breakdown = DiscrLossBreakdown(
        discr_loss=discr_loss_val,
        multiscale_discr_losses=tuple(multiscale_discr_losses),
        gradient_penalty=gp,
    )
    return total, breakdown
