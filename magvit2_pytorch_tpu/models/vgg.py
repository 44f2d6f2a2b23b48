"""VGG16 feature extractor for the perceptual loss.

The reference uses torchvision's pretrained VGG16 with the classifier
truncated by its last two layers (magvit2_pytorch.py:1392-1407 — ends after
the second 4096-d Linear+ReLU), fed raw [0,1] frames (no ImageNet
normalization). torchvision is not importable here, so this is a first-party
flax VGG16 with:

- identical architecture (cfg-D features, adaptive 7x7 avgpool, truncated
  classifier), channels-last;
- channel-first flatten ordering between avgpool and classifier so torchvision
  ``vgg16`` state_dicts convert weight-for-weight
  (``load_torch_vgg16_state_dict``);
- dropout omitted (the perceptual net always runs in eval mode).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from magvit2_pytorch_tpu.ops.basic import Linear
from magvit2_pytorch_tpu.ops.conv import Conv2d

VGG16_CFG = (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
             512, 512, 512, 'M', 512, 512, 512, 'M')


def adaptive_avg_pool_2d(x, out_hw=(7, 7)):
    """torch AdaptiveAvgPool2d semantics on (B, H, W, C): window
    [floor(i*H/out), ceil((i+1)*H/out)) per output cell — exact for any
    input/output ratio (including upscaling)."""
    b, h, w, c = x.shape
    oh, ow = out_hw

    def pool_axis(t, in_size, out_size, axis):
        if in_size == out_size:
            return t
        slices = []
        for i in range(out_size):
            start = (i * in_size) // out_size
            end = -(-((i + 1) * in_size) // out_size)
            sl = jax.lax.slice_in_dim(t, start, end, axis=axis)
            slices.append(jnp.mean(sl, axis=axis, keepdims=True))
        return jnp.concatenate(slices, axis=axis)

    x = pool_axis(x, h, oh, axis=1)
    x = pool_axis(x, w, ow, axis=2)
    return x


class VGG16Features(nn.Module):
    """VGG16 up to the truncated classifier -> (B, 4096) features."""

    @nn.compact
    def __call__(self, x):
        conv_idx = 0
        for v in VGG16_CFG:
            if v == 'M':
                x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
            else:
                x = Conv2d(v, 3, padding=1, name=f'conv_{conv_idx}')(x)
                x = jax.nn.relu(x)
                conv_idx += 1

        x = adaptive_avg_pool_2d(x, (7, 7))
        b, h, w, c = x.shape
        # channel-first flatten for torchvision weight parity
        x = x.transpose(0, 3, 1, 2).reshape(b, c * h * w)

        x = Linear(4096, name='fc_0')(x)
        x = jax.nn.relu(x)
        x = Linear(4096, name='fc_1')(x)
        x = jax.nn.relu(x)
        return x


def load_torch_vgg16_state_dict(state_dict) -> dict:
    """Convert a torchvision ``vgg16`` state_dict (tensors or ndarrays keyed
    ``features.N.weight`` / ``classifier.N.weight``) into VGG16Features flax
    params."""

    def to_np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, 'detach') else t)

    params = {}
    conv_idx = 0
    layer_idx = 0
    for v in VGG16_CFG:
        if v == 'M':
            layer_idx += 1  # maxpool occupies one features index
            continue
        w = to_np(state_dict[f'features.{layer_idx}.weight'])  # (O,I,kh,kw)
        b = to_np(state_dict[f'features.{layer_idx}.bias'])
        params[f'conv_{conv_idx}'] = {
            'kernel': jnp.asarray(w.transpose(2, 3, 1, 0)),
            'bias': jnp.asarray(b),
        }
        conv_idx += 1
        layer_idx += 2  # conv + relu

    for our, theirs in (('fc_0', 0), ('fc_1', 3)):
        w = to_np(state_dict[f'classifier.{theirs}.weight'])   # (out, in)
        b = to_np(state_dict[f'classifier.{theirs}.bias'])
        params[our] = {'kernel': jnp.asarray(w.T), 'bias': jnp.asarray(b)}

    return {'params': params}


def orthogonalize_vgg_params(vgg_params, seed: int = 7):
    """Re-init every VGG kernel orthogonally at ReLU gain sqrt(2).

    The flax default (lecun_normal) decays activation variance through the
    15-layer ReLU tower, so a random-init VGG measures perceptual losses of
    O(1e-11)-O(1e-14) — which in turn drives the adaptive adversarial weight
    (reference magvit2_pytorch.py:1815-1829, its numerator is the perceptual
    gradient norm) to ~0 and silently disables the GAN signal. Orthogonal
    kernels at gain sqrt(2) keep ReLU feature variance O(1) per layer, so a
    weights-less setup still exercises the perceptual + adaptive paths with
    meaningful magnitudes. NOT a substitute for pretrained weights — random
    orthogonal features carry no perceptual prior — just non-degenerate.
    """

    def _orth(path, leaf):
        name = path[-1].key if hasattr(path[-1], 'key') else str(path[-1])
        if name != 'kernel':
            return leaf
        key = jax.random.fold_in(jax.random.PRNGKey(seed), abs(hash(
            tuple(str(p) for p in path))) % (2 ** 31))
        flat_shape = (int(np.prod(leaf.shape[:-1])), leaf.shape[-1])
        q = jax.nn.initializers.orthogonal(scale=float(np.sqrt(2)))(
            key, flat_shape, jnp.float32)
        return q.reshape(leaf.shape).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(_orth, vgg_params)
