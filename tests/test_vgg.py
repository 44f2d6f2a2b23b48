"""VGG16 feature extractor: torchvision state_dict conversion (synthetic
weights — torchvision itself is not installed) and torch-equivalent forward."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from magvit2_pytorch_tpu.models.vgg import (
    VGG16_CFG,
    VGG16Features,
    load_torch_vgg16_state_dict,
)


def _synthetic_torch_vgg16_state_dict(seed=0):
    """Build a state dict with torchvision vgg16 keys/shapes."""
    rng = np.random.default_rng(seed)
    state = {}
    in_c = 3
    idx = 0
    for v in VGG16_CFG:
        if v == 'M':
            idx += 1
            continue
        state[f'features.{idx}.weight'] = rng.normal(
            size=(v, in_c, 3, 3)).astype(np.float32) * 0.05
        state[f'features.{idx}.bias'] = rng.normal(size=(v,)).astype(np.float32)
        in_c = v
        idx += 2
    state['classifier.0.weight'] = rng.normal(
        size=(4096, 512 * 7 * 7)).astype(np.float32) * 0.01
    state['classifier.0.bias'] = rng.normal(size=(4096,)).astype(np.float32)
    state['classifier.3.weight'] = rng.normal(
        size=(4096, 4096)).astype(np.float32) * 0.01
    state['classifier.3.bias'] = rng.normal(size=(4096,)).astype(np.float32)
    return state


def _torch_vgg16_features(state, x):
    """Run the torchvision-equivalent forward in torch from the state dict."""
    t = torch.tensor(x.transpose(0, 3, 1, 2))
    idx = 0
    for v in VGG16_CFG:
        if v == 'M':
            t = F.max_pool2d(t, 2, 2)
            idx += 1
            continue
        w = torch.tensor(state[f'features.{idx}.weight'])
        b = torch.tensor(state[f'features.{idx}.bias'])
        t = F.relu(F.conv2d(t, w, b, padding=1))
        idx += 2
    t = F.adaptive_avg_pool2d(t, (7, 7))
    t = torch.flatten(t, 1)
    t = F.relu(F.linear(t, torch.tensor(state['classifier.0.weight']),
                        torch.tensor(state['classifier.0.bias'])))
    t = F.relu(F.linear(t, torch.tensor(state['classifier.3.weight']),
                        torch.tensor(state['classifier.3.bias'])))
    return t.numpy()


def test_vgg_conversion_matches_torch_forward():
    state = _synthetic_torch_vgg16_state_dict()
    params = load_torch_vgg16_state_dict(state)

    rng = np.random.default_rng(1)
    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)

    vgg = VGG16Features()
    ours = np.asarray(vgg.apply(params, jnp.asarray(x)))
    ref = _torch_vgg16_features(state, x)

    assert ours.shape == (2, 4096)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_random_vgg_warns_and_npz_weights_load(tmp_path):
    """Tokenizer must warn loudly when the perceptual net is random-init
    (VERDICT round-1 item 3) and load the tools/fetch_vgg16_weights.py .npz
    artifact (torchvision key names) silently."""
    import warnings

    import pytest

    from magvit2_pytorch_tpu.models import VideoTokenizer

    kwargs = dict(
        image_size=32,
        init_dim=8,
        codebook_size=64,
        layers=('residual',),
        use_gan=False,
        perceptual_loss_weight=1.0,
        seed=0,
    )

    with pytest.warns(UserWarning, match='randomly'):
        tok = VideoTokenizer(**kwargs)
    assert tok.use_vgg and not tok.vgg_pretrained

    # the weights-less tower must be NON-degenerate (r4 review #8 / the r5
    # flagship GAN run measured perceptual ~2e-11 under the flax default,
    # which zeroes the adaptive adversarial weight): orthogonal re-init
    # keeps features O(1), so two distinct images must measure a perceptual
    # distance far above fp noise
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    fa = tok.vgg.apply(tok.vgg_params, a)
    fb = tok.vgg.apply(tok.vgg_params, b)
    dist = float(jnp.mean((fa - fb) ** 2))
    assert 1e-4 < dist < 1e6, dist

    state = _synthetic_torch_vgg16_state_dict()
    npz_path = tmp_path / 'vgg16.npz'
    np.savez(npz_path, **state)

    with warnings.catch_warnings():
        warnings.simplefilter('error')  # no warning when weights are given
        tok = VideoTokenizer(**kwargs, vgg_weights=str(npz_path))
    assert tok.vgg_pretrained

    # loaded params match the direct conversion
    direct = load_torch_vgg16_state_dict(state)
    jax.tree.map(np.testing.assert_array_equal, tok.vgg_params, direct)
