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
