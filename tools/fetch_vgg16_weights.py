#!/usr/bin/env python
"""One-time, run-anywhere converter for the pretrained VGG16 perceptual net.

The reference builds its perceptual loss from torchvision's pretrained VGG16
(reference magvit2_pytorch.py:1399-1403). This training image has no network
egress and no torchvision, so the weights cannot be bundled — run this script
ONCE on any machine with internet (torchvision optional), copy the resulting
``vgg16.npz`` next to your training config, and pass
``VideoTokenizer(..., vgg_weights='vgg16.npz')``.

Modes:
  python tools/fetch_vgg16_weights.py vgg16.npz
      downloads torchvision's canonical checkpoint
      (https://download.pytorch.org/models/vgg16-397923af.pth — the
      IMAGENET1K_V1 / pre-0.13 default weights the reference era used)
      via torch.hub and converts it. Needs torch + internet, NOT torchvision.

  python tools/fetch_vgg16_weights.py vgg16.npz --from-pth /path/vgg16.pth
      converts an already-downloaded torchvision vgg16 state_dict offline.

The .npz keeps torchvision's own key names (features.N.weight, ...);
``VideoTokenizer.load_vgg_weights`` / ``models/vgg.py:
load_torch_vgg16_state_dict`` do the layout transposes at load time, so the
artifact stays a faithful, inspectable copy of the upstream checkpoint.
"""

import argparse

VGG16_URL = 'https://download.pytorch.org/models/vgg16-397923af.pth'

# keys the converter consumes (13 convs + first two classifier Linears)
NEEDED_PREFIXES = ('features.', 'classifier.0.', 'classifier.3.')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('output', help='output .npz path')
    parser.add_argument('--from-pth', default=None,
                        help='convert a local torchvision vgg16 .pth instead '
                             'of downloading')
    args = parser.parse_args()

    import numpy as np
    import torch

    if args.from_pth:
        state = torch.load(args.from_pth, map_location='cpu',
                           weights_only=True)
    else:
        state = torch.hub.load_state_dict_from_url(
            VGG16_URL, map_location='cpu', weights_only=True)

    out = {}
    for k, v in state.items():
        if k.startswith(NEEDED_PREFIXES):
            out[k] = v.detach().cpu().numpy().astype(np.float32)

    assert sum(k.startswith('features.') and k.endswith('.weight')
               for k in out) == 13, 'expected 13 VGG16 conv layers'
    assert 'classifier.0.weight' in out and 'classifier.3.weight' in out

    np.savez(args.output, **out)
    n_params = sum(v.size for v in out.values())
    print(f'wrote {args.output}: {len(out)} tensors, {n_params:,} params')
    print("use: VideoTokenizer(..., vgg_weights='%s')" % args.output)


if __name__ == '__main__':
    main()
