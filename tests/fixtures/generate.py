"""Generate golden parity fixtures from the ACTUAL reference implementation.

Run from the repo root:  python tests/fixtures/generate.py

Outputs ``tests/fixtures/data/*.npz``:
- quantizer fixtures: seeded inputs + indices/quantized/aux outputs of the
  torch LFQ/FSQ oracle (vqp_torch.py) in train and eval mode;
- tokenizer fixtures: seeded reference ``VideoTokenizer`` (the real code at
  /root/reference, imported via ref_loader with stubbed deps) state_dict +
  input video + encoder latents + code indices + reconstruction, for several
  configs covering every layer type.

tests/test_torch_parity.py consumes these; fixtures are committed so the tests
run without torch-side regeneration.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).parent))

import vqp_torch
from ref_loader import load_reference_module

DATA = Path(__file__).parent / 'data'
DATA.mkdir(exist_ok=True)


def save(name, **arrays):
    np.savez_compressed(DATA / f'{name}.npz', **arrays)
    print(f'wrote {name}.npz ({len(arrays)} arrays)')


# ---------------------------------------------------------------- quantizers

def gen_lfq(name, *, dim, codebook_size, num_codebooks=1, spherical=False,
            soft_clamp=None, seed=0, train=True):
    torch.manual_seed(seed)
    lfq = vqp_torch.LFQ(
        dim=dim, codebook_size=codebook_size, num_codebooks=num_codebooks,
        entropy_loss_weight=0.1, commitment_loss_weight=1.0,
        diversity_gamma=2.5, soft_clamp_input_value=soft_clamp,
        spherical=spherical)
    lfq.train(train)
    x = torch.randn(2, 3, 4, 4, dim).movedim(-1, 1) * 2.0  # (b, d, t, h, w)
    with torch.no_grad():
        (q, idx, aux), bd = lfq(x, return_loss_breakdown=True)
        decoded = lfq.indices_to_codes(idx)

    arrays = dict(
        x=x.numpy(), quantized=q.numpy(), indices=idx.numpy().astype(np.int32),
        aux=np.float32(aux.item()),
        per_sample_entropy=np.float32(bd.per_sample_entropy.item()),
        batch_entropy=np.float32(bd.batch_entropy.item()),
        commitment=np.float32(bd.commitment.item()),
        decoded=decoded.numpy(),
        meta=np.bytes_(json.dumps(dict(
            dim=dim, codebook_size=codebook_size, num_codebooks=num_codebooks,
            spherical=spherical, soft_clamp=soft_clamp, train=train))),
    )
    for k, v in lfq.state_dict().items():
        if k in ('mask', 'codebook'):
            continue
        arrays[f'sd.{k}'] = v.numpy()
    save(name, **arrays)


def gen_fsq(name, *, levels, dim=None, num_codebooks=1, seed=0):
    torch.manual_seed(seed)
    fsq = vqp_torch.FSQ(levels, dim=dim, num_codebooks=num_codebooks)
    fsq.eval()
    eff_dim = fsq.dim
    x = torch.randn(2, 3, 4, 4, eff_dim).movedim(-1, 1) * 1.5
    with torch.no_grad():
        q, idx = fsq(x)
        decoded = fsq.indices_to_codes(idx)
    arrays = dict(
        x=x.numpy(), quantized=q.numpy(), indices=idx.numpy().astype(np.int32),
        decoded=decoded.numpy(),
        meta=np.bytes_(json.dumps(dict(
            levels=list(levels), dim=dim, num_codebooks=num_codebooks))),
    )
    for k, v in fsq.state_dict().items():
        if k.startswith('_'):
            continue
        arrays[f'sd.{k}'] = v.numpy()
    save(name, **arrays)


# ----------------------------------------------------------------- tokenizer

def gen_tokenizer(name, config: dict, *, frames=5, batch=2, seed=0,
                  dim_cond=None):
    ref = load_reference_module()
    torch.manual_seed(seed)
    tok = ref.VideoTokenizer(**config)
    tok.eval()

    torch.manual_seed(seed + 100)
    video = torch.rand(batch, config.get('channels', 3), frames,
                       config['image_size'], config['image_size'])
    cond = None
    if dim_cond is not None:
        cond = torch.randn(batch, dim_cond)

    kwargs = dict(cond=cond) if cond is not None else {}
    with torch.no_grad():
        latents = tok.encode(video, video_contains_first_frame=True, **kwargs)
        codes = tok(video, return_codes=True, **kwargs)
        recon = tok(video, **kwargs)
        # round trip through flattened indices (reference README contract)
        flat = codes.reshape(codes.shape[0], -1)
        recon_from_codes = tok.decode_from_code_indices(
            flat, video_contains_first_frame=True, **kwargs)

    arrays = dict(
        video=video.numpy(),
        latents=latents.numpy(),
        codes=codes.numpy().astype(np.int64),
        recon=recon.numpy(),
        recon_from_codes=recon_from_codes.numpy(),
        config=np.bytes_(json.dumps(config)),
    )
    if cond is not None:
        arrays['cond'] = cond.numpy()
    for k, v in tok.state_dict().items():
        if k.startswith(('discr.', 'vgg.', 'multiscale_discrs.')):
            continue
        arrays[f'sd.{k}'] = v.numpy()
    save(name, **arrays)


def main():
    # quantizer-only fixtures
    gen_lfq('lfq_noproj', dim=8, codebook_size=256, train=True)
    gen_lfq('lfq_noproj_eval', dim=8, codebook_size=256, train=False, seed=1)
    gen_lfq('lfq_proj_clamp', dim=16, codebook_size=512, soft_clamp=10.0,
            seed=2)
    gen_lfq('lfq_spherical', dim=8, codebook_size=256, spherical=True, seed=3)
    gen_lfq('lfq_multicb', dim=12, codebook_size=64, num_codebooks=2, seed=4)
    gen_fsq('fsq_basic', levels=(8, 5, 5, 5))
    gen_fsq('fsq_proj', levels=(7, 5, 5), dim=9, seed=5)
    gen_fsq('fsq_multicb', levels=(5, 3), num_codebooks=2, seed=6)

    base = dict(
        image_size=16,
        init_dim=8,
        codebook_size=256,
        layers=(
            'residual',
            ('consecutive_residual', 2),
            ('compress_space', 12),
            'attend_space',
            ('compress_time', 16),
            'attend_time',
            'linear_attend_space',
        ),
        perceptual_loss_weight=0.0,
        use_gan=False,
        flash_attn=False,
    )
    gen_tokenizer('tok_lfq', base)

    fsq_cfg = {**base, 'codebook_size': None, 'use_fsq': True,
               'fsq_levels': [8, 5, 5, 5]}
    gen_tokenizer('tok_fsq', fsq_cfg, seed=1)

    # NOTE (reference quirks #8/#9, fixed in the rebuild, verified here):
    # - 'cond_linear_attend_space' crashes the reference — its registry passes
    #   flash= to LinearAttention which does not accept it
    #   (magvit2_pytorch.py:1267-1283);
    # - the cond_attend_* layers crash too: their Sequential wrapper is plain
    #   nn.Sequential whose forward takes no kwargs, yet encode hands it
    #   cond= (magvit2_pytorch.py:1565-1572, 159-165). The only cond layer the
    #   reference can actually run is cond_residual, and only when every layer
    #   AFTER it also accepts cond (the has_cond flag is sticky).
    cond_cfg = {**base,
                'layers': (
                    'residual',
                    ('compress_space', 12),
                    ('compress_time', 16),
                    'cond_residual',
                    'cond_residual',
                ),
                'dim_cond': 4}
    gen_tokenizer('tok_cond', cond_cfg, seed=2, dim_cond=4)

    sff_cfg = {**base,
               'layers': ('residual', ('compress_time', 12)),
               'separate_first_frame_encoding': True}
    gen_tokenizer('tok_sff', sff_cfg, seed=3)

    gl_cfg = {**base,
              'layers': ('residual', ('compress_time', 12), 'gateloop_time')}
    gen_tokenizer('tok_gateloop', gl_cfg, seed=4)


if __name__ == '__main__':
    main()
