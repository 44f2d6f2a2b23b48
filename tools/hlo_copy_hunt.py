#!/usr/bin/env python
"""Hunt layout-change copies in the compiled flagship roundtrip.

The lane-packed layout loses to unpacked at batch 128 (r2: 1323 vs 1434;
r3: 1394 vs 1512 with fused kernels) even though every stem op measures
faster packed in isolation — so XLA is inserting relayout copies somewhere
between stages. This tool AOT-compiles the roundtrip (packed and unpacked)
and ranks `copy`/`transpose`/`reshape`-family instructions in the optimized
HLO by byte size, attributing each to the nearest named op in its operand
chain. Lowering only — safe to run without touching device memory.

Usage: python tools/hlo_copy_hunt.py [--batch 128] [--lane-pack true]
"""

import argparse
import collections
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

SHAPE_RE = re.compile(r'(bf16|f32|f16|s32|u32|s8|u8|pred)\[([0-9,]*)\]')
BYTES = {'bf16': 2, 'f32': 4, 'f16': 2, 's32': 4, 'u32': 4, 's8': 1,
         'u8': 1, 'pred': 1}


def shape_bytes(text):
    m = SHAPE_RE.search(text)
    if not m:
        return 0
    dims = [int(d) for d in m.group(2).split(',') if d]
    n = 1
    for d in dims:
        n *= d
    return n * BYTES[m.group(1)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=128)
    p.add_argument('--lane-pack', default='true',
                   choices=['false', 'encoder', 'true'])
    p.add_argument('--top', type=int, default=25)
    args = p.parse_args()

    from magvit2_pytorch_tpu.configs import readme_video_tokenizer_kwargs
    from magvit2_pytorch_tpu.models import VideoTokenizer

    tok = VideoTokenizer(
        **readme_video_tokenizer_kwargs(
            image_size=128, use_gan=False, perceptual_loss_weight=0.0,
            lane_pack={'false': False, 'encoder': 'encoder',
                       'true': True}[args.lane_pack]),
        seed=0)
    module = tok.module
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        tok.params)

    def roundtrip(params, video):
        recon, _ = module.apply({'params': params}, video)
        return recon

    shape = jax.ShapeDtypeStruct(
        (args.batch, 17, 128, 128, 3), jnp.bfloat16)
    pshapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
    compiled = jax.jit(roundtrip).lower(pshapes, shape).compile()
    hlo = compiled.as_text()

    # rank relayout-ish instructions by bytes moved
    rows = []
    total = collections.Counter()
    for line in hlo.splitlines():
        line = line.strip()
        m = re.match(r'%?([\w.\-]+)\s*=\s*(\S+\[\S*\]\S*)\s+(\w+)\(', line)
        if not m:
            continue
        name, shape_s, op = m.groups()
        if op not in ('copy', 'transpose', 'bitcast-convert'):
            continue
        b = shape_bytes(shape_s)
        total[op] += b
        # metadata op_name attribution if present
        meta = re.search(r'op_name="([^"]+)"', line)
        rows.append((b, op, name, meta.group(1) if meta else '?'))

    rows.sort(reverse=True)
    print(f'# lane_pack={args.lane_pack} batch={args.batch} '
          f'backend={jax.default_backend()}')
    for op, b in total.most_common():
        print(f'TOTAL {op}: {b/1e9:.3f} GB')
    print()
    for b, op, name, meta in rows[:args.top]:
        print(f'{b/1e6:10.1f} MB  {op:10s}  {name:40s}  {meta[:120]}')


if __name__ == '__main__':
    main()
