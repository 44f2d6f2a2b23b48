"""Import the ACTUAL reference model file as a CPU test oracle.

``/root/reference/magvit2_pytorch/magvit2_pytorch.py`` is pure PyTorch but
imports several packages unavailable offline (torchvision, beartype, kornia,
vector_quantize_pytorch, gateloop_transformer, taylor_series_linear_attention).
This module installs minimal functional stand-ins into ``sys.modules`` and then
imports the reference module directly (bypassing the package __init__, which
would drag in the trainer's heavier deps). The resulting ``VideoTokenizer`` runs
the reference's real conv/attention/layer-stack code — the strongest available
correctness oracle for the JAX rebuild and its torch-checkpoint importer.

Stub fidelity notes:
- vector_quantize_pytorch -> tests/fixtures/vqp_torch.py (see its docstring for
  the assumed-semantics ledger).
- kornia.filters.filter3d: faithful reimplementation (replicate border,
  normalized kernel, per-channel depthwise conv).
- taylor_series_linear_attention / gateloop_transformer: functional equivalents
  mirroring the JAX rebuild's math with package-style parameter naming —
  fixtures built from layers using these validate the conversion machinery and
  the rebuild's math against torch autograd semantics, NOT against the real
  external packages (unavailable offline; flagged in STATUS.md).
- beartype: no-op decorator; torchvision: enum placeholder (fixture configs
  run with perceptual_loss_weight=0 so vgg16() is never constructed).
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import torch
import torch.nn.functional as F
from torch import nn

REFERENCE_DIR = Path('/root/reference/magvit2_pytorch')

_FIXTURES_DIR = Path(__file__).parent
if str(_FIXTURES_DIR) not in sys.path:
    sys.path.insert(0, str(_FIXTURES_DIR))


def _beartype_stub():
    mod = types.ModuleType('beartype')

    def beartype(obj=None, **kwargs):
        if obj is None:
            return lambda f: f
        return obj

    mod.beartype = beartype
    typing_mod = types.ModuleType('beartype.typing')
    import typing
    for name in dir(typing):
        if not name.startswith('_'):
            setattr(typing_mod, name, getattr(typing, name))
    mod.typing = typing_mod
    return mod, typing_mod


def _torchvision_stub():
    mod = types.ModuleType('torchvision')
    models = types.ModuleType('torchvision.models')

    class VGG16_Weights:  # noqa: N801 - mirrors torchvision name
        DEFAULT = 'DEFAULT'
        IMAGENET1K_V1 = 'IMAGENET1K_V1'

    def vgg16(weights=None):
        raise RuntimeError(
            'fixture stub: construct reference models with '
            'perceptual_loss_weight=0 (no torchvision offline)')

    models.VGG16_Weights = VGG16_Weights
    models.vgg16 = vgg16
    mod.models = models
    return mod, models


def _kornia_stub():
    mod = types.ModuleType('kornia')
    filters = types.ModuleType('kornia.filters')

    def filter3d(input, kernel, border_type='replicate', normalized=False):
        """kornia.filters.filter3d semantics: kernel (1|B, kD, kH, kW),
        replicate border, optional sum-normalization, per-channel conv."""
        b, c, d, h, w = input.shape
        k = kernel.to(input)
        if normalized:
            k = k / k.sum(dim=(-1, -2, -3), keepdim=True)
        kd, kh, kw = k.shape[-3:]
        pad = (kw // 2, kw // 2, kh // 2, kh // 2, kd // 2, kd // 2)
        x = F.pad(input, pad, mode=border_type)
        weight = k.reshape(1, 1, kd, kh, kw).expand(c, 1, kd, kh, kw)
        return F.conv3d(x, weight, groups=c)

    filters.filter3d = filter3d
    mod.filters = filters
    return mod, filters


class TaylorSeriesLinearAttn(nn.Module):
    """Functional equivalent of the external package wrapped by the reference
    (magvit2_pytorch.py:34,415-419): 2nd-order Taylor softmax linear attention
    with phi(t) = [1, t, vec(t t^T)/sqrt2], q scaled by dim_head**-0.5.
    Matches the JAX rebuild's ops/pallas/taylor_attention.py math exactly.
    Parameter naming follows the package style (fused qkv, no biases)."""

    def __init__(self, dim, *, dim_head=8, heads=8, eps=1e-5, **kwargs):
        super().__init__()
        self.heads, self.dim_head, self.eps = heads, dim_head, eps
        dim_inner = dim_head * heads
        self.to_qkv = nn.Sequential(nn.Linear(dim, dim_inner * 3, bias=False))
        self.to_out = nn.Sequential(nn.Identity(),
                                    nn.Linear(dim_inner, dim, bias=False))

    def forward(self, x):
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        qkv = self.to_qkv[0](x).reshape(b, n, 3, h, d)
        q = qkv[:, :, 0] * (d ** -0.5)
        k = qkv[:, :, 1]
        v = qkv[:, :, 2]

        def phi(t):
            outer = torch.einsum('bnhi,bnhj->bnhij', t, t) * (0.5 ** 0.5)
            return torch.cat([
                torch.ones((*t.shape[:-1], 1), dtype=t.dtype, device=t.device),
                t,
                outer.reshape(*t.shape[:-1], d * d),
            ], dim=-1)

        pq, pk = phi(q), phi(k)
        kv = torch.einsum('bnhD,bnhe->bhDe', pk, v)
        num = torch.einsum('bnhD,bhDe->bnhe', pq, kv)
        den = torch.einsum('bnhD,bhD->bnh', pq, pk.sum(dim=1))
        out = (num / (den[..., None] + self.eps)).reshape(b, n, h * d)
        return self.to_out[1](out)


class SimpleGateLoopLayer(nn.Module):
    """Functional equivalent of gateloop_transformer.SimpleGateLoopLayer
    (reference magvit2_pytorch.py:32,1216-1222) mirroring the JAX rebuild's
    ops/gateloop.py: qkva projection, sigmoid forget gate, diagonal linear
    recurrence s_t = a_t s_{t-1} + k_t v_t, o_t = q_t s_t."""

    def __init__(self, dim, use_heinsen=False, **kwargs):
        super().__init__()
        self.dim = dim
        self.to_qkva = nn.Linear(dim, dim * 4, bias=False)
        self.to_out = nn.Linear(dim, dim, bias=False)

    def forward(self, x):
        q, k, v, a = self.to_qkva(x).chunk(4, dim=-1)
        a = torch.sigmoid(a.float())
        kv = (k * v).float()
        s = torch.zeros_like(kv[:, 0])
        outs = []
        for t in range(x.shape[1]):
            s = a[:, t] * s + kv[:, t]
            outs.append(s)
        s = torch.stack(outs, dim=1)
        out = (q.float() * s).to(x.dtype)
        return self.to_out(out)


def install_stubs():
    """Idempotently install all stub modules into sys.modules."""
    if 'vector_quantize_pytorch' not in sys.modules:
        import vqp_torch
        vq = types.ModuleType('vector_quantize_pytorch')
        vq.LFQ = vqp_torch.LFQ
        vq.FSQ = vqp_torch.FSQ
        sys.modules['vector_quantize_pytorch'] = vq

    if 'beartype' not in sys.modules:
        bt, bt_typing = _beartype_stub()
        sys.modules['beartype'] = bt
        sys.modules['beartype.typing'] = bt_typing

    if 'torchvision' not in sys.modules:
        tv, tv_models = _torchvision_stub()
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.models'] = tv_models

    if 'kornia' not in sys.modules:
        kornia, kfilters = _kornia_stub()
        sys.modules['kornia'] = kornia
        sys.modules['kornia.filters'] = kfilters

    if 'taylor_series_linear_attention' not in sys.modules:
        ts = types.ModuleType('taylor_series_linear_attention')
        ts.TaylorSeriesLinearAttn = TaylorSeriesLinearAttn
        sys.modules['taylor_series_linear_attention'] = ts

    if 'gateloop_transformer' not in sys.modules:
        gl = types.ModuleType('gateloop_transformer')
        gl.SimpleGateLoopLayer = SimpleGateLoopLayer
        sys.modules['gateloop_transformer'] = gl


def load_reference_module():
    """Import /root/reference/magvit2_pytorch/magvit2_pytorch.py (read-only)
    with stubbed deps, bypassing the package __init__."""
    install_stubs()

    if 'magvit2_pytorch.magvit2_pytorch' in sys.modules:
        return sys.modules['magvit2_pytorch.magvit2_pytorch']

    # register the package WITHOUT executing its __init__ (which imports the
    # trainer and its heavier dependency set)
    if 'magvit2_pytorch' not in sys.modules:
        pkg = types.ModuleType('magvit2_pytorch')
        pkg.__path__ = [str(REFERENCE_DIR)]
        sys.modules['magvit2_pytorch'] = pkg

    for name in ('version', 'attend', 'magvit2_pytorch'):
        full = f'magvit2_pytorch.{name}'
        if full in sys.modules:
            continue
        spec = importlib.util.spec_from_file_location(
            full, REFERENCE_DIR / f'{name}.py')
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
        setattr(sys.modules['magvit2_pytorch'], name, mod)

    return sys.modules['magvit2_pytorch.magvit2_pytorch']
