"""PyTorch LFQ/FSQ oracle matching ``vector_quantize_pytorch`` semantics.

The reference delegates quantization to the external ``vector-quantize-pytorch``
package (>=1.14.39, /root/reference/setup.py:34; construction at
magvit2_pytorch.py:1364-1382). That package is not installable in this offline
image, so this module re-derives its LFQ/FSQ forward semantics in PyTorch from
the published algorithms (MagViT2 arXiv 2310.05737 §3.1; FSQ arXiv 2309.15505)
and the package's documented conventions. It serves two purposes:

1. an independent *cross-framework* oracle: golden fixtures generated from this
   torch code are asserted against the JAX quantizers in
   tests/test_torch_parity.py (indices must match exactly);
2. the ``vector_quantize_pytorch`` import stub used when instantiating the
   actual reference model for end-to-end fixtures (tests/fixtures/ref_loader.py).

Assumed package semantics (each is a potential divergence point vs the real
package; all are recorded here so any future access to the package can check
them line by line). Each entry carries an EVIDENCE tag (round-3 review
item #10 — shrink the assumption surface; no new external material exists
in this zero-egress image, so the tags grade what backs each assumption):

  [paper]     pinned by the published algorithm (MagViT2 arXiv 2310.05737
              §3.1; FSQ arXiv 2309.15505 §2/§3.1; BSQ arXiv 2406.07548 §3).
  [ref-api]   pinned by the reference's own construction kwargs
              (magvit2_pytorch.py:1363-1381) — a wrong name/semantic would
              break the reference itself.
  [ckpt]      falsifiable by any real reference checkpoint through the
              strict importer / exact-index tests (a divergence surfaces as
              a loud, structured failure).
  [convention] package-internal choice we cannot verify offline — the
              actual residual risk.

LFQ:
- A1. codebook_dim = log2(codebook_size); project_in/out = nn.Linear WITH
      bias, present iff dim != codebook_dim * num_codebooks.
      [paper] (codes are {-1,1}^log2(K)); bias presence/absence is [ckpt]
      (strict import fails on an unexpected/missing `quantizers.*.bias`).
- A2. indices are MSB-first bit packs: mask = 2**arange(d-1, ..., 0),
      index = sum((x > 0) * mask)  →  channel 0 is the most significant bit.
      [convention] — the paper does not fix bit order. Falsified-by: any
      real checkpoint decode (mismatch pattern = exact bit reversal);
      pinned as literal vectors in tests/test_quantizers.py::
      test_lfq_bit_order_msb_first.
- A3. soft clamp x = tanh(x / v) * v applied after project_in (and after the
      spherical l2norm), before quantization; the commitment loss compares
      the CLAMPED input against the detached codes.
      kwarg existence [ref-api]; clamp FORM and ordering [convention]
      (index-invariant for the sign quantizer when v > 0 — ordering only
      shifts loss values, not codes, except spherical interplay).
- A4. spherical=True is BSQ: the input is l2-normalized and the quantized
      codes are too (codes = ±1/sqrt(d)); the entropy codebook rows likewise.
      [paper] (BSQ); the kwarg name `spherical` is [ref-api].
- A5. straight-through x + (quantized - x).detach() in TRAINING only; eval
      returns the exact code values. STE-in-training [paper]; exact-at-eval
      [convention] (index-invariant; affects decoder inputs only).
- A6. entropy aux loss: probs = softmax(2 * inv_temperature * x @ codebook^T)
      (inv_temperature default 100); per_sample_entropy = H(probs).mean();
      codebook_entropy = H(mean probs over batch*seq).mean over codebooks;
      entropy_aux = per_sample - diversity_gamma * codebook_entropy.
      Loss STRUCTURE [paper] (eq. for H(E[p]) and E[H(p)]);
      inv_temperature=100 default and the exact softmax scaling
      [convention] — training-dynamics-only, never affects indices.
      MEASURED CONSEQUENCE (r3): with the assumed x100 scaling, BOTH
      diversity-term gradients (full-softmax and factorized) are
      numerically zero once |z| > ~0.05 (sigmoid(4*100*z) saturates) —
      the term cannot oppose codebook collapse after the earliest steps,
      and a scaled 2^18 probe (tools/codebook_probe.py) collapses to one
      code by step 20. If the real package trains healthy codebooks at
      this setting, its scaling must differ from A6 — the single most
      falsification-worthy entry in this ledger. The rebuild exposes
      lfq_entropy_inv_temperature to unsaturate it (1-10 keeps gradients
      alive).
- A7. returned aux loss = entropy_aux * entropy_loss_weight
      + commitment * commitment_loss_weight (commitment = plain MSE);
      aux losses are zero at eval. Weight kwargs [ref-api]; composition
      [convention] (training-dynamics-only).
- A8. quantization math runs in float32 (force_quantization_f32).
      [convention] — affects only sub-ulp sign boundaries; exercised by the
      margin contract test (tests/test_torch_parity.py, |x| margin floor).

FSQ:
- B1. basis = cumprod([1, *levels[:-1]]) — the FIRST level is the LEAST
      significant digit. [convention] for digit ORDER ([paper] fixes only
      the mixed-radix total); pinned as literal vectors in
      tests/test_torch_parity.py (per-digit comparison) and falsified-by
      any real checkpoint (mismatch = digit permutation).
- B2. bound(z) = tanh(z + shift) * half_l - offset with
      half_l = (levels-1)(1+eps)/2, offset = 0.5 for even levels,
      shift = atanh(offset / half_l); codes = round(bound(z)) / (levels // 2).
      [paper] (FSQ §3.1 gives exactly this construction incl. the even-level
      half-shift); the (1+eps) guard is [convention].
- B3. no aux losses; round uses straight-through in training. [paper].
- B4. project_in/out Linear with bias iff dim != len(levels) * num_codebooks.
      [ckpt] (same strict-import argument as A1).

Shared: channel-first inputs of ndim >= 4 are internally moved to
channels-last and flattened to (b, n, d) exactly as einops
``'b d ... -> b ... d'`` + pack; indices come back as (b, *spatial)
[, num_codebooks if > 1].
"""

from __future__ import annotations

from collections import namedtuple
from math import log2

import torch
import torch.nn.functional as F
from torch import nn

Return = namedtuple('Return', ['quantized', 'indices', 'entropy_aux_loss'])
LossBreakdown = namedtuple(
    'LossBreakdown', ['per_sample_entropy', 'batch_entropy', 'commitment'])


def _entropy(prob, eps=1e-5):
    return (-prob * torch.log(prob.clamp(min=eps))).sum(dim=-1)


class LFQ(nn.Module):
    def __init__(
        self,
        *,
        dim=None,
        codebook_size=None,
        num_codebooks=1,
        entropy_loss_weight=0.1,
        commitment_loss_weight=1.0,
        diversity_gamma=2.5,
        soft_clamp_input_value=None,
        spherical=False,
        keep_num_codebooks_dim=None,
        inv_temperature=100.0,
    ):
        super().__init__()
        assert codebook_size is not None and codebook_size & (codebook_size - 1) == 0
        codebook_dim = int(log2(codebook_size))
        codebook_dims = codebook_dim * num_codebooks
        dim = dim if dim is not None else codebook_dims

        self.dim = dim
        self.codebook_size = codebook_size
        self.codebook_dim = codebook_dim
        self.num_codebooks = num_codebooks
        self.entropy_loss_weight = entropy_loss_weight
        self.commitment_loss_weight = commitment_loss_weight
        self.diversity_gamma = diversity_gamma
        self.soft_clamp_input_value = soft_clamp_input_value
        self.spherical = spherical
        self.inv_temperature = inv_temperature
        self.keep_num_codebooks_dim = (
            keep_num_codebooks_dim if keep_num_codebooks_dim is not None
            else num_codebooks > 1)

        has_projections = dim != codebook_dims
        self.project_in = (nn.Linear(dim, codebook_dims) if has_projections
                           else nn.Identity())
        self.project_out = (nn.Linear(codebook_dims, dim) if has_projections
                            else nn.Identity())

        self.register_buffer(
            'mask', 2 ** torch.arange(codebook_dim - 1, -1, -1))
        all_codes = torch.arange(codebook_size)
        bits = ((all_codes[..., None].int() & self.mask) != 0).float()
        self.register_buffer('codebook', bits * 2 - 1, persistent=False)

    def _maybe_l2norm(self, t):
        if self.spherical:
            return F.normalize(t, dim=-1)
        return t

    def indices_to_codes(self, indices):
        if not self.keep_num_codebooks_dim:
            indices = indices[..., None]
        is_img_or_video = indices.ndim >= 4  # (b, *spatial, c)
        bits = ((indices[..., None].int() & self.mask) != 0).float()
        codes = bits * 2 - 1
        codes = self._maybe_l2norm(codes)
        codes = codes.reshape(*codes.shape[:-2], -1)
        codes = self.project_out(codes)
        if is_img_or_video:
            # back to channel-first
            codes = codes.movedim(-1, 1)
        return codes

    def forward(self, x, return_loss_breakdown=False):
        is_img_or_video = x.ndim >= 4
        if is_img_or_video:
            spatial = x.shape[2:]
            x = x.movedim(1, -1).reshape(x.shape[0], -1, x.shape[1])

        assert x.shape[-1] == self.dim
        x = self.project_in(x)
        b, n, _ = x.shape
        x = x.reshape(b, n, self.num_codebooks, self.codebook_dim)

        orig_dtype = x.dtype
        x = x.float()                                  # A8

        x = self._maybe_l2norm(x)                      # A4
        if self.soft_clamp_input_value is not None:    # A3
            v = self.soft_clamp_input_value
            x = (x / v).tanh() * v

        original_input = x

        codebook_value = torch.ones_like(x)
        quantized = torch.where(x > 0, codebook_value, -codebook_value)
        indices = ((quantized > 0).int() * self.mask.int()).sum(dim=-1)  # A2
        quantized = self._maybe_l2norm(quantized)      # A4

        if self.training:                              # A5
            x = x + (quantized - x).detach()
        else:
            x = quantized

        if self.training:                              # A6
            codebook = self._maybe_l2norm(self.codebook)
            logits = 2 * self.inv_temperature * torch.einsum(
                'b n c d, k d -> b n c k', original_input, codebook)
            prob = logits.softmax(dim=-1)
            per_sample_entropy = _entropy(prob).mean()
            avg_prob = prob.mean(dim=(0, 1))
            codebook_entropy = _entropy(avg_prob).mean()
            entropy_aux_loss = (per_sample_entropy
                                - self.diversity_gamma * codebook_entropy)
        else:
            zero = x.new_zeros(())
            entropy_aux_loss = per_sample_entropy = codebook_entropy = zero

        if self.training and self.commitment_loss_weight > 0:    # A7
            commit_loss = F.mse_loss(original_input, quantized.detach())
        else:
            commit_loss = x.new_zeros(())

        x = x.reshape(b, n, -1).to(orig_dtype)
        x = self.project_out(x)

        if is_img_or_video:
            x = x.reshape(x.shape[0], *spatial, x.shape[-1]).movedim(-1, 1)
            indices = indices.reshape(b, *spatial, self.num_codebooks)

        if not self.keep_num_codebooks_dim:
            indices = indices.squeeze(-1)

        aux_loss = (entropy_aux_loss * self.entropy_loss_weight
                    + commit_loss * self.commitment_loss_weight)
        ret = Return(x, indices, aux_loss)
        if not return_loss_breakdown:
            return ret
        return ret, LossBreakdown(per_sample_entropy, codebook_entropy,
                                  commit_loss)


class FSQ(nn.Module):
    def __init__(self, levels, dim=None, num_codebooks=1,
                 keep_num_codebooks_dim=None, eps=1e-3):
        super().__init__()
        self.levels = list(levels)
        self.eps = eps
        codebook_dim = len(self.levels)
        effective = codebook_dim * num_codebooks
        dim = dim if dim is not None else effective
        self.dim = dim
        self.codebook_dim = codebook_dim
        self.num_codebooks = num_codebooks
        self.keep_num_codebooks_dim = (
            keep_num_codebooks_dim if keep_num_codebooks_dim is not None
            else num_codebooks > 1)

        self.register_buffer(
            '_levels', torch.tensor(self.levels, dtype=torch.int32),
            persistent=False)
        self.register_buffer(
            '_basis',
            torch.cumprod(torch.tensor([1] + self.levels[:-1]), dim=0).int(),
            persistent=False)

        has_projections = dim != effective
        self.project_in = (nn.Linear(dim, effective) if has_projections
                           else nn.Identity())
        self.project_out = (nn.Linear(effective, dim) if has_projections
                            else nn.Identity())

    def bound(self, z):                                # B2
        levels = self._levels.float()
        half_l = (levels - 1) * (1 + self.eps) / 2
        offset = torch.where(levels % 2 == 0,
                             torch.tensor(0.5), torch.tensor(0.0))
        shift = (offset / half_l).atanh()
        return (z + shift).tanh() * half_l - offset

    def quantize(self, z):
        quantized = torch.round(self.bound(z))
        if self.training:                              # B3 round STE
            bounded = self.bound(z)
            quantized = bounded + (quantized - bounded).detach()
        half_width = self._levels // 2
        return quantized / half_width

    def codes_to_indices(self, zhat):
        half_width = self._levels // 2
        scaled = zhat * half_width + half_width
        return (scaled * self._basis).sum(dim=-1).to(torch.int32)  # B1

    def indices_to_codes(self, indices):
        if not self.keep_num_codebooks_dim:
            indices = indices[..., None]
        is_img_or_video = indices.ndim >= 4
        idx = indices[..., None]
        digits = (idx // self._basis) % self._levels
        half_width = self._levels // 2
        codes = (digits - half_width).float() / half_width
        codes = codes.reshape(*codes.shape[:-2], -1)
        codes = self.project_out(codes)
        if is_img_or_video:
            codes = codes.movedim(-1, 1)
        return codes

    def forward(self, x):
        is_img_or_video = x.ndim >= 4
        if is_img_or_video:
            spatial = x.shape[2:]
            x = x.movedim(1, -1).reshape(x.shape[0], -1, x.shape[1])

        assert x.shape[-1] == self.dim
        x = self.project_in(x)
        b, n, _ = x.shape
        z = x.reshape(b, n, self.num_codebooks, self.codebook_dim)

        orig_dtype = z.dtype
        z = z.float()
        codes = self.quantize(z)
        indices = self.codes_to_indices(codes)

        out = codes.reshape(b, n, -1).to(orig_dtype)
        out = self.project_out(out)

        if is_img_or_video:
            out = out.reshape(out.shape[0], *spatial,
                              out.shape[-1]).movedim(-1, 1)
            indices = indices.reshape(b, *spatial, self.num_codebooks)

        if not self.keep_num_codebooks_dim:
            indices = indices.squeeze(-1)
        return out, indices
