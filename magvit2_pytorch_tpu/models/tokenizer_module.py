"""The tokenizer network as a pure flax module (encoder → LFQ/FSQ → decoder).

TPU-native rebuild of the reference ``VideoTokenizer`` nn.Module core
(magvit2_pytorch.py:1045-1654): layer-spec DSL with all 11 layer types, causal
first-frame padding, optional separate first-frame encoding, image/video
polymorphic forward. Layout is channels-last ``(B, T, H, W, C)`` throughout.

Loss machinery (GAN/VGG/adaptive weights) lives outside this module in
``training/losses.py`` — the module stays a pure encode/quantize/decode graph,
which keeps generator vs discriminator parameter sets separable by
construction (the reference instead overrides ``parameters()`` to carve the
discriminator out, magvit2_pytorch.py:1460-1474).

Fixed reference quirks (SURVEY.md §2.6):
- #5: gateloop kwargs are actually forwarded.
- #7 (new): cond attention layers receive the *expanded* cond dim, matching
  the cond-MLP stem output (the reference wires the un-expanded dim_cond into
  AdaptiveRMSNorm, magvit2_pytorch.py:1249, which asserts on the expanded
  vector at runtime when dim_cond_expansion_factor != 1).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from magvit2_pytorch_tpu.models.layerspec import LayerSpec, ParsedLayers, parse_layers
from magvit2_pytorch_tpu.ops.attention import (
    LinearSpaceAttention,
    SpaceAttention,
    TimeAttention,
)
from magvit2_pytorch_tpu.ops.basic import (
    FeedForward,
    Linear,
    Residual,
    Sequential,
    TokenShift,
)
from magvit2_pytorch_tpu.ops.conv import CausalConv3d, SameConv2d
from magvit2_pytorch_tpu.ops.gateloop import SimpleGateLoopLayer, ToTimeSequence
from magvit2_pytorch_tpu.ops.norms import LayerNorm
from magvit2_pytorch_tpu.ops.quantizers import FSQ, LFQ
from magvit2_pytorch_tpu.ops.resample import (
    ResidualUnit,
    ResidualUnitMod,
    SpatialDownsample2x,
    SpatialUpsample2x,
    TimeDownsample2x,
    TimeUpsample2x,
)
from magvit2_pytorch_tpu.utils.helpers import default, exists


def _conv_dot_saveable_policy(prim, *_, **__):
    """jax.checkpoint policy for remat='dots': keep every MXU result (convs
    AND matmuls — the built-in dots_saveable misses convs, and this model is
    conv-dominated) and recompute only the cheap VPU elementwise/norm ops."""
    return prim.name in ('conv_general_dilated', 'dot_general')


@dataclasses.dataclass(frozen=True)
class TokenizerConfig:
    """JSON-serializable constructor config (replaces the reference's pickled
    ``locals()`` blob, magvit2_pytorch.py:1095-1100; SURVEY.md §5.6)."""

    image_size: int
    layers: Tuple = (('residual',), ('residual',), ('residual',))
    residual_conv_kernel_size: int = 3
    num_codebooks: int = 1
    codebook_size: Optional[int] = None
    channels: int = 3
    init_dim: int = 64
    max_dim: float = float('inf')
    dim_cond: Optional[int] = None
    dim_cond_expansion_factor: float = 4.0
    input_conv_kernel_size: Tuple[int, int, int] = (7, 7, 7)
    output_conv_kernel_size: Tuple[int, int, int] = (3, 3, 3)
    pad_mode: str = 'constant'
    lfq_entropy_loss_weight: float = 0.1
    lfq_commitment_loss_weight: float = 1.0
    lfq_diversity_gamma: float = 2.5
    lfq_spherical: bool = False
    quantizer_aux_loss_weight: float = 1.0
    lfq_soft_clamp_input_value: Optional[float] = 10.0
    # exact chunk-enumerated diversity entropy for large codebooks instead of
    # the per-bit marginal surrogate (ops/quantizers.py module docstring)
    lfq_exact_codebook_entropy: bool = False
    # softmax sharpness of the entropy aux loss (parity default 100, matching
    # the reference's quantizer package). Measured: at 100 the diversity
    # gradient is numerically ZERO once |z| > ~0.05 (sigmoid(4*100*z)
    # saturates), so the term cannot prevent codebook collapse after the
    # earliest steps — values around 1-10 keep it alive. Training-dynamics
    # only; never affects indices.
    lfq_entropy_inv_temperature: float = 100.0
    use_fsq: bool = False
    fsq_levels: Optional[Tuple[int, ...]] = None
    attn_dim_head: int = 32
    attn_heads: int = 8
    attn_dropout: float = 0.0
    linear_attn_dim_head: int = 8
    linear_attn_heads: int = 16
    vgg_weights: Optional[str] = None
    perceptual_loss_weight: float = 1e-1
    discr_kwargs: Optional[dict] = None
    multiscale_discrs: Tuple[dict, ...] = tuple()
    use_gan: bool = True
    adversarial_loss_weight: float = 1.0
    grad_penalty_loss_weight: float = 10.0
    multiscale_adversarial_loss_weight: float = 1.0
    flash_attn: bool = True
    separate_first_frame_encoding: bool = False
    # extension (north-star; reference README TODO): axial rotary positions in
    # space/time attention layers
    use_rotary_pos_emb: bool = False
    # streaming: bound the attend_time kv cache to this many past LATENT
    # frames (None = unbounded/exact). Exact whenever the window covers the
    # stream (ops/attention.py Attention.kv_window for the precise boundary);
    # also makes chunk shapes static once the cache hits the cap, so the
    # per-chunk jit stops recompiling on a long stream.
    streaming_kv_window: Optional[int] = None
    # reference quirk #10 (discovered via the CPU oracle,
    # tests/fixtures/generate.py): the reference APPENDS a final LayerNorm to
    # encoder_layers (magvit2_pytorch.py:1322-1326) but its encode loop zips
    # against has_cond_across_layers, which is one element SHORTER — the norm
    # is never applied (zip truncation, magvit2_pytorch.py:1565-1572). Default
    # False mirrors the reference (required for code-index parity and torch
    # checkpoint import); True opts into the evidently-intended behavior.
    apply_final_norm: bool = False
    # rematerialize each encoder/decoder layer in the backward pass — trades
    # one extra forward of FLOPs for O(depth) less activation HBM (the 128px
    # README config cannot train in one v5e chip's 16G without it).
    # False = save all activations; True/'full' = save only layer boundaries;
    # 'dots' = selective: save MXU (conv/matmul) outputs inside each layer and
    # recompute only the cheap elementwise/norm ops — most of the memory win
    # at a fraction of the recompute FLOPs
    remat: object = False
    # lane packing (ops/conv.py module note): when the stem stage has < 128
    # channels, run it in the w-blocked layout (W/2, 2C) so the TPU's 128-wide
    # vector lanes / MXU are fully used; pure layout transform, numerics
    # unchanged up to float reduction order. Auto-disabled for ineligible
    # configs (separate first-frame stem, non-zero pad modes, odd sizes).
    # False | True (encoder+decoder) | 'encoder'. Measured on v5e: +8%
    # roundtrip at batch<=96, numerics exact (9e-8 f32), but two costs keep
    # it off by default: packing the DECODER stage triggers an XLA layout
    # copy of the 5.4GB upsample output (+2.7GB peak HBM at batch 128), and
    # even encoder-only packing trips the runtime allocator at the flagship
    # bench's 13.4GB/16GB edge despite an identical static memory analysis.
    # Opt in for small/medium-batch inference and training. See STATUS.md.
    lane_pack: object = False

    def __post_init__(self):
        # normalize layer defs to tuples for hashability / JSON round-trip
        object.__setattr__(self, 'layers', tuple(
            tuple(l) if isinstance(l, (list, tuple)) else (l,)
            for l in self.layers))
        for key in ('input_conv_kernel_size', 'output_conv_kernel_size'):
            object.__setattr__(self, key, tuple(getattr(self, key)))
        if exists(self.fsq_levels):
            object.__setattr__(self, 'fsq_levels', tuple(self.fsq_levels))
        if exists(self.multiscale_discrs):
            object.__setattr__(self, 'multiscale_discrs', tuple(
                dict(d) if not isinstance(d, dict) else d
                for d in self.multiscale_discrs))
        if not self.use_fsq:
            assert exists(self.codebook_size) and not exists(self.fsq_levels), (
                'if use_fsq=False, `codebook_size` must be set (and not '
                '`fsq_levels`)')
            if (self.codebook_size >= 2 ** 14
                    and self.lfq_entropy_inv_temperature > 4):
                # measured on TPU (results/codebook_2e18_t2.log +
                # results/convergence_config1*.json): at the reference-parity
                # inv_temperature=100 every tested config's codebook collapses
                # permanently within ~25 steps (2-8 live codes); ~2 keeps the
                # diversity gradient alive at 2^18 AND improves recon. Kept
                # as a warning (not a re-default) for reference parity.
                import warnings
                warnings.warn(
                    f'codebook_size={self.codebook_size} (>= 2^14) with '
                    f'lfq_entropy_inv_temperature='
                    f'{self.lfq_entropy_inv_temperature} (> 4): at this scale '
                    'the entropy diversity gradient saturates within ~25 '
                    'steps and codebook utilization collapses permanently '
                    '(measured: results/codebook_2e18_t2.log). Set '
                    'lfq_entropy_inv_temperature~=2 for real runs, and watch '
                    "the trainer's mean_bit_entropy metric in the first 50 "
                    'steps — below ~0.1 means the collapse already happened.',
                    stacklevel=3)
        else:
            assert not exists(self.codebook_size) and exists(self.fsq_levels), (
                'if use_fsq=True, `fsq_levels` must be set (and not '
                '`codebook_size`)')

    def parsed(self) -> ParsedLayers:
        return parse_layers(
            self.layers, init_dim=self.init_dim, image_size=self.image_size,
            max_dim=self.max_dim, dim_cond=self.dim_cond)

    @property
    def expanded_dim_cond(self) -> Optional[int]:
        if not exists(self.dim_cond):
            return None
        return int(self.dim_cond * self.dim_cond_expansion_factor)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        if d['max_dim'] == float('inf'):
            d['max_dim'] = 'inf'
        return json.dumps(d)

    @classmethod
    def from_json(cls, s: str) -> 'TokenizerConfig':
        d = json.loads(s)
        if d.get('max_dim') == 'inf':
            d['max_dim'] = float('inf')
        return cls(**d)


def _compute_lane_pack_end(config: TokenizerConfig) -> int:
    """Spec index of the ``compress_space`` that terminates the lane-packed
    stem stage, or -1 when packing is off or the config is ineligible. The
    packed region is conv_in + a (possibly empty) run of residual layers,
    ended by the stride-2 spatial conv that consumes the blocked layout."""
    cfg = config
    if not cfg.lane_pack:
        return -1
    if cfg.separate_first_frame_encoding:
        return -1  # the 2D first-frame stem is not blocked-layout aware
    if cfg.pad_mode not in ('constant', 'zeros'):
        return -1  # blocked w-padding is zero-fill only
    if cfg.init_dim >= 128 or cfg.image_size % 2:
        return -1  # full lanes already / can't split w
    for i, spec in enumerate(cfg.parsed().specs):
        t = spec.layer_type
        if t == 'compress_space':
            return i
        if t not in ('residual', 'consecutive_residual'):
            return -1
    return -1


def _attend_backend(config: TokenizerConfig) -> Optional[str]:
    # flash_attn=True -> 'auto' dispatch (flash on TPU when profitable),
    # mirroring the reference's flash/math gate (attend.py:84)
    return None if config.flash_attn else 'xla'


def _build_encoder_layer(spec: LayerSpec, config: TokenizerConfig, name: str):
    return _build_layer(spec, config, name, encoder=True)


def _build_decoder_layer(spec: LayerSpec, config: TokenizerConfig, name: str):
    return _build_layer(spec, config, name, encoder=False)


def _build_layer(spec: LayerSpec, config: TokenizerConfig, name: str, encoder: bool):
    t = spec.layer_type
    k = config.residual_conv_kernel_size
    dim, dim_out = spec.dim_in, spec.dim_out
    cond_dim = config.expanded_dim_cond
    backend = _attend_backend(config)

    if t == 'residual':
        return ResidualUnit(dim, k, pad_mode=config.pad_mode, name=name)

    if t == 'consecutive_residual':
        (num,) = spec.params
        return Sequential([
            ResidualUnit(dim, k, pad_mode=config.pad_mode)
            for _ in range(num)
        ], name=name)

    if t == 'cond_residual':
        return ResidualUnitMod(
            dim, k, dim_cond=cond_dim, pad_mode=config.pad_mode, name=name)

    if t == 'compress_space':
        if encoder:
            return SpatialDownsample2x(dim, dim_out, name=name)
        return SpatialUpsample2x(dim_out, dim, name=name)

    if t == 'compress_time':
        if encoder:
            return TimeDownsample2x(dim, dim_out, name=name)
        return TimeUpsample2x(dim_out, dim, name=name)

    if t in ('attend_space', 'cond_attend_space'):
        dc = cond_dim if t.startswith('cond') else None
        return Sequential([
            Residual(SpaceAttention(
                dim=dim, dim_cond=dc, dim_head=config.attn_dim_head,
                heads=config.attn_heads, backend=backend,
                dropout=config.attn_dropout,
                use_rotary=config.use_rotary_pos_emb)),
            Residual(FeedForward(dim, dim_cond=dc)),
        ], name=name)

    if t in ('linear_attend_space', 'cond_linear_attend_space'):
        dc = cond_dim if t.startswith('cond') else None
        if t.startswith('cond'):
            attn = LinearSpaceAttention(
                dim=dim, dim_cond=dc, dim_head=config.attn_dim_head,
                heads=config.attn_heads)
        else:
            attn = LinearSpaceAttention(
                dim=dim, dim_head=config.linear_attn_dim_head,
                heads=config.linear_attn_heads)
        return Sequential([
            Residual(attn),
            Residual(FeedForward(dim, dim_cond=dc)),
        ], name=name)

    if t == 'gateloop_time':
        # quirk #5 fixed: use_heinsen kwarg actually reaches the layer
        return ToTimeSequence(
            Residual(SimpleGateLoopLayer(dim=dim, use_heinsen=False)), name=name)

    if t in ('attend_time', 'cond_attend_time'):
        dc = cond_dim if t.startswith('cond') else None
        return Sequential([
            Residual(TokenShift(TimeAttention(
                dim=dim, dim_cond=dc, dim_head=config.attn_dim_head,
                heads=config.attn_heads, causal=True, backend=backend,
                dropout=config.attn_dropout,
                use_rotary=config.use_rotary_pos_emb,
                kv_window=config.streaming_kv_window))),
            Residual(TokenShift(FeedForward(dim, dim_cond=dc))),
        ], name=name)

    raise ValueError(f'unknown layer type {t}')


class TokenizerModule(nn.Module):
    """Pure encoder/quantizer/decoder graph. All methods take channels-last
    video ``(B, T, H, W, C)``."""

    config: TokenizerConfig

    def setup(self):
        cfg = self.config
        parsed = cfg.parsed()
        self.parsed_layers = parsed
        end = _compute_lane_pack_end(cfg)
        self.lane_pack_end = end if cfg.lane_pack in (True, 'encoder') else -1
        self.lane_pack_dec_end = end if cfg.lane_pack is True else -1

        self.conv_in = CausalConv3d(
            cfg.init_dim, cfg.input_conv_kernel_size, pad_mode=cfg.pad_mode,
            name='conv_in')
        self.conv_out = CausalConv3d(
            cfg.channels, cfg.output_conv_kernel_size, pad_mode=cfg.pad_mode,
            name='conv_out')

        if cfg.separate_first_frame_encoding:
            self.conv_in_first_frame = SameConv2d(
                cfg.init_dim, cfg.input_conv_kernel_size[-2:],
                name='conv_in_first_frame')
            self.conv_out_first_frame = SameConv2d(
                cfg.channels, cfg.output_conv_kernel_size[-2:],
                name='conv_out_first_frame')

        self.encoder_layers = [
            _build_encoder_layer(spec, cfg, name=f'encoder_{spec.index}')
            for spec in parsed.specs
        ]
        # decoder applies the mirror stack in reverse (reference insert(0),
        # magvit2_pytorch.py:1315); module names keep the encoder index so
        # checkpoints read naturally
        self.decoder_layers = [
            _build_decoder_layer(spec, cfg, name=f'decoder_{spec.index}')
            for spec in reversed(parsed.specs)
        ]

        self.final_norm = LayerNorm(parsed.final_dim, name='final_norm')

        if parsed.has_cond:
            self.encoder_cond_in = Linear(
                cfg.expanded_dim_cond, name='encoder_cond_in')
            self.decoder_cond_in = Linear(
                cfg.expanded_dim_cond, name='decoder_cond_in')

        if not cfg.use_fsq:
            self.quantizers = LFQ(
                dim=parsed.final_dim,
                codebook_size=cfg.codebook_size,
                num_codebooks=cfg.num_codebooks,
                entropy_loss_weight=cfg.lfq_entropy_loss_weight,
                commitment_loss_weight=cfg.lfq_commitment_loss_weight,
                diversity_gamma=cfg.lfq_diversity_gamma,
                soft_clamp_input_value=cfg.lfq_soft_clamp_input_value,
                spherical=cfg.lfq_spherical,
                exact_codebook_entropy=cfg.lfq_exact_codebook_entropy,
                inv_temperature=cfg.lfq_entropy_inv_temperature,
                name='quantizers',
            )
        else:
            self.quantizers = FSQ(
                levels=cfg.fsq_levels,
                dim=parsed.final_dim,
                num_codebooks=cfg.num_codebooks,
                name='quantizers',
            )

    # -- derived static properties -------------------------------------------

    @property
    def time_downsample_factor(self) -> int:
        return self.config.parsed().time_downsample_factor

    @property
    def time_padding(self) -> int:
        return self.time_downsample_factor - 1

    @property
    def fmap_size(self) -> int:
        return self.config.parsed().fmap_size

    # -- cond plumbing -------------------------------------------------------

    def _prep_cond(self, cond, batch, encoder: bool):
        parsed = self.parsed_layers
        assert (not parsed.has_cond) or exists(cond), (
            '`cond` must be passed in since conditionable layers were '
            'specified')
        if not exists(cond):
            return None
        assert cond.shape == (batch, self.config.dim_cond)
        stem = self.encoder_cond_in if encoder else self.decoder_cond_in
        return jax.nn.silu(stem(cond))

    # -- core graph ----------------------------------------------------------

    def encode(self, video, cond=None, video_contains_first_frame: bool = True,
               streaming: bool = False):
        """Video ``(B, T, H, W, C)`` -> continuous latents
        ``(B, T', H', W', D)`` (pre-quantization). Mirrors reference encode
        (magvit2_pytorch.py:1522-1576).

        ``streaming=True``: chunked causal encoding — apply with
        ``mutable=['cache']``; the caller owns first-chunk time padding
        (see models/streaming.py) and passes
        ``video_contains_first_frame=False``."""
        cfg = self.config
        if streaming:
            # cond streams fine (per-sample vector, constant across chunks);
            # separate_first_frame_encoding is rejected up-front by
            # StreamingSession.__init__
            assert not cfg.separate_first_frame_encoding

        encode_first_frame_separately = (
            cfg.separate_first_frame_encoding and video_contains_first_frame)

        tp = self.time_padding
        if video_contains_first_frame and not streaming:
            video = jnp.pad(video, [(0, 0), (tp, 0), (0, 0), (0, 0), (0, 0)])

        cond = self._prep_cond(cond, video.shape[0], encoder=True)

        pack_end = self.lane_pack_end
        if encode_first_frame_separately:
            first_frame = video[:, tp]
            rest = video[:, tp + 1:]
            first = self.conv_in_first_frame(first_frame)
            x = self.conv_in(rest)
            x = jnp.concatenate([first[:, None], x], axis=1)
            x = jnp.pad(x, [(0, 0), (tp, 0), (0, 0), (0, 0), (0, 0)])
        else:
            x = self.conv_in(video, streaming=streaming,
                             w_blocked_out=pack_end >= 0)

        for i, (layer, has_cond) in enumerate(
                zip(self.encoder_layers,
                    self.parsed_layers.has_cond_across_layers)):
            kwargs = dict(cond=cond) if (has_cond and exists(cond)) else dict()
            if streaming:
                kwargs['streaming'] = True
            if 0 <= pack_end:
                if i < pack_end:
                    kwargs['w_blocked'] = True
                elif i == pack_end:
                    kwargs['w_blocked_in'] = True
            x = self._apply_layer(layer, x, remat=self.config.remat, **kwargs)

        if cfg.apply_final_norm:
            return self.final_norm(x)
        # reference parity: the final norm's params exist (checkpoints carry
        # them) but the reference never applies it — see config docstring.
        # Touch the params so flax registers them regardless.
        _ = (self.final_norm.gamma, self.final_norm.beta)
        return x

    def quantize(self, x, train: bool = False):
        return self.quantizers(x, train=train)

    def indices_to_codes(self, indices):
        return self.quantizers.indices_to_codes(indices)

    def decode_features(self, quantized, cond=None, streaming: bool = False):
        """Quantized latents -> pre-conv_out feature map (still time-padded).
        Split from pixel projection so the trainer can differentiate w.r.t.
        only the final conv kernel for the adaptive adversarial weight
        (reference magvit2_pytorch.py:1815-1841) without a full backward."""
        cond = self._prep_cond(cond, quantized.shape[0], encoder=False)

        x = quantized
        pack_end = self.lane_pack_dec_end
        n = len(self.decoder_layers)
        # decoder_layers are stored reversed already; cond flags mirror too
        for j, (layer, has_cond) in enumerate(zip(
                self.decoder_layers,
                reversed(self.parsed_layers.has_cond_across_layers))):
            kwargs = dict(cond=cond) if (has_cond and exists(cond)) else dict()
            if streaming:
                kwargs['streaming'] = True
            if 0 <= pack_end:
                spec_index = n - 1 - j
                if spec_index == pack_end:
                    # the mirrored SpatialUpsample2x enters the packed stage:
                    # its w-phase channels ARE the blocked layout, for free
                    kwargs['w_blocked_out'] = True
                elif spec_index < pack_end:
                    kwargs['w_blocked'] = True
            x = self._apply_layer(layer, x, remat=self.config.remat, **kwargs)
        return x

    def decode_pixels(self, x, video_contains_first_frame: bool = True,
                      streaming: bool = False):
        """Pre-conv_out features -> pixel video (reference decode tail,
        magvit2_pytorch.py:1631-1649). In streaming mode the caller slices the
        first-chunk time padding."""
        cfg = self.config
        tp = self.time_padding
        decode_first_frame_separately = (
            cfg.separate_first_frame_encoding and video_contains_first_frame
            and not streaming)

        if decode_first_frame_separately:
            xff = x[:, tp]
            rest = x[:, tp + 1:]
            out = self.conv_out(rest)
            outff = self.conv_out_first_frame(xff)
            video = jnp.concatenate([outff[:, None], out], axis=1)
        else:
            packed = self.lane_pack_dec_end >= 0
            # blocked-in conv_out emits UNPACKED pixels directly (the
            # G-strided head lowering consumes the blocked layout; the
            # module falls back to dense-blocked + in-graph unblock when
            # the head trick doesn't apply) — ops/conv.py
            video = self.conv_out(x, streaming=streaming,
                                  w_blocked_in=packed)
            if video_contains_first_frame and not streaming:
                video = video[:, tp:]

        return video

    def decode(self, quantized, cond=None, video_contains_first_frame: bool = True,
               streaming: bool = False):
        x = self.decode_features(quantized, cond=cond, streaming=streaming)
        return self.decode_pixels(
            x, video_contains_first_frame=video_contains_first_frame,
            streaming=streaming)

    def __call__(self, video, cond=None, video_contains_first_frame: bool = True,
                 train: bool = False):
        """Full round trip; returns (recon, indices, aux_loss, breakdown)."""
        x = self.encode(video, cond=cond,
                        video_contains_first_frame=video_contains_first_frame)
        qout = self.quantize(x, train=train)
        recon = self.decode(
            qout.quantized, cond=cond,
            video_contains_first_frame=video_contains_first_frame)
        return recon, qout

    # -- introspection helpers (FLOP audit, parity bisecting) ----------------

    def apply_encoder_layer(self, x, index: int, cond=None):
        """Apply the single encoder layer for layer-spec ``index``."""
        kwargs = dict(cond=cond) if exists(cond) else {}
        return self._apply_layer(self.encoder_layers[index], x, **kwargs)

    def apply_decoder_layer(self, x, index: int, cond=None):
        """Apply the single decoder layer for layer-spec ``index`` (stored
        reversed, reference insert(0) semantics)."""
        pos = len(self.decoder_layers) - 1 - index
        kwargs = dict(cond=cond) if exists(cond) else {}
        return self._apply_layer(self.decoder_layers[pos], x, **kwargs)

    def trace_shapes(self, video):
        """Static (enc_in_shape, dec_in_shape) per layer spec for the padded
        round trip — drives tools/flop_audit.py."""
        tp = self.time_padding
        x = jnp.pad(video, [(0, 0), (tp, 0), (0, 0), (0, 0), (0, 0)])
        x = self.conv_in(x)
        enc_shapes = {}
        for i, layer in enumerate(self.encoder_layers):
            enc_shapes[i] = tuple(x.shape)
            x = self._apply_layer(layer, x)
        x = self.final_norm(x)
        n = len(self.decoder_layers)
        dec_shapes = {}
        for pos, layer in enumerate(self.decoder_layers):
            i = n - 1 - pos
            dec_shapes[i] = tuple(x.shape)
            x = self._apply_layer(layer, x)
        return [(enc_shapes[i], dec_shapes[i]) for i in range(n)]

    @staticmethod
    def _apply_layer(layer, x, remat=False, **kwargs):
        # the reference tracks conditioning as a *running* flag, so layers
        # after the first cond layer are handed `cond` whether or not they use
        # it (magvit2_pytorch.py:1565-1572) — filter by acceptance, per key
        from magvit2_pytorch_tpu.ops.basic import _filter_kwargs
        kwargs = _filter_kwargs(layer, kwargs)
        if remat and 'streaming' not in kwargs:
            # remat=True/'full': save only layer boundaries (max memory win,
            # one full recompute). remat='dots': jax.checkpoint policy that
            # saves conv/matmul outputs and recomputes only elementwise ops.
            # Static flags (lane-packing w_blocked*) close over the lambda;
            # only traced values (cond) become remat arguments.
            policy = None
            if remat == 'dots':
                policy = _conv_dot_saveable_policy
            static = {k: v for k, v in kwargs.items() if k != 'cond'}
            if 'cond' in kwargs:
                fn = nn.remat(
                    lambda mdl, x, cond: mdl(x, cond=cond, **static),
                    prevent_cse=False, policy=policy)
                return fn(layer, x, kwargs['cond'])
            fn = nn.remat(lambda mdl, x: mdl(x, **static), prevent_cse=False,
                          policy=policy)
            return fn(layer, x)
        if not kwargs:
            return layer(x)
        return layer(x, **kwargs)
