"""Chunked causal streaming tokenize/decode (BASELINE config 5).

Long-video inference without whole-clip memory: every time-causal op carries
its history in a flax 'cache' collection (the last ``k_t - 1`` input frames per
causal conv, the stride phase of temporal downsamplers, the shift frame of
TokenShift), so chunk-by-chunk encoding/decoding is **bit-identical** to a
single whole-clip pass — verified in tests/test_streaming.py. This is the
carried-causal-state design SURVEY.md §5.7 prescribes; the reference can only
tokenize whole clips.

Chunk grammar: the first chunk holds the first frame plus a multiple of
``time_downsample_factor`` frames (e.g. 1 + 16); every later chunk holds a
multiple of ``time_downsample_factor``.

Supported layers: every layer type streams — spatial/``attend_space`` ops are
per-frame, causal convs carry the last ``k_t - 1`` frames, ``attend_time``
carries its kv cache, ``gateloop_time`` carries its recurrence state, and
TokenShift carries one frame (all bit-exactness tested in
tests/test_streaming.py). Conditioned (``cond_*``) layers stream with a fixed
per-stream ``cond`` vector. The one unsupported mode is
``separate_first_frame_encoding`` (its first-frame stem needs whole-clip
packing semantics) — rejected at session construction.

Bit-exactness boundary on TPU: the fused Pallas kernels
(ops/pallas/residual_unit.py, ops/pallas/axial_attention.py) engage on
whole-clip passes but not on streaming chunks (their gates exclude
``streaming=True`` — the kernels hold no cross-chunk state), so a TPU
whole-clip pass and a streamed pass differ by kernel-vs-XLA numerics
(~1e-3 relative in bf16; identical math). For a bit-exact comparison set
``MAGVIT2_TPU_NO_FUSED_ATTN=1`` and ``MAGVIT2_TPU_NO_FUSED_RU=1`` so both
sides run the XLA path — that configuration (and every CPU run) is
bit-identical, as the tests assert.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from magvit2_pytorch_tpu.models.tokenizer_module import TokenizerModule
from magvit2_pytorch_tpu.utils.helpers import divisible_by, exists


class StreamingSession:
    """One stateful encode and/or decode stream over a ``VideoTokenizer``."""

    def __init__(self, tokenizer, cond=None):
        # unsupported modes fail HERE, not deep inside a jitted apply
        assert not tokenizer.config.separate_first_frame_encoding, (
            'streaming does not support separate_first_frame_encoding: its '
            'first-frame stem has whole-clip packing semantics — construct '
            'the tokenizer without it to stream')
        if tokenizer.config.parsed().has_cond:
            assert cond is not None, (
                'this tokenizer has conditioned (cond_*) layers — pass the '
                'per-sample `cond` vector to StreamingSession(tokenizer, '
                'cond=...); it is fixed for the life of the stream')

        self.tokenizer = tokenizer
        self.module: TokenizerModule = tokenizer.module
        self.params = tokenizer.params
        self.cond = None if cond is None else jnp.asarray(cond)
        self.tp = tokenizer.time_padding
        self.tdf = tokenizer.time_downsample_factor

        self._enc_cache = None
        self._dec_cache = None
        self._enc_chunks = 0
        self._dec_chunks = 0
        self._jit_cache = {}

    # -- jit helpers ---------------------------------------------------------

    def _jitted(self, name, fn):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    # -- encode side ---------------------------------------------------------

    def encode_chunk(self, chunk, quantize: bool = True):
        """chunk: (B, T, H, W, C). First chunk: T = 1 + k*tdf (contains the
        first frame); later chunks: T = k*tdf. Returns code indices (or raw
        latents with quantize=False)."""
        chunk = jnp.asarray(chunk)
        first = self._enc_chunks == 0

        if first:
            assert divisible_by(chunk.shape[1] - 1, self.tdf), (
                f'first chunk must hold 1 + k*{self.tdf} frames')
            pad = [(0, 0), (self.tp, 0)] + [(0, 0)] * (chunk.ndim - 2)
            chunk = jnp.pad(chunk, pad)
        else:
            assert divisible_by(chunk.shape[1], self.tdf), (
                f'chunks must hold multiples of {self.tdf} frames')

        def _enc(params, cache, chunk, cond):
            variables = {'params': params}
            if exists(cache):
                variables['cache'] = cache
            latents, mutated = self.module.apply(
                variables, chunk, cond=cond, video_contains_first_frame=False,
                streaming=True, mutable=['cache'],
                method=TokenizerModule.encode)
            return latents, mutated['cache']

        fn = self._jitted(('enc', chunk.shape, exists(self._enc_cache)), _enc)
        latents, self._enc_cache = fn(
            self.params, self._enc_cache, chunk, self.cond)
        self._enc_chunks += 1

        if not quantize:
            return latents

        def _quant(params, latents):
            qout = self.module.apply({'params': params}, latents,
                                     method=TokenizerModule.quantize)
            return qout.indices

        # jitted: eager quantization was ~dozens of individual dispatches per
        # chunk — through a remote-TPU tunnel that dominated the whole session
        fn = self._jitted(('quant', latents.shape), _quant)
        return fn(self.params, latents)

    # -- decode side ---------------------------------------------------------

    def decode_chunk(self, codes):
        """codes: int indices (B, T', H', W') for one chunk (first chunk has
        (tp + 1 + k*tdf)/tdf latent frames). Returns pixel frames; the first
        chunk's left time padding is sliced off."""
        codes = jnp.asarray(codes)
        first = self._dec_chunks == 0

        def _dec(params, cache, codes, cond):
            quantized = self.module.apply(
                {'params': params}, codes,
                method=TokenizerModule.indices_to_codes)
            variables = {'params': params}
            if exists(cache):
                variables['cache'] = cache
            recon, mutated = self.module.apply(
                variables, quantized, cond=cond,
                video_contains_first_frame=False,
                streaming=True, mutable=['cache'],
                method=TokenizerModule.decode)
            return recon, mutated['cache']

        fn = self._jitted(('dec', codes.shape, exists(self._dec_cache)), _dec)
        recon, self._dec_cache = fn(
            self.params, self._dec_cache, codes, self.cond)
        self._dec_chunks += 1

        if first:
            recon = recon[:, self.tp:]
        return recon


def tokenize_streaming(tokenizer, video, chunk_frames: Optional[int] = None,
                       cond=None):
    """Convenience: chunked tokenize of a whole (B, T, H, W, C) video.
    ``chunk_frames`` must be a multiple of time_downsample_factor (default:
    4 * tdf)."""
    tdf = tokenizer.time_downsample_factor
    chunk_frames = chunk_frames or 4 * tdf
    assert divisible_by(chunk_frames, tdf)

    t = video.shape[1]
    assert divisible_by(t - 1, tdf), (
        'video must hold 1 + k*tdf frames (first-frame convention)')

    session = StreamingSession(tokenizer, cond=cond)
    codes = []
    first_len = 1 + min(chunk_frames, t - 1)
    codes.append(session.encode_chunk(video[:, :first_len]))
    pos = first_len
    while pos < t:
        end = min(pos + chunk_frames, t)
        codes.append(session.encode_chunk(video[:, pos:end]))
        pos = end
    return jnp.concatenate(codes, axis=1)


def decode_streaming(tokenizer, codes, chunk_latents: Optional[int] = None,
                     cond=None):
    """Convenience: chunked decode of (B, T', H', W') code indices."""
    tdf = tokenizer.time_downsample_factor
    tp = tokenizer.time_padding
    chunk_latents = chunk_latents or 4

    t = codes.shape[1]
    session = StreamingSession(tokenizer, cond=cond)
    frames = []
    first_len = min(chunk_latents + (tp + 1) // tdf, t)
    frames.append(session.decode_chunk(codes[:, :first_len]))
    pos = first_len
    while pos < t:
        end = min(pos + chunk_latents, t)
        frames.append(session.decode_chunk(codes[:, pos:end]))
        pos = end
    return jnp.concatenate(frames, axis=1)
