"""PageReader: an end-to-end page->JSON vision model (BASELINE config 5).

The reference reaches structured JSON by pushing photos through an external
VLM server (Ollama gemma3 / GPT-4o / Gemini — reference
``pipeline_demo/extractor/enhanced_extractor.py:836-877``), paying seconds
per request and leaving the chip idle. This is the TPU-native alternative in
the spirit of Donut/TrOCR: a patch-embedding vision encoder and a causal
transformer decoder that emits the metadata JSON directly — ONE compiled
program per (page-shape, max-len), no OCR loop, no HTTP.

Deliberately compact (the domain is one page layout family, not open-world
documents): ~6 encoder blocks / 4 decoder blocks at d=192 trains on the
synthetic page distribution in minutes on a v5e chip.

TPU-first choices:
- patchify via a single strided conv (MXU), static token counts;
- greedy decode as a ``lax.scan`` over a fixed-length token buffer with a
  causal mask — no dynamic shapes, compiles once;
- bfloat16 compute, float32 params/logits.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bbocr_tpu.models.charset import EN_CHARSET

# Token vocabulary: JSON is emitted as characters; specials sit above the
# charset ids (0 = CTC blank / PAD here too, so charset ids align).
PAD_ID = 0
_CHARS = EN_CHARSET.chars  # ids 1..len(chars)
BOS_ID = len(_CHARS) + 1
EOS_ID = len(_CHARS) + 2
VOCAB_SIZE = len(_CHARS) + 3

MAX_JSON_LEN = 192  # decoded JSON length budget (tokens incl. BOS/EOS)


def encode_json(text: str, max_len: int = MAX_JSON_LEN) -> Tuple[np.ndarray, int]:
    """JSON string -> (max_len,) int32 token ids: BOS body EOS PAD..."""
    ids = [BOS_ID]
    for ch in text:
        idx = _CHARS.find(ch)
        if idx >= 0:
            ids.append(idx + 1)
    ids = ids[: max_len - 1]
    ids.append(EOS_ID)
    out = np.zeros(max_len, np.int32)
    out[: len(ids)] = ids
    return out, len(ids)


def decode_ids(ids) -> str:
    """Token ids -> JSON string (stops at EOS, skips PAD/BOS)."""
    out = []
    for i in np.asarray(ids).tolist():
        if i == EOS_ID:
            break
        if i in (PAD_ID, BOS_ID):
            continue
        if 1 <= i <= len(_CHARS):
            out.append(_CHARS[i - 1])
    return "".join(out)


def _sincos_2d(h: int, w: int, dim: int) -> np.ndarray:
    """Fixed 2-D sin/cos position embedding, (h*w, dim)."""
    assert dim % 4 == 0
    d4 = dim // 4
    omega = 1.0 / (10000 ** (np.arange(d4) / d4))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    out = np.concatenate(
        [
            np.sin(ys.reshape(-1, 1) * omega),
            np.cos(ys.reshape(-1, 1) * omega),
            np.sin(xs.reshape(-1, 1) * omega),
            np.cos(xs.reshape(-1, 1) * omega),
        ],
        axis=1,
    )
    return out.astype(np.float32)


class Block(nn.Module):
    dim: int
    heads: int
    causal: bool = False
    cross: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, ctx=None, mask=None):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, deterministic=True
        )(h, h, mask=mask)
        x = x + h
        if self.cross:
            h = nn.LayerNorm(dtype=self.dtype)(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=self.dtype, deterministic=True
            )(h, ctx)
            x = x + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.dim * 4, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class PageEncoder(nn.Module):
    """(B, H, W, 1) gray page in [0,255] -> (B, H/8*W/8, dim) tokens."""

    dim: int = 192
    depth: int = 6
    heads: int = 6
    patch: int = 8
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, page):
        x = page / 127.5 - 1.0
        x = nn.Conv(
            self.dim,
            (self.patch, self.patch),
            strides=(self.patch, self.patch),
            dtype=self.dtype,
        )(x)
        b, h, w, d = x.shape
        x = x.reshape(b, h * w, d)
        pos = jnp.asarray(_sincos_2d(h, w, d), self.dtype)
        x = x + pos[None]
        for _ in range(self.depth):
            x = Block(self.dim, self.heads, dtype=self.dtype)(x)
        return nn.LayerNorm(dtype=self.dtype)(x)


class PageReader(nn.Module):
    """Donut-style encoder-decoder; teacher-forced call for training."""

    dim: int = 192
    enc_depth: int = 6
    dec_depth: int = 4
    heads: int = 6
    patch: int = 8
    vocab: int = VOCAB_SIZE
    max_len: int = MAX_JSON_LEN
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.encoder = PageEncoder(
            self.dim, self.enc_depth, self.heads, self.patch, self.dtype
        )
        self.tok_embed = nn.Embed(self.vocab, self.dim, dtype=self.dtype)
        self.pos_embed = nn.Embed(self.max_len, self.dim, dtype=self.dtype)
        self.blocks = [
            Block(self.dim, self.heads, causal=True, cross=True, dtype=self.dtype)
            for _ in range(self.dec_depth)
        ]
        self.out_norm = nn.LayerNorm(dtype=self.dtype)
        self.head = nn.Dense(self.vocab, dtype=jnp.float32)
        # Auxiliary CTC head over the encoder token grid (round-2 VERDICT
        # #6: the from-scratch cross-attention never grounds on the glyphs
        # from the JSON loss alone). Row-major flattening of the H/8 x W/8
        # grid visits horizontal text lines top-to-bottom, so a CTC
        # alignment against the page's reading-order transcription exists;
        # the loss forces encoder tokens to carry character identity, which
        # the decoder's cross-attention can then exploit. Inference never
        # applies it (params are lazily absent from pre-aux checkpoints).
        self.ctc_head = nn.Dense(len(_CHARS) + 1, dtype=jnp.float32)

    def encode(self, page):
        return self.encoder(page)

    def encode_ctc(self, page):
        """(ctx, ctc_logits): encoder tokens + per-token character logits."""
        ctx = self.encoder(page)
        return ctx, self.ctc_head(ctx.astype(jnp.float32))

    def decode(self, ctx, tokens):
        """ctx (B, S, d); tokens (B, T) -> logits (B, T, vocab)."""
        t = tokens.shape[1]
        x = self.tok_embed(tokens) + self.pos_embed(jnp.arange(t))[None]
        mask = nn.make_causal_mask(tokens)
        for blk in self.blocks:
            x = blk(x, ctx=ctx, mask=mask)
        return self.head(self.out_norm(x))

    def __call__(self, page, tokens, with_ctc: bool = False):
        if with_ctc:
            ctx, ctc_logits = self.encode_ctc(page)
            return self.decode(ctx, tokens), ctc_logits
        return self.decode(self.encode(page), tokens)


@partial(jax.jit, static_argnames=("model", "max_len"))
def greedy_generate(params, model: PageReader, page, max_len: int = MAX_JSON_LEN):
    """Greedy page->token-ids as one compiled program.

    Re-runs the decoder over the growing (static-size) buffer each step —
    O(T^2) attention, which at T<=192 / d=192 is negligible next to the
    encoder — and keeps every shape static for XLA.
    """
    ctx = model.apply(params, page, method=PageReader.encode)
    b = page.shape[0]
    tokens0 = jnp.full((b, max_len), PAD_ID, jnp.int32).at[:, 0].set(BOS_ID)

    def step(tokens, t):
        logits = model.apply(params, ctx, tokens, method=PageReader.decode)
        nxt = jnp.argmax(logits[:, t, :], axis=-1).astype(jnp.int32)
        # after EOS, keep emitting EOS (stable decode)
        prev_done = jnp.any(tokens == EOS_ID, axis=1)
        nxt = jnp.where(prev_done, EOS_ID, nxt)
        tokens = tokens.at[:, t + 1].set(nxt)
        return tokens, None

    tokens, _ = jax.lax.scan(step, tokens0, jnp.arange(max_len - 1))
    return tokens
