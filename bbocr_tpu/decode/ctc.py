"""CTC decoding.

Greedy decode runs fully on device (replacing the host-side loop inside the
reference's EasyOCR dependency — SURVEY.md §2.3 "greedy/beam CTC decode"):
argmax, repeat-merge, blank-drop and compaction are expressed as sort/cumsum
primitives with static shapes, so the decode fuses into the same XLA program
as the recognizer forward and nothing but token ids crosses back to the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from bbocr_tpu.models.charset import BLANK_ID


@partial(jax.jit, static_argnames=("blank",))
def ctc_greedy_decode(logits: jnp.ndarray, lengths: jnp.ndarray | None = None, blank: int = BLANK_ID):
    """Greedy CTC decode of (B, T, C) logits.

    Args:
        logits: (B, T, C) float logits (or log-probs — only argmax matters).
        lengths: optional (B,) int32 valid frame counts; frames beyond the
            valid length are treated as blank (width-bucket padding).
        blank: CTC blank id.

    Returns:
        ids: (B, T) int32 — decoded symbols compacted to the front, zero
            padded (0 is the blank id, so padding is inert for codecs).
        out_lengths: (B,) int32 number of valid symbols per row.
        confidence: (B,) float32 — product of per-frame max softmax probs
            over non-blank emitted frames (EasyOCR-style confidence).
    """
    b, t, c = logits.shape
    best = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, T)
    if lengths is not None:
        frame_idx = jnp.arange(t, dtype=jnp.int32)[None, :]
        valid = frame_idx < lengths[:, None]
        best = jnp.where(valid, best, blank)
    prev = jnp.concatenate([jnp.full((b, 1), -1, jnp.int32), best[:, :-1]], axis=1)
    keep = (best != blank) & (best != prev)

    # Stable compaction: sort "kept" frames to the front preserving time order.
    order = jnp.argsort(jnp.where(keep, 0, 1), axis=1, stable=True)
    ids = jnp.take_along_axis(jnp.where(keep, best, 0), order, axis=1)
    out_lengths = keep.sum(axis=1).astype(jnp.int32)

    probs = jax.nn.softmax(logits, axis=-1)
    pmax = jnp.max(probs, axis=-1)  # (B, T)
    conf = jnp.exp(jnp.sum(jnp.where(keep, jnp.log(jnp.maximum(pmax, 1e-9)), 0.0), axis=1))
    conf = jnp.where(out_lengths > 0, conf, 0.0)
    return ids, out_lengths, conf
