"""CTC prefix beam search ON DEVICE (vectorized, static shapes).

The host beam (``decode/beam.py``) is a per-crop Python loop — fine for a
handful of ISBN re-reads, but it serializes on the host and ships full
(T, C) log-prob tensors over the link. This implementation runs the same
prefix-merging beam entirely inside XLA: one ``lax.scan`` over frames,
beams and frame-candidates expanded as static-shape tensors, and prefix
merging done by sorting a rolling hash and segment-combining probabilities
(TPU has no hash maps; equal prefixes ⇔ equal rolling hash, and a u32
multiplicative hash over ≤ beam*(k+1) ≈ 10^2 candidates makes collisions
negligible). vmap batches it over crops, so decode stays in the same
program as the recognizer forward — nothing but ids crosses to the host.

Replaces the reference's host-side CTC decode inside easyocr
(SURVEY.md §2.3 "greedy/beam CTC decode"); the host beam remains the
parity oracle in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from bbocr_tpu.models.charset import BLANK_ID

NEG = jnp.float32(-1e30)
_HASH_MULT = jnp.uint32(1000003)


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    # exp of (very negative - m) underflows to 0 cleanly
    out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))
    return jnp.where(jnp.maximum(a, b) <= NEG / 2, NEG, out)


def _segment_logaddexp(vals, seg_id, num_segments):
    m = jax.ops.segment_max(vals, seg_id, num_segments=num_segments)
    m_safe = jnp.where(m <= NEG / 2, 0.0, m)
    s = jax.ops.segment_sum(jnp.exp(vals - m_safe[seg_id]), seg_id, num_segments=num_segments)
    out = m_safe + jnp.log(jnp.maximum(s, 1e-30))
    return jnp.where(m <= NEG / 2, NEG, out)


def _beam_single(logp, frames, beam_width: int, top_k: int, blank: int, max_len: int):
    """One sequence. logp (T, C) log-probs, frames = valid frame count."""
    t_len, n_cls = logp.shape
    k = min(top_k, n_cls - 1)
    w = beam_width
    m = w * (k + 2)  # w stays + w*(k+1) extension slots

    # frames beyond the valid length become deterministic blanks (log p = 0):
    # the update then only moves mass p_total -> p_b, leaving prefixes alone.
    t_idx = jnp.arange(t_len, dtype=jnp.int32)
    blank_row = jnp.full((n_cls,), NEG, jnp.float32).at[blank].set(0.0)
    logp = jnp.where((t_idx < frames)[:, None], logp, blank_row[None, :])

    ids0 = jnp.zeros((w, max_len), jnp.int32)
    lens0 = jnp.zeros((w,), jnp.int32)
    hash0 = jnp.zeros((w,), jnp.uint32)
    last0 = jnp.full((w,), -1, jnp.int32)
    p_b0 = jnp.full((w,), NEG, jnp.float32).at[0].set(0.0)
    p_nb0 = jnp.full((w,), NEG, jnp.float32)

    def step(carry, logp_t):
        ids, lens, hsh, last, p_b, p_nb = carry
        p_tot = _logaddexp(p_b, p_nb)

        vals, chars = jax.lax.top_k(logp_t, k + 1)  # may include blank
        ext_vals = jnp.where(chars == blank, NEG, vals)  # (k+1,)
        p_blank = logp_t[blank]
        p_last = jnp.where(last >= 0, logp_t[jnp.maximum(last, 0)], NEG)

        # --- candidates ------------------------------------------------
        # stay (one per beam): blank after anything, or repeat-collapse
        stay_pb = p_tot + p_blank                      # (w,)
        stay_pnb = p_nb + p_last                       # (w,)
        # extend (w x (k+1)): char c appended; repeated char needs the
        # blank-separated mass p_b, otherwise all mass extends
        base = jnp.where(chars[None, :] == last[:, None], p_b[:, None], p_tot[:, None])
        ext_pnb = base + ext_vals[None, :]             # (w, k+1)
        full = lens[:, None] >= max_len
        ext_pnb = jnp.where(full, NEG, ext_pnb)
        ext_hash = hsh[:, None] * _HASH_MULT + chars[None, :].astype(jnp.uint32) + 1

        c_hash = jnp.concatenate([hsh, ext_hash.reshape(-1)])
        c_pb = jnp.concatenate([stay_pb, jnp.full((w * (k + 1),), NEG)])
        c_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(-1)])
        c_parent = jnp.concatenate(
            [jnp.arange(w, dtype=jnp.int32),
             jnp.repeat(jnp.arange(w, dtype=jnp.int32), k + 1)]
        )
        c_char = jnp.concatenate(
            [jnp.full((w,), -1, jnp.int32),
             jnp.broadcast_to(chars[None, :], (w, k + 1)).reshape(-1)]
        )

        # --- merge equal prefixes (equal rolling hash) -------------------
        order = jnp.argsort(c_hash)
        h_s = c_hash[order]
        pb_s, pnb_s = c_pb[order], c_pnb[order]
        seg_start = jnp.concatenate([jnp.array([True]), h_s[1:] != h_s[:-1]])
        seg_id = jnp.cumsum(seg_start.astype(jnp.int32)) - 1
        pb_c = _segment_logaddexp(pb_s, seg_id, m)[seg_id]
        pnb_c = _segment_logaddexp(pnb_s, seg_id, m)[seg_id]
        # only the first candidate of each segment carries the merged mass
        pb_m = jnp.where(seg_start, pb_c, NEG)
        pnb_m = jnp.where(seg_start, pnb_c, NEG)
        tot_m = _logaddexp(pb_m, pnb_m)

        # --- keep top beams ---------------------------------------------
        top_tot, pick = jax.lax.top_k(tot_m, w)
        src = order[pick]
        parent = c_parent[src]
        newchar = c_char[src]
        n_hash = c_hash[src]
        n_pb = pb_m[pick]
        n_pnb = pnb_m[pick]

        p_ids = ids[parent]
        p_lens = lens[parent]
        pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
        appended = jnp.where(
            (pos == p_lens[:, None]) & (newchar[:, None] >= 0),
            jnp.maximum(newchar[:, None], 0),
            p_ids,
        )
        n_ids = jnp.where((newchar >= 0)[:, None], appended, p_ids)
        n_lens = p_lens + (newchar >= 0).astype(jnp.int32)
        n_last = jnp.where(newchar >= 0, newchar, last[parent])
        # dead beams (NEG total) must not shadow live prefixes
        n_hash = jnp.where(top_tot <= NEG / 2, jnp.uint32(0xFFFFFFFF) - jnp.arange(w, dtype=jnp.uint32), n_hash)
        return (n_ids, n_lens, n_hash, n_last, n_pb, n_pnb), None

    (ids, lens, _, _, p_b, p_nb), _ = jax.lax.scan(
        step, (ids0, lens0, hash0, last0, p_b0, p_nb0), logp
    )
    tot = _logaddexp(p_b, p_nb)
    best = jnp.argmax(tot)
    return ids[best], lens[best], tot[best]


@partial(jax.jit, static_argnames=("beam_width", "top_k", "blank", "max_len"))
def ctc_beam_decode_device(
    logits: jnp.ndarray,
    lengths: jnp.ndarray | None = None,
    beam_width: int = 8,
    top_k: int = 8,
    blank: int = BLANK_ID,
    max_len: int = 32,
):
    """Batched on-device CTC prefix beam decode.

    Args:
        logits: (B, T, C) float logits.
        lengths: optional (B,) valid frame counts (width-bucket padding).
        beam_width, top_k: beams kept / symbols expanded per frame.
        max_len: prefix buffer length (static).

    Returns:
        ids: (B, max_len) int32, zero padded.
        out_lengths: (B,) int32.
        score: (B,) float32 — log probability of the best prefix.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    b, t, _ = logp.shape
    frames = (
        jnp.full((b,), t, jnp.int32)
        if lengths is None
        else lengths.astype(jnp.int32)
    )
    fn = partial(
        _beam_single, beam_width=beam_width, top_k=top_k, blank=blank, max_len=max_len
    )
    return jax.vmap(fn)(logp, frames)
