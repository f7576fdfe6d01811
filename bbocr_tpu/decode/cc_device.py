"""Connected-component labeling ON DEVICE (jittable, static shapes).

First building block of the single-dispatch latency fast path
(docs/ROADMAP.md): keeping the CRAFT mask -> components step inside the
XLA program removes a host round trip per scan, which dominates p50 on
relayed TPU links. Semantically matches the host labeler
(``bbocr_tpu.native.connected_components``) up to label renaming: here a
component's label is ``1 + min flat index`` of its pixels.

Algorithm: iterative min-label propagation (each step takes the min over
the 4-neighborhood, a pure VPU shift/min pass) accelerated by pointer
jumping every ``jump_every`` steps (labels are flat indices, so
``label[i] <- label[label[i] - 1]`` halves chain lengths — gather-based,
so used sparingly). Converges in O(log diameter) jump rounds; the
``lax.while_loop`` exits on a fixed-point check.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.int32(2**31 - 1)


def _neighbor_min(lab: jnp.ndarray) -> jnp.ndarray:
    """Min over the 4-neighborhood (edges padded with the BIG sentinel)."""
    up = jnp.concatenate([lab[1:], jnp.full_like(lab[:1], _BIG)], axis=0)
    down = jnp.concatenate([jnp.full_like(lab[:1], _BIG), lab[:-1]], axis=0)
    left = jnp.concatenate([lab[:, 1:], jnp.full_like(lab[:, :1], _BIG)], axis=1)
    right = jnp.concatenate([jnp.full_like(lab[:, :1], _BIG), lab[:, :-1]], axis=1)
    return jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))


def label_components_device(
    mask: jnp.ndarray, max_iters: int = 1024, jump_every: int = 8
) -> jnp.ndarray:
    """(H, W) bool/int mask -> (H, W) int32 labels.

    Background pixels get 0; each component is labeled ``1 + min flat
    index`` over its pixels (4-connectivity, matching the detection
    postprocessing's ``connectivity=4``).
    """
    h, w = mask.shape
    m = mask != 0
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    lab0 = jnp.where(m, idx, _BIG)

    def body(state):
        lab, _, it = state
        new = jnp.where(m, jnp.minimum(lab, _neighbor_min(lab)), _BIG)

        def jump(l):
            # Pointer jumping: labels are flat indices into the same grid.
            flat = l.reshape(-1)
            tgt = flat[jnp.clip(flat, 0, h * w - 1)]
            return jnp.where(l != _BIG, jnp.minimum(l, tgt.reshape(h, w)), _BIG)

        new = jax.lax.cond((it + 1) % jump_every == 0, jump, lambda l: l, new)
        changed = jnp.any(new != lab)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    lab, _, _ = jax.lax.while_loop(
        cond, body, (lab0, jnp.asarray(True), jnp.int32(0))
    )
    return jnp.where(m, lab + 1, 0).astype(jnp.int32)


def component_stats_device(labels: jnp.ndarray, k: int, score: jnp.ndarray = None):
    """Top-``k`` component stats from device labels, fully on device.

    Returns ``(ids, x0, y0, x1, y1, count)`` each of shape (k,), padded
    with zeros past the number of real components — plus ``peak`` (the max
    of ``score`` over the component, float32) when ``score`` is given.
    Components are ranked by population. O(H*W * k) compare-reduce —
    intended for small k (word boxes per canvas) on half-resolution score
    maps.
    """
    h, w = labels.shape
    flat = labels.reshape(-1)

    # k largest components by count: iterate k times, masking found ids.
    ys = jnp.arange(h, dtype=jnp.int32)[:, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]

    def pick(carry, _):
        excluded = carry  # (k,) already-picked ids (0 = none)
        cand = jnp.where(
            (flat[:, None] == excluded[None, :]).any(axis=1), 0, flat
        )
        # mode of nonzero candidates via one-pass bincount-free argmax:
        # count occurrences of each pixel's label among candidates by
        # comparing against a sorted unique trick is dynamic; instead use
        # segment-free approach: count[i] = sum(cand == cand[i]) is O(n^2).
        # Practical alternative: histogram over flat indices is dense
        # (h*w bins) — fine at half-res map sizes.
        counts = jnp.zeros((h * w + 1,), jnp.int32).at[
            jnp.clip(cand, 0, h * w)
        ].add(jnp.where(cand > 0, 1, 0))
        best = jnp.argmax(counts).astype(jnp.int32)
        return jnp.concatenate([excluded[1:], best[None]]), best

    excluded0 = jnp.zeros((k,), jnp.int32)
    _, ids = jax.lax.scan(pick, excluded0, None, length=k)

    def stats_for(cid):
        sel = labels == cid
        cnt = sel.sum().astype(jnp.int32)
        x0 = jnp.where(sel, xs, w).min().astype(jnp.int32)
        x1 = jnp.where(sel, xs, -1).max().astype(jnp.int32)
        y0 = jnp.where(sel, ys, h).min().astype(jnp.int32)
        y1 = jnp.where(sel, ys, -1).max().astype(jnp.int32)
        valid = (cid > 0) & (cnt > 0)
        z = jnp.int32(0)
        out = (
            jnp.where(valid, cid, z),
            jnp.where(valid, x0, z),
            jnp.where(valid, y0, z),
            jnp.where(valid, x1, z),
            jnp.where(valid, y1, z),
            jnp.where(valid, cnt, z),
        )
        if score is not None:
            peak = jnp.where(sel, score, 0.0).max().astype(jnp.float32)
            out = out + (jnp.where(valid, peak, 0.0),)
        return out

    return jax.vmap(stats_for)(ids)
