"""Histogram ops: equalization, CLAHE, Otsu — cv2-parity, jittable.

CLAHE is the reference's key contrast op
(``image_preprocessor.py:48-56`` with clip_limit=2.5, tiles 8x8; also inside
auto-crop, ``enhanced_extractor.py:255``). The cv2 algorithm is reproduced
exactly in integer arithmetic: per-tile 256-bin histograms (scatter-add),
clip + residual redistribution, LUT via scaled CDF, then bilinear
interpolation between the four neighboring tile LUTs.

Histograms use scatter-add, which XLA lowers fine on TPU for 256-bin sizes;
a Pallas VMEM-resident variant lives in ``bbocr_tpu.kernels``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _as_u8_int(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(img), 0, 255).astype(jnp.int32)


def _hist256(vals_int: jnp.ndarray) -> jnp.ndarray:
    """256-bin histogram of an int32 array (any shape), float32 counts."""
    return jnp.zeros((256,), jnp.float32).at[vals_int.ravel()].add(1.0)


def _batched(fn):
    """Lift a (H, W) -> (H, W) op to arbitrary leading batch dims."""

    def wrapped(img, *args, **kwargs):
        if img.ndim == 2:
            return fn(img, *args, **kwargs)
        flat = img.reshape((-1,) + img.shape[-2:])
        out = jax.vmap(lambda x: fn(x, *args, **kwargs))(flat)
        return out.reshape(img.shape[:-2] + out.shape[-2:])

    return wrapped


# ---------------------------------------------------------------------------
# Global histogram equalization (cv2.equalizeHist)
# ---------------------------------------------------------------------------


def _equalize_hist_2d(img: jnp.ndarray) -> jnp.ndarray:
    vals = _as_u8_int(img)
    hist = _hist256(vals)
    total = jnp.asarray(float(img.shape[-1] * img.shape[-2]), jnp.float32)
    nz = hist > 0
    # index of the first non-zero bin
    i0 = jnp.argmax(nz)
    h0 = hist[i0]
    denom = total - h0
    cdf = jnp.cumsum(hist)
    # lut[i] = round(255/(N - hist[i0]) * (cdf[i] - cdf[i0])), lut[i0] = 0
    scale = jnp.where(denom > 0, 255.0 / jnp.maximum(denom, 1.0), 0.0)
    lut = jnp.round(scale * (cdf - cdf[i0]))
    lut = jnp.clip(lut, 0, 255)
    return lut[vals].astype(jnp.float32)


equalize_hist = _batched(_equalize_hist_2d)


# ---------------------------------------------------------------------------
# Otsu threshold (cv2.threshold THRESH_OTSU)
# ---------------------------------------------------------------------------


def otsu_threshold_value(img: jnp.ndarray) -> jnp.ndarray:
    """Scalar Otsu threshold of a (H, W) image (cv2.getThreshVal_Otsu)."""
    vals = _as_u8_int(img)
    n = float(img.shape[-1] * img.shape[-2])
    p = _hist256(vals) / n
    bins = jnp.arange(256, dtype=jnp.float32)
    q1 = jnp.cumsum(p)
    mu_total = jnp.sum(p * bins)
    mu1_num = jnp.cumsum(p * bins)
    eps = 1.1920929e-07  # FLT_EPSILON, matching cv2's validity check
    valid = jnp.minimum(q1, 1.0 - q1) >= eps
    mu1 = mu1_num / jnp.maximum(q1, eps)
    mu2 = (mu_total - mu1_num) / jnp.maximum(1.0 - q1, eps)
    sigma = q1 * (1.0 - q1) * (mu1 - mu2) ** 2
    sigma = jnp.where(valid, sigma, -jnp.inf)
    return jnp.argmax(sigma).astype(jnp.float32)  # first max, like cv2


def _otsu_threshold_2d(img: jnp.ndarray, maxval: float = 255.0, inverse: bool = False) -> jnp.ndarray:
    t = otsu_threshold_value(img)
    src = jnp.clip(jnp.round(img), 0, 255)
    mask = src > t
    if inverse:
        mask = ~mask
    return jnp.where(mask, maxval, 0.0).astype(jnp.float32)


def otsu_threshold(img: jnp.ndarray, maxval: float = 255.0, inverse: bool = False) -> jnp.ndarray:
    """cv2.threshold(..., THRESH_BINARY[_INV] + THRESH_OTSU), batched."""
    return _batched(_otsu_threshold_2d)(img, maxval, inverse)


# ---------------------------------------------------------------------------
# CLAHE (cv2.createCLAHE)
# ---------------------------------------------------------------------------


def _tile_hists(tiles_vals: jnp.ndarray) -> jnp.ndarray:
    """(T, P) int32 -> (T, 256) float32 histograms.

    One-hot compare-reduce instead of scatter-add: XLA fuses the broadcast
    compare into the reduction (no materialization), and on TPU this stays
    on the VPU while scatters serialize (~12x faster on full-size covers).
    """
    bins = jnp.arange(256, dtype=tiles_vals.dtype)
    return jnp.sum(
        (tiles_vals[:, :, None] == bins[None, None, :]).astype(jnp.float32), axis=1
    )


def _clahe_luts_from_hist(hist: jnp.ndarray, clip_limit: float, tile_area: int) -> jnp.ndarray:
    """(T, 256) float histograms -> (T, 256) float LUTs, cv2 math."""
    clip_int = max(int(clip_limit * tile_area / 256.0), 1)
    clip = jnp.asarray(float(clip_int), jnp.float32)
    excess = jnp.maximum(hist - clip, 0.0)
    clipped = jnp.sum(excess, axis=1, keepdims=True)  # (T, 1)
    hist = jnp.minimum(hist, clip)
    redist_batch = jnp.floor(clipped / 256.0)
    residual = clipped - redist_batch * 256.0
    hist = hist + redist_batch
    # cv2 adds +1 at bins i = 0, s, 2s, ... while residual lasts,
    # s = max(256 // residual, 1).
    idx = jnp.arange(256, dtype=jnp.float32)[None, :]
    step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(residual, 1.0)), 1.0)
    hit = (jnp.floor(idx / step) * step == idx) & (idx / step < residual)
    hist = hist + jnp.where((residual > 0) & hit, 1.0, 0.0)

    lut_scale = 255.0 / float(tile_area)
    lut = jnp.round(jnp.cumsum(hist, axis=1) * lut_scale)
    return jnp.clip(lut, 0, 255)


def _clahe_batched(
    img: jnp.ndarray, clip_limit: float, tiles_y: int, tiles_x: int
) -> jnp.ndarray:
    """(N, H, W) float [0,255] -> CLAHE'd (N, H, W), cv2 math, TPU-shaped.

    The per-pixel 4-LUT bilinear gather of the textbook formulation is
    restructured into half-tile-shifted blocks: every pixel of a block shares
    the same four neighboring tile LUTs, so the lookup becomes a one-hot
    matmul (MXU) against a (256, 4) table and the bilinear weights become two
    fixed ramps. LUT values split L = 2*floor(L/2) + (L&1) keep the bf16
    matmul exact (one-hot rows select a single entry; halves are <= 127).
    """
    n, h, w = img.shape
    th = -(-h // tiles_y)  # ceil
    tw = -(-w // tiles_x)
    hp, wp = th * tiles_y, tw * tiles_x
    padded = jnp.pad(img, ((0, 0), (0, hp - h), (0, wp - w)), mode="reflect")
    vals = _as_u8_int(padded)  # (n, hp, wp)

    tiles = (
        vals.reshape(n, tiles_y, th, tiles_x, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(n * tiles_y * tiles_x, th * tw)
    )
    hist = _tile_hists(tiles)
    luts = _clahe_luts_from_hist(hist, clip_limit, th * tw)
    luts = luts.reshape(n, tiles_y, tiles_x, 256)

    # Edge-replicated LUT grid: block (by, bx) interpolates the four LUTs
    # lutp[by:by+2, bx:bx+2], which reproduces cv2's clipped neighbor
    # indexing (ty1 = clip(by-1), ty2 = clip(by)).
    lutp = jnp.pad(luts, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    l4 = jnp.stack(
        [
            lutp[:, :-1, :-1],  # top-left
            lutp[:, :-1, 1:],   # top-right
            lutp[:, 1:, :-1],   # bottom-left
            lutp[:, 1:, 1:],    # bottom-right
        ],
        axis=-1,
    )  # (n, ty+1, tx+1, 256, 4)
    nb = n * (tiles_y + 1) * (tiles_x + 1)
    l4 = l4.reshape(nb, 256, 4)

    # Half-tile shift makes the 4-LUT neighborhoods block-uniform.
    pt, pl = th // 2, tw // 2
    shifted = jnp.pad(vals, ((0, 0), (pt, th - pt), (pl, tw - pl)), mode="edge")
    vb = (
        shifted.reshape(n, tiles_y + 1, th, tiles_x + 1, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(nb, th * tw)
    )

    # Bilinear ramps, identical for every block: ya = frac(y/th - 0.5).
    ya = (jnp.arange(th, dtype=jnp.float32) - pt) / th + 0.5
    xa = (jnp.arange(tw, dtype=jnp.float32) - pl) / tw + 0.5
    wy = jnp.stack([1.0 - ya, ya], axis=1)  # (th, 2)
    wx = jnp.stack([1.0 - xa, xa], axis=1)  # (tw, 2)
    w4 = (wy[:, None, :, None] * wx[None, :, None, :]).reshape(th * tw, 4)

    # Exact bf16 split: vals = 2*dot(oh, floor(L/2)) + dot(oh, L mod 2).
    lh = jnp.floor(l4 / 2.0)
    l8 = jnp.concatenate([lh, l4 - 2.0 * lh], axis=-1).astype(jnp.bfloat16)
    w8 = jnp.concatenate([2.0 * w4, w4], axis=-1)  # (P, 8)

    chunk = 16
    nb_pad = -(-nb // chunk) * chunk
    vb = jnp.pad(vb, ((0, nb_pad - nb), (0, 0)))
    l8 = jnp.pad(l8, ((0, nb_pad - nb), (0, 0), (0, 0)))

    def chunk_fn(args):
        v_c, l_c = args  # (chunk, P) int32, (chunk, 256, 8) bf16
        oh = jax.nn.one_hot(v_c, 256, dtype=jnp.bfloat16)
        picked = jax.lax.dot_general(
            oh, l_c, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (chunk, P, 8)
        return jnp.einsum("cpk,pk->cp", picked, w8)

    out_blocks = jax.lax.map(
        chunk_fn,
        (
            vb.reshape(nb_pad // chunk, chunk, th * tw),
            l8.reshape(nb_pad // chunk, chunk, 256, 8),
        ),
    ).reshape(nb_pad, th * tw)[:nb]

    out = (
        out_blocks.reshape(n, tiles_y + 1, tiles_x + 1, th, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(n, hp + th, wp + tw)
    )
    out = out[:, pt : pt + h, pl : pl + w]
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.float32)


def clahe(
    img: jnp.ndarray,
    clip_limit: float = 2.0,
    tile_grid: tuple = (8, 8),
) -> jnp.ndarray:
    """cv2.createCLAHE(clipLimit, tileGridSize).apply — batched, jittable."""
    ty, tx = tile_grid
    if img.ndim == 2:
        return _clahe_batched(img[None], clip_limit, ty, tx)[0]
    flat = img.reshape((-1,) + img.shape[-2:])
    out = _clahe_batched(flat, clip_limit, ty, tx)
    return out.reshape(img.shape[:-2] + out.shape[-2:])
