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


def _clahe_luts(tiles_vals: jnp.ndarray, clip_limit: float, tile_area: int) -> jnp.ndarray:
    """(T, tile_area) int32 pixel values -> (T, 256) float LUTs, cv2 math."""
    n_tiles = tiles_vals.shape[0]

    def tile_hist(v):
        return _hist256(v)

    hist = jax.vmap(tile_hist)(tiles_vals)  # (T, 256) float counts

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


def _clahe_2d(img: jnp.ndarray, clip_limit: float, tiles_y: int, tiles_x: int) -> jnp.ndarray:
    h, w = img.shape
    th = -(-h // tiles_y)  # ceil
    tw = -(-w // tiles_x)
    hp, wp = th * tiles_y, tw * tiles_x
    padded = jnp.pad(img, ((0, hp - h), (0, wp - w)), mode="reflect")
    vals = _as_u8_int(padded)

    tiles = vals.reshape(tiles_y, th, tiles_x, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(tiles_y * tiles_x, th * tw)
    luts = _clahe_luts(tiles, clip_limit, th * tw)  # (T, 256)
    lut_flat = luts.reshape(-1)  # (T*256,)

    ys = jnp.arange(hp, dtype=jnp.float32)
    xs = jnp.arange(wp, dtype=jnp.float32)
    tyf = ys / th - 0.5
    txf = xs / tw - 0.5
    ty1 = jnp.floor(tyf)
    tx1 = jnp.floor(txf)
    ya = (tyf - ty1)[:, None]
    xa = (txf - tx1)[None, :]
    ty1i = jnp.clip(ty1, 0, tiles_y - 1).astype(jnp.int32)
    ty2i = jnp.clip(ty1 + 1, 0, tiles_y - 1).astype(jnp.int32)
    tx1i = jnp.clip(tx1, 0, tiles_x - 1).astype(jnp.int32)
    tx2i = jnp.clip(tx1 + 1, 0, tiles_x - 1).astype(jnp.int32)

    def lut_at(tyi, txi):
        tile_idx = tyi[:, None] * tiles_x + txi[None, :]
        return lut_flat[tile_idx * 256 + vals]

    v11 = lut_at(ty1i, tx1i)
    v12 = lut_at(ty1i, tx2i)
    v21 = lut_at(ty2i, tx1i)
    v22 = lut_at(ty2i, tx2i)
    out = (
        v11 * (1 - xa) * (1 - ya)
        + v12 * xa * (1 - ya)
        + v21 * (1 - xa) * ya
        + v22 * xa * ya
    )
    out = jnp.clip(jnp.round(out), 0, 255)
    return out[:h, :w].astype(jnp.float32)


def clahe(
    img: jnp.ndarray,
    clip_limit: float = 2.0,
    tile_grid: tuple = (8, 8),
) -> jnp.ndarray:
    """cv2.createCLAHE(clipLimit, tileGridSize).apply — batched, jittable."""
    ty, tx = tile_grid
    return _batched(_clahe_2d)(img, clip_limit, ty, tx)
