"""Resize as matrix-multiply resampling — the TPU-native formulation.

Instead of gather-based interpolation (poor MXU utilization), separable
resize is expressed as two dense matmuls:

    out = W_rows @ img @ W_cols^T

where ``W_rows`` is ``(H_out, H_in)`` with at most 4 (cubic) or 2 (linear)
non-zeros per row. Dense matmuls ride the 128x128 systolic array, and XLA
fuses the surrounding elementwise work. Weight matrices are built on the host
at trace time (shapes are static) and become compile-time constants.

Parity target: ``cv2.resize(..., INTER_CUBIC)`` — half-pixel centers,
Catmull-Rom-style cubic with a = -0.75, edge clamping
(reference ``image_preprocessor.py:130``).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from bbocr_tpu.ops.color import quantize_u8


def _cubic_weights(f: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution weights for taps at offsets (-1, 0, 1, 2).

    ``f`` is the fractional coordinate in [0, 1); returns shape (len(f), 4).
    Matches OpenCV's interpolateCubic (A = -0.75).
    """
    f = f.astype(np.float64)
    w = np.empty((f.size, 4), np.float64)
    # distance of each tap from the sample point: 1+f, f, 1-f, 2-f
    w[:, 0] = ((a * (f + 1) - 5 * a) * (f + 1) + 8 * a) * (f + 1) - 4 * a
    w[:, 1] = ((a + 2) * f - (a + 3)) * f * f + 1
    w[:, 2] = ((a + 2) * (1 - f) - (a + 3)) * (1 - f) * (1 - f) + 1
    w[:, 3] = 1.0 - w[:, 0] - w[:, 1] - w[:, 2]
    return w


@lru_cache(maxsize=None)
def _resample_matrix(n_out: int, n_in: int, kind: str) -> np.ndarray:
    """(n_out, n_in) resampling matrix with cv2 half-pixel-center mapping."""
    scale = n_in / n_out
    x = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
    ix = np.floor(x).astype(np.int64)
    f = x - ix
    mat = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    if kind == "cubic":
        w = _cubic_weights(f)
        taps = (-1, 0, 1, 2)
    elif kind == "linear":
        w = np.stack([1.0 - f, f], axis=1)
        taps = (0, 1)
    else:
        raise ValueError(f"unknown resize kind: {kind}")
    for t_idx, t in enumerate(taps):
        src = np.clip(ix + t, 0, n_in - 1)
        np.add.at(mat, (rows, src), w[:, t_idx].astype(np.float32))
    return mat


def _resize2d(img: jnp.ndarray, out_h: int, out_w: int, kind: str, quantize: bool) -> jnp.ndarray:
    h, w = img.shape[-2], img.shape[-1]
    wr = jnp.asarray(_resample_matrix(out_h, h, kind))
    wc = jnp.asarray(_resample_matrix(out_w, w, kind))
    # rows: (..., H, W) -> (..., H_out, W); use high-precision accumulate.
    out = jnp.einsum("oh,...hw->...ow", wr, img, precision="highest")
    out = jnp.einsum("pw,...ow->...op", wc, out, precision="highest")
    return quantize_u8(out) if quantize else out


def resize_bicubic(img: jnp.ndarray, out_h: int, out_w: int, quantize: bool = True) -> jnp.ndarray:
    """cv2.resize INTER_CUBIC on the last two axes of a grayscale image.

    For color, vmap over / move the channel axis off the last two positions.
    """
    return _resize2d(img, out_h, out_w, "cubic", quantize)


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int, quantize: bool = False) -> jnp.ndarray:
    """cv2.resize INTER_LINEAR (upscaling case) on the last two axes."""
    return _resize2d(img, out_h, out_w, "linear", quantize)
