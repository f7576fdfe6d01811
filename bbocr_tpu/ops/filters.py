"""Separable filtering ops: Gaussian blur (cv2 + PIL variants), box blur,
Sobel magnitude, unsharp mask.

Parity targets:
- ``cv2.GaussianBlur`` (reference ``image_preprocessor.py:35`` with
  ksize=(3,3), sigma=strength; BORDER_REFLECT_101).
- ``PIL.ImageFilter.UnsharpMask(radius=1.0, percent=30, threshold=3)``
  (reference ``image_preprocessor.py:109``). Pillow's Gaussian is three
  passes of an "extended" fractional box blur (Gwosdek et al. 2011), which we
  reproduce as a single separable float kernel.

All filters operate on the last two axes of a ``(..., H, W)`` float32 array
and are jit/vmap-friendly (static kernel sizes, no data-dependent shapes).
On TPU the stacked-shift formulation lowers to fused VPU code; there is also
a Pallas fused variant in ``bbocr_tpu.kernels``.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from bbocr_tpu.ops.color import quantize_u8


# ---------------------------------------------------------------------------
# Padding helpers
# ---------------------------------------------------------------------------

_PAD_MODES = {
    "reflect101": "reflect",  # cv2.BORDER_REFLECT_101 == numpy 'reflect'
    "replicate": "edge",  # cv2.BORDER_REPLICATE == numpy 'edge'
}


def pad2d(img: jnp.ndarray, top: int, bottom: int, left: int, right: int, mode: str) -> jnp.ndarray:
    """Pad the last two axes with an OpenCV-style border mode."""
    np_mode = _PAD_MODES[mode]
    pad_width = [(0, 0)] * (img.ndim - 2) + [(top, bottom), (left, right)]
    return jnp.pad(img, pad_width, mode=np_mode)


# ---------------------------------------------------------------------------
# Separable correlation via stacked shifts (fuses well under XLA)
# ---------------------------------------------------------------------------


def _correlate_axis(img: jnp.ndarray, taps: np.ndarray, axis: int, border: str) -> jnp.ndarray:
    """1-D correlation along ``axis`` (-1 or -2) with static float taps."""
    k = len(taps)
    r_lo = (k - 1) // 2
    r_hi = k - 1 - r_lo
    if axis == -2:
        padded = pad2d(img, r_lo, r_hi, 0, 0, border)
    else:
        padded = pad2d(img, 0, 0, r_lo, r_hi, border)
    n = img.shape[axis]
    out = None
    for i, w in enumerate(taps):
        if w == 0.0:
            continue
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(i, i + n)
        term = float(w) * padded[tuple(sl)]
        out = term if out is None else out + term
    return out


def separable_filter2d(
    img: jnp.ndarray,
    taps_y,
    taps_x,
    border: str = "reflect101",
) -> jnp.ndarray:
    taps_y = np.asarray(taps_y, np.float64)
    taps_x = np.asarray(taps_x, np.float64)
    out = _correlate_axis(img, taps_y, -2, border)
    out = _correlate_axis(out, taps_x, -1, border)
    return out


# ---------------------------------------------------------------------------
# Gaussian kernels
# ---------------------------------------------------------------------------


# cv2's fixed binomial kernels used when sigma <= 0 and ksize <= 7.
_SMALL_GAUSSIAN_TAB = {
    1: (1.0,),
    3: (0.25, 0.5, 0.25),
    5: (0.0625, 0.25, 0.375, 0.25, 0.0625),
    7: (0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125),
}


@lru_cache(maxsize=None)
def gaussian_kernel_1d(ksize: int, sigma: float) -> tuple:
    """cv2.getGaussianKernel parity (including the sigma<=0 default rules)."""
    if sigma <= 0 and ksize in _SMALL_GAUSSIAN_TAB:
        return _SMALL_GAUSSIAN_TAB[ksize]
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    half = (ksize - 1) * 0.5
    xs = np.arange(ksize, dtype=np.float64) - half
    w = np.exp(-(xs**2) / (2.0 * sigma * sigma))
    w /= w.sum()
    return tuple(w.tolist())


def gaussian_blur(
    img: jnp.ndarray,
    ksize: int,
    sigma: float,
    border: str = "reflect101",
    quantize: bool = True,
) -> jnp.ndarray:
    """cv2.GaussianBlur on the last two axes (square kernel)."""
    taps = gaussian_kernel_1d(ksize, sigma)
    out = separable_filter2d(img, taps, taps, border)
    return quantize_u8(out) if quantize else out


# ---------------------------------------------------------------------------
# Box blur + Pillow-style Gaussian (3x extended box)
# ---------------------------------------------------------------------------


def box_blur(img: jnp.ndarray, ksize: int, border: str = "replicate", normalize: bool = True) -> jnp.ndarray:
    """cv2.boxFilter/blur on the last two axes (no quantization)."""
    w = np.ones(ksize, np.float64)
    if normalize:
        w /= ksize
    return separable_filter2d(img, w, w, border)


@lru_cache(maxsize=None)
def pil_gaussian_kernel_1d(radius: float, passes: int = 3) -> tuple:
    """Effective 1-D kernel of Pillow's GaussianBlur.

    Pillow implements Gaussian blur as ``passes`` applications of an extended
    box filter whose half-width l and edge weight alpha match the requested
    per-pass variance sigma^2 = radius^2 / passes (Gwosdek et al., SSVM'11).
    Auto-convolving that box kernel ``passes`` times yields the effective
    float kernel (Pillow's intermediate uint8 rounding introduces <=1 LSB
    deviations, which our golden tests tolerate).
    """
    sigma2 = radius * radius / passes
    li = int((math.sqrt(12.0 * sigma2 + 1.0) - 1.0) / 2.0)
    denom = 2.0 * ((li + 1) ** 2 - sigma2)
    alpha = (2 * li + 1) * (sigma2 - li * (li + 1) / 3.0) / denom if denom != 0 else 0.0
    base = np.ones(2 * li + 3, np.float64)
    base[0] = base[-1] = alpha
    base /= base.sum()
    kern = base
    for _ in range(passes - 1):
        kern = np.convolve(kern, base)
    return tuple(kern.tolist())


def pil_gaussian_blur(img: jnp.ndarray, radius: float, passes: int = 3) -> jnp.ndarray:
    """PIL.ImageFilter.GaussianBlur approximation (float, edge-replicated)."""
    taps = pil_gaussian_kernel_1d(radius, passes)
    return separable_filter2d(img, taps, taps, border="replicate")


def unsharp_mask(
    img: jnp.ndarray,
    radius: float = 1.0,
    percent: int = 30,
    threshold: int = 3,
) -> jnp.ndarray:
    """PIL.ImageFilter.UnsharpMask parity on grayscale [0,255] floats.

    Pillow: blur with 3-pass box Gaussian, then for |in - blur| >= threshold,
    out = clip(in + (in - blur) * percent // 100) with C integer truncation.
    """
    blurred = quantize_u8(pil_gaussian_blur(img, radius))
    src = quantize_u8(img)
    diff = src - blurred
    scaled = diff * float(percent)
    # C integer division truncates toward zero.
    adj = jnp.sign(scaled) * jnp.floor(jnp.abs(scaled) / 100.0)
    out = jnp.where(jnp.abs(diff) >= threshold, src + adj, src)
    return quantize_u8(out)


# ---------------------------------------------------------------------------
# Sobel gradient magnitude (auto-crop mask cue)
# ---------------------------------------------------------------------------


def sobel_magnitude_u8(img: jnp.ndarray) -> jnp.ndarray:
    """|Sobel_x| + |Sobel_y| with per-term uint8 saturation.

    Mirrors the reference's gradient cue
    (``enhanced_extractor.py:262-264``): Sobel CV_16S ksize=3 in x and y,
    convertScaleAbs each, then addWeighted(1,1) with saturation.
    """
    smooth = np.array([1.0, 2.0, 1.0])
    deriv = np.array([-1.0, 0.0, 1.0])
    gx = separable_filter2d(img, smooth, deriv, border="reflect101")
    gy = separable_filter2d(img, deriv, smooth, border="reflect101")
    ax = jnp.clip(jnp.round(jnp.abs(gx)), 0, 255)
    ay = jnp.clip(jnp.round(jnp.abs(gy)), 0, 255)
    return jnp.clip(jnp.round(ax + ay), 0, 255)
