"""Binary/grayscale morphology as reduce-window min/max pooling.

Mirrors cv2.erode / cv2.dilate / cv2.morphologyEx with rectangular
structuring elements (the only shape the reference uses —
``enhanced_extractor.py:274-280``). cv2's default border value
(+inf for erode, -inf for dilate) makes the border neutral, which is exactly
``lax.reduce_window`` with SAME-style explicit padding and the identity init.

reduce_window is natively supported by XLA:TPU and fuses with neighbors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _window(img: jnp.ndarray, ksize: tuple, computation, init: float) -> jnp.ndarray:
    kh, kw = ksize
    # cv2 anchors the kernel at its center: for even sizes the extra tap goes
    # to the bottom/right (anchor = k//2).
    pad_h = (kh // 2, kh - 1 - kh // 2)
    pad_w = (kw // 2, kw - 1 - kw // 2)
    window_dims = (1,) * (img.ndim - 2) + (kh, kw)
    strides = (1,) * img.ndim
    padding = [(0, 0)] * (img.ndim - 2) + [pad_h, pad_w]
    return lax.reduce_window(img, init, computation, window_dims, strides, padding)


def erode(img: jnp.ndarray, ksize: tuple, iterations: int = 1) -> jnp.ndarray:
    """cv2.erode with a (kw, kh)-rect kernel. ``ksize`` is (kw, kh) like cv2."""
    kw, kh = ksize
    out = img
    for _ in range(iterations):
        out = _window(out, (kh, kw), lax.min, jnp.inf)
    return out


def dilate(img: jnp.ndarray, ksize: tuple, iterations: int = 1) -> jnp.ndarray:
    """cv2.dilate with a (kw, kh)-rect kernel."""
    kw, kh = ksize
    out = img
    for _ in range(iterations):
        out = _window(out, (kh, kw), lax.max, -jnp.inf)
    return out


def close(img: jnp.ndarray, ksize: tuple, iterations: int = 1) -> jnp.ndarray:
    """cv2.morphologyEx(MORPH_CLOSE): dilate x iters, then erode x iters."""
    return erode(dilate(img, ksize, iterations), ksize, iterations)


def open_(img: jnp.ndarray, ksize: tuple, iterations: int = 1) -> jnp.ndarray:
    """cv2.morphologyEx(MORPH_OPEN): erode x iters, then dilate x iters."""
    return dilate(erode(img, ksize, iterations), ksize, iterations)
