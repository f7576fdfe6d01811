"""PIL.ImageEnhance parity ops (grayscale).

Reference: ``image_preprocessor.py:70-100`` — Contrast(1.9) and
Brightness(1.2) applied to the grayscale image via PIL.

PIL semantics:
- Contrast: mean = int(ImageStat(L).mean + 0.5); out = blend(solid(mean), img, f)
- Brightness: out = blend(black, img, f)
- blend(a, b, alpha) = a + alpha*(b-a), rounded half-up, clipped to [0,255].
"""

from __future__ import annotations

import jax.numpy as jnp

from bbocr_tpu.ops.color import quantize_u8


def _blend(degenerate: jnp.ndarray, img: jnp.ndarray, factor: float) -> jnp.ndarray:
    out = degenerate + factor * (img - degenerate)
    # Pillow rounds half-up (adds 0.5 then truncates) and clips.
    return jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)


def adjust_contrast(img: jnp.ndarray, factor: float) -> jnp.ndarray:
    """ImageEnhance.Contrast(img).enhance(factor) on (..., H, W) grayscale.

    The mean is computed per image over the trailing two axes (PIL computes
    it over the whole image), then rounded half-up to an integer.
    """
    mean = jnp.mean(quantize_u8(img), axis=(-2, -1), keepdims=True)
    mean = jnp.floor(mean + 0.5)
    return _blend(mean, quantize_u8(img), factor)


def adjust_brightness(img: jnp.ndarray, factor: float) -> jnp.ndarray:
    """ImageEnhance.Brightness(img).enhance(factor)."""
    return _blend(jnp.zeros_like(img), quantize_u8(img), factor)
