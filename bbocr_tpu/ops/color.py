"""Color conversions (cv2.cvtColor parity).

Reference uses ``cv2.cvtColor(..., cv2.COLOR_BGR2GRAY)``
(``pipeline_demo/ocr_testing/preprocessing/image_preprocessor.py:28``); the
ITU-R BT.601 luma weights are identical for RGB inputs with channels swapped.
"""

from __future__ import annotations

import jax.numpy as jnp

# BT.601 luma weights used by OpenCV for *2GRAY conversions (R, G, B order).
_LUMA_RGB = (0.299, 0.587, 0.114)


def quantize_u8(x: jnp.ndarray) -> jnp.ndarray:
    """Round to the nearest integer and clip to [0, 255], staying float32.

    Models the uint8 store the reference performs after every OpenCV/PIL step.
    """
    return jnp.clip(jnp.round(x), 0.0, 255.0)


def rgb_to_grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) RGB float [0,255] -> (..., H, W) grayscale.

    Matches cv2 COLOR_RGB2GRAY including the round-to-nearest uint8 store.
    """
    r = img[..., 0]
    g = img[..., 1]
    b = img[..., 2]
    y = _LUMA_RGB[0] * r + _LUMA_RGB[1] * g + _LUMA_RGB[2] * b
    return quantize_u8(y)
