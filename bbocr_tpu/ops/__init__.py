"""Jittable JAX image ops mirroring the reference's OpenCV/PIL semantics.

Conventions
-----------
- Images are ``float32`` arrays in the [0, 255] domain. Grayscale images have
  shape ``(..., H, W)``; color images ``(..., H, W, 3)`` (RGB channel order).
- Ops are pure functions of their array inputs with static configuration
  passed as Python values, so everything composes under ``jax.jit`` /
  ``jax.vmap`` / ``shard_map``.
- ``quantize_u8`` reproduces the uint8 round-trip the reference performs
  between steps (OpenCV/PIL operate on uint8 buffers); running it between
  chain stages keeps histogram-based ops (CLAHE, equalize, Otsu) faithful.
"""

from bbocr_tpu.ops.color import quantize_u8, rgb_to_grayscale
from bbocr_tpu.ops.filters import (
    box_blur,
    gaussian_blur,
    gaussian_kernel_1d,
    sobel_magnitude_u8,
    unsharp_mask,
)
from bbocr_tpu.ops.histogram import clahe, equalize_hist, otsu_threshold
from bbocr_tpu.ops.morphology import (
    close as morph_close,
    dilate,
    erode,
    open_ as morph_open,
)
from bbocr_tpu.ops.pil_enhance import adjust_brightness, adjust_contrast
from bbocr_tpu.ops.resize import resize_bicubic, resize_bilinear
from bbocr_tpu.ops.threshold import adaptive_threshold

__all__ = [
    "quantize_u8",
    "rgb_to_grayscale",
    "gaussian_blur",
    "gaussian_kernel_1d",
    "box_blur",
    "sobel_magnitude_u8",
    "unsharp_mask",
    "clahe",
    "equalize_hist",
    "otsu_threshold",
    "erode",
    "dilate",
    "morph_open",
    "morph_close",
    "adjust_brightness",
    "adjust_contrast",
    "resize_bicubic",
    "resize_bilinear",
    "adaptive_threshold",
]
