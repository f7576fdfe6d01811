"""cv2.adaptiveThreshold parity (MEAN_C and GAUSSIAN_C).

Used by the reference's "gentle_threshold" preprocessing step
(``image_preprocessor.py:58-68``) and by the auto-crop composite mask
(``enhanced_extractor.py:258-259``).

cv2 semantics: the local mean image is computed with BORDER_REPLICATE and
rounded to uint8; then for THRESH_BINARY, dst = maxval where
src > mean - C (strict), and for THRESH_BINARY_INV, dst = maxval where
src <= mean - C.
"""

from __future__ import annotations

import jax.numpy as jnp

from bbocr_tpu.ops.filters import box_blur, gaussian_kernel_1d, separable_filter2d


def adaptive_threshold(
    img: jnp.ndarray,
    maxval: float = 255.0,
    method: str = "mean",
    block_size: int = 11,
    c: float = 2.0,
    inverse: bool = False,
) -> jnp.ndarray:
    src = jnp.clip(jnp.round(img), 0, 255)
    if method == "mean":
        mean = box_blur(src, block_size, border="replicate", normalize=True)
    elif method == "gaussian":
        taps = gaussian_kernel_1d(block_size, -1.0)  # cv2 default sigma rule
        mean = separable_filter2d(src, taps, taps, border="replicate")
    else:
        raise ValueError(f"unknown adaptive threshold method: {method}")
    mean = jnp.clip(jnp.round(mean), 0, 255)
    above = src > mean - c
    mask = ~above if inverse else above
    return jnp.where(mask, maxval, 0.0).astype(jnp.float32)
