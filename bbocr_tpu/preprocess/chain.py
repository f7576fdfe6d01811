"""The canonical book-cover preprocessing chain, as one fused XLA program.

Reference recipe (``pipeline_demo/ocr_testing/preprocessing/image_preprocessor.py:147-160``):

    grayscale -> resize x1.5 (bicubic) -> GaussianBlur(3x3, sigma=3)
    -> PIL Contrast(1.9) -> PIL Brightness(1.2) -> CLAHE(2.5, 8x8)
    -> UnsharpMask(radius=1.0, percent=30, threshold=3)

The reference runs this as ~7 separate full-image OpenCV/PIL passes on the
host, up to 3x per image per job (SURVEY.md §3.1). Here the whole chain is a
single jitted function: XLA fuses the elementwise stages, the resize rides
the MXU (matmul resampling), and a batch dimension amortizes everything.
uint8 quantization between stages is preserved so histogram-driven stages
(CLAHE) see the same integer values the reference does.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from bbocr_tpu.ops import (
    adjust_brightness,
    adjust_contrast,
    clahe,
    gaussian_blur,
    quantize_u8,
    resize_bicubic,
    rgb_to_grayscale,
    unsharp_mask,
)

# Step names reported to callers/traces, mirroring the reference's
# ``steps_applied`` strings so UI traces render identically.
BOOK_COVER_STEPS = (
    "original",
    "grayscale",
    "resize(scale_factor=1.5)",
    "denoise(strength=3)",
    "increase_contrast(factor=1.9)",
    "increase_brightness(factor=1.2)",
    "clahe(clip_limit=2.5)",
    "sharpen(amount=0.3)",
)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def _chain_gray(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """(..., H, W) grayscale [0,255] -> preprocessed (..., out_h, out_w)."""
    x = quantize_u8(img)
    x = resize_bicubic(x, out_h, out_w)
    x = gaussian_blur(x, 3, 3.0)
    x = adjust_contrast(x, 1.9)
    x = adjust_brightness(x, 1.2)
    x = clahe(x, 2.5, (8, 8))
    x = unsharp_mask(x, 1.0, 30, 3)
    return x


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def _chain_gray_pallas(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Chain variant with the conv+epilogue stages as fused Pallas kernels
    (bbocr_tpu.kernels); numerically identical to :func:`_chain_gray`.

    CLAHE and the MXU matmul-resize stay XLA; blur/enhance/unsharp each
    become one HBM-read one HBM-write VMEM pass.
    """
    from bbocr_tpu.kernels import blur3_u8_pallas, enhance_u8_pallas, unsharp_u8_pallas

    x = quantize_u8(img)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    x = x.reshape((-1,) + x.shape[-2:])
    x = resize_bicubic(x, out_h, out_w)
    x = blur3_u8_pallas(x, 3.0)
    mean = jnp.floor(jnp.mean(x, axis=(-2, -1)) + 0.5)
    x = enhance_u8_pallas(x, mean, 1.9, 1.2)
    x = clahe(x, 2.5, (8, 8))
    x = unsharp_u8_pallas(x, 30, 3, 1.0)
    if squeeze:
        x = x[0]
    return x


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def _chain_rgb(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    return _chain_gray(rgb_to_grayscale(img), out_h, out_w)


def _use_pallas(explicit) -> bool:
    if explicit is not None:
        return bool(explicit)
    import os

    from bbocr_tpu.utils.env import env_flag, on_tpu

    if os.environ.get("BB_OCR_PALLAS_PREPROCESS") is not None:
        return env_flag("BB_OCR_PALLAS_PREPROCESS")
    # default: fused kernels on real TPU hardware, XLA elsewhere
    return on_tpu()


def preprocess_for_book_cover(img: jnp.ndarray, scale: float = 1.5, use_pallas=None):
    """Single-image chain. ``img``: (H, W) gray or (H, W, 3) RGB float [0,255].

    Returns ``(preprocessed, steps_applied)`` where ``preprocessed`` is
    (round(H*scale), round(W*scale)) float32 in [0,255]. ``use_pallas``
    selects the fused-kernel variant (default: BB_OCR_PALLAS_PREPROCESS).
    """
    gray = img.ndim == 2
    h, w = (img.shape[0], img.shape[1])
    out_h, out_w = int(h * scale), int(w * scale)
    arr = jnp.asarray(img, jnp.float32)
    if not gray:
        arr = rgb_to_grayscale(arr)
    fn = _chain_gray_pallas if _use_pallas(use_pallas) else _chain_gray
    out = fn(arr, out_h, out_w)
    return out, list(BOOK_COVER_STEPS)


def preprocess_for_book_cover_batch(
    imgs: jnp.ndarray, scale: float = 1.5, use_pallas=None
) -> jnp.ndarray:
    """Batched chain over (B, H, W[, 3]) — the TPU-native entry point."""
    h, w = imgs.shape[1], imgs.shape[2]
    out_h, out_w = int(h * scale), int(w * scale)
    arr = jnp.asarray(imgs, jnp.float32)
    if imgs.ndim == 4:
        arr = rgb_to_grayscale(arr)
    fn = _chain_gray_pallas if _use_pallas(use_pallas) else _chain_gray
    return fn(arr, out_h, out_w)
