"""Host<->device wire reduction: bit-packed canvas upload + host rectify.

The serving binder on relayed TPU links is the *uplink* (measured ~8.5MB/s
up vs 148MB/s down on the axon relay — docs/EVAL.md round 3): one u8
grayscale canvas per photo (1.44MB at 1408x1024) caps the hi-res mix at
~6-7 photos/s however fast the chip is. Two complementary cuts:

1. **Bit-packed canvases** (`pack_canvas` / `unpack_widen`): the detect
   canvas ships at 4 (or 2) bits/pixel with ordered (Bayer 4x4) dithering
   and is unpacked to float inside the detect program. Detection is a
   coarse segmentation task; 16 dithered gray levels preserve the text/bg
   edge structure CRAFT keys on. Halves (quarters) canvas wire bytes.

2. **Host rectification** (`host_warp_crop`): recognition crops are warped
   on the host with cv2 from the ORIGINAL photo at native resolution and
   uploaded as small u8 strips (~0.15MB/photo for ~23 crops), instead of
   being gather-warped on device from the letterboxed canvas. This (a)
   decouples recognition quality from canvas quantization AND canvas
   scale — crops come from full-detail pixels, like the reference's
   easyocr, which warps from the original image — and (b) removes the
   device warp gather from the serving path.

The reference has no analog (its easyocr runs host-side end to end); this
module exists because the rebuild splits work across a bandwidth-bounded
host<->device link. Role citation: crop rectification inside easyocr via
``pipeline_demo/extractor/enhanced_extractor.py:520``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

try:
    import cv2 as _cv2
except ImportError:  # pragma: no cover - cv2 is present in the image
    _cv2 = None

# Bayer 4x4 ordered-dither index matrix (standard recursive construction).
_BAYER4 = np.array(
    [[0, 8, 2, 10], [12, 4, 14, 6], [3, 11, 1, 9], [15, 7, 13, 5]],
    np.int32,
)

_DITHER_CACHE: Dict[Tuple[int, int], np.ndarray] = {}


def _dither_plane(h: int, w: int) -> np.ndarray:
    """(h, w) int32 tile of the Bayer matrix (cached per shape)."""
    key = (h, w)
    plane = _DITHER_CACHE.get(key)
    if plane is None:
        plane = np.tile(_BAYER4, (-(-h // 4), -(-w // 4)))[:h, :w]
        _DITHER_CACHE[key] = plane
    return plane


def quantize_dithered(gray_u8: np.ndarray, bits: int) -> np.ndarray:
    """Ordered-dither quantize (..., H, W) u8 to 2**bits levels (u8 indices).

    Integer-only: q = floor(x/s + (B+0.5)/16) for step s = 255/(L-1),
    computed as (32*x*(L-1) + 255*(2B+1)) // (32*255). Dequantization is
    q * s (exact endpoints 0/255).
    """
    levels = (1 << bits) - 1
    b = _dither_plane(gray_u8.shape[-2], gray_u8.shape[-1])
    num = 32 * levels * gray_u8.astype(np.int32) + 255 * (2 * b + 1)
    return np.minimum(num // (32 * 255), levels).astype(np.uint8)


def pack_canvas(batch_u8: np.ndarray, bits: int) -> np.ndarray:
    """(n, H, W) u8 canvas -> (n, H, W*bits/8) packed u8, MSB-first.

    bits=8 returns the input unchanged; bits must divide 8 and W must be a
    multiple of 8/bits (canvas widths are multiples of 32).
    """
    if bits == 8:
        return batch_u8
    q = quantize_dithered(batch_u8, bits)
    if bits == 4:
        return ((q[..., 0::2] << 4) | q[..., 1::2]).astype(np.uint8)
    if bits == 2:
        return (
            (q[..., 0::4] << 6) | (q[..., 1::4] << 4) | (q[..., 2::4] << 2) | q[..., 3::4]
        ).astype(np.uint8)
    if bits == 1:
        out = np.zeros(q.shape[:-1] + (q.shape[-1] // 8,), np.uint8)
        for i in range(8):
            out |= q[..., i::8] << (7 - i)
        return out
    raise ValueError(f"wire_bits must be 1, 2, 4, or 8 (got {bits})")


def unpack_widen(packed: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Device-side inverse of :func:`pack_canvas` -> float32 in [0, 255].

    Pure elementwise shifts/masks — XLA fuses it into the consumer (the
    CRAFT stem), so the unpack costs no extra HBM pass.
    """
    if bits == 8:
        return packed.astype(jnp.float32)
    n, h, wp = packed.shape
    if bits == 4:
        parts = jnp.stack([(packed >> 4) & 0xF, packed & 0xF], axis=-1)
        step = 255.0 / 15.0
    elif bits == 2:
        parts = jnp.stack(
            [(packed >> 6) & 0x3, (packed >> 4) & 0x3, (packed >> 2) & 0x3, packed & 0x3],
            axis=-1,
        )
        step = 255.0 / 3.0
    elif bits == 1:
        parts = jnp.stack([(packed >> s) & 0x1 for s in range(7, -1, -1)], axis=-1)
        step = 255.0
    else:
        raise ValueError(f"wire_bits must be 1, 2, 4, or 8 (got {bits})")
    return parts.reshape(n, h, wp * (8 // bits)).astype(jnp.float32) * step


def host_warp_crop(
    gray_u8: np.ndarray,
    quad: np.ndarray,
    true_w: int,
    out_h: int,
    bucket_w: int,
    homography_fn,
) -> np.ndarray:
    """Rectify one quad from the original image on the host -> (out_h, bucket_w) u8.

    Supersamples (warp at kx, then INTER_AREA down) when the source line is
    much taller than out_h, since warpPerspective's bilinear taps alias on
    large downscales. Columns past true_w replicate the last valid column —
    the same padding semantic as the device warp (rectify.warp_crops), so
    recognition sees identical padding statistics either way.
    """
    q = np.asarray(quad, np.float64)
    h_src = max(
        float(np.linalg.norm(q[3] - q[0])), float(np.linalg.norm(q[2] - q[1]))
    )
    k = int(np.clip(round(h_src / out_h), 1, 4))
    # dst->src homography for the kx-supersampled output grid directly.
    m = homography_fn(q, true_w * k, out_h * k).astype(np.float64)
    crop = _cv2.warpPerspective(
        gray_u8,
        m,
        (true_w * k, out_h * k),
        flags=_cv2.INTER_LINEAR | _cv2.WARP_INVERSE_MAP,
        borderMode=_cv2.BORDER_REPLICATE,
    )
    if k > 1:
        crop = _cv2.resize(crop, (true_w, out_h), interpolation=_cv2.INTER_AREA)
    if bucket_w > true_w:
        crop = np.pad(crop, ((0, 0), (0, bucket_w - true_w)), mode="edge")
    return crop
