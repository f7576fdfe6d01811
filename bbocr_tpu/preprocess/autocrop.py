"""Auto text-region cropping: device-side mask building + native labeling.

Behavioral port of the reference's crop heuristic
(``pipeline_demo/extractor/enhanced_extractor.py:239-372``):

1. composite text mask = OR of adaptive-mean(35,10,INV), adaptive-gauss(31,5,INV),
   Otsu(INV), Sobel-gradient Otsu — computed on a lightly denoised,
   CLAHE(2.0)-equalized grayscale;
2. two morphology variants (close x2 / open x1 / dilate x1 with rect kernels
   (9,3)+(3,3)+(11,3) and (15,5)+(3,3)+(11,3)), OR-merged;
3. connected components -> bounding boxes, area-filtered to
   [1e-4, 0.10] x image area; union of boxes; inflate if < 0.12 x area;
   margin; clamp to bounds.

Steps 1-2 run as one jitted XLA program (thresholds, reduce-window
morphology); step 3 uses the native C++ labeler on the tiny binary mask.
The contract is behavior (crop rectangles), not cv2 bit-exactness.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bbocr_tpu.native import connected_components
from bbocr_tpu.ops import (
    adaptive_threshold,
    clahe,
    dilate,
    gaussian_blur,
    morph_close,
    morph_open,
    otsu_threshold,
    rgb_to_grayscale,
    sobel_magnitude_u8,
)
from bbocr_tpu.ops.histogram import otsu_threshold_value


@jax.jit
def text_mask(gray: jnp.ndarray) -> jnp.ndarray:
    """Composite + morphed text mask, values {0,1} float32, same HxW."""
    g = gaussian_blur(gray, 3, 0.0)
    g = clahe(g, 2.0, (8, 8))
    thr_mean = adaptive_threshold(g, 255.0, "mean", 35, 10, inverse=True)
    thr_gaus = adaptive_threshold(g, 255.0, "gaussian", 31, 5, inverse=True)
    thr_otsu = otsu_threshold(g, 255.0, inverse=True)
    grad = sobel_magnitude_u8(g)
    tg = otsu_threshold_value(grad)
    thr_grad = jnp.where(grad > tg, 255.0, 0.0)
    mask = jnp.maximum(jnp.maximum(thr_mean, thr_gaus), jnp.maximum(thr_otsu, thr_grad))

    def morph_pass(src, kclose):
        closed = morph_close(src, kclose, 2)
        opened = morph_open(closed, (3, 3), 1)
        return dilate(opened, (11, 3), 1)

    merged = jnp.maximum(morph_pass(mask, (9, 3)), morph_pass(mask, (15, 5)))
    return (merged > 0).astype(jnp.float32), (mask > 0).astype(jnp.float32)


def auto_crop_text_region(
    img: np.ndarray, margin: int
) -> Optional[Tuple[int, int, int, int]]:
    """Return the crop rectangle (x0, y0, x1, y1) or None when no crop applies.

    ``img``: (H, W) grayscale or (H, W, 3) RGB uint8/float numpy array.
    The caller slices the image; this mirrors the reference which writes a
    cropped temp file (we avoid the filesystem round-trip).
    """
    arr = jnp.asarray(img, jnp.float32)
    gray = rgb_to_grayscale(arr) if arr.ndim == 3 else arr
    h, w = int(gray.shape[0]), int(gray.shape[1])
    merged, raw_mask = text_mask(gray)
    merged_np = np.asarray(merged, np.uint8)

    img_area = float(h * w)
    boxes = _component_boxes(merged_np, img_area, min_frac=0.0001, max_frac=0.10)
    if boxes.size == 0:
        # Reference falls back to the unmorphed mask with no filtering; its
        # own area filters there are commented out, so any component counts.
        boxes = _component_boxes(np.asarray(raw_mask, np.uint8), img_area, 0.0, 1.1)
        if boxes.size == 0:
            return None

    x0 = int(boxes[:, 0].min())
    y0 = int(boxes[:, 1].min())
    x1 = int(boxes[:, 2].max()) + 1
    y1 = int(boxes[:, 3].max()) + 1

    area = float((x1 - x0) * (y1 - y0))
    if area < 0.12 * img_area:
        pad = int(0.03 * max(w, h))
        x0 = max(0, x0 - pad)
        y0 = max(0, y0 - pad)
        x1 = min(w, x1 + pad)
        y1 = min(h, y1 + pad)
    x0 = max(0, x0 - margin)
    y0 = max(0, y0 - margin)
    x1 = min(w, x1 + margin)
    y1 = min(h, y1 + margin)
    if x1 <= x0 or y1 <= y0:
        return None
    return x0, y0, x1, y1


def _component_boxes(mask: np.ndarray, img_area: float, min_frac: float, max_frac: float) -> np.ndarray:
    _, stats = connected_components(mask, connectivity=8)
    if stats.shape[0] == 0:
        return np.empty((0, 4))
    bw = stats[:, 2] - stats[:, 0] + 1
    bh = stats[:, 3] - stats[:, 1] + 1
    areas = bw * bh
    keep = (areas >= min_frac * img_area) & (areas <= max_frac * img_area)
    return stats[keep][:, :4]


def central_edge_crop(shape: Tuple[int, int], percent: float) -> Optional[Tuple[int, int, int, int]]:
    """Centered crop rectangle removing ``percent`` from each edge.

    Mirrors ``enhanced_extractor.py:374-397`` including the minimum-size
    guard (crop must keep >= max(16, 20%) of each dimension).
    """
    if percent <= 0.0:
        return None
    h, w = shape
    mx = int(round(w * (percent / 100.0)))
    my = int(round(h * (percent / 100.0)))
    x0, y0 = max(0, mx), max(0, my)
    x1, y1 = min(w, w - mx), min(h, h - my)
    if x1 - x0 < max(16, w * 0.2) or y1 - y0 < max(16, h * 0.2):
        return None
    return x0, y0, x1, y1
