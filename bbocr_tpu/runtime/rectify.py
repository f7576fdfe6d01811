"""Batched perspective rectification of detected quads, on device.

Replaces the per-box host-side cv2.warpPerspective loop inside the
reference's EasyOCR dependency (SURVEY.md §2.3 "polygon grouping &
rectification"): all crops of a width bucket are sampled in one gather-based
bilinear warp with static shapes — one XLA program per bucket, zero
host<->device round trips per crop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bbocr_tpu.models.crnn import INPUT_HEIGHT


def quad_to_rect_homography(quad: np.ndarray, out_w: int, out_h: int = INPUT_HEIGHT) -> np.ndarray:
    """3x3 homography mapping output-rect pixel coords -> source coords.

    ``quad``: (4, 2) corners ordered top-left clockwise.
    Solves the 8-DOF DLT system for the 4-point correspondence
    (what cv2.getPerspectiveTransform computes, inverted direction).
    """
    dst = np.array(
        [[0, 0], [out_w - 1, 0], [out_w - 1, out_h - 1], [0, out_h - 1]],
        np.float64,
    )
    src = np.asarray(quad, np.float64)
    a = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        x, y = dst[i]
        u, v = src[i]
        a[2 * i] = [x, y, 1, 0, 0, 0, -x * u, -y * u]
        b[2 * i] = u
        a[2 * i + 1] = [0, 0, 0, x, y, 1, -x * v, -y * v]
        b[2 * i + 1] = v
    try:
        h = np.linalg.solve(a, b)
    except np.linalg.LinAlgError:
        h = np.linalg.lstsq(a, b, rcond=None)[0]
    return np.append(h, 1.0).reshape(3, 3)


@partial(jax.jit, static_argnames=("out_w",))
def warp_crops(
    images: jnp.ndarray,
    homos: jnp.ndarray,
    img_idx: jnp.ndarray,
    true_w: jnp.ndarray,
    out_w: int,
) -> jnp.ndarray:
    """Sample N perspective crops from a batch of grayscale images.

    Args:
        images: (B, H, W) float32 source images.
        homos: (N, 3, 3) float32 output->source homographies.
        img_idx: (N,) int32 source image index per crop.
        true_w: (N,) int32 valid output width per crop; columns beyond it
            replicate the last valid column (width-bucket padding).
        out_w: static bucket width.

    Returns:
        (N, INPUT_HEIGHT, out_w) float32 crops.
    """
    n = homos.shape[0]
    h_img, w_img = images.shape[1], images.shape[2]
    ys = jnp.arange(INPUT_HEIGHT, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    # Clamp x to the crop's true width: padding replicates the last column.
    xg = jnp.minimum(xs[None, :], (true_w[:, None] - 1).astype(jnp.float32))  # (N, out_w)
    xg = jnp.broadcast_to(xg[:, None, :], (n, INPUT_HEIGHT, out_w))
    yg = jnp.broadcast_to(ys[None, :, None], (n, INPUT_HEIGHT, out_w))
    ones = jnp.ones_like(xg)
    pts = jnp.stack([xg, yg, ones], axis=-1)  # (N, 32, out_w, 3)
    src = jnp.einsum("nij,nhwj->nhwi", homos, pts)
    sx = src[..., 0] / jnp.maximum(src[..., 2], 1e-8)
    sy = src[..., 1] / jnp.maximum(src[..., 2], 1e-8)
    sx = jnp.clip(sx, 0.0, w_img - 1.0)
    sy = jnp.clip(sy, 0.0, h_img - 1.0)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w_img - 1)
    y1i = jnp.minimum(y0i + 1, h_img - 1)

    # Flat 1-D gathers from the flattened image stack: XLA lowers these
    # measurably faster on TPU than the equivalent (b, y, x) advanced
    # indexing (single index operand instead of three).
    flat = images.reshape(-1)
    base = img_idx[:, None, None] * (h_img * w_img)

    def g(yy, xx):
        return flat[base + yy * w_img + xx]

    v00 = g(y0i, x0i)
    v01 = g(y0i, x1i)
    v10 = g(y1i, x0i)
    v11 = g(y1i, x1i)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy
