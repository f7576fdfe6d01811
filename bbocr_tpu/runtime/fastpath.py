"""Single-dispatch serving fast path: detect -> label -> box -> rectify ->
recognize as ONE XLA program.

The default engine path needs three host round trips per scan (canvas up,
mask/region down for the C++ labeler, crops dispatched back up). On relayed
TPU links the round trips dominate p50 (docs/ROADMAP.md), so this module
keeps the whole pipeline on device:

  canvas u8 -> CRAFT -> threshold mask -> iterative CC labeling
  (``decode.cc_device``) -> top-K component boxes + peak scores ->
  axis-aligned quads grown by the CRAFT dilation margin -> affine crop
  sampling -> CRNN -> CTC decode

ONE upload (canvas) and ONE download (boxes/ids/lens/conf/valid) per photo.

Trade-off vs the host path (kept as the default + parity oracle): component
quads are axis-aligned bounding boxes, not rotated min-area rectangles —
equivalent for the level or near-level text on book covers/title pages, and
looser (more background in the crop) for strongly rotated lines. Parity is
tested in ``tests/test_models.py`` against the host labeler on the same
masks; behavior on rotated text is bounded by the loose-crop augmentation
the recognizer trains with (``train/synth.py``).

Reference counterpart: the detection+recognition internals of
``easyocr.Reader.readtext`` (``enhanced_extractor.py:520``), which run as
many small torch ops with host sync between stages.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from bbocr_tpu.decode.cc_device import component_stats_device, label_components_device
from bbocr_tpu.decode.ctc import ctc_greedy_decode
from bbocr_tpu.models.craft import normalize_image
from bbocr_tpu.models.crnn import INPUT_HEIGHT
from bbocr_tpu.runtime.rectify import warp_crops


def device_boxes_from_mask(
    mask: jnp.ndarray,
    region: jnp.ndarray,
    k: int,
    *,
    text_threshold: float,
    min_size_px: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(H, W) mask + region scores -> (k, 4) grown boxes, (k,) validity.

    Boxes are (x0, y0, x1, y1) floats in mask coordinates, grown by the
    CRAFT dilation margin ``niter = sqrt(area * min(w,h) / (w*h)) * 2``
    applied along the corner directions exactly like the host path
    (``decode/boxes.py::_extract_boxes_from_mask``).
    """
    labels = label_components_device(mask)
    _, x0, y0, x1, y1, count, peak = component_stats_device(labels, k, score=region)
    valid = (count >= min_size_px) & (peak >= text_threshold)

    bw = (x1 - x0 + 1).astype(jnp.float32)
    bh = (y1 - y0 + 1).astype(jnp.float32)
    area = count.astype(jnp.float32)
    niter = jnp.floor(jnp.sqrt(area * jnp.minimum(bw, bh) / (bw * bh + 1e-6)) * 2.0)
    grow = niter + 1.0
    # Corner-direction growth of the axis-aligned rect: corners move along
    # (corner - center) by grow * sqrt(2); componentwise that expands each
    # half-extent by grow * sqrt(2) * (extent / diag).
    diag = jnp.sqrt(bw * bw + bh * bh) + 1e-6
    dx = grow * jnp.sqrt(2.0) * bw / diag
    dy = grow * jnp.sqrt(2.0) * bh / diag
    boxes = jnp.stack(
        [x0.astype(jnp.float32) - dx, y0.astype(jnp.float32) - dy,
         x1.astype(jnp.float32) + dx, y1.astype(jnp.float32) + dy],
        axis=-1,
    )
    return boxes, valid


def make_fast_readtext(engine, canvas_hw: Tuple[int, int], k: int, bucket_w: int):
    """Compile-once single-dispatch program for one (1, H, W) canvas.

    Returns fn(craft_params, crnn_params, canvas_u8) ->
    (boxes (k,4) canvas coords, ids (k,T), lens (k,), conf (k,), valid (k,)).
    """
    det = engine.config.detection
    h, w = canvas_hw

    def program(craft_params, crnn_params, canvas_u8):
        # (1, H, W) float canvas; bit-packed uploads unpack in-program
        # (runtime/wire.py — fused into the CRAFT stem by XLA).
        from bbocr_tpu.runtime.wire import unpack_widen

        gray = unpack_widen(canvas_u8, getattr(engine, "_wire_bits", 8))
        if getattr(engine, "_fold", False):
            maps = engine.craft_infer.apply(craft_params, gray[..., None])
        else:
            rgb01 = jnp.repeat(gray[..., None], 3, axis=-1) / 255.0
            maps = engine.craft_infer.apply(craft_params, normalize_image(rgb01))
        region = maps[0, ..., 0]
        affinity = maps[0, ..., 1]
        mask = (region > det.low_text) | (affinity > det.link_threshold)

        boxes_half, valid = device_boxes_from_mask(
            mask, region, k,
            text_threshold=det.text_threshold, min_size_px=det.min_size_px,
        )
        boxes = boxes_half * 2.0  # half-res map -> canvas coords
        x0 = jnp.clip(boxes[:, 0], 0.0, w - 1.0)
        y0 = jnp.clip(boxes[:, 1], 0.0, h - 1.0)
        x1 = jnp.clip(boxes[:, 2], 0.0, w - 1.0)
        y1 = jnp.clip(boxes[:, 3], 0.0, h - 1.0)
        bw = jnp.maximum(x1 - x0 + 1.0, 1.0)
        bh = jnp.maximum(y1 - y0 + 1.0, 1.0)

        true_w = jnp.clip(
            jnp.round(INPUT_HEIGHT * bw / bh), 8, bucket_w
        ).astype(jnp.int32)
        # Affine output->source homography per box (axis-aligned rect).
        sx = bw / jnp.maximum(true_w.astype(jnp.float32) - 1.0, 1.0)
        sy = bh / jnp.float32(INPUT_HEIGHT - 1)
        zeros = jnp.zeros_like(sx)
        ones = jnp.ones_like(sx)
        homos = jnp.stack(
            [
                jnp.stack([sx, zeros, x0], axis=-1),
                jnp.stack([zeros, sy, y0], axis=-1),
                jnp.stack([zeros, zeros, ones], axis=-1),
            ],
            axis=1,
        )  # (k, 3, 3)
        crops = warp_crops(
            gray, homos, jnp.zeros((k,), jnp.int32), true_w, bucket_w
        )
        x = (crops / 127.5 - 1.0)[..., None]
        logits = engine.crnn.apply(crnn_params, x)
        lengths = jnp.maximum(true_w // 4 - 1, 1)
        ids, lens, conf = ctc_greedy_decode(logits, lengths)
        boxes_out = jnp.stack([x0, y0, x1, y1], axis=-1)
        return boxes_out, ids, lens, conf, valid

    return jax.jit(program)
