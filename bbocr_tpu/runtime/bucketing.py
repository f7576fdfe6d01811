"""Static-shape bucketing policies.

Everything under jit compiles once per shape; buckets bound the number of
distinct shapes so the compile cache stays small while padding waste stays
low (SURVEY.md §7 "dynamic-width bucketing" / BASELINE.json config 4).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Sequence, Tuple

import numpy as np

from bbocr_tpu.models.crnn import INPUT_HEIGHT

# Recognizer width buckets (pixels). T = w/4 - 1 CTC frames. 512 exists for
# full-width lines cropped from the hi-res canvases (imprint/arrangement
# lines on title pages run ~20:1 aspect).
DEFAULT_WIDTH_BUCKETS: Tuple[int, ...] = (64, 128, 256, 384, 512)

# Crop-count capacities per recognizer batch: next value >= n, so at most
# len(CAPACITIES) compiled programs per width bucket. Deliberately coarse:
# on relayed links a fresh XLA compile costs tens of seconds, far more than
# the padded-slot compute a finer menu would save (round-2 bench: the
# (width x capacity x canvas) shape space caused a compile storm).
DEFAULT_CAPACITIES: Tuple[int, ...] = (8, 32, 128, 384)


def pick_bucket(value: float, buckets: Sequence[int]) -> int:
    """Smallest bucket >= value, else the largest bucket."""
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


def pad_count(n: int, capacities: Sequence[int] = DEFAULT_CAPACITIES) -> int:
    for c in capacities:
        if n <= c:
            return c
    return ((n + capacities[-1] - 1) // capacities[-1]) * capacities[-1]


@dataclass(frozen=True)
class CanvasSpec:
    """Detector input canvas (static, multiples of 32)."""

    height: int
    width: int


DEFAULT_CANVASES: Tuple[CanvasSpec, ...] = (
    CanvasSpec(704, 512),    # portrait book photos (cover/title/copyright)
    CanvasSpec(512, 704),    # landscape
    CanvasSpec(512, 512),    # square-ish
    # Mid tier: 1.02MB vs the hi-res tier's 1.44MB on an uplink-bound
    # serving link (~8.5MB/s on the relay — docs/EVAL.md round 3). At the
    # default DETAIL_SCALE it only catches images it can hold at full
    # detail (e.g. ~1200px scans, previously escalated to 1408); at
    # BB_OCR_DETAIL_SCALE=0.45 it becomes the 2400px-photo operating
    # point (0.49x scale) for -29% wire bytes.
    CanvasSpec(1184, 864),   # mid portrait
    CanvasSpec(864, 1184),   # mid landscape
    CanvasSpec(1408, 1024),  # hi-res portrait (camera photos of dense pages)
    CanvasSpec(1024, 1408),  # hi-res landscape
)

# XL tier (env-gated, BB_OCR_CANVAS_XL=1): one step past hi-res for cheap
# detectors. CRAFTLite at 1792x1312 costs ~177 GFLOPs — still ~6x below
# VGG at 1408x1024 (1075; docs/BUDGET.md) — so a lite engine can buy back
# small-text resolution with canvas area instead of backbone depth. Off by
# default: each extra canvas is another compiled program + 2.35MB u8 on
# the wire, and the VGG detector gains nothing it can afford.
XL_CANVASES: Tuple[CanvasSpec, ...] = (
    CanvasSpec(1792, 1312),
    CanvasSpec(1312, 1792),
)


def default_canvases() -> Tuple[CanvasSpec, ...]:
    """Canvas menu honoring BB_OCR_CANVAS_XL at call time (same
    read-at-construction contract as the other env knobs)."""
    if os.environ.get("BB_OCR_CANVAS_XL", "0") not in ("", "0"):
        return DEFAULT_CANVASES + XL_CANVASES
    return DEFAULT_CANVASES

# Letterboxing may shrink an image's long side to at most this fraction
# before we escalate to a larger canvas. Real-photo finding (round 2): the
# reference's 2400px page photos at the 704x512 canvas land at 0.29x scale,
# which pushes body text below CRAFT's resolution and cost ~all word recall;
# at >= ~0.55x the same checkpoints read title/copyright pages correctly.
# BB_OCR_DETAIL_SCALE overrides (0.8 sends ~960px cover scans — 0.73x on
# the 704 canvas, small print crushed — to the full-res 1408 canvas while
# leaving webcam captures and 800x600 pages on the cheap canvas).
def detail_scale() -> float:
    """Read at call time (not import) so servers/tests that set
    BB_OCR_DETAIL_SCALE after import are honored."""
    return float(os.environ.get("BB_OCR_DETAIL_SCALE", "0.55"))


def pick_canvas(h: int, w: int, canvases: Sequence[CanvasSpec] = DEFAULT_CANVASES) -> CanvasSpec:
    """Choose a canvas by aspect ratio AND resolution.

    Among canvases that keep the letterbox scale >= detail_scale(), pick the
    best aspect match (ties -> smaller canvas = cheaper detect). If none is
    large enough, pick the one preserving the most detail.
    """
    aspect = w / max(h, 1)

    def fit(c: CanvasSpec) -> float:
        return min(c.height / h, c.width / w)

    keep = [c for c in canvases if fit(c) >= detail_scale()]
    if keep:
        # Aspect compared in coarse buckets (0.08-wide) so NEAR-tied
        # aspects resolve by area — otherwise a canvas tier whose ratio is
        # 0.005 closer steals traffic from a 3x-cheaper one (the wire pays
        # per pixel; see the mid-tier note above).
        return min(
            keep,
            key=lambda c: (
                int(abs(c.width / c.height - aspect) / 0.08),
                c.height * c.width,
            ),
        )
    return max(canvases, key=lambda c: (fit(c), -abs(c.width / c.height - aspect)))


def letterbox_params(h: int, w: int, canvas: CanvasSpec) -> Tuple[float, int, int]:
    """(scale, out_h, out_w): aspect-preserving fit into the canvas."""
    scale = min(canvas.height / h, canvas.width / w)
    return scale, int(round(h * scale)), int(round(w * scale))


def crop_width_for_quad(quad: np.ndarray, buckets: Sequence[int] = DEFAULT_WIDTH_BUCKETS) -> Tuple[int, int]:
    """(true_width, bucket_width) for a quad rectified to height 32."""
    w_top = np.linalg.norm(quad[1] - quad[0])
    w_bot = np.linalg.norm(quad[2] - quad[3])
    h_l = np.linalg.norm(quad[3] - quad[0])
    h_r = np.linalg.norm(quad[2] - quad[1])
    w_src = max(w_top, w_bot)
    h_src = max(h_l, h_r)
    aspect = w_src / max(h_src, 1e-6)
    true_w = int(round(INPUT_HEIGHT * aspect))
    true_w = max(8, min(true_w, buckets[-1]))
    return true_w, pick_bucket(true_w, buckets)
