"""Harvest labeled REAL text crops from the hand-transcribed eval corpus.

The round-3 diagnosis showed synthetic val CER (0.015) can be 20x better
than CER on real, legible, rectified crops (~0.3): the synthetic corpus is
the only thing training ever measures, so regressions against the real
regime are invisible until a full evaluate_real run. This tool closes the
loop: it runs the serving engine on ``data/real`` images, re-warps every
detected quad exactly as recognize saw it, fuzzy-aligns each decode to a
contiguous word span of a ground-truth phrase, and writes the crops whose
alignment is confident as (png, label) pairs. ``cli/train --val-real DIR``
then reports CER on these during training.

Labels come from the GT span (not the decode), so a bad recognizer still
yields correct labels as long as the alignment is unambiguous; crops that
align to nothing (texture junk, decorations) are skipped on purpose.

Reference role: this mirrors how the reference validated easyocr output
against hand-checked fields (pipeline_demo/extractor tests), applied at
crop granularity.
"""

from __future__ import annotations

import argparse
import json
import os
import re
from typing import List, Optional, Tuple

import numpy as np


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.upper().strip())


def _lev(a: str, b: str) -> int:
    prev = np.arange(len(b) + 1, dtype=np.int32)
    for i, ca in enumerate(a, 1):
        cur = np.empty(len(b) + 1, np.int32)
        cur[0] = i
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return int(prev[-1])


def best_span_label(
    crop_text: str, phrases: List[str], max_cer: float = 0.45
) -> Tuple[Optional[str], float]:
    """Best contiguous word-span of any GT phrase for this decode.

    Returns (span with original casing, span CER) or (None, best_cer).
    """
    span, cer, _ = best_span_with_margin(crop_text, phrases)
    return (span, cer) if span is not None and cer <= max_cer else (None, cer)


def best_span_with_margin(
    crop_text: str, phrases: List[str]
) -> Tuple[Optional[str], float, float]:
    """Like best_span_label, plus the cross-phrase ambiguity margin.

    Returns (best span, its CER, runner_cer) where runner_cer is the best
    CER any OTHER phrase achieves. A large (runner_cer - cer) means the
    decode identifies its source line even when the decode itself is bad —
    which lets a synthetic-page harvest keep the HARD crops (decode CER
    0.3-0.6) that a flat CER gate throws away, exactly the regime the
    recognizer most needs to train on."""
    c = _norm(crop_text)
    if len(c) < 3:
        return None, 1.0, 1.0
    per_phrase: List[Tuple[float, Optional[str]]] = []
    for ph in phrases:
        words = ph.split()
        best_ph: Tuple[float, Optional[str]] = (1.0, None)
        for i in range(len(words)):
            for j in range(i + 1, len(words) + 1):
                span = " ".join(words[i:j])
                n = _norm(span)
                if len(n) < 3:
                    continue
                cer = _lev(n, c) / max(1, len(n))
                if cer < best_ph[0]:
                    best_ph = (cer, span)
        per_phrase.append(best_ph)
    if not per_phrase:
        return None, 1.0, 1.0
    order = sorted(range(len(per_phrase)), key=lambda k: per_phrase[k][0])
    cer, span = per_phrase[order[0]]
    runner = per_phrase[order[1]][0] if len(order) > 1 else 1.0
    return span, cer, runner


def harvest_image(
    engine,
    img: np.ndarray,
    phrases: List[str],
    tag: str,
    out_dir: str,
    labels: dict,
    stats: dict,
    max_cer: float = 0.45,
    margin_accept: Optional[Tuple[float, float]] = None,
) -> None:
    """Run the serving engine on one image, re-warp every detected quad
    exactly as recognize saw it, and keep crops whose decode aligns to a
    GT phrase span. Appends to ``labels``/``stats`` and writes PNGs.

    ``margin_accept=(loose_cer, min_margin)`` additionally keeps crops whose
    best alignment is worse than ``max_cer`` but still UNAMBIGUOUS: CER <=
    loose_cer and the runner-up phrase is at least ``min_margin`` worse.
    Use only where the phrase list is per-page (synthetic harvests) — with
    few candidate lines, a unique weak match still identifies its source."""
    import cv2
    import jax.numpy as jnp

    from bbocr_tpu.runtime import bucketing
    from bbocr_tpu.runtime.engine import _host_resize, _to_gray_u8
    from bbocr_tpu.runtime.rectify import quad_to_rect_homography, warp_crops

    results = engine.readtext(img)
    stats["crops_seen"] += len(results)
    g = _to_gray_u8(img)
    canvas = bucketing.pick_canvas(g.shape[0], g.shape[1], engine.config.canvases)
    scale, oh, ow = bucketing.letterbox_params(g.shape[0], g.shape[1], canvas)
    batch = np.zeros((1, canvas.height, canvas.width), np.uint8)
    batch[0, :oh, :ow] = _host_resize(g, oh, ow)
    dev = jnp.asarray(batch).astype(jnp.float32)
    for k, (quad, text, conf) in enumerate(results):
        label, cer, runner = best_span_with_margin(text, phrases)
        if label is None:
            continue
        if cer > max_cer:
            if margin_accept is None:
                continue
            loose_cer, min_margin = margin_accept
            if cer > loose_cer or (runner - cer) < min_margin:
                continue
        q = np.asarray(quad, np.float32) * scale
        true_w, bucket_w = bucketing.crop_width_for_quad(
            q, engine.config.width_buckets
        )
        homo = quad_to_rect_homography(q, true_w)
        crop = np.asarray(
            warp_crops(
                dev,
                jnp.asarray(homo[None]),
                jnp.zeros(1, jnp.int32),
                jnp.asarray([true_w]),
                bucket_w,
            )
        )[0, :, :true_w]
        name = f"{tag}_{k:02d}.png"
        cv2.imwrite(
            os.path.join(out_dir, name), np.clip(crop, 0, 255).astype(np.uint8)
        )
        labels[name] = {
            "label": label,
            "decode": text,
            "align_cer": round(cer, 3),
            "align_margin": round(runner - cer, 3),
            "conf": round(float(conf), 3),
        }
        stats["crops_kept"] += 1


def harvest(
    craft: str,
    crnn: str,
    out_dir: str,
    books_filter: str = "",
    max_cer: float = 0.45,
    data_dir: str = "data/real",
    margin_accept: Optional[Tuple[float, float]] = None,
) -> dict:
    import cv2

    from bbocr_tpu.runtime.engine import OCREngine

    engine = OCREngine.from_checkpoint(craft, crnn)
    gt = json.load(open(os.path.join(data_dir, "ground_truth.json")))["books"]
    os.makedirs(out_dir, exist_ok=True)
    labels: dict = {}
    stats = {"books": 0, "crops_seen": 0, "crops_kept": 0}
    for book_id, entry in sorted(gt.items()):
        if books_filter and books_filter not in book_id:
            continue
        phrases = [p for p in entry.get("phrases", []) if p.strip()]
        if not phrases:
            continue
        stats["books"] += 1
        base = os.path.join(data_dir, book_id.split("/")[0])
        img_dir = (
            os.path.join(data_dir, os.path.dirname(book_id))
            if "/" in book_id
            else base
        )
        for img_name, sideways in zip(entry["images"], entry.get("sideways", [])):
            path = os.path.join(img_dir, img_name)
            if not os.path.exists(path):
                path = os.path.join(data_dir, book_id, img_name)
            if not os.path.exists(path):
                continue
            img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
            if img is None:
                continue
            if sideways:
                img = np.rot90(img, -1).copy()
            tag = f"{book_id.replace('/', '_')}_{os.path.splitext(img_name)[0]}"
            harvest_image(
                engine, img, phrases, tag, out_dir, labels, stats, max_cer,
                margin_accept=margin_accept,
            )
    with open(os.path.join(out_dir, "labels.json"), "w") as f:
        json.dump(labels, f, indent=1, ensure_ascii=False)
    return stats


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--craft", default="checkpoints/craft.npz")
    p.add_argument("--crnn", default="checkpoints/crnn.npz")
    p.add_argument("--out", default="data/real_crops")
    p.add_argument("--books", default="", help="substring filter on book id")
    p.add_argument("--max-cer", type=float, default=0.45)
    p.add_argument("--data-dir", default="data/real")
    p.add_argument(
        "--margin", default="",
        help="'loose_cer,min_margin' — additionally keep hard decodes whose "
             "best phrase beats the runner-up by min_margin (see "
             "harvest_image.margin_accept)")
    args = p.parse_args()
    from bbocr_tpu.utils.env import sync_platform_from_env

    sync_platform_from_env()
    margin = None
    if args.margin:
        loose, min_m = (float(x) for x in args.margin.split(","))
        margin = (loose, min_m)
    stats = harvest(
        args.craft, args.crnn, args.out,
        books_filter=args.books, max_cer=args.max_cer, data_dir=args.data_dir,
        margin_accept=margin,
    )
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
