"""Diagnose the cover-reading gap: detection vs recognition.

For each real cover: run the engine, print detected boxes + texts + conf,
and dump the rectified crops (exactly what the recognizer sees) as PNG
strips so the failure mode is visible.

Usage: JAX_PLATFORMS=axon PYTHONPATH=/root/.axon_site python scripts/diag_covers.py
"""

import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bbocr_tpu.runtime.engine import EngineConfig, OCREngine
from bbocr_tpu.runtime.bucketing import pick_canvas, letterbox_params
from bbocr_tpu.runtime.rectify import quad_to_rect_homography, warp_crops
from bbocr_tpu.cli.evaluate_real import word_recall

import jax.numpy as jnp

OUT = "/tmp/diag_covers"
os.makedirs(OUT, exist_ok=True)

gt = json.load(open("data/real/ground_truth.json"))["books"]
engine = OCREngine.from_checkpoint("checkpoints/craft.npz", "checkpoints/crnn.npz")

for key in sorted(k for k in gt if k.startswith("covers/")):
    entry = gt[key]
    name = entry["images"][0]
    path = os.path.join("data", "real", "covers", name)
    img = np.asarray(Image.open(path).convert("L"), np.float32)
    res = engine.readtext(img)
    text = " ".join(t for _, t, _ in res)
    rec = word_recall(entry.get("phrases", []), text)
    print(f"\n=== {key} {img.shape} canvas={pick_canvas(*img.shape)} "
          f"boxes={len(res)} recall={rec['recall']} ===")
    for quad, t, c in res:
        h = float(np.linalg.norm(quad[3] - quad[0]))
        print(f"  conf={c:.2f} h={h:5.1f} {t!r}")

    # Rebuild the letterboxed canvas and dump each rectified crop.
    canvas = pick_canvas(img.shape[0], img.shape[1])
    scale, oh, ow = letterbox_params(img.shape[0], img.shape[1], canvas)
    pil = Image.fromarray(img.astype(np.uint8)).resize((ow, oh), Image.BILINEAR)
    cbatch = np.zeros((1, canvas.height, canvas.width), np.float32)
    cbatch[0, :oh, :ow] = np.asarray(pil, np.float32)
    strips = []
    for quad, t, c in res:
        q = np.asarray(quad, np.float64) * scale  # back to canvas coords
        w_src = max(np.linalg.norm(q[1] - q[0]), np.linalg.norm(q[2] - q[3]))
        h_src = max(np.linalg.norm(q[3] - q[0]), np.linalg.norm(q[2] - q[1]))
        true_w = int(np.clip(round(32 * w_src / max(h_src, 1e-6)), 8, 512))
        homo = quad_to_rect_homography(q, true_w)
        crop = np.asarray(warp_crops(
            jnp.asarray(cbatch), jnp.asarray(homo[None].astype(np.float32)),
            jnp.zeros((1,), jnp.int32), jnp.asarray([true_w], jnp.int32), 512))[0]
        strips.append((crop, t, c))
    if strips:
        H = 40 * len(strips)
        sheet = np.full((H, 520), 255, np.uint8)
        for i, (crop, t, c) in enumerate(strips):
            sheet[i * 40:i * 40 + 32, :512] = np.clip(crop, 0, 255).astype(np.uint8)
        Image.fromarray(sheet).save(f"{OUT}/{key.replace('/', '_')}_crops.png")
        print(f"  crops -> {OUT}/{key.replace('/', '_')}_crops.png")

print("\ndone")
