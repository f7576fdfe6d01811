"""End-of-round benchmark: book photos/sec/chip through the OCR pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the three device stages the reference spends its seconds on
(SURVEY.md §6: EasyOCR ~2.6-4.4 s/photo on CPU => ~0.33 photos/sec):

  1. the full preprocessing chain (the reference's 7-pass OpenCV/PIL recipe),
  2. CRAFT detection on the letterboxed canvas,
  3. rectification + CRNN recognition + CTC decode for a realistic crop load
     (24 word crops per photo at the 128px bucket).

Per-photo time = t_pre/B + t_det/B + t_rec/B; baseline 0.333 photos/sec.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _time(fn, reps=5):
    _block(fn())  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _block(out)
    return (time.perf_counter() - t0) / reps


def _block(x):
    """Synchronize on a result tree.

    block_until_ready() can return before execution completes on relayed
    backends, so force a tiny host readback of one element per leaf — the
    transfer cannot complete until the producing computation has.
    """
    import jax

    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[0])


def main():
    from bbocr_tpu.utils.env import sync_platform_from_env

    sync_platform_from_env()  # honor JAX_PLATFORMS=cpu if set
    import jax
    import jax.numpy as jnp

    from bbocr_tpu.decode import ctc_greedy_decode
    from bbocr_tpu.models import CRAFT, CRNN, EN_CHARSET
    from bbocr_tpu.models.craft import normalize_image
    from bbocr_tpu.preprocess.chain import _chain_gray
    from bbocr_tpu.runtime.rectify import warp_crops

    B = 8               # photos per batch
    PH, PW = 1056, 800  # photo size entering the preprocess chain
    CH, CW = 704, 512   # detector canvas
    CROPS_PER_PHOTO = 24
    CROP_W = 128

    rng = np.random.default_rng(0)
    photos = jnp.asarray(rng.integers(0, 255, (B, PH, PW)).astype(np.float32))
    canvas = jnp.asarray(rng.integers(0, 255, (B, CH, CW)).astype(np.float32))

    import os

    from bbocr_tpu.utils.checkpoint import load_params

    craft = CRAFT()
    crnn = CRNN(num_classes=EN_CHARSET.num_classes)
    ckpt_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "checkpoints")
    try:
        craft_params = load_params(os.path.join(ckpt_dir, "craft.npz"))
        crnn_params = load_params(os.path.join(ckpt_dir, "crnn.npz"))
    except Exception:
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        craft_params = craft.init(k1, jnp.zeros((1, 64, 64, 3), jnp.float32))
        crnn_params = crnn.init(k2, jnp.zeros((1, 32, 64, 1), jnp.float32))
    # Device-resident weights (numpy trees re-upload per call otherwise).
    craft_params = jax.tree_util.tree_map(jnp.asarray, craft_params)
    crnn_params = jax.tree_util.tree_map(jnp.asarray, crnn_params)

    # stage 1: preprocessing chain (x1.5 resize -> (1584, 1200))
    pre = jax.jit(lambda x: _chain_gray(x, int(PH * 1.5), int(PW * 1.5)))
    t_pre = _time(lambda: pre(photos))

    # stage 2: detection
    det = jax.jit(
        lambda p, g: craft.apply(p, normalize_image(jnp.repeat(g[..., None], 3, -1) / 255.0))
    )
    t_det = _time(lambda: det(craft_params, canvas))

    # stage 3: rectify + recognize + decode
    n_crops = B * CROPS_PER_PHOTO
    homos = np.tile(np.eye(3, dtype=np.float32), (n_crops, 1, 1))
    homos[:, 0, 2] = rng.integers(0, CW - CROP_W, n_crops)
    homos[:, 1, 2] = rng.integers(0, CH - 32, n_crops)
    img_idx = jnp.asarray(rng.integers(0, B, n_crops), jnp.int32)
    true_w = jnp.full((n_crops,), CROP_W, jnp.int32)
    lengths = jnp.full((n_crops,), CROP_W // 4 - 1, jnp.int32)
    homos_d = jnp.asarray(homos)

    def rec():
        crops = warp_crops(canvas, homos_d, img_idx, true_w, CROP_W)
        logits = crnn.apply(crnn_params, (crops / 127.5 - 1.0)[..., None])
        return ctc_greedy_decode(logits, lengths)

    t_rec = _time(jax.jit(rec))

    per_photo = (t_pre + t_det + t_rec) / B
    photos_per_sec = 1.0 / per_photo
    baseline = 1.0 / 3.0  # reference: ~3s/photo EasyOCR CPU (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "book_photos_per_sec_per_chip",
                "value": round(photos_per_sec, 2),
                "unit": "photos/sec",
                "vs_baseline": round(photos_per_sec / baseline, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
