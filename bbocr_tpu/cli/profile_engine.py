"""Per-stage serving-engine profile on the current backend.

Separates what the engine's StageTimer lumps together — in particular the
"detect" stage into upload / device compute / map download — so throughput
work (round-2 VERDICT #4: detect dominates at 1.31 s/call) targets the real
cost. On relayed TPU links `block_until_ready` returns early, so every
timing here syncs with a host readback of the result.

Usage:
    python -m bbocr_tpu.cli.profile_engine [--repeat 5] [--photos N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x) -> None:
    np.asarray(x)  # host readback = hard sync on every backend


def _load_photos(n: int):
    from PIL import Image

    paths = sorted(glob.glob(os.path.join(ROOT, "data", "real", "photos", "*", "*.jpg")))
    paths += sorted(glob.glob(os.path.join(ROOT, "data", "real", "covers", "*.png")))
    paths += sorted(glob.glob(os.path.join(ROOT, "books", "*", "*.jpg")))
    out = []
    for p in paths[:n]:
        out.append(np.asarray(Image.open(p).convert("L"), np.float32))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--photos", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=8)
    args = ap.parse_args()

    from bbocr_tpu.utils.env import sync_platform_from_env

    sync_platform_from_env()

    import jax
    import jax.numpy as jnp

    from bbocr_tpu.runtime import bucketing
    from bbocr_tpu.runtime.engine import OCREngine

    ckpt = os.path.join(ROOT, "checkpoints")
    engine = OCREngine.from_checkpoint(
        os.path.join(ckpt, "craft.npz"), os.path.join(ckpt, "crnn.npz")
    )
    photos = _load_photos(args.photos)
    print(f"backend={jax.default_backend()} photos={len(photos)}", flush=True)

    # warm every shape the run needs
    engine.warmup(photos)
    engine.readtext_batch(photos)

    # --- end-to-end + engine stage timers --------------------------------
    engine.timers.reset()
    t0 = time.perf_counter()
    for _ in range(args.repeat):
        engine.readtext_batch(photos)
    wall = (time.perf_counter() - t0) / args.repeat
    print(
        json.dumps(
            {
                "end_to_end_s_per_batch": round(wall, 3),
                "photos_per_sec": round(len(photos) / wall, 2),
                "stages": engine.timings(),
            }
        ),
        flush=True,
    )

    # --- detect micro-breakdown on the hi-res canvas ---------------------
    grays = photos
    canvas = bucketing.pick_canvas(grays[0].shape[0], grays[0].shape[1], engine.config.canvases)
    rows = args.chunk
    batch = np.zeros((rows, canvas.height, canvas.width), np.uint8)
    for s, g in enumerate(grays[:rows]):
        scale, oh, ow = bucketing.letterbox_params(g.shape[0], g.shape[1], canvas)
        from bbocr_tpu.runtime.engine import _host_resize

        batch[s, :oh, :ow] = _host_resize(g, oh, ow).astype(np.uint8)

    def timed(label, fn, sync=True):
        ts = []
        for _ in range(args.repeat):
            t = time.perf_counter()
            r = fn()
            if sync:
                _sync(r[0] if isinstance(r, tuple) else r)
            ts.append(time.perf_counter() - t)
        print(
            json.dumps(
                {
                    "op": label,
                    "canvas": f"{canvas.height}x{canvas.width}x{rows}",
                    "mean_ms": round(1e3 * float(np.mean(ts)), 1),
                    "min_ms": round(1e3 * float(np.min(ts)), 1),
                }
            ),
            flush=True,
        )
        return r

    # host letterbox cost (PIL resize of the full photo set)
    def letterbox():
        out = np.zeros_like(batch)
        for s, g in enumerate(grays[:rows]):
            scale, oh, ow = bucketing.letterbox_params(g.shape[0], g.shape[1], canvas)
            from bbocr_tpu.runtime.engine import _host_resize

            out[s, :oh, :ow] = _host_resize(g, oh, ow).astype(np.uint8)
        return out

    timed("host_letterbox", letterbox, sync=False)

    # upload alone (u8 canvas batch -> device, synced)
    timed("upload_u8", lambda: jnp.asarray(batch))

    dev_u8 = jnp.asarray(batch)
    _sync(dev_u8)
    dev_f32 = engine._widen(dev_u8)
    _sync(dev_f32)

    # detect compute+download with input already on device
    timed("detect_resident", lambda: engine._detect(engine.craft_params, dev_f32, 1))

    # detect dispatch only (no map download): measures device compute via
    # one trailing sync after repeat dispatches
    t = time.perf_counter()
    for _ in range(args.repeat):
        m, r = engine._detect(engine.craft_params, dev_f32, 1)
    _sync(m)
    print(
        json.dumps(
            {
                "op": "detect_pipelined",
                "mean_ms": round(1e3 * (time.perf_counter() - t) / args.repeat, 1),
            }
        ),
        flush=True,
    )

    # map download alone
    m, r = engine._detect(engine.craft_params, dev_f32, 1)
    _sync(m)
    timed("maps_download", lambda: (np.asarray(m), np.asarray(r)), sync=False)


if __name__ == "__main__":
    main()
