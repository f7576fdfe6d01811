"""End-of-round benchmark: book photos/sec/chip through the FULL OCR serving
path, measured on the reference's real book photos.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Unlike the round-1 bench (which timed only the three device stages), this
drives ``OCREngine.readtext_batch`` end to end on real images: JPEG decode ->
grayscale -> canvas letterbox (host PIL resize) -> CRAFT detect -> host box
extraction (native C++ CC labeling + quads) -> device rectification -> CRNN
recognize -> CTC decode -> text assembly. The recognition crop load is
whatever the detector actually finds on each photo, not an assumed count.

Decode runs on a host thread pool overlapped with device work (the serving
architecture: ``runtime/batching.py`` drains a queue while the chip runs),
so steady-state throughput = the slower of the two pipelines.

Reference baseline: EasyOCR ~2.6-4.4 s/photo on CPU (SURVEY.md §6)
=> ~0.333 photos/sec/machine.

Side metrics (p50 single-photo latency, per-stage timers, crops/photo) go to
stderr so the driver's one-line contract stays intact.
"""

from __future__ import annotations

import glob
import io
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))


def _photo_paths(max_photos: int):
    """Real corpus first (covers + photo sets), synthetic books as filler.

    BENCH_SET=books restricts to the synthetic 800x600 pages (the small-
    canvas operating point, comparable with the round-1 numbers); the
    default mix is dominated by the reference's 2400px camera photos,
    which run the 1408x1024 quality canvases (~5x the work per photo).
    """
    paths = []
    if os.environ.get("BENCH_SET", "") != "books":
        paths += sorted(glob.glob(os.path.join(ROOT, "data", "real", "covers", "*.png")))
        paths += sorted(glob.glob(os.path.join(ROOT, "data", "real", "photos", "*", "*.jpg")))
    paths += sorted(glob.glob(os.path.join(ROOT, "books", "*", "*.jpg")))
    paths += sorted(glob.glob(os.path.join(ROOT, "books", "*", "*.png")))
    if not paths:
        raise SystemExit("no benchmark images found under data/real or books/")
    out = []
    while len(out) < max_photos:
        out.extend(paths)
    return out[:max_photos]


def _decode(raw: bytes) -> np.ndarray:
    """JPEG/PNG -> (H, W) uint8 grayscale. cv2 decodes grayscale directly
    (no RGB intermediate) and the engine's host path is u8-native; the old
    float32 round trip cost ~30ms/photo of pure conversion on 1 host core."""
    try:
        import cv2

        img = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_GRAYSCALE)
        if img is not None:
            return img
    except ImportError:
        pass
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(raw)).convert("L"))


def _backend_alive(timeout_s: int = 300) -> bool:
    """Probe the accelerator in a SUBPROCESS (a wedged relay hangs the
    probing process forever — round-3 outage probes sat 600s; the subprocess
    is killable, the importing process is not)."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "float((jnp.ones((8,8))@jnp.ones((8,8))).sum());"
        "print(jax.devices()[0].platform)"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, text=True,
        )
        # A host where JAX silently defaults to CPU passes the matmul probe;
        # only a real accelerator counts as 'device' (honest labeling).
        return r.returncode == 0 and r.stdout.strip().lower() != "cpu"
    except Exception:
        return False


def _ensure_backend() -> str:
    """Return the platform this bench will run on: the accelerator if it
    answers (with retry/backoff — a transient relay blip must not zero a
    round's perf record), else a degraded CPU fallback.

    Round-3 lesson: BENCH_r03.json was rc=1 because the axon backend was
    down and the bench just died. Degrading to CPU keeps rc=0 and records
    an honest (clearly labeled) measurement instead of nothing.
    """
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return "cpu"
    retries = int(os.environ.get("BENCH_PROBE_RETRIES", "3"))
    wait = float(os.environ.get("BENCH_PROBE_WAIT", "120"))
    probe_timeout = int(os.environ.get("BENCH_PROBE_TIMEOUT", "300"))
    for attempt in range(retries):
        if _backend_alive(probe_timeout):
            return "device"
        print(
            json.dumps({"bench_probe": "backend unavailable",
                        "attempt": attempt + 1, "of": retries}),
            file=sys.stderr, flush=True,
        )
        if attempt + 1 < retries:
            time.sleep(wait)
    os.environ["JAX_PLATFORMS"] = "cpu"
    return "cpu_fallback"


def main():
    platform = _ensure_backend()

    from bbocr_tpu.utils.env import sync_platform_from_env

    sync_platform_from_env()  # honor JAX_PLATFORMS=cpu if set

    from bbocr_tpu.runtime.engine import OCREngine

    degraded = platform == "cpu_fallback"
    # CPU fallback: a handful of photos on the small-canvas operating point
    # (800x600 synthetic pages) is enough to produce a nonzero, honest
    # number without burning an hour on one host core.
    N_PHOTOS = int(os.environ.get("BENCH_PHOTOS", "8" if degraded else "96"))
    BATCH = int(os.environ.get("BENCH_BATCH", "4" if degraded else "16"))
    if degraded and "BENCH_SET" not in os.environ:
        os.environ["BENCH_SET"] = "books"
    ckpt = os.path.join(ROOT, "checkpoints")
    engine = OCREngine.from_checkpoint(
        os.path.join(ckpt, "craft.npz"), os.path.join(ckpt, "crnn.npz")
    )

    paths = _photo_paths(N_PHOTOS)
    raws = [open(p, "rb").read() for p in paths]

    pool = ThreadPoolExecutor(max_workers=8)

    def decode_batch(i):
        return list(pool.map(_decode, raws[i : i + BATCH]))

    # Warm-up: one full UNTIMED pass over the photo set, so every program
    # shape real traffic needs (canvas x row-bucket detects, width x
    # capacity rectify/recognize, single-photo merged buckets) is compiled
    # before the timed run — the timed section then measures steady-state
    # serving, which is what a long-lived server delivers. The single-photo
    # latency loop is warmed on ITS OWN photos: single-image calls merge
    # width buckets and pad warp counts per photo, so each distinct photo
    # can be a distinct compiled shape (round-2 bench: p90 11.6s from
    # compiles inside the timed loop).
    for i in range(0, len(raws), BATCH):
        engine.readtext_batch(decode_batch(i))
    for raw in raws[: min(24, len(raws))]:
        engine.readtext(_decode(raw))

    # --- throughput: pipelined decode -> readtext_stream ------------------
    # Decode overlaps on the thread pool; the engine's 3-stage stream then
    # overlaps detect dispatch / host CC + recognize dispatch / text decode
    # across consecutive batches, so the chip never idles on host-only work.
    engine.timers.reset() if hasattr(engine.timers, "reset") else None
    n_crops = 0
    t0 = time.perf_counter()

    def batch_iter():
        nxt = pool.submit(decode_batch, 0)
        for i in range(0, len(raws), BATCH):
            imgs = nxt.result()
            if i + BATCH < len(raws):
                nxt = pool.submit(decode_batch, i + BATCH)
            yield imgs

    done = 0
    results_sample = None
    for res in engine.readtext_stream(batch_iter()):
        n_crops += sum(len(r) for r in res)
        if results_sample is None and res:
            results_sample = res[0]
        done += len(res)
    elapsed = time.perf_counter() - t0
    photos_per_sec = done / elapsed

    # --- p50 single-photo latency (decode included) -----------------------
    lat = []
    for raw in raws[: min(24, len(raws))]:
        t = time.perf_counter()
        engine.readtext(_decode(raw))
        lat.append(time.perf_counter() - t)
    p50 = float(np.median(lat)) * 1000.0
    p90 = float(np.percentile(lat, 90)) * 1000.0

    # --- p50 single-photo latency, single-dispatch fast path ---------------
    # readtext_fast runs detect -> on-device CC -> rectify -> recognize as
    # ONE XLA program (one upload, one small download), so on relayed links
    # its latency is ~one round trip instead of three. Warm pass first: the
    # program compiles per (canvas, K, bucket) key.
    fast_lat = []
    if hasattr(engine, "readtext_fast"):
        sample = raws[: min(4 if degraded else 12, len(raws))]
        for raw in sample:
            engine.readtext_fast(_decode(raw))
        for raw in sample:
            t = time.perf_counter()
            engine.readtext_fast(_decode(raw))
            fast_lat.append(time.perf_counter() - t)
    p50_fast = float(np.median(fast_lat)) * 1000.0 if fast_lat else None

    ecfg = engine.config
    side = {
        "platform": platform,
        "bench_set": os.environ.get("BENCH_SET", "real_mix"),
        "engine_config": {
            "wire_bits": ecfg.wire_bits,
            "host_rectify": ecfg.host_rectify,
            "detect_coarse": ecfg.detect_coarse,
            "decoder": ecfg.decoder,
            "detail_scale": os.environ.get("BB_OCR_DETAIL_SCALE"),
        },
        "photos": done,
        "elapsed_s": round(elapsed, 2),
        "crops_total": n_crops,
        "crops_per_photo": round(n_crops / max(done, 1), 1),
        "p50_ms": round(p50, 1),
        "p90_ms": round(p90, 1),
        "p50_fast_ms": round(p50_fast, 1) if p50_fast is not None else None,
        "stage_timers": engine.timings(),
    }
    print(json.dumps(side), file=sys.stderr)

    baseline = 1.0 / 3.0  # reference: ~3s/photo EasyOCR CPU (BASELINE.md)
    line = {
        "metric": "book_photos_per_sec_per_chip",
        "value": round(photos_per_sec, 2),
        "unit": "photos/sec",
        "vs_baseline": round(photos_per_sec / baseline, 1),
    }
    if platform != "device":
        # Honest labeling: this run never touched the chip. The metric is
        # still the real serving path end to end, just on the host CPU.
        line["platform"] = platform
        line["note"] = (
            "TPU backend unavailable after retries; measured on host CPU"
            if platform == "cpu_fallback"
            else "JAX_PLATFORMS=cpu requested"
        )
    print(json.dumps(line))


if __name__ == "__main__":
    main()
