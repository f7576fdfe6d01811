"""Full-path integration: HTTP -> real BookMetadataExtractor -> real
(tiny-shape) OCREngine -> heuristic structurer -> trace/metadata round-trip.

The other server tests swap in a FakeExtractor; this suite runs the genuine
extraction stack (preprocess, edge/auto crop, TPU-architecture OCR engine,
trace capture, heuristic structuring) end to end over live sockets on the
CPU backend, mirroring the reference's UI scan job
(``pipeline_demo/i2j_ui/app/main.py:775`` -> ``enhanced_extractor.py:588``).
"""

import asyncio
import io
import json
import socket
import threading
import time

import httpx
import numpy as np
import pytest

from bbocr_tpu.server.app import ScannerService


def _make_test_jpeg(text: str = "COPYRIGHT 1984") -> bytes:
    """A small page-like photo with real rendered text."""
    from PIL import Image, ImageDraw, ImageFont

    img = Image.new("L", (240, 320), 235)
    d = ImageDraw.Draw(img)
    try:
        font = ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf", 28
        )
    except Exception:
        font = ImageFont.load_default()
    d.text((20, 60), text, fill=15, font=font)
    d.text((20, 140), "RANDOM HOUSE", fill=15, font=font)
    buf = io.BytesIO()
    img.convert("RGB").save(buf, format="JPEG", quality=92)
    return buf.getvalue()


@pytest.fixture(scope="module")
def real_server(tmp_path_factory):
    """ScannerService whose extractor is the real one, with a small-canvas
    real engine injected (untrained-weights fallback keeps this hermetic)."""
    from bbocr_tpu.extract import BookMetadataExtractor
    from bbocr_tpu.runtime.bucketing import CanvasSpec
    from bbocr_tpu.runtime.engine import EngineConfig, OCREngine

    cfg = EngineConfig(
        canvases=(CanvasSpec(128, 96), CanvasSpec(96, 128)),
        width_buckets=(64,),
        batch_capacities=(8,),
    )
    import os

    ckpt = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "checkpoints")
    try:
        engine = OCREngine.from_checkpoint(
            os.path.join(ckpt, "craft.npz"), os.path.join(ckpt, "crnn.npz"), cfg
        )
    except Exception:
        engine = OCREngine.create(config=cfg)

    data_dir = str(tmp_path_factory.mktemp("data"))
    service = ScannerService(data_dir=data_dir)
    orig_build = service._build_extractor

    def build(**kw):
        return BookMetadataExtractor(
            model=kw.get("model", "test"),
            ocr_engine="tpu",
            use_preprocessing=bool(kw.get("use_preprocessing", True)),
            crop_for_ocr=bool(kw.get("auto_crop", False)),
            warm_model=False,
            edge_crop_percent=float(kw.get("edge_crop", 0.0)),
            llm_backend="heuristic",
            engine=engine,
        )

    service._build_extractor = build

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        try:
            loop.run_until_complete(service.app.serve("127.0.0.1", port))
        except RuntimeError:
            pass

    t = threading.Thread(target=run, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    for _ in range(100):
        try:
            httpx.get(base + "/api/health", timeout=0.5)
            break
        except Exception:
            time.sleep(0.05)
    yield base, service
    # drain connection tasks before stopping the loop (see tests/test_server.py)
    done = threading.Event()

    async def _shutdown():
        try:
            await service.app.shutdown()
        finally:
            done.set()

    asyncio.run_coroutine_threadsafe(_shutdown(), loop)
    done.wait(timeout=5)
    loop.call_soon_threadsafe(loop.stop)


def _wait_done(base, job_id, timeout=120.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        job = httpx.get(base + f"/api/job_status?id={job_id}").json()
        if job.get("status") in ("done", "error"):
            return job
        time.sleep(0.2)
    raise TimeoutError("job did not finish")


class TestFullPath:
    def test_process_images_real_extractor(self, real_server):
        base, _ = real_server
        jpeg = _make_test_jpeg()
        files = [
            ("images", ("cover.jpg", jpeg, "image/jpeg")),
            ("images", ("title.jpg", jpeg, "image/jpeg")),
        ]
        r = httpx.post(
            base + "/api/process_images",
            files=files,
            data={
                "llm_backend": "heuristic",
                "model": "test",
                "run_ocr": "true",
                "use_preprocessing": "true",
            },
            timeout=30.0,
        )
        assert r.status_code == 200, r.text
        job_id = r.json()["id"]
        job = _wait_done(base, job_id)
        assert job["status"] == "done", json.dumps(job)[:500]

        meta = job["metadata"]
        # Schema keys present (real extractor output contract)
        for key in ("title", "authors", "publisher", "year", "isbn_13"):
            assert key in meta
        info = meta["_processing_info"]
        assert info["ocr_engine"] == "tpu"
        assert info["llm_backend"] == "heuristic"
        # 2 images => OCR default plan is [1] (skip the cover)
        assert info["ocr_images_processed"] == 1

        # The trace round-trips through the job buffers with real previews.
        trace = httpx.get(base + f"/api/trace_poll?id={job_id}&after=0").json()
        items = trace["items"]
        assert items, "no trace updates captured"
        merged = {}
        for item in items:
            if item.get("trace", {}).get("images"):
                merged = item["trace"]
        assert len(merged.get("images", [])) == 2
        # heavy fields dedup: at least the first occurrence ships previews
        first_with_imgs = next(i["trace"] for i in items if i.get("trace", {}).get("images"))
        assert any(
            (im.get("original_b64") or "").startswith("data:image/")
            for im in first_with_imgs["images"]
        )

    def test_job_result_includes_engine_info(self, real_server):
        base, _ = real_server
        jpeg = _make_test_jpeg("ISBN 0-306-40615-2")
        r = httpx.post(
            base + "/api/process_images",
            files=[("images", ("page.jpg", jpeg, "image/jpeg"))],
            data={"llm_backend": "heuristic", "model": "test", "run_ocr": "true"},
            timeout=30.0,
        )
        assert r.status_code == 200
        job_id = r.json()["id"]
        job = _wait_done(base, job_id)
        assert job["status"] == "done"
        res = httpx.get(base + f"/api/job_result?id={job_id}")
        assert res.status_code == 200
        meta = res.json()["metadata"]
        # single image => OCR plan [0]
        assert meta["_processing_info"]["ocr_images_processed"] == 1
        # the engine actually ran: stage timers accumulated on the real
        # path — "detect" on the batched path, "fast" when the webcam-shaped
        # single photo routes through the single-dispatch fast path.
        timings = meta["_processing_info"].get("engine_timings", {})
        stage = "fast" if "fast" in timings else "detect"
        assert stage in timings and timings[stage]["count"] >= 1


class TestRealEvalUtils:
    """Pure helpers of the real-photo eval harness (cli/evaluate_real)."""

    def test_word_recall_counts_tokens_and_substrings(self):
        from bbocr_tpu.cli.evaluate_real import word_recall

        r = word_recall(["Beyond the Frontier"], "lBeyond the Froncc")
        # "THE" found as token, "BEYOND" found inside "LBEYOND" (substring
        # rule handles OCR word-merging); "FRONTIER" missing.
        assert r["total"] == 3
        assert r["found"] == 2

    def test_word_recall_empty_phrases(self):
        from bbocr_tpu.cli.evaluate_real import word_recall

        assert word_recall([], "anything")["recall"] is None

    def test_rotation_score_gates_garbage(self):
        from bbocr_tpu.cli.evaluate_real import rotation_score

        garbage = [(None, t, 0.1) for t in ("2--", "yrk", "WEE", "HA", "D")] * 40
        clean = [(None, "A. L. BURT COMPANY", 0.8), (None, "Publishers", 0.6)]
        assert rotation_score(clean) > rotation_score(garbage)
        # short or low-confidence fragments contribute nothing
        assert rotation_score([(None, "ab", 0.9), (None, "xyz", 0.2)]) == 0.0

    def test_substring_cer(self):
        from bbocr_tpu.cli.evaluate_real import phrase_cer, substring_cer

        assert substring_cer("FRONTIER", "junk lBeyond the Frontier junk") == 0.0
        assert substring_cer("FRONTIER", "lBeyond the Froncc") > 0.2
        assert substring_cer("ABC", "") == 1.0
        assert phrase_cer([], "x") is None
        # identical inputs -> identical scores for both pipelines
        assert phrase_cer(["Copyright 1915"], "Copyright 1915") == 0.0
