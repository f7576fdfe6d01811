"""Scanner service tests: live asyncio HTTP server driven over sockets —
multipart jobs, SSE + poll streams, review workflow, pricing endpoints."""

import asyncio
import json
import socket
import threading
import time

import httpx
import pytest

from bbocr_tpu.server.app import ScannerService, validate_backend_model
from bbocr_tpu.pricing.aggregator import DEFAULT_PROVIDERS
from bbocr_tpu.pricing.parse import make_offer


class FakeExtractor:
    """Emits two trace updates then returns metadata (no TPU engine)."""

    def extract_metadata_from_images(self, paths, ocr_image_indices=None, capture_trace=False, trace_sink=None):
        print("processing", len(paths), "images")
        print("processing", len(paths), "images")  # coalesced duplicate
        trace = {"images": [{"original_b64": "data:image/png;base64,AAA"} for _ in paths], "steps": []}
        if trace_sink:
            trace_sink(trace)
            trace["steps"] = [{"step": "ocr", "info": {"chars": 5}}]
            trace_sink(trace)
        return {
            "title": "Fake Book",
            "authors": ["A. Author"],
            "_processing_info": {"ocr_images_processed": len(ocr_image_indices or [])},
        }


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("data"))
    service = ScannerService(data_dir=data_dir)
    service._build_extractor = lambda **kw: FakeExtractor()

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
            pass  # loop stopped at teardown

    t = threading.Thread(target=run, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    for _ in range(100):
        try:
            httpx.get(base + "/api/health", timeout=1)
            break
        except Exception:
            time.sleep(0.05)
    yield base, service
    # drain connection tasks (lingering SSE streams) before stopping the
    # loop, else asyncio logs "Task was destroyed but it is pending!"
    done = threading.Event()

    async def _shutdown():
        try:
            await service.app.shutdown()
        finally:
            done.set()

    asyncio.run_coroutine_threadsafe(_shutdown(), loop)
    done.wait(timeout=5)
    loop.call_soon_threadsafe(loop.stop)


PNG_1PX = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000010000000108060000001f15c489"
    "0000000d49444154789c626001000000ffff03000006000557bfabd40000000049454e44ae426082"
)


class TestBasics:
    def test_health(self, server):
        base, _ = server
        data = httpx.get(base + "/api/health").json()
        assert data["status"] == "ok"
        assert data["pipeline_imported"] is True

    def test_404_and_405(self, server):
        base, _ = server
        assert httpx.get(base + "/api/nope").status_code == 404
        assert httpx.get(base + "/api/accept").status_code in (404, 405)

    def test_models_fallback(self, server):
        base, _ = server
        data = httpx.get(base + "/api/models").json()
        assert "gemma3:4b" in data["models"]

    def test_index_and_static(self, server):
        base, _ = server
        r = httpx.get(base + "/")
        assert r.status_code == 200 and "Scanner" in r.text
        assert httpx.get(base + "/static/script.js").status_code == 200
        # path traversal blocked
        assert httpx.get(base + "/static/../app.py").status_code == 404

    def test_validate_backend_model(self):
        assert validate_backend_model("gemini", "gemma3:4b")
        assert validate_backend_model("openai", "llava:7b")
        assert validate_backend_model("ollama", "anything:works") is None
        assert validate_backend_model("gemini", "gemini-2.5-flash") is None


class TestJobs:
    def submit(self, base, n_files=2):
        files = [("images", (f"p{i}.png", PNG_1PX, "image/png")) for i in range(n_files)]
        r = httpx.post(
            base + "/api/process_images",
            files=files,
            data={"llm_backend": "ollama", "model": "gemma3:4b", "run_ocr": "true"},
        )
        assert r.status_code == 200, r.text
        return r.json()

    def wait_done(self, base, job_id, timeout=10.0):
        t0 = time.time()
        while time.time() - t0 < timeout:
            job = httpx.get(base + f"/api/job_status?id={job_id}").json()
            if job.get("status") in ("done", "error"):
                return job
            time.sleep(0.1)
        raise TimeoutError("job did not finish")

    def test_process_and_result(self, server):
        base, _ = server
        data = self.submit(base)
        assert data["status"] == "started"
        assert data["id"].startswith("batch_")
        job = self.wait_done(base, data["id"])
        assert job["status"] == "done"
        assert job["metadata"]["title"] == "Fake Book"
        res = httpx.get(base + f"/api/job_result?id={data['id']}")
        assert res.status_code == 200

    def test_rejects_non_image(self, server):
        base, _ = server
        r = httpx.post(
            base + "/api/process_images",
            files=[("images", ("x.txt", b"hi", "text/plain"))],
            data={"llm_backend": "ollama", "model": "m"},
        )
        assert r.status_code == 400

    def test_bad_backend_model(self, server):
        base, _ = server
        r = httpx.post(
            base + "/api/process_images",
            files=[("images", ("p.png", PNG_1PX, "image/png"))],
            data={"llm_backend": "gemini", "model": "gemma3:4b"},
        )
        assert r.status_code == 400
        assert "Invalid model for Gemini" in r.json()["error"]

    def test_trace_poll_heavy_dedup(self, server):
        base, _ = server
        data = self.submit(base)
        self.wait_done(base, data["id"])
        items = httpx.get(base + f"/api/trace_poll?id={data['id']}&after=0").json()["items"]
        assert len(items) >= 2
        first, second = items[0]["trace"], items[1]["trace"]
        assert first["images"][0]["original_b64"] is not None
        assert second["images"][0]["original_b64"] is None  # heavy field sent once

    def test_log_poll_coalescing(self, server):
        base, _ = server
        data = self.submit(base)
        self.wait_done(base, data["id"])
        items = httpx.get(base + f"/api/log_poll?id={data['id']}&after=0").json()["items"]
        lines = [i["line"] for i in items]
        assert any("(x2)" in l for l in lines), lines

    def test_sse_job_stream(self, server):
        base, _ = server
        data = self.submit(base)
        statuses = []
        with httpx.stream("GET", base + f"/api/job_stream?id={data['id']}", timeout=10) as resp:
            assert resp.headers["content-type"].startswith("text/event-stream")
            for line in resp.iter_lines():
                if line.startswith("data: "):
                    frame = json.loads(line[6:])
                    if "status" in frame:
                        statuses.append(frame["status"])
                    if frame.get("status") in ("done", "error"):
                        break
        assert statuses[-1] == "done"
        assert "queued" in statuses or "running" in statuses


class TestReviewWorkflow:
    def test_accept_transfer_finalize(self, server):
        base, service = server
        meta = {"title": "The Sea", "authors": ["J. B."], "year": "2005"}
        r = httpx.post(base + "/api/accept", json={"id": "item_1", "metadata": meta}).json()
        assert r["status"] == "saved"
        assert r["path"].endswith("item_1.json")
        key = r["transfer_key"]
        got = httpx.get(base + f"/api/transfer_get?key={key}").json()
        assert got["metadata"]["title"] == "The Sea"
        assert httpx.get(base + "/api/transfer_get?key=bogus").status_code == 404

        fin = httpx.post(
            base + "/api/pricing/finalize",
            json={"id": "item_1", "decision": "approved", "merged": dict(meta, price={"currency": "USD", "amount": 5})},
        ).json()
        assert fin["status"] == "approved"
        assert "the_sea_" in fin["path"]
        bad = httpx.post(base + "/api/pricing/finalize", json={"decision": "maybe"})
        assert bad.status_code == 400

    def test_reject(self, server):
        base, _ = server
        r = httpx.post(base + "/api/reject", json={"id": "item_2", "reason": "blurry"}).json()
        assert r["status"] == "rejected"
        with open(r["path"]) as f:
            assert f.read() == "blurry"

    def test_accept_reject_ids_are_sanitized(self, server):
        base, service = server
        import os

        r = httpx.post(
            base + "/api/accept",
            json={"id": "../../escape", "metadata": {"title": "X"}},
        ).json()
        # The slugified id must keep the written file inside accepted_dir.
        assert os.path.dirname(os.path.abspath(r["path"])) == os.path.abspath(service.accepted_dir)
        r2 = httpx.post(base + "/api/reject", json={"id": "/abs/path", "reason": "x"}).json()
        assert os.path.dirname(os.path.abspath(r2["path"])) == os.path.abspath(service.rejected_dir)

    def test_oversized_body_and_options_preflight(self, server):
        base, _ = server
        # Raw socket: httpx refuses to send a Content-Length it can't honor.
        host, port = base.replace("http://", "").split(":")
        with socket.create_connection((host, int(port)), timeout=5) as s:
            s.sendall(
                b"POST /api/accept HTTP/1.1\r\n"
                b"Host: x\r\nContent-Type: application/json\r\n"
                b"Content-Length: 68157440\r\n\r\n"
            )
            status_line = s.recv(4096).split(b"\r\n", 1)[0]
        assert b"413" in status_line
        opt = httpx.request("OPTIONS", base + "/api/accept")
        assert opt.status_code == 204
        assert opt.headers.get("access-control-allow-origin") == "*"

    def test_job_stream_unknown_id_terminates(self, server):
        base, _ = server
        with httpx.stream("GET", base + "/api/job_stream?id=no_such_job", timeout=5) as r:
            body = "".join(r.iter_text())
        assert "unknown job" in body


class TestPricingEndpoints:
    def test_lookup_with_fake_provider(self, server, monkeypatch):
        base, _ = server
        offer = make_offer("fake", listing_id="1", title="The Sea", amount=9.0, currency="USD")

        class FP:
            async def lookup(self, **q):
                return [offer]

        monkeypatch.setitem(DEFAULT_PROVIDERS, "fake", FP)
        data = httpx.post(
            base + "/api/pricing_lookup",
            json={"title": "The Sea", "authors": "J. B.", "providers": ["fake"]},
        ).json()
        assert data["offers"][0]["amount"] == 9.0
        assert data["query"]["authors"] == ["J. B."]  # string -> [string]

    def test_select_best(self, server):
        base, _ = server
        offers = [
            make_offer("a", listing_id="1", title="The Sea", amount=5.0, currency="USD", publication_date="2005"),
            make_offer("a", listing_id="2", title="Other", amount=2.0, currency="USD"),
        ]
        data = httpx.post(
            base + "/api/pricing/select_best",
            json={"metadata": {"title": "The Sea", "year": "2005"}, "offers": offers},
        ).json()
        assert data["best_offer"]["listing_id"] == "1"
        assert data["merged"]["price"]["amount"] == 5.0

    def test_providers_alias_and_embed(self, server):
        base, _ = server
        names = httpx.get(base + "/providers").json()["providers"]
        assert "abebooks" in names and "google_books" in names
        html = httpx.get(base + "/pricing_embed").text
        assert "/pricing_static/" in html and "/static/pricing.css" not in html

    def test_processed_load_path_allowlist(self, server):
        base, _ = server
        r = httpx.get(base + "/processed/load", params={"path": "/etc/passwd"})
        assert r.status_code == 400


class TestExamples:
    def test_example_flow(self, server, tmp_path):
        base, service = server
        # wire a books dir with one "book"
        book = tmp_path / "books" / "demo"
        book.mkdir(parents=True)
        (book / "p0.png").write_bytes(PNG_1PX)
        (book / "p1.png").write_bytes(PNG_1PX)
        service.books_dir = str(tmp_path / "books")

        data = httpx.get(base + "/api/examples").json()
        assert data["examples"][0]["name"] == "demo"
        assert data["examples"][0]["has_output"] is False

        r = httpx.post(base + "/api/process_example",
                       json={"name": "demo", "llm_backend": "ollama", "model": "m"}).json()
        assert r["status"] == "started"
        job_id = r["id"]
        for _ in range(100):
            if httpx.get(base + f"/api/job_status?id={job_id}").json()["status"] in ("done", "error"):
                break
            time.sleep(0.1)
        out = httpx.get(base + "/api/example_output", params={"name": "demo"}).json()
        assert out["metadata"]["title"] == "Fake Book"
        data = httpx.get(base + "/api/examples").json()
        assert data["examples"][0]["has_output"] is True

    def test_unknown_example(self, server):
        base, _ = server
        assert httpx.post(base + "/api/process_example", json={"name": "nope"}).status_code == 404


class TestMetrics:
    def test_metrics_endpoint(self, server):
        base, _ = server
        data = httpx.get(base + "/api/metrics").json()
        assert data["uptime_s"] >= 0
        assert isinstance(data["jobs"], dict)
        assert "engine_timings" in data
