"""Failure-detection / recovery behaviors (SURVEY.md §5):

- Ollama retry-with-backoff (3 attempts) in the extractor
- Gemini 404 model-name and 403/429 quota fallback chains
- job runtime error isolation + concurrent submission safety
- OCR failure degrades to empty text, not a crashed extraction
"""

import json
import threading
import time

import numpy as np
import pytest

from bbocr_tpu.extract import BookMetadataExtractor, empty_metadata
from bbocr_tpu.llm.client import GeminiClient
from bbocr_tpu.server.jobs import JobManager


def fake_images(n=2):
    rng = np.random.default_rng(0)
    return [rng.integers(0, 255, (32, 24, 3)).astype(np.uint8) for _ in range(n)]


class FlakyOllama:
    """generate() fails twice, then succeeds."""

    def __init__(self):
        self.calls = 0

    def generate(self, model, prompt, images, timeout_seconds=0):
        self.calls += 1
        if self.calls < 3:
            raise RuntimeError(f"boom {self.calls}")
        return json.dumps(empty_metadata())


class TestOllamaRetry:
    def test_three_attempts_then_success(self, monkeypatch):
        ext = BookMetadataExtractor(warm_model=False, engine=None, use_preprocessing=False)
        ext.ocr_engine = "tpu"
        ext._engine = type("E", (), {"read_lines": lambda self, im: ["x"], "timings": lambda self: {}})()
        flaky = FlakyOllama()
        monkeypatch.setattr("bbocr_tpu.llm.OllamaClient", lambda session, url: flaky)
        monkeypatch.setattr(time, "sleep", lambda s: None)  # no real backoff wait
        meta = ext.extract_metadata_from_images(fake_images(2))
        assert flaky.calls == 3
        assert "fallback_used" not in meta["_processing_info"]

    def test_exhausted_retries_raise(self, monkeypatch):
        class AlwaysDown:
            def generate(self, *a, **k):
                raise RuntimeError("down")

        ext = BookMetadataExtractor(warm_model=False, use_preprocessing=False,
                                    engine=type("E", (), {"read_lines": lambda s, im: [], "timings": lambda s: {}})())
        monkeypatch.setattr("bbocr_tpu.llm.OllamaClient", lambda session, url: AlwaysDown())
        monkeypatch.setattr(time, "sleep", lambda s: None)
        with pytest.raises(Exception, match="Error from Ollama API"):
            ext.extract_metadata_from_images(fake_images(1))


class FakeResponse:
    def __init__(self, status_code, payload=None, text=""):
        self.status_code = status_code
        self._payload = payload or {}
        self.text = text

    def json(self):
        return self._payload


class TestGeminiFallbacks:
    def _client(self, responses, monkeypatch):
        client = GeminiClient.__new__(GeminiClient)
        client.api_key = "k"
        client.base_url = "https://example.invalid"
        client.last_url = None
        client.tried_models = []
        calls = []

        class S:
            def post(self, url, json=None, timeout=None):
                calls.append(url)
                return responses.pop(0)

        client.session = S()
        return client, calls

    def test_404_name_fallback(self, monkeypatch):
        ok = FakeResponse(200, {"candidates": [{"content": {"parts": [{"text": "hi"}]}}]})
        client, calls = self._client([FakeResponse(404), ok], monkeypatch)
        out = client.generate("gemini-1.5-flash", "p", [])
        assert out == "hi"
        assert client.tried_models == ["gemini-1.5-flash", "gemini-1.5-flash-latest"]

    def test_quota_fallback_to_cheaper(self, monkeypatch):
        ok = FakeResponse(200, {"candidates": [{"content": {"parts": [{"text": "cheap"}]}}]})
        client, calls = self._client([FakeResponse(429), ok], monkeypatch)
        out = client.generate("gemini-1.5-pro", "p", [])
        assert out == "cheap"
        assert client.tried_models[-1] in ("gemini-1.5-flash", "gemini-1.5-flash-8b")

    def test_hard_error_raises(self, monkeypatch):
        client, _ = self._client([FakeResponse(500, text="ise")], monkeypatch)
        with pytest.raises(RuntimeError, match="Gemini HTTP 500"):
            client.generate("gemini-1.5-flash", "p", [])


class TestJobRuntimeResilience:
    def test_error_isolated_to_job(self):
        jm = JobManager()
        jm.reset_streams("bad")
        jm.submit("bad", lambda: 1 / 0)
        for _ in range(100):
            if jm.get("bad")["status"] == "error":
                break
            time.sleep(0.02)
        job = jm.get("bad")
        assert job["status"] == "error"
        assert "division" in job["error"]
        # runtime still healthy for the next job
        jm.reset_streams("good")
        jm.submit("good", lambda: {"ok": True})
        for _ in range(100):
            if jm.get("good")["status"] == "done":
                break
            time.sleep(0.02)
        assert jm.get("good")["metadata"] == {"ok": True}

    def test_concurrent_submissions_serialized(self):
        jm = JobManager(max_concurrent=1)
        running = []
        overlap = []

        def work(i):
            def fn():
                running.append(i)
                if len(running) > 1:
                    overlap.append(True)
                time.sleep(0.05)
                running.remove(i)
                return i

            return fn

        for i in range(5):
            jm.reset_streams(f"j{i}")
            jm.submit(f"j{i}", work(i))
        for _ in range(300):
            if all(jm.get(f"j{i}")["status"] == "done" for i in range(5)):
                break
            time.sleep(0.02)
        assert not overlap  # global semaphore kept jobs serialized
        assert [jm.get(f"j{i}")["metadata"] for i in range(5)] == list(range(5))


class TestOCRFailureDegrades:
    def test_ocr_exception_yields_empty_context(self):
        class Exploding:
            def read_lines(self, im):
                raise RuntimeError("device lost")

            def timings(self):
                return {}

        ext = BookMetadataExtractor(
            warm_model=False, use_preprocessing=False,
            llm_backend="heuristic", engine=Exploding(),
        )
        meta = ext.extract_metadata_from_images(fake_images(2))
        # extraction completes with no OCR context rather than raising
        assert meta["_processing_info"]["ocr_images_processed"] == 0
