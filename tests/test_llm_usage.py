"""Per-request cost accounting + native-VLM client caching.

Reference behavior: the GUI baseline computes $-per-request for GPT-4o
(``pipeline_components/gradio_GPT/app.py:139-143``: $0.005/1K prompt +
$0.015/1K completion). The clients surface the same accounting as
``last_usage`` and the extractor embeds it in ``_processing_info``.
"""

import pytest

from bbocr_tpu.llm.client import GeminiClient, OpenAIClient, _usage


class FakeResponse:
    def __init__(self, status_code, payload=None, text=""):
        self.status_code = status_code
        self._payload = payload or {}
        self.text = text

    def json(self):
        return self._payload


class FakeSession:
    def __init__(self, responses):
        self.responses = list(responses)

    def post(self, url, json=None, headers=None, timeout=None):
        return self.responses.pop(0)


class TestOpenAIUsage:
    def _client(self, resp):
        c = OpenAIClient.__new__(OpenAIClient)
        c.api_key = "k"
        c.base_url = "https://example.invalid/v1"
        c.session = FakeSession([resp])
        return c

    def test_cost_per_reference_rates(self):
        resp = FakeResponse(200, {
            "choices": [{"message": {"content": "{}"}}],
            "usage": {"prompt_tokens": 2000, "completion_tokens": 1000},
        })
        c = self._client(resp)
        assert c.generate("gpt-4o", "p", []) == "{}"
        u = c.last_usage
        assert u["prompt_tokens"] == 2000 and u["completion_tokens"] == 1000
        # gradio_GPT/app.py:139-143: 2.0 * 0.005 + 1.0 * 0.015
        assert u["cost_usd"] == pytest.approx(0.025)

    def test_missing_usage_block(self):
        resp = FakeResponse(200, {"choices": [{"message": {"content": "x"}}]})
        c = self._client(resp)
        c.generate("gpt-4o", "p", [])
        assert c.last_usage is None


class TestGeminiUsage:
    def test_usage_metadata_parsed(self):
        c = GeminiClient.__new__(GeminiClient)
        c.api_key = "k"
        c.base_url = "https://example.invalid"
        c.last_url = None
        c.tried_models = []
        c.session = FakeSession([
            FakeResponse(200, {
                "candidates": [{"content": {"parts": [{"text": "hi"}]}}],
                "usageMetadata": {"promptTokenCount": 100, "candidatesTokenCount": 50},
            })
        ])
        assert c.generate("gemini-1.5-flash", "p", []) == "hi"
        assert c.last_usage["prompt_tokens"] == 100
        assert c.last_usage["cost_usd"] > 0


def test_usage_helper_handles_partial():
    assert _usage("openai", None, None) is None
    u = _usage("openai", 10, None)
    assert u["cost_usd"] is None and u["prompt_tokens"] == 10


class TestExtractorEmbedsUsage:
    def test_processing_info_llm_usage(self, monkeypatch):
        from bbocr_tpu.extract.extractor import BookMetadataExtractor

        class FakeClient:
            last_usage = {"prompt_tokens": 10, "completion_tokens": 5, "cost_usd": 0.000125}

            def generate(self, *a, **k):
                return '{"title": "T", "authors": ["A"], "publisher": null, ' \
                       '"year": null, "isbn_10": null, "isbn_13": null, ' \
                       '"edition": null, "binding": null}'

        monkeypatch.setattr(
            "bbocr_tpu.llm.create_llm_client", lambda backend, session=None: FakeClient()
        )
        ext = BookMetadataExtractor(
            warm_model=False, use_preprocessing=False, llm_backend="openai",
            engine=type("E", (), {"read_lines": lambda s, im: [], "timings": lambda s: {}})(),
        )
        import numpy as np
        from PIL import Image
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "a.jpg")
            Image.fromarray(np.full((64, 64), 200, np.uint8)).save(p)
            meta = ext.extract_metadata_from_images([p])
        assert meta["_processing_info"]["llm_usage"]["cost_usd"] == 0.000125


class TestNativeClientCache:
    def test_process_wide_cache_identity(self):
        from bbocr_tpu.llm.native_vlm import get_native_client

        a = get_native_client("checkpoints/vlm.npz")
        b = get_native_client("checkpoints/vlm.npz")
        assert a is b

    def test_params_rekeyed_on_path_change(self, monkeypatch):
        from bbocr_tpu.llm import native_vlm

        loads = []
        monkeypatch.setattr(
            "bbocr_tpu.utils.checkpoint.load_params",
            lambda path: loads.append(path) or {"params": {}},
        )
        monkeypatch.setattr("bbocr_tpu.models.vlm.PageReader", lambda: object())
        c = native_vlm.NativeVLMClient("x.npz")
        monkeypatch.setattr("os.path.isfile", lambda p: True)
        c._ensure_loaded("a.npz")
        c._ensure_loaded("a.npz")
        assert loads == ["a.npz"]  # cached, not reloaded
        c._ensure_loaded("b.npz")
        assert loads == ["a.npz", "b.npz"]  # path change reloads
