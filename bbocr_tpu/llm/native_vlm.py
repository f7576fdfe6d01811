"""On-chip VLM backend: PageReader instead of an external model server.

The reference's only route to JSON is HTTP to Ollama/OpenAI/Gemini
(``pipeline_demo/llm_providers/client.py``; seconds per request). This
client satisfies the same ``LLMClient.generate`` contract with the
TPU-resident PageReader (BASELINE config 5): decode the first image,
letterbox it to the model's page shape, and greedy-decode the metadata
JSON in one compiled program. The prompt is ignored — the model IS the
extractor. Downstream JSON repair/schema validation in the extractor
applies unchanged.
"""

from __future__ import annotations

import base64
import io
import os
import threading
from typing import List, Optional

import numpy as np

from bbocr_tpu.llm.client import LLMClient

DEFAULT_CKPT = os.path.join("checkpoints", "vlm.npz")
PAGE_H, PAGE_W = 256, 192

# Process-wide client cache keyed by default checkpoint path: params live
# on device and the jit trace is shape-stable, so re-creating a client per
# request (the extractor builds its LLM client per call) would re-read the
# ~19MB npz and re-upload params every time, defeating the on-chip
# backend's latency rationale. Mirrors the engine's _ENGINE_CACHE.
_CLIENT_CACHE: dict = {}
_CACHE_LOCK = threading.Lock()


def get_native_client(ckpt_path: Optional[str] = None) -> "NativeVLMClient":
    key = ckpt_path or os.environ.get("BB_OCR_VLM_CKPT", DEFAULT_CKPT)
    with _CACHE_LOCK:
        client = _CLIENT_CACHE.get(key)
        if client is None:
            client = _CLIENT_CACHE[key] = NativeVLMClient(key)
        return client


class NativeVLMClient(LLMClient):
    """LLMClient over the on-chip PageReader. ``model`` names a checkpoint
    path (or empty for the default ``checkpoints/vlm.npz``)."""

    def __init__(self, ckpt_path: Optional[str] = None):
        self.ckpt_path = ckpt_path or os.environ.get("BB_OCR_VLM_CKPT", DEFAULT_CKPT)
        self._lock = threading.Lock()
        self._model = None
        self._params = None
        self._loaded_path: Optional[str] = None

    def _ensure_loaded(self, model_name: str):
        import jax

        from bbocr_tpu.models.vlm import PageReader
        from bbocr_tpu.utils.checkpoint import load_params

        path = model_name if model_name and os.path.isfile(model_name) else self.ckpt_path
        if self._model is None:
            self._model = PageReader()
        # key the cached params on the resolved path: a long-lived client
        # asked for a different checkpoint must not keep serving the first
        if self._loaded_path != path:
            self._params = jax.tree_util.tree_map(
                jax.numpy.asarray, load_params(path)
            )
            self._loaded_path = path

    @staticmethod
    def _page_from_b64(image_b64: str) -> np.ndarray:
        from PIL import Image

        raw = base64.b64decode(image_b64)
        img = Image.open(io.BytesIO(raw)).convert("L")
        # aspect-preserving letterbox into the model's page shape
        scale = min(PAGE_H / img.height, PAGE_W / img.width)
        nh, nw = max(1, round(img.height * scale)), max(1, round(img.width * scale))
        img = img.resize((nw, nh), Image.BILINEAR)
        page = np.full((PAGE_H, PAGE_W), 255, np.float32)
        page[:nh, :nw] = np.asarray(img, np.float32)
        return page

    def generate(self, model, prompt, images_b64: List[str], timeout_seconds=300.0) -> str:
        import jax.numpy as jnp

        from bbocr_tpu.models.vlm import decode_ids, greedy_generate

        if not images_b64:
            return "{}"
        with self._lock:
            self._ensure_loaded(model)
            page = self._page_from_b64(images_b64[0])
            ids = greedy_generate(
                self._params, self._model, jnp.asarray(page)[None, ..., None]
            )
        return decode_ids(np.asarray(ids)[0])
