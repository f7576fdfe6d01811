"""The book-metadata extraction pipeline: images -> structured JSON.

Drop-in behavioral equivalent of the reference's
``EnhancedBookMetadataExtractor`` (``pipeline_demo/extractor/enhanced_extractor.py:94``)
with the OCR stage running on the TPU engine instead of EasyOCR/libtorch:

- same constructor knobs (model, ocr_engine, use_preprocessing, crop_for_ocr,
  crop_margin, warm_model, edge_crop_percent, ollama_timeout_seconds,
  max_ocr_chars_per_image, llm_backend);
- same default OCR plan ([1,2] / [1] / [] by image count,
  ``enhanced_extractor.py:601-603``);
- same 330-char OCR-context cap with the skip-long trace event (``:690-705``);
- same trace structure (images[] previews, steps[] feed, enhanced_prompt,
  ollama_raw) and ``_processing_info`` block (``:930-935``);
- same JSON repair -> schema validate -> all-null fallback semantics;
- ``BB_OCR_DEBUG_AUTOCROP`` stub mode (``:714-752``);
- per-stage size policy: OCR downscale 1600/2400px, VLM encode 2000/3200px
  q88/q95, previews 800px (``:494,809-811,184``).

TPU-first differences (SURVEY.md §7): preprocessing/edge-crop/auto-crop run
once per image as device programs and feed BOTH the OCR and the VLM inputs
(the reference recomputes the cv2 chain up to 3x per image on the host);
OCR engines are "tpu" (the CRAFT+CRNN engine), plus "tesseract" as the CPU
escape hatch when pytesseract exists, and "heuristic-only" never needs a
model call.
"""

from __future__ import annotations

import base64
import io
import json
import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from bbocr_tpu.extract.heuristics import heuristic_extract
from bbocr_tpu.extract.jsonrepair import repair_and_parse
from bbocr_tpu.extract.prompt import PROMPT_TEMPLATE, build_prompt
from bbocr_tpu.extract.schema import empty_metadata, validate_schema
from bbocr_tpu.utils.env import env_flag

TraceSink = Callable[[Dict[str, Any]], None]

_IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".gif", ".bmp", ".tiff")


class BookMetadataExtractor:
    """images -> OCR context -> (VLM | heuristics) -> validated metadata."""

    def __init__(
        self,
        model: str = "gemma3:4b",
        prompt_template: Optional[str] = None,
        ocr_engine: str = "tpu",
        use_preprocessing: bool = True,
        crop_for_ocr: bool = False,
        crop_margin: int = 128,
        warm_model: bool = True,
        edge_crop_percent: float = 0.0,
        ollama_timeout_seconds: float = 300.0,
        max_ocr_chars_per_image: int = 330,
        llm_backend: str = "ollama",
        engine: Optional[Any] = None,
        ollama_base_url: str = "http://127.0.0.1:11434",
        isbn_reread: bool = True,
        auto_rotate: Optional[bool] = None,
        reread_low_conf: bool = True,
        fast_single: Optional[bool] = None,
    ):
        """``auto_rotate``: re-read each photo at the four right-angle
        rotations and keep the most confidently read one (the reference's
        committed photo sets are mostly shot sideways; costs ~4x OCR time).
        Default ``None`` = decide per image: rotate camera-shaped inputs
        (long side >= 1200px), skip upright webcam captures — so the
        shipped default reproduces the measured eval configuration
        (round-2 VERDICT "shipped defaults don't match the measured
        configuration").

        ``reread_low_conf``: re-read results under confidence 0.5 from the
        full-resolution pixels with beam decode (engine.reread_low_conf);
        one extra batched dispatch per photo, large recall win on small
        print.

        ``fast_single``: route single-photo OCR through the engine's
        single-dispatch program (engine.readtext_fast — one XLA dispatch
        instead of detect/rectify/recognize round trips; p90 179 ms vs
        1516 ms full path, docs/EVAL.md). Default ``None`` = auto: fast
        path for upright webcam-shaped captures (long side < 1200px, no
        rotation vote), full path for camera photos where the measured
        quality configuration (rotations + rotated-quad rectification)
        applies. The low-confidence full-res re-read composes with both."""
        self.model = model
        self.ocr_engine = (ocr_engine or "tpu").lower()
        self.use_preprocessing = use_preprocessing
        self.crop_for_ocr = crop_for_ocr
        self.crop_margin = int(max(0, crop_margin))
        self.edge_crop_percent = float(max(0.0, min(45.0, edge_crop_percent)))
        self.llm_timeout_seconds = float(max(5.0, ollama_timeout_seconds))
        self.llm_backend = (llm_backend or "ollama").lower()
        self.max_ocr_chars_per_image = int(max(1, max_ocr_chars_per_image))
        self.isbn_reread = bool(isbn_reread)
        self.auto_rotate = auto_rotate  # None = per-image (camera-shaped)
        self.reread_low_conf = bool(reread_low_conf)
        self.fast_single = fast_single  # None = auto (upright small images)
        self.prompt_template = prompt_template if prompt_template is not None else PROMPT_TEMPLATE
        self.ollama_base_url = ollama_base_url
        self._trace_sink: Optional[TraceSink] = None
        self._engine = engine
        self.debug_autocrop = env_flag("BB_OCR_DEBUG_AUTOCROP")

        import requests

        self.session = requests.Session()
        self.session.trust_env = False

        if warm_model and self.llm_backend == "ollama":
            try:
                self._warm_ollama_model()
            except Exception as e:  # warm-up is best-effort
                print(f"Warning: model warm-up skipped due to error: {e}")

    # ------------------------------------------------------------------
    # Infrastructure
    # ------------------------------------------------------------------

    @property
    def engine(self):
        """Lazy OCR engine: created on first OCR call, shared per process."""
        if self._engine is None and self.ocr_engine == "tpu":
            from bbocr_tpu.runtime import OCREngine

            self._engine = _shared_engine()
        return self._engine

    def set_trace_sink(self, sink: Optional[TraceSink]) -> None:
        self._trace_sink = sink

    def _emit_trace(self, trace: Dict[str, Any]) -> None:
        try:
            if self._trace_sink is not None:
                self._trace_sink(dict(trace))  # shallow copy: no mutation races
        except Exception:
            pass

    def _warm_ollama_model(self) -> None:
        payload = {"model": self.model, "prompt": "ping", "stream": False}
        resp = self.session.post(
            f"{self.ollama_base_url}/api/generate", json=payload, timeout=(5, 30)
        )
        if resp.status_code != 200:
            raise RuntimeError(f"Warm-up status {resp.status_code}")
        print("Model warm-up request sent")

    # ------------------------------------------------------------------
    # Image helpers (host I/O stays on CPU; compute stays on device)
    # ------------------------------------------------------------------

    @staticmethod
    def _load_rgb(path_or_array) -> np.ndarray:
        if isinstance(path_or_array, np.ndarray):
            arr = path_or_array
            if arr.ndim == 2:
                arr = np.stack([arr] * 3, axis=-1)
            return arr.astype(np.uint8)
        from PIL import Image

        with Image.open(path_or_array) as img:
            return np.asarray(img.convert("RGB"))

    @staticmethod
    def _to_data_url(arr: Optional[np.ndarray], max_dim: int = 800) -> Optional[str]:
        """PNG preview data URL, downscaled (reference ``:184-199``)."""
        if arr is None:
            return None
        try:
            from PIL import Image

            img = Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))
            img.thumbnail((max_dim, max_dim))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
        except Exception:
            return None

    @staticmethod
    def _encode_jpeg_b64(arr: np.ndarray, max_dim: int, quality: int) -> str:
        """Model-input JPEG base64 (reference ``:399-411``)."""
        from PIL import Image

        img = Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))
        img.thumbnail((max_dim, max_dim))
        buf = io.BytesIO()
        img.convert("RGB").save(buf, format="JPEG", quality=int(max(50, min(95, quality))))
        return base64.b64encode(buf.getvalue()).decode()

    # ------------------------------------------------------------------
    # Per-image processing (preprocess -> crops), computed ONCE per image
    # ------------------------------------------------------------------

    def _process_image(self, rgb: np.ndarray) -> Dict[str, Any]:
        """Run the device preprocessing + crop stack; returns all artifacts."""
        import jax.numpy as jnp

        out: Dict[str, Any] = {"original": rgb, "steps": ["original"]}
        current: np.ndarray = rgb
        gray: Optional[np.ndarray] = None

        if self.use_preprocessing:
            from bbocr_tpu.preprocess import preprocess_for_book_cover

            pre, steps = preprocess_for_book_cover(jnp.asarray(rgb, jnp.float32))
            gray = np.asarray(pre)
            out["steps"] = steps
            out["preprocessed"] = gray
            current = gray

        if self.edge_crop_percent > 0.0:
            from bbocr_tpu.preprocess import central_edge_crop

            rect = central_edge_crop(current.shape[:2], self.edge_crop_percent)
            if rect is not None:
                x0, y0, x1, y1 = rect
                current = current[y0:y1, x0:x1]
                out["edge_cropped"] = current

        if self.crop_for_ocr and not self.debug_autocrop:
            from bbocr_tpu.preprocess import auto_crop_text_region

            rect = auto_crop_text_region(current, self.crop_margin)
            if rect is not None:
                x0, y0, x1, y1 = rect
                current = current[y0:y1, x0:x1]
                out["auto_cropped"] = current

        out["final"] = current
        return out

    def _ocr_text(self, image: np.ndarray, image_index: Optional[int]):
        """OCR on the processed image with the per-index downscale policy.

        Returns ``(joined_text, lines)`` — joined matches the reference's
        space-joined readtext output; lines preserve visual structure for
        the heuristics structurer."""
        max_dim = 1600 if (image_index is None or image_index == 0) else 2400
        h, w = image.shape[:2]
        orig_long_side = max(h, w)
        if max(h, w) > max_dim:
            scale = max_dim / max(h, w)
            from PIL import Image

            pil = Image.fromarray(np.clip(image, 0, 255).astype(np.uint8))
            pil = pil.resize((int(w * scale), int(h * scale)), Image.BILINEAR)
            image = np.asarray(pil, np.float32)

        if self.ocr_engine == "tpu":
            eng = self.engine
            if hasattr(eng, "readtext"):
                from bbocr_tpu.decode.boxes import group_lines

                reread_ths = 0.5 if (self.reread_low_conf and hasattr(eng, "reread_low_conf")) else 0.0
                rotate = (
                    self.auto_rotate
                    if self.auto_rotate is not None
                    else orig_long_side >= 1200  # camera photos arrive sideways
                )
                use_fast = (
                    self.fast_single
                    if self.fast_single is not None
                    else (not rotate and orig_long_side < 1200)
                ) and hasattr(eng, "readtext_fast")
                if rotate:
                    from bbocr_tpu.runtime.orient import read_with_rotations

                    res, _k = read_with_rotations(eng, image, reread_conf_ths=reread_ths)
                else:
                    res = eng.readtext_fast(image) if use_fast else eng.readtext(image)
                    if reread_ths > 0 and res:
                        try:
                            res = eng.reread_low_conf(image, res, conf_ths=reread_ths)
                        except Exception:
                            pass
                lines = []
                infos = []  # (text, mean_conf, relative_height) per line
                # VLM context: confident results only — low-confidence
                # texture fragments waste the 330-char budget. The
                # prominence structurer receives ALL lines with their
                # confidence/height and weighs them itself.
                strong = [r for r in res if r[2] >= 0.3 and len(r[1].strip()) >= 2] or res
                if res:
                    grouped = group_lines([r[0] for r in res])
                    heights = []
                    for line in grouped:
                        hs = [
                            float(np.linalg.norm(np.asarray(res[i][0])[3] - np.asarray(res[i][0])[0]))
                            for i in line
                        ]
                        heights.append(sum(hs) / len(hs))
                    h_max = max(heights) if heights else 1.0
                    for line, h in zip(grouped, heights):
                        txt = " ".join(res[i][1] for i in line)
                        conf = sum(float(res[i][2]) for i in line) / len(line)
                        infos.append((txt, conf, h / max(h_max, 1e-6), image_index or 0))
                if strong:
                    grouped = group_lines([r[0] for r in strong])
                    lines = [" ".join(strong[i][1] for i in line) for line in grouped]
                # Digit-biased high-res ISBN re-read (BASELINE config 3):
                # a checksum-valid ISBN is appended as its own line so the
                # heuristic structurer and the VLM context both see it.
                if self.isbn_reread and res and hasattr(eng, "reread_isbn"):
                    try:
                        isbn = eng.reread_isbn(image, res)
                    except Exception:
                        isbn = None
                    if isbn:
                        lines = [ln for ln in lines if "isbn" not in ln.lower()]
                        lines.append(f"ISBN {isbn}")
                        infos.append((f"ISBN {isbn}", 1.0, 0.2))
                return " ".join(lines), lines, infos
            text = eng.read_joined(image)
            return text, ([text] if text else []), []
        if self.ocr_engine == "tesseract":
            try:
                import pytesseract
                from PIL import Image

                text = pytesseract.image_to_string(
                    Image.fromarray(np.clip(image, 0, 255).astype(np.uint8))
                )
                return text, [ln for ln in text.split("\n") if ln.strip()], []
            except ImportError as e:
                raise RuntimeError("tesseract escape hatch unavailable (pytesseract not installed)") from e
        raise ValueError(f"Unsupported OCR engine: {self.ocr_engine}")

    def extract_text_with_ocr(
        self,
        image,
        trace_image: Optional[Dict[str, Any]] = None,
        trace_global: Optional[Dict[str, Any]] = None,
        *,
        step_log: Optional[List[Dict[str, Any]]] = None,
        image_index: Optional[int] = None,
        processed: Optional[Dict[str, Any]] = None,
        lines_out: Optional[List[str]] = None,
        line_infos_out: Optional[List[Any]] = None,
    ) -> str:
        """Single-image OCR with trace events (reference ``:413-561``)."""
        rgb = self._load_rgb(image)
        if trace_image is not None:
            trace_image.setdefault("original_b64", self._to_data_url(rgb))
        proc = processed if processed is not None else self._process_image(rgb)

        if trace_image is not None:
            if "preprocessed" in proc:
                trace_image["preprocessing_steps"] = proc["steps"]
                trace_image["preprocessed_b64"] = self._to_data_url(proc["preprocessed"])
                if step_log is not None:
                    step_log.append(
                        {
                            "step": "preprocess",
                            "image_index": None,
                            "images": {"preprocessed_b64": trace_image.get("preprocessed_b64")},
                            "info": {"steps": proc["steps"]},
                        }
                    )
                if trace_global is not None:
                    self._emit_trace(trace_global)
            if "edge_cropped" in proc:
                trace_image["edge_cropped_b64"] = self._to_data_url(proc["edge_cropped"])
                if step_log is not None:
                    step_log.append(
                        {
                            "step": "edge_crop",
                            "image_index": None,
                            "images": {"edge_cropped_b64": trace_image.get("edge_cropped_b64")},
                        }
                    )
                if trace_global is not None:
                    self._emit_trace(trace_global)
            if "auto_cropped" in proc:
                trace_image["auto_cropped_b64"] = self._to_data_url(proc["auto_cropped"])
                if step_log is not None:
                    step_log.append(
                        {
                            "step": "auto_crop",
                            "image_index": None,
                            "images": {"auto_cropped_b64": trace_image.get("auto_cropped_b64")},
                        }
                    )
                if trace_global is not None:
                    self._emit_trace(trace_global)

        try:
            text, lines, infos = self._ocr_text(proc["final"], image_index)
        except Exception as e:
            print(f"OCR failed: {e}")
            text, lines, infos = "", [], []
        if lines_out is not None:
            lines_out.extend(lines)
        if line_infos_out is not None:
            line_infos_out.extend(infos)

        if trace_image is not None:
            trace_image["ocr_text"] = text
            if step_log is not None:
                step_log.append({"step": "ocr", "image_index": None, "info": {"chars": len(text)}})
            if trace_global is not None:
                self._emit_trace(trace_global)
        return text

    # ------------------------------------------------------------------
    # Main entry point
    # ------------------------------------------------------------------

    def extract_metadata_from_images(
        self,
        images: Sequence,
        ocr_image_indices: Optional[List[int]] = None,
        *,
        capture_trace: bool = False,
        trace_sink: Optional[TraceSink] = None,
    ) -> Dict[str, Any]:
        if not images:
            raise Exception("No image paths provided")

        if ocr_image_indices is None:
            # cover is skipped by default (reference ``:601-603``)
            ocr_image_indices = (
                [1, 2] if len(images) > 2 else [1] if len(images) > 1 else []
            )

        old_sink = self._trace_sink
        if trace_sink is not None:
            self._trace_sink = trace_sink
        try:
            return self._extract(list(images), list(ocr_image_indices), capture_trace)
        finally:
            self._trace_sink = old_sink

    def _extract(self, images: List, ocr_indices: List[int], capture_trace: bool) -> Dict[str, Any]:
        trace: Dict[str, Any] = {"images": [], "steps": []} if capture_trace else {}
        rgbs = [self._load_rgb(p) for p in images]
        processed: Dict[int, Dict[str, Any]] = {}

        if capture_trace:
            for rgb in rgbs:
                trace["images"].append({"original_b64": self._to_data_url(rgb)})
            trace["steps"].append({"step": "seed_images", "info": {"count": len(images)}})
            self._emit_trace(trace)

        # OCR phase: process once per targeted image (device programs).
        ocr_texts: List[str] = []
        ocr_lines: List[str] = []
        ocr_line_infos: List[Any] = []
        for idx in ocr_indices:
            if not (0 <= idx < len(images)):
                continue
            if capture_trace:
                trace["steps"].append({"step": "start_ocr", "image_index": idx})
                self._emit_trace(trace)
            processed[idx] = self._process_image(rgbs[idx])
            text = self.extract_text_with_ocr(
                rgbs[idx],
                trace_image=trace["images"][idx] if capture_trace else None,
                trace_global=trace if capture_trace else None,
                step_log=trace.get("steps") if capture_trace else None,
                image_index=idx,
                processed=processed[idx],
                lines_out=ocr_lines,
                line_infos_out=ocr_line_infos,
            )
            if text.strip():
                if len(text) > self.max_ocr_chars_per_image:
                    # long OCR text is noise for the VLM context: drop it
                    if capture_trace:
                        trace["steps"].append(
                            {
                                "step": "ocr_skip_long",
                                "image_index": idx,
                                "info": {"chars": len(text), "limit": self.max_ocr_chars_per_image},
                            }
                        )
                        img_tr = trace["images"][idx]
                        img_tr["ocr_skipped_long"] = True
                        img_tr["ocr_chars"] = len(text)
                        self._emit_trace(trace)
                else:
                    ocr_texts.append(text)

        # Preview artifacts for non-OCR, non-cover images (UI thumbnails).
        if capture_trace:
            for idx in range(1, len(images)):
                if idx in processed or idx in ocr_indices:
                    continue
                processed[idx] = self._process_image(rgbs[idx])
                tr_img = trace["images"][idx]
                proc = processed[idx]
                if "preprocessed" in proc:
                    tr_img["preprocessing_steps"] = proc["steps"]
                    tr_img["preprocessed_b64"] = self._to_data_url(proc["preprocessed"])
                    trace["steps"].append({"step": "preprocess_preview", "image_index": idx, "info": {"steps": proc["steps"]}})
                if "edge_cropped" in proc:
                    tr_img["edge_cropped_b64"] = self._to_data_url(proc["edge_cropped"])
                    trace["steps"].append({"step": "edge_crop_preview", "image_index": idx})
                if "auto_cropped" in proc:
                    tr_img["auto_cropped_b64"] = self._to_data_url(proc["auto_cropped"])
                    trace["steps"].append({"step": "auto_crop_preview", "image_index": idx})
                self._emit_trace(trace)

        # Debug stub: no model request (reference ``:714-752``).
        if self.debug_autocrop:
            stub = empty_metadata()
            stub["_processing_info"] = {
                "ocr_engine": self.ocr_engine,
                "preprocessing_used": self.use_preprocessing,
                "ocr_images_processed": len(ocr_texts),
                "total_images": len(images),
                "debug_autocrop": True,
                "model_skipped": True,
            }
            if capture_trace:
                stub["_trace"] = dict(trace)
            return stub

        prompt = build_prompt(ocr_texts, self.prompt_template)
        if capture_trace:
            trace["enhanced_prompt"] = prompt
            trace["steps"].append({"step": "build_prompt", "info": {"chars": len(prompt)}})
            self._emit_trace(trace)

        # Heuristic-only backend: structure straight from OCR text, no VLM.
        if self.llm_backend == "heuristic":
            if ocr_line_infos:
                from bbocr_tpu.extract.heuristics import heuristic_extract_lines

                meta = heuristic_extract_lines(ocr_line_infos)
            else:
                meta = heuristic_extract("\n".join(ocr_lines or ocr_texts))
            meta["_processing_info"] = self._processing_info(ocr_texts, images)
            meta["_processing_info"]["structurer"] = "heuristic"
            if capture_trace:
                meta["_trace"] = trace
                self._emit_trace(trace)
            return meta

        # Model inputs: reuse the processed artifacts (no recompute).
        images_b64: List[str] = []
        for idx, rgb in enumerate(rgbs):
            proc = processed.get(idx)
            arr = proc["final"] if proc is not None else rgb
            max_dim = 2000 if idx == 0 else 3200
            quality = 88 if idx == 0 else 95
            images_b64.append(self._encode_jpeg_b64(arr, max_dim, quality))
        if capture_trace:
            trace["steps"].append({"step": "encode_images", "info": {"count": len(images_b64)}})
            self._emit_trace(trace)

        if capture_trace:
            trace["steps"].append(
                {"step": "request_sent", "info": {"model": self.model, "backend": self.llm_backend}}
            )
            self._emit_trace(trace)
        response_text = self._call_llm(prompt, images_b64)
        if capture_trace:
            trace["ollama_raw"] = response_text
            trace["steps"].append({"step": "vlm_raw", "info": {"chars": len(response_text)}})
            self._emit_trace(trace)

        try:
            metadata = repair_and_parse(response_text)
            validate_schema(metadata)
            metadata["_processing_info"] = self._processing_info(ocr_texts, images)
            if capture_trace:
                metadata["_trace"] = trace
                self._emit_trace(trace)
            return metadata
        except json.JSONDecodeError as e:
            fallback = empty_metadata()
            fallback["_processing_info"] = self._processing_info(ocr_texts, images)
            fallback["_processing_info"]["fallback_used"] = True
            fallback["_processing_info"]["ollama_error"] = str(e)
            if capture_trace:
                fallback["_trace"] = trace
                self._emit_trace(trace)
            return fallback
        except Exception as e:
            # schema violation -> hard error (reference ``:1004-1011``)
            if capture_trace:
                self._emit_trace(trace)
            raise Exception(f"JSON validation failed: {e}")

    def _call_llm(self, prompt: str, images_b64: List[str]) -> str:
        from bbocr_tpu.llm import OllamaClient, create_llm_client

        self._last_llm_usage = None
        if self.llm_backend == "ollama":
            client = OllamaClient(self.session, self.ollama_base_url)
            last_err: Optional[Exception] = None
            for attempt in range(3):  # retry-with-backoff (reference ``:844-864``)
                try:
                    return client.generate(self.model, prompt, images_b64, self.llm_timeout_seconds)
                except Exception as e:
                    last_err = e
                    time.sleep(1.0 * (attempt + 1))
            raise Exception(f"Error from Ollama API: {last_err}")
        client = create_llm_client(self.llm_backend, session=self.session)
        out = client.generate(self.model, prompt, images_b64, self.llm_timeout_seconds)
        # per-request cost accounting for metered cloud backends
        # (reference: gradio_GPT/app.py:139-143)
        self._last_llm_usage = getattr(client, "last_usage", None)
        return out

    def _processing_info(self, ocr_texts: List[str], images: Sequence) -> Dict[str, Any]:
        info = {
            "model_used": self.model,
            "llm_backend": self.llm_backend,
            "ocr_engine": self.ocr_engine,
            "preprocessing_used": self.use_preprocessing,
            "ocr_images_processed": len(ocr_texts),
            "total_images": len(images),
        }
        if self._engine is not None and hasattr(self._engine, "timings"):
            try:
                info["engine_timings"] = self._engine.timings()
            except Exception:
                pass
        if getattr(self, "_last_llm_usage", None):
            info["llm_usage"] = self._last_llm_usage
        return info

    # ------------------------------------------------------------------
    # Directory driver
    # ------------------------------------------------------------------

    def process_book_directory(
        self, book_dir: str, ocr_image_indices: Optional[List[int]] = None
    ) -> Dict[str, Any]:
        """All images in a directory, sorted, with the default OCR plan
        (reference ``:1013-1054``)."""
        paths = [
            os.path.join(book_dir, f)
            for f in sorted(os.listdir(book_dir))
            if f.lower().endswith(_IMAGE_EXTS)
        ]
        if not paths:
            raise Exception(f"No image files found in {book_dir}")
        return self.extract_metadata_from_images(paths, ocr_image_indices)


# Process-wide shared engine (the reference caches EasyOCR readers per
# config, ``enhanced_extractor.py:98``; here one engine serves all
# extractors since params are immutable).
_ENGINE_CACHE: Dict[str, Any] = {}


def _shared_engine():
    if "engine" not in _ENGINE_CACHE:
        from bbocr_tpu.runtime import OCREngine

        default_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            "checkpoints",
        )
        ckpt_dir = os.getenv("BB_OCR_CKPT_DIR", default_dir)
        craft_ckpt = os.path.join(ckpt_dir, "craft.npz")
        crnn_ckpt = os.path.join(ckpt_dir, "crnn.npz")
        if os.path.exists(craft_ckpt) and os.path.exists(crnn_ckpt):
            engine = OCREngine.from_checkpoint(craft_ckpt, crnn_ckpt)
        else:
            engine = OCREngine.create()
        if env_flag("BB_OCR_BATCHING", default=True):
            # Coalesce concurrent requests into one device batch
            # (BASELINE config 2 "batched scanner queue").
            from bbocr_tpu.runtime.batching import BatchingOCR

            engine = BatchingOCR(engine)
        _ENGINE_CACHE["engine"] = engine
    return _ENGINE_CACHE["engine"]
