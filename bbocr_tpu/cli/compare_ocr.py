"""OCR engine bake-off harness.

Role of the reference's OCR comparison suite
(``pipeline_components/img_to_json/ocr_testing/ocr_engines/compare_ocr_engines.py``):
run each available engine (tpu, tesseract when installed) over images with
and without preprocessing, record wall time, text yield and the heuristic
metadata extraction, and persist a comparison JSON per image.

    python -m bbocr_tpu.cli.compare_ocr books/1/IMG_0002.jpg --out results/
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Any, Dict

import numpy as np


def _engines():
    out = ["tpu"]
    try:
        import pytesseract  # noqa: F401

        out.append("tesseract")
    except ImportError:
        pass
    return out


def run_engine(engine: str, image: np.ndarray) -> Dict[str, Any]:
    t0 = time.time()
    try:
        if engine == "tpu":
            from bbocr_tpu.extract.extractor import _shared_engine

            text = _shared_engine().read_joined(image)
        elif engine == "tesseract":
            import pytesseract
            from PIL import Image

            text = pytesseract.image_to_string(
                Image.fromarray(np.clip(image, 0, 255).astype(np.uint8))
            )
        else:
            raise ValueError(engine)
        err = None
    except Exception as e:
        text, err = "", str(e)
    elapsed = time.time() - t0
    from bbocr_tpu.extract import heuristic_extract

    return {
        "processing_time": round(elapsed, 3),
        "text_length": len(text),
        "text": text[:2000],
        "heuristic_metadata": {
            k: v for k, v in heuristic_extract(text).items() if v not in (None, [], {})
        },
        "error": err,
    }


def compare_image(path: str, preprocess: bool = True) -> Dict[str, Any]:
    from PIL import Image

    rgb = np.asarray(Image.open(path).convert("RGB"), np.float32)
    variants: Dict[str, np.ndarray] = {"raw": rgb}
    if preprocess:
        import jax.numpy as jnp

        from bbocr_tpu.preprocess import preprocess_for_book_cover

        pre, _ = preprocess_for_book_cover(jnp.asarray(rgb))
        variants["preprocessed"] = np.asarray(pre)

    report: Dict[str, Any] = {"image": path}
    for variant, img in variants.items():
        for engine in _engines():
            report[f"{engine}_{variant}"] = run_engine(engine, img)
    return report


def main():
    p = argparse.ArgumentParser(description="Compare OCR engines on images")
    p.add_argument("images", nargs="+")
    p.add_argument("--no-preprocess", action="store_true")
    p.add_argument("--out", default=None, help="directory for per-image JSON reports")
    args = p.parse_args()
    for path in args.images:
        report = compare_image(path, preprocess=not args.no_preprocess)
        summary = {
            k: {"time_s": v["processing_time"], "chars": v["text_length"]}
            for k, v in report.items()
            if isinstance(v, dict)
        }
        print(os.path.basename(path), json.dumps(summary))
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            name = os.path.splitext(os.path.basename(path))[0]
            with open(os.path.join(args.out, f"ocr_comparison_{name}.json"), "w") as f:
                json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
