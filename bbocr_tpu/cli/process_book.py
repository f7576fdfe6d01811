"""Single-book CLI driver.

Role of the reference's ``pipeline_demo/extractor/process_book_enhanced.py``:
resolve ``books/<id>/``, run the extractor, validate, save
``book_<id>_enhanced.json``, print a summary; ``--model list`` queries the
local Ollama tags endpoint.

    python -m bbocr_tpu.cli.process_book 3 --llm-backend heuristic
    python -m bbocr_tpu.cli.process_book --book-dir path/to/book
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Optional

from bbocr_tpu.extract import BookMetadataExtractor, validate_metadata


def find_books_dir(explicit: Optional[str] = None) -> Optional[str]:
    if explicit:
        return explicit if os.path.isdir(explicit) else None
    for cand in ("books", os.path.join("..", "books")):
        if os.path.isdir(cand):
            return cand
    return None


def list_ollama_models() -> int:
    import requests

    try:
        resp = requests.get("http://localhost:11434/api/tags", timeout=5)
        for m in resp.json().get("models", []):
            print(m.get("name"))
        return 0
    except Exception as e:
        print(f"Could not list Ollama models: {e}", file=sys.stderr)
        return 1


def process_book(
    book_dir: str,
    *,
    extractor: Optional[BookMetadataExtractor] = None,
    output_dir: str = "output",
    ocr_indices=None,
    **extractor_kwargs,
) -> dict:
    """Run one book directory through the pipeline and persist the result."""
    ext = extractor or BookMetadataExtractor(**extractor_kwargs)
    t0 = time.time()
    metadata = ext.process_book_directory(book_dir, ocr_indices)
    elapsed = time.time() - t0

    ok, issues = validate_metadata(metadata)
    book_id = os.path.basename(os.path.normpath(book_dir))
    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(output_dir, f"book_{book_id}_enhanced.json")
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(metadata, f, indent=2, ensure_ascii=False)

    print(f"book {book_id}: {elapsed:.2f}s -> {out_path}")
    print(f"  title:   {metadata.get('title')}")
    print(f"  authors: {', '.join(metadata.get('authors') or []) or None}")
    print(f"  year:    {metadata.get('year')}  isbn13: {metadata.get('isbn_13')}")
    if not ok:
        print(f"  validation issues: {issues}")
    return metadata


def main():
    p = argparse.ArgumentParser(description="Process one book photo set -> metadata JSON")
    p.add_argument("book_id", nargs="?", help="book id under the books dir")
    p.add_argument("--book-dir", help="explicit book directory")
    p.add_argument("--books-dir", help="root directory holding book subdirs")
    p.add_argument("--model", default="gemma3:4b")
    p.add_argument("--llm-backend", default="ollama",
                   choices=["ollama", "openai", "gemini", "heuristic", "tpu"])
    p.add_argument("--ocr-engine", default="tpu", choices=["tpu", "tesseract"])
    p.add_argument("--no-preprocessing", action="store_true")
    p.add_argument("--crop-ocr", action="store_true")
    p.add_argument("--crop-margin", type=int, default=16)
    p.add_argument("--edge-crop", type=float, default=0.0)
    p.add_argument("--no-warm-model", action="store_true")
    p.add_argument("--ocr-indices", type=int, nargs="+")
    p.add_argument("--output-dir", default="output")
    p.add_argument("--auto-rotate", action="store_true",
                   help="re-read each photo at 4 rotations, keep the most "
                        "confident (for sideways camera photos)")
    args = p.parse_args()

    if args.model == "list":
        sys.exit(list_ollama_models())

    if args.book_dir:
        book_dir = args.book_dir
    else:
        if not args.book_id:
            p.error("provide a book_id or --book-dir")
        root = find_books_dir(args.books_dir)
        if root is None:
            p.error("no books directory found (use --books-dir)")
        book_dir = os.path.join(root, args.book_id)
    if not os.path.isdir(book_dir):
        p.error(f"not a directory: {book_dir}")

    try:
        process_book(
            book_dir,
            output_dir=args.output_dir,
            ocr_indices=args.ocr_indices,
            model=args.model,
            llm_backend=args.llm_backend,
            ocr_engine=args.ocr_engine,
            use_preprocessing=not args.no_preprocessing,
            crop_for_ocr=args.crop_ocr,
            crop_margin=args.crop_margin,
            edge_crop_percent=args.edge_crop,
            warm_model=not args.no_warm_model,
            auto_rotate=args.auto_rotate,
        )
    except Exception as e:
        print(f"Error: {e}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
