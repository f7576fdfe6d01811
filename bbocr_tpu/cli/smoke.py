"""End-to-end smoke runner.

Role of the reference's ``run_enhanced_test.py``: generate (or pick) a book
photo set, push it through the full pipeline via the CLI driver, and assert
an output JSON lands with the expected contract. Exit code 0 = healthy.

    python -m bbocr_tpu.cli.smoke            # synthetic book, heuristic path
    python -m bbocr_tpu.cli.smoke --books-dir books --llm-backend ollama
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile


def main() -> int:
    p = argparse.ArgumentParser(description="Pipeline smoke test")
    p.add_argument("--books-dir", default=None, help="existing books dir (default: render one)")
    p.add_argument("--llm-backend", default="heuristic")
    p.add_argument("--ocr-engine", default="tpu")
    args = p.parse_args()

    workdir = tempfile.mkdtemp(prefix="bbocr_smoke_")
    books_dir = args.books_dir
    if books_dir is None:
        from bbocr_tpu.cli.make_examples import make_book

        books_dir = os.path.join(workdir, "books")
        make_book(books_dir, 0, seed=42)
        print(f"rendered synthetic book -> {books_dir}/1")

    book_id = sorted(
        d for d in os.listdir(books_dir) if os.path.isdir(os.path.join(books_dir, d))
    )[0]

    from bbocr_tpu.cli.process_book import process_book

    out_dir = os.path.join(workdir, "output")
    metadata = process_book(
        os.path.join(books_dir, book_id),
        output_dir=out_dir,
        llm_backend=args.llm_backend,
        ocr_engine=args.ocr_engine,
        warm_model=False,
    )

    out_path = os.path.join(out_dir, f"book_{book_id}_enhanced.json")
    ok = True
    if not os.path.isfile(out_path):
        print("FAIL: output JSON missing")
        ok = False
    else:
        with open(out_path) as f:
            saved = json.load(f)
        for key in ("title", "authors", "isbn_13", "_processing_info"):
            if key not in saved:
                print(f"FAIL: contract key missing: {key}")
                ok = False
    if metadata.get("_processing_info", {}).get("total_images") != 3:
        print("FAIL: expected 3 images processed")
        ok = False
    print("SMOKE PASS" if ok else "SMOKE FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
