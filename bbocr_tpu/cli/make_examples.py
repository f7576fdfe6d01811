"""Generate synthetic example books (cover/title/copyright photo sets).

The reference ships real book photos as its examples/fixtures
(``pipeline_components/img_to_json/ollama_to_JSON/books/<id>/``); those are
data, not code, and are not copied. This generator renders equivalent photo
sets with known ground truth, powering the UI "Examples" dropdown, the CER
harness, and batch-CLI smoke runs.

    python -m bbocr_tpu.cli.make_examples --out books --count 5
"""

from __future__ import annotations

import argparse
import json
import os
import random

import numpy as np
from PIL import Image, ImageDraw, ImageFont

_FONTS_BOLD = "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf"
_FONTS_REG = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
_FONTS_SERIF = "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf"

_TITLES = [
    ("The Silent River", "Maria Keller"),
    ("Garden of Hours", "Thomas Wren"),
    ("A History of Light", "Elena Park"),
    ("The Last Cartographer", "Samuel Reyes"),
    ("Winter Letters", "Anne Whitfield"),
    ("Stone and Salt", "David Okafor"),
    ("The Collected Essays", "J. M. Harlan"),
    ("Field Notes from the North", "Iris Chen"),
]
_PUBLISHERS = ["Harbor Press", "Meridian Books", "Bluestone Publishing", "Atlas House"]


def _isbn13(rng: random.Random) -> str:
    core = "978" + "".join(str(rng.randint(0, 9)) for _ in range(9))
    check = (10 - sum(int(c) * (1 if i % 2 == 0 else 3) for i, c in enumerate(core)) % 10) % 10
    return core + str(check)


def _photo(img: Image.Image, rng: random.Random) -> Image.Image:
    """Make a rendered page look photographed: slight rotation + noise."""
    img = img.rotate(rng.uniform(-2.0, 2.0), expand=False, fillcolor=(210, 205, 196))
    arr = np.asarray(img).astype(np.int16)
    noise = np.random.default_rng(rng.randint(0, 1 << 31)).normal(0, 5, arr.shape)
    return Image.fromarray(np.clip(arr + noise, 0, 255).astype(np.uint8))


def make_book(out_dir: str, idx: int, seed: int) -> dict:
    rng = random.Random(seed)
    title, author = _TITLES[idx % len(_TITLES)]
    publisher = rng.choice(_PUBLISHERS)
    year = str(rng.randint(1965, 2022))
    isbn = _isbn13(rng)
    size = (600, 800)
    bg = (rng.randint(215, 245), rng.randint(210, 240), rng.randint(200, 230))
    big = ImageFont.truetype(_FONTS_BOLD, 48)
    mid = ImageFont.truetype(_FONTS_SERIF, 30)
    small = ImageFont.truetype(_FONTS_REG, 24)

    cover = Image.new("RGB", size, bg)
    d = ImageDraw.Draw(cover)
    d.text((60, 180), title, fill=(30, 30, 50), font=big)
    d.text((60, 420), author, fill=(50, 50, 70), font=mid)

    title_page = Image.new("RGB", size, (245, 242, 235))
    d = ImageDraw.Draw(title_page)
    d.text((60, 200), title, fill=(25, 25, 25), font=big)
    d.text((60, 330), author, fill=(40, 40, 40), font=mid)
    d.text((60, 620), publisher, fill=(60, 60, 60), font=small)

    copyright_page = Image.new("RGB", size, (245, 242, 235))
    d = ImageDraw.Draw(copyright_page)
    lines = [
        f"Copyright {year} by {author}",
        "All rights reserved.",
        f"Published by {publisher}",
        f"First edition {year}",
        f"ISBN {isbn}",
        "Printed in the United States",
    ]
    y = 180
    for ln in lines:
        d.text((60, y), ln, fill=(35, 35, 35), font=small)
        y += 60

    book_dir = os.path.join(out_dir, str(idx + 1))
    os.makedirs(book_dir, exist_ok=True)
    for i, page in enumerate((cover, title_page, copyright_page)):
        _photo(page, rng).save(os.path.join(book_dir, f"IMG_{i:04d}.jpg"), quality=92)

    truth = {
        "title": title,
        "authors": [author],
        "publisher": publisher,
        "year": year,
        "isbn_13": isbn,
    }
    with open(os.path.join(book_dir, "ground_truth.json"), "w") as f:
        json.dump(truth, f, indent=2)
    return truth


def main():
    p = argparse.ArgumentParser(description="Render synthetic example books")
    p.add_argument("--out", default="books")
    p.add_argument("--count", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    for i in range(args.count):
        truth = make_book(args.out, i, args.seed + i)
        print(f"book {i + 1}: {truth['title']} ({truth['year']}) {truth['isbn_13']}")


if __name__ == "__main__":
    main()
