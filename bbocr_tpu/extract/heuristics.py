"""Regex/heuristic OCR-text -> metadata structurer (no LLM).

Role of the reference's heuristics extractor
(``pipeline_components/img_to_json/ocr_testing/hueristics/book_extractor.py``),
rebuilt with stricter logic: checksum-validated ISBN-10/13 (the reference
only pattern-matches), imprint-aware year picking, publisher suffix +
known-list matching, price/currency, and first-lines title/author fallback.

This is the default low-latency structurer on the TPU serving path — the
p50 < 150 ms budget has no room for a VLM round trip (SURVEY.md §7 "Latency
budget"); the VLM remains the async enrichment path.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

from bbocr_tpu.extract.schema import empty_metadata

_ISBN13_RE = re.compile(r"(?<!\d)(97[89][- ]?(?:\d[- ]?){9}\d)(?!\d)")
_ISBN10_RE = re.compile(r"(?<![\dX])((?:\d[- ]?){9}[\dXx])(?![\dX])")
_YEAR_IMPRINT_RE = re.compile(
    r"(?:©|\(c\)|copyright|published|printed|edition)[^\d]{0,20}((?:1[5-9]|20)\d{2})",
    re.IGNORECASE,
)
_YEAR_RE = re.compile(r"\b((?:1[5-9]|20)\d{2})\b")
_PRICE_RE = re.compile(r"(?:\$|USD|£|GBP|€|EUR)\s*(\d+(?:[.,]\d{1,2})?)|(\d+(?:[.,]\d{1,2})?)\s*(?:\$|USD|£|GBP|€|EUR)")
_CURRENCY_RE = re.compile(r"(\$|USD|£|GBP|€|EUR)")
_PUBLISHER_SUFFIX_RE = re.compile(
    r"\b([A-Z][A-Za-z&.' -]{2,40}?(?:Press|Publishing|Publishers|Publications|Books|House|Editions))\b"
)
# "by <Name Name>": same line only, and not the imprint's "published by"
_AUTHOR_BY_RE = re.compile(
    r"(?<![Pp]ublished )(?<![Pp]rinted )\bby[ \t]+"
    r"([A-Z][a-z]+(?:[ \t]+[A-Z]\.?)?(?:[ \t]+[A-Z][a-z]+)+)"
)
_EDITION_RE = re.compile(
    r"\b((?:first|second|third|fourth|fifth|1st|2nd|3rd|\d+th|revised|limited|special)\s+(?:edition|printing|impression))\b",
    re.IGNORECASE,
)

KNOWN_PUBLISHERS = (
    "Penguin", "Random House", "HarperCollins", "Simon & Schuster", "Hachette",
    "Macmillan", "Scholastic", "Wiley", "Oxford University Press",
    "Cambridge University Press", "MIT Press", "Pearson", "McGraw-Hill",
    "Bloomsbury", "Vintage", "Knopf", "Bantam", "Ballantine", "Del Rey",
    "Tor", "Orbit", "DAW", "Baen", "Ace", "Pocket Books", "Doubleday",
    "Houghton Mifflin", "Farrar", "Norton", "Viking", "Harper & Row",
)

_CURRENCY_MAP = {"$": "USD", "USD": "USD", "£": "GBP", "GBP": "GBP", "€": "EUR", "EUR": "EUR"}


def _clean_isbn(raw: str) -> str:
    return re.sub(r"[- ]", "", raw).upper()


def isbn10_valid(isbn: str) -> bool:
    if len(isbn) != 10 or not re.fullmatch(r"\d{9}[\dX]", isbn):
        return False
    total = sum((10 - i) * (10 if c == "X" else int(c)) for i, c in enumerate(isbn))
    return total % 11 == 0


def isbn13_valid(isbn: str) -> bool:
    if len(isbn) != 13 or not isbn.isdigit():
        return False
    total = sum(int(c) * (1 if i % 2 == 0 else 3) for i, c in enumerate(isbn))
    return total % 10 == 0


def isbn10_to_13(isbn10: str) -> Optional[str]:
    if not isbn10_valid(isbn10):
        return None
    core = "978" + isbn10[:9]
    check = (10 - sum(int(c) * (1 if i % 2 == 0 else 3) for i, c in enumerate(core)) % 10) % 10
    return core + str(check)


def find_isbns(text: str) -> Dict[str, Optional[str]]:
    isbn_13 = None
    isbn_10 = None
    for m in _ISBN13_RE.finditer(text):
        cand = _clean_isbn(m.group(1))
        if isbn13_valid(cand):
            isbn_13 = cand
            break
    for m in _ISBN10_RE.finditer(text):
        cand = _clean_isbn(m.group(1))
        if cand.startswith(("978", "979")):
            continue  # fragment of an ISBN-13
        if isbn10_valid(cand):
            isbn_10 = cand
            break
    if isbn_13 is None and isbn_10 is not None:
        isbn_13 = isbn10_to_13(isbn_10)
    return {"isbn_10": isbn_10, "isbn_13": isbn_13}


def find_year(text: str) -> Optional[str]:
    m = _YEAR_IMPRINT_RE.search(text)
    if m:
        return m.group(1)
    years = _YEAR_RE.findall(text)
    if years:
        # latest plausible year ~ the printing of this copy
        return max(years)
    return None


_PUBLISHED_BY_RE = re.compile(
    r"published by[ \t]+([A-Z][A-Za-z&.' -]{2,40}?)[ \t]*(?:$|[\n,.])",
    re.IGNORECASE | re.MULTILINE,
)


def find_publisher(text: str) -> Optional[str]:
    m = _PUBLISHED_BY_RE.search(text)
    if m:
        tail = m.group(1).strip()
        # trim to the imprint-suffix phrase when present ("Acme Press in
        # London" -> "Acme Press"); otherwise keep the whole name
        suffix = _PUBLISHER_SUFFIX_RE.search(tail)
        return suffix.group(1).strip() if suffix else tail
    m = _PUBLISHER_SUFFIX_RE.search(text)
    if m:
        return m.group(1).strip()
    for pub in KNOWN_PUBLISHERS:
        if re.search(r"\b" + re.escape(pub) + r"\b", text, re.IGNORECASE):
            return pub
    return None


def find_price(text: str) -> Dict[str, Any]:
    m = _PRICE_RE.search(text)
    if not m:
        return {"currency": None, "amount": None}
    amount = next(g for g in m.groups() if g)
    cur = _CURRENCY_RE.search(m.group(0))
    return {
        "currency": _CURRENCY_MAP.get(cur.group(1)) if cur else None,
        "amount": float(amount.replace(",", ".")),
    }


def heuristic_extract(text: str) -> Dict[str, Any]:
    """OCR text -> metadata dict in the standard schema (all heuristic)."""
    meta = empty_metadata()
    if not text or not text.strip():
        return meta

    meta.update(find_isbns(text))
    meta["year"] = find_year(text)
    meta["publisher"] = find_publisher(text)
    meta["price"] = find_price(text)

    m = _EDITION_RE.search(text)
    if m:
        meta["edition"] = m.group(1)

    m = _AUTHOR_BY_RE.search(text)
    if m:
        meta["authors"] = [m.group(1)]

    lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
    if not lines:
        lines = [s.strip() for s in re.split(r"[.!?]|\s{2,}", text) if s.strip()]
    if lines:
        # first non-numeric-ish line as the title candidate
        for ln in lines:
            if len(ln) >= 3 and not ln.replace(" ", "").isdigit():
                meta["title"] = ln
                break
    if not meta["authors"] and len(lines) > 1 and meta["title"] in lines:
        idx = lines.index(meta["title"])
        for cand in lines[idx + 1 : idx + 4]:
            if _plausible_author(cand):
                meta["authors"] = [cand]
                break
    return meta


_NON_AUTHOR_RE = re.compile(
    r"press|publish|books|house|editions|copyright|rights|reserved|printed"
    r"|edition|impression|isbn|chapter|volume|first|all\b",
    re.IGNORECASE,
)


def _plausible_author(line: str) -> bool:
    """A name-like line: 1-5 words, no digits, no imprint vocabulary."""
    line = line.strip()
    if not (0 < len(line) <= 60) or any(ch.isdigit() for ch in line):
        return False
    if _NON_AUTHOR_RE.search(line):
        return False
    words = line.split()
    return 1 <= len(words) <= 5
