"""The book-metadata JSON contract.

Byte-compatible with the reference's schema
(``pipeline_demo/extractor/enhanced_extractor.py:57-92``) and validation
rules (``process_book_enhanced.py:35-51``) so downstream pricing lookup and
CSV/RPA integrations are untouched (BASELINE.json north star).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jsonschema

METADATA_SCHEMA: Dict[str, Any] = {
    "type": "object",
    "properties": {
        "title": {"type": ["string", "null"]},
        "subtitle": {"type": ["string", "null"]},
        "authors": {"type": "array", "items": {"type": "string"}},
        "publisher": {"type": ["string", "null"]},
        "year": {"type": ["string", "null"]},
        "isbn_10": {"type": ["string", "null"]},
        "isbn_13": {"type": ["string", "null"]},
        "asin": {"type": ["string", "null"]},
        "edition": {"type": ["string", "null"]},
        "binding_type": {"type": ["string", "null"]},
        "language": {"type": ["string", "null"]},
        "page_count": {"type": ["integer", "null"]},
        "categories": {"type": "array", "items": {"type": "string"}},
        "description": {"type": ["string", "null"]},
        "condition_keywords": {"type": "array", "items": {"type": "string"}},
        "price": {
            "type": ["object", "null"],
            "properties": {
                "currency": {"type": ["string", "null"]},
                "amount": {"type": ["number", "null"]},
            },
        },
    },
}

_FIELDS_NULL = (
    "title", "subtitle", "publisher", "year", "isbn_10", "isbn_13",
    "asin", "edition", "binding_type", "language", "page_count",
    "description",
)


def empty_metadata() -> Dict[str, Any]:
    """All-null metadata skeleton (the reference's fallback shape,
    ``enhanced_extractor.py:959-978``)."""
    meta: Dict[str, Any] = {k: None for k in _FIELDS_NULL}
    meta["authors"] = []
    meta["categories"] = []
    meta["condition_keywords"] = []
    meta["price"] = {"currency": None, "amount": None}
    # key ordering follows the schema/prompt contract
    ordered = {
        k: meta[k]
        for k in (
            "title", "subtitle", "authors", "publisher", "year", "isbn_10",
            "isbn_13", "asin", "edition", "binding_type", "language",
            "page_count", "categories", "description", "condition_keywords",
            "price",
        )
    }
    return ordered


def validate_schema(metadata: Dict[str, Any]) -> None:
    """Raises jsonschema.ValidationError on contract violations."""
    jsonschema.validate(instance=metadata, schema=METADATA_SCHEMA)


def validate_metadata(metadata: Dict[str, Any]) -> Tuple[bool, List[str]]:
    """Sanity rules: title required; ISBN-10/13 digit lengths when present
    (reference ``process_book_enhanced.py:35-51``)."""
    issues: List[str] = []
    if not metadata.get("title"):
        issues.append("Missing title")
    isbn_10 = metadata.get("isbn_10")
    if isbn_10 and len(str(isbn_10).replace("-", "").replace(" ", "")) != 10:
        issues.append("ISBN-10 should be 10 characters")
    isbn_13 = metadata.get("isbn_13")
    if isbn_13 and len(str(isbn_13).replace("-", "").replace(" ", "")) != 13:
        issues.append("ISBN-13 should be 13 characters")
    return (len(issues) == 0, issues)
