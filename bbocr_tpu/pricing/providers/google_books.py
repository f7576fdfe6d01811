"""Google Books volumes API provider (metadata-only offers).

Query construction mirrors the reference
(``pipeline_demo/pricing_api/pricing_api/providers/google_books.py``):
``isbn:`` term when an ISBN is known, else intitle/inauthor/inpublisher
terms; maxResults=5; optional GOOGLE_BOOKS_API_KEY; volumeInfo mapped into
the offer contract with currency/amount None and source "metadata".
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import httpx

from bbocr_tpu.pricing.parse import make_offer

API_URL = "https://www.googleapis.com/books/v1/volumes"


class GoogleBooksProvider:
    async def lookup(
        self,
        *,
        title: Optional[str],
        authors: List[str],
        isbn_13: Optional[str],
        isbn_10: Optional[str],
        publisher: Optional[str],
        publication_date: Optional[str],
    ) -> List[Dict[str, Any]]:
        terms: List[str] = []
        isbn = isbn_13 or isbn_10
        if isbn:
            terms.append(f"isbn:{isbn}")
        else:
            if title:
                terms.append(f"intitle:{title}")
            if authors:
                terms.append(f"inauthor:{authors[0]}")
            if publisher:
                terms.append(f"inpublisher:{publisher}")
        if not terms:
            return []

        params: Dict[str, Any] = {"q": " ".join(terms), "maxResults": 5}
        api_key = os.getenv("GOOGLE_BOOKS_API_KEY")
        if api_key:
            params["key"] = api_key

        async with httpx.AsyncClient(timeout=8.0) as client:
            resp = await client.get(API_URL, params=params)
            resp.raise_for_status()
            data = resp.json()

        offers: List[Dict[str, Any]] = []
        for item in data.get("items", []) or []:
            info = item.get("volumeInfo", {}) or {}
            ids = {
                d.get("type"): d.get("identifier")
                for d in info.get("industryIdentifiers", []) or []
            }
            offers.append(
                make_offer(
                    "google_books",
                    listing_id=item.get("id"),
                    title=info.get("title"),
                    authors=info.get("authors") or [],
                    publisher=info.get("publisher"),
                    publication_date=info.get("publishedDate"),
                    isbn_13=ids.get("ISBN_13"),
                    isbn_10=ids.get("ISBN_10"),
                    currency=None,
                    amount=None,
                    url=info.get("infoLink") or info.get("canonicalVolumeLink"),
                    source="metadata",
                )
            )
        return offers
