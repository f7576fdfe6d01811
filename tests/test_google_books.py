"""Recorded-JSON contract tests for the google_books provider.

The reference contract (``pipeline_demo/pricing_api/pricing_api/providers/
google_books.py:9-65``): every known field becomes a query term
(isbn:/intitle:/inauthor:/inpublisher:), plus-joined with spaces replaced;
maxResults=5; volumeInfo mapped into the offer dict with metadata extras.
The fixture below is a trimmed real-shaped volumes API response.
"""

import asyncio

import pytest

import bbocr_tpu.pricing.providers.google_books as gb

RECORDED = {
    "kind": "books#volumes",
    "totalItems": 2,
    "items": [
        {
            "id": "zyTCAlFPjgYC",
            "selfLink": "https://www.googleapis.com/books/v1/volumes/zyTCAlFPjgYC",
            "volumeInfo": {
                "title": "The Google Story",
                "authors": ["David A. Vise", "Mark Malseed"],
                "publisher": "Random House Digital, Inc.",
                "publishedDate": "2005-11-15",
                "description": "Here is the story behind one of the most remarkable Internet successes of our time.",
                "industryIdentifiers": [
                    {"type": "ISBN_10", "identifier": "055380457X"},
                    {"type": "ISBN_13", "identifier": "9780553804577"},
                ],
                "pageCount": 207,
                "categories": ["Browsers (Computer programs)"],
                "language": "en",
                "infoLink": "https://books.google.com/books?id=zyTCAlFPjgYC",
            },
        },
        {
            "id": "noIdInfoLink",
            "selfLink": "https://www.googleapis.com/books/v1/volumes/noIdInfoLink",
            "volumeInfo": {
                "title": "Untitled Companion",
                "industryIdentifiers": [],
            },
        },
    ],
}


class _FakeResponse:
    def __init__(self, payload):
        self._payload = payload

    def raise_for_status(self):
        pass

    def json(self):
        return self._payload


class _FakeAsyncClient:
    captured = {}

    def __init__(self, timeout=None):
        _FakeAsyncClient.captured["timeout"] = timeout

    async def __aenter__(self):
        return self

    async def __aexit__(self, *a):
        return False

    async def get(self, url, params=None):
        _FakeAsyncClient.captured["url"] = url
        _FakeAsyncClient.captured["params"] = params
        return _FakeResponse(RECORDED)


@pytest.fixture
def fake_client(monkeypatch):
    _FakeAsyncClient.captured = {}
    monkeypatch.setattr(gb.httpx, "AsyncClient", _FakeAsyncClient)
    return _FakeAsyncClient.captured


def _lookup(**kw):
    base = dict(title=None, authors=[], isbn_13=None, isbn_10=None,
                publisher=None, publication_date=None)
    base.update(kw)
    return asyncio.run(gb.GoogleBooksProvider().lookup(**base))


def test_query_grammar_all_terms(fake_client):
    _lookup(title="The Google Story", authors=["David Vise", "Mark Malseed"],
            isbn_13="9780553804577", isbn_10="055380457X",
            publisher="Random House")
    q = fake_client["params"]["q"]
    assert q == (
        "isbn:9780553804577+isbn:055380457X+intitle:The+Google+Story"
        "+inauthor:David+Vise+inauthor:Mark+Malseed+inpublisher:Random+House"
    )
    assert fake_client["params"]["maxResults"] == 5


def test_offer_mapping_with_extras(fake_client):
    offers = _lookup(title="The Google Story")
    assert len(offers) == 2
    o = offers[0]
    assert o["provider"] == "google_books"
    assert o["listing_id"] == "zyTCAlFPjgYC"
    assert o["isbn_13"] == "9780553804577" and o["isbn_10"] == "055380457X"
    assert o["currency"] is None and o["amount"] is None
    assert o["source"] == "metadata"
    assert o["url"] == "https://books.google.com/books?id=zyTCAlFPjgYC"
    # reference enrichment extras (google_books.py:54-58)
    assert o["page_count"] == 207
    assert o["language"] == "en"
    assert o["categories"] == ["Browsers (Computer programs)"]
    # selfLink fallback when infoLink missing
    assert offers[1]["url"].endswith("/volumes/noIdInfoLink")
    assert offers[1]["authors"] == []


def test_api_key_param(fake_client, monkeypatch):
    monkeypatch.setenv("GOOGLE_BOOKS_API_KEY", "sekrit")
    _lookup(title="x")
    assert fake_client["params"]["key"] == "sekrit"


def test_empty_query_short_circuits(fake_client):
    offers = _lookup()
    assert offers == []
    assert "params" not in fake_client  # no HTTP call made
