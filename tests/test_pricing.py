"""Pricing layer: parsers, offer contract, aggregator isolation,
AbeBooks HTML parsing on recorded markup, best-offer selection + merge."""

import asyncio

import pytest

from bbocr_tpu.pricing import aggregate_offers
from bbocr_tpu.pricing.aggregator import DEFAULT_PROVIDERS
from bbocr_tpu.pricing.parse import extract_year, make_offer, parse_amount, parse_price
from bbocr_tpu.pricing.providers.abebooks_html import parse_results_html, score_offer
from bbocr_tpu.pricing.select import (
    fuzzy_title_match,
    merge_offer_into_metadata,
    select_best_offer,
)


class TestParse:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("12", 12.0),
            ("12.50", 12.5),
            ("1,234.56", 1234.56),
            ("1.234,56", 1234.56),
            ("12,50", 12.5),
            ("", None),
            ("abc", None),
        ],
    )
    def test_parse_amount(self, raw, expected):
        assert parse_amount(raw) == expected

    @pytest.mark.parametrize(
        "text,ccy,amt",
        [
            ("US$ 12.34", "USD", 12.34),
            ("$ 9.99 shipping extra", "USD", 9.99),
            ("£5.00", "GBP", 5.0),
            ("12,99 EUR", "EUR", 12.99),
            ("Price: CAD 20", "CAD", 20.0),
            ("no price here", None, None),
        ],
    )
    def test_parse_price(self, text, ccy, amt):
        got_ccy, got_amt = parse_price(text)
        assert got_ccy == ccy
        assert got_amt == amt

    def test_extract_year(self):
        assert extract_year("First published 1987 in London") == "1987"
        assert extract_year("no year") is None

    def test_offer_contract_keys(self):
        offer = make_offer("x")
        assert set(offer) == {
            "provider", "listing_id", "title", "authors", "publisher",
            "publication_date", "isbn_13", "isbn_10", "currency", "amount",
            "url", "source",
        }


class FakeProvider:
    def __init__(self, offers=None, delay=0.0, error=None):
        self._offers = offers or []
        self._delay = delay
        self._error = error

    async def lookup(self, **query):
        if self._delay:
            await asyncio.sleep(self._delay)
        if self._error:
            raise self._error
        return self._offers


class TestAggregator:
    def run(self, coro):
        return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)

    def test_fan_out_and_error_isolation(self, monkeypatch):
        ok = make_offer("fast", listing_id="1", title="T")
        monkeypatch.setitem(DEFAULT_PROVIDERS, "fast", lambda: FakeProvider([ok]))
        monkeypatch.setitem(
            DEFAULT_PROVIDERS, "boom", lambda: FakeProvider(error=RuntimeError("nope"))
        )
        offers, errors = self.run(
            aggregate_offers(title="T", providers=["fast", "boom"])
        )
        assert len(offers) == 1 and offers[0]["provider"] == "fast"
        assert "nope" in errors["boom"]

    def test_timeout_isolated(self, monkeypatch):
        slow = FakeProvider([make_offer("slow", listing_id="s")], delay=2.0)
        monkeypatch.setitem(DEFAULT_PROVIDERS, "slow", lambda: slow)
        offers, errors = self.run(
            aggregate_offers(title="T", providers=["slow"], timeout_seconds=0.05)
        )
        assert offers == []
        assert "timed out" in errors["slow"]

    def test_dedup(self, monkeypatch):
        a = make_offer("dup", listing_id="same", isbn_13="9780306406157")
        monkeypatch.setitem(DEFAULT_PROVIDERS, "dup", lambda: FakeProvider([a, dict(a)]))
        offers, _ = self.run(aggregate_offers(title="T", providers=["dup"]))
        assert len(offers) == 1

    def test_unknown_provider(self):
        offers, errors = self.run(aggregate_offers(title="T", providers=["nope"]))
        assert offers == []
        assert "unknown provider" in errors["nope"]


ABEBOOKS_HTML = """
<html><body><ul>
  <li class="srp-list-item">
    <h2 class="srp-title">The Sea</h2>
    <a class="srp-item-detail-link" href="/servlet/bd123">The Sea</a>
    <span class="srp-author">John Banville</span>
    <span class="srp-item-price">US$ 8.50</span>
    <time itemprop="datePublished" content="2005"></time>
  </li>
  <li class="srp-list-item">
    <h2 class="srp-title">The Sea The Sea</h2>
    <a class="srp-item-detail-link" href="/servlet/bd456">The Sea The Sea</a>
    <span class="srp-author">Iris Murdoch</span>
    <meta itemprop="price" content="12.00">
    <meta itemprop="priceCurrency" content="USD">
    <span>Published: 1978</span>
  </li>
  <li class="srp-list-item">
    <h2 class="srp-title">The Sea</h2>
    <a id="add-to-basket-link-1" href="#" data-csa-c-cost="4.75"
       data-csa-c-purchase-currency="US%24"></a>
    <span>Publication date: 2005</span>
  </li>
</ul></body></html>
"""


class TestAbeBooksParsing:
    def test_cards_parsed_with_fallbacks(self):
        offers = parse_results_html(
            ABEBOOKS_HTML, title="The Sea", primary_author="John Banville", year=None
        )
        assert len(offers) == 3
        first = offers[0]
        assert first["title"] == "The Sea"
        assert first["amount"] == 8.5
        assert first["currency"] == "USD"
        assert first["url"].startswith("https://www.abebooks.com/")
        # microdata price
        murdoch = next(o for o in offers if o["title"] == "The Sea The Sea")
        assert murdoch["amount"] == 12.0
        # add-to-basket fallback
        basket = next(o for o in offers if o["amount"] == 4.75)
        assert basket["currency"] == "USD"

    def test_strict_year_filter(self):
        offers = parse_results_html(
            ABEBOOKS_HTML, title="The Sea", primary_author=None, year="2005"
        )
        assert offers
        assert all(o["publication_date"].find("2005") >= 0 for o in offers)

    def test_scoring_order(self):
        offers = parse_results_html(
            ABEBOOKS_HTML, title="The Sea", primary_author="John Banville", year=None
        )
        # exact title + author beats substring title
        assert offers[0]["authors"] == ["John Banville"]
        s_exact = score_offer(offers[0], "the sea", "john banville", "2005")
        assert s_exact == pytest.approx(3.0 + 1.5 + 1.0)


class TestSelection:
    def offers(self):
        return [
            make_offer("a", listing_id="1", title="Other Book", amount=3.0, currency="USD",
                       publication_date="1999"),
            make_offer("b", listing_id="2", title="The Sea", amount=8.0, currency="USD",
                       publication_date="2005", isbn_13="9780307263117"),
            make_offer("c", listing_id="3", title="The Sea (Vintage)", amount=5.0,
                       currency="USD", publication_date="2005"),
        ]

    def test_isbn_wins(self):
        best, reason = select_best_offer({"title": "X", "isbn_13": "9780307263117"}, self.offers())
        assert best["listing_id"] == "2" and reason == "isbn_exact"

    def test_year_filter_then_title(self):
        best, reason = select_best_offer({"title": "The Sea", "year": "2005"}, self.offers())
        assert best["listing_id"] == "2" and reason == "title_exact"

    def test_fuzzy(self):
        assert fuzzy_title_match("The Sea", "Sea, The (Paperback)")
        best, reason = select_best_offer({"title": "Sea Vintage"}, self.offers())
        assert reason in ("title_fuzzy", "cheapest")

    def test_cheapest_fallback(self):
        best, reason = select_best_offer({"title": "zzz no match"}, self.offers())
        assert reason == "cheapest" and best["amount"] == 3.0

    def test_merge(self):
        meta = {"title": "The Sea", "authors": [], "publisher": None, "year": None,
                "price": {"currency": None, "amount": None}}
        best, _ = select_best_offer({"title": "The Sea", "year": "2005"}, self.offers())
        merged = merge_offer_into_metadata(meta, best)
        assert merged["year"] == "2005"
        assert merged["price"] == {"currency": "USD", "amount": 8.0}
        assert merged["source_provider"] == "b"
        assert merged["info_url"] is None or isinstance(merged["info_url"], str)
        # original scan fields never overwritten
        assert merged["title"] == "The Sea"
