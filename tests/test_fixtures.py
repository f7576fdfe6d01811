"""Recorded-output fixtures as schema ground truth.

The reference commits accepted/priced JSONs under
``pipeline_demo/i2j_ui/data/accepted/`` as living documentation of the
output contract; these tests pin our committed fixtures (``data/accepted/``)
to the metadata schema, the pricing merge invariants, and the server's
accept -> finalize write formats, so contract drift fails CI rather than a
downstream consumer.
"""

import glob
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ACCEPTED = sorted(glob.glob(os.path.join(ROOT, "data", "accepted", "*.json")))
PRICED = sorted(glob.glob(os.path.join(ROOT, "data", "accepted", "priced", "*.json")))


class TestAcceptedFixtures:
    def test_fixtures_exist(self):
        assert ACCEPTED, "no accepted fixtures committed"
        assert PRICED, "no priced fixtures committed"

    @pytest.mark.parametrize("path", ACCEPTED)
    def test_accepted_matches_schema(self, path):
        from bbocr_tpu.extract.schema import validate_schema

        with open(path) as f:
            meta = json.load(f)
        validate_schema(meta)  # raises on mismatch
        info = meta["_processing_info"]
        assert info["ocr_engine"] in ("tpu", "tesseract")
        assert isinstance(info["total_images"], int)

    @pytest.mark.parametrize("path", ACCEPTED)
    def test_trace_previews_are_data_urls(self, path):
        with open(path) as f:
            meta = json.load(f)
        trace = meta.get("_trace") or {}
        for img in trace.get("images", []):
            for field in ("original_b64", "preprocessed_b64"):
                if img.get(field):
                    assert img[field].startswith("data:image/")

    @pytest.mark.parametrize("path", PRICED)
    def test_priced_adds_price_at_pricing_step_only(self, path):
        """The merge contract: price/info_url/source_provider are set by the
        pricing finalize step (reference pricing SPA ``pick()`` semantics:
        metadata fields fill nulls from the best offer, price is only ever
        added at pricing time)."""
        with open(path) as f:
            meta = json.load(f)
        price = meta["price"]
        assert set(price) == {"currency", "amount"}
        assert isinstance(price["amount"], (int, float)) or price["amount"] is None
        assert meta["source_provider"]
        assert meta["info_url"].startswith("http")

    @pytest.mark.parametrize("path", PRICED)
    def test_priced_still_schema_valid(self, path):
        """Extra pricing keys must not break schema validation (the schema
        allows additional properties like the reference's)."""
        from bbocr_tpu.extract.schema import validate_schema

        with open(path) as f:
            meta = json.load(f)
        validate_schema(meta)


class TestSelectMergeAgainstFixture:
    def test_select_and_merge_reproduces_priced_fixture_shape(self):
        """Run the real server-side best-offer selection + merge on a
        recorded offer and check it produces the committed priced shape."""
        from bbocr_tpu.pricing.select import merge_offer_into_metadata, select_best_offer

        with open(os.path.join(ROOT, "data", "accepted", "example_parrish.json")) as f:
            meta = {k: v for k, v in json.load(f).items() if not k.startswith("_")}
        offers = [
            {
                "provider": "abebooks", "listing_id": "x1",
                "title": "Beyond the Frontier",
                "authors": ["Randall Parrish"],
                "publisher": "A. L. Burt Company",
                "publication_date": "1915",
                "isbn_13": None, "isbn_10": None,
                "currency": "USD", "amount": 14.5,
                "url": "https://www.abebooks.com/servlet/SearchResults?kn=Beyond+the+Frontier",
                "source": "listing",
            },
            {
                "provider": "google_books", "listing_id": "g1",
                "title": "Beyond the Frontier", "authors": ["Randall Parrish"],
                "publisher": None, "publication_date": "1915",
                "isbn_13": None, "isbn_10": None,
                "currency": None, "amount": None,
                "url": "https://books.google.com/x", "source": "metadata",
            },
        ]
        best, reason = select_best_offer(meta, offers)
        assert best["provider"] == "abebooks"  # priced listing beats metadata
        assert reason in ("title_exact", "title_fuzzy")
        merged = merge_offer_into_metadata(meta, best)
        assert merged["price"] == {"currency": "USD", "amount": 14.5}
        assert merged["source_provider"] == "abebooks"
        assert merged["info_url"].startswith("https://www.abebooks.com")
        # fill-nulls semantics: existing fields preserved
        assert merged["publisher"] == "A. L. Burt Company"
