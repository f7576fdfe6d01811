"""Extraction-layer contract tests: schema, JSON repair, heuristics, the
extractor pipeline with a stubbed LLM, and trace structure."""

import json

import numpy as np
import pytest

from bbocr_tpu.extract import (
    METADATA_SCHEMA,
    BookMetadataExtractor,
    build_prompt,
    empty_metadata,
    heuristic_extract,
    repair_and_parse,
    validate_metadata,
)
from bbocr_tpu.extract.schema import validate_schema


class FakeEngine:
    """Stands in for the TPU OCR engine (plumbing tests only)."""

    def __init__(self, text="ISBN 978-0-306-40615-7 Penguin Books 1984"):
        self.text = text
        self.calls = 0

    def read_joined(self, image):
        self.calls += 1
        return self.text


def make_extractor(**kw):
    kw.setdefault("warm_model", False)
    kw.setdefault("engine", FakeEngine())
    return BookMetadataExtractor(**kw)


def fake_images(n=3, h=64, w=48):
    rng = np.random.default_rng(0)
    return [rng.integers(0, 255, (h, w, 3)).astype(np.uint8) for _ in range(n)]


class TestSchema:
    def test_empty_metadata_validates(self):
        validate_schema(empty_metadata())

    def test_validate_metadata_rules(self):
        ok, issues = validate_metadata({"title": "X", "isbn_10": "0306406152", "isbn_13": "9780306406157"})
        assert ok and not issues
        ok, issues = validate_metadata({"title": None})
        assert not ok and "Missing title" in issues
        ok, issues = validate_metadata({"title": "X", "isbn_10": "123"})
        assert not ok and any("ISBN-10" in i for i in issues)


class TestJsonRepair:
    def test_fenced_json(self):
        raw = 'Sure! ```json\n{"title": "T", "authors": []}\n``` hope that helps'
        assert repair_and_parse(raw)["title"] == "T"

    def test_placeholders_nulled(self):
        raw = '{"title": "T", "year": "YYYY | null", "subtitle": "string | null", "page_count": "integer | null"}'
        meta = repair_and_parse(raw)
        assert meta["year"] is None and meta["subtitle"] is None and meta["page_count"] is None

    def test_brace_slicing(self):
        raw = 'prefix {"title": "T"} suffix'
        assert repair_and_parse(raw) == {"title": "T"}

    def test_unparseable_raises(self):
        with pytest.raises(json.JSONDecodeError):
            repair_and_parse("no json here")


class TestPrompt:
    def test_ocr_context_appended(self):
        p = build_prompt(["line one", "line two"])
        assert "ADDITIONAL OCR CONTEXT" in p
        assert "Page 2 OCR Text:\nline one" in p
        assert "Page 3 OCR Text:\nline two" in p

    def test_no_context(self):
        p = build_prompt([])
        assert "ADDITIONAL OCR CONTEXT" not in p
        assert '"isbn_13": "string | null"' in p


class TestHeuristics:
    def test_isbn13_checksum(self):
        meta = heuristic_extract("ISBN 978-0-306-40615-7")
        assert meta["isbn_13"] == "9780306406157"
        # invalid checksum rejected
        meta = heuristic_extract("ISBN 978-0-306-40615-8")
        assert meta["isbn_13"] is None

    def test_isbn10_and_conversion(self):
        meta = heuristic_extract("ISBN 0-306-40615-2")
        assert meta["isbn_10"] == "0306406152"
        assert meta["isbn_13"] == "9780306406157"

    def test_year_imprint_priority(self):
        meta = heuristic_extract("First published 1990. This edition (c) 1975 reprint 2003")
        assert meta["year"] == "1990"

    def test_publisher(self):
        assert heuristic_extract("Published by Acme Press in London")["publisher"].endswith("Press")
        assert heuristic_extract("a PENGUIN paperback")["publisher"] == "Penguin"

    def test_price_and_title(self):
        meta = heuristic_extract("The Great Title\nJohn Smith\n$12.99")
        assert meta["title"] == "The Great Title"
        assert meta["price"]["amount"] == 12.99
        assert meta["price"]["currency"] == "USD"
        assert meta["authors"] == ["John Smith"]

    def test_empty(self):
        assert heuristic_extract("")["title"] is None

    def test_fuzzy_imprint_rejection(self):
        from bbocr_tpu.extract.heuristics import _looks_like_imprint

        # OCR-garbled imprint words (real reads from the photo corpus)
        assert _looks_like_imprint("First Ase Prinling Outher 1977")
        assert _looks_like_imprint("Published Simencony In Camdn")
        assert _looks_like_imprint("Copyrighted in Grost Brs")
        assert _looks_like_imprint("A. C. MeClrs & Co.")
        # real title words within edit-2 of imprint vocabulary must survive
        assert not _looks_like_imprint("J Bevond the Pronter")
        assert not _looks_like_imprint("The Winter Palace")
        # bare month names occur in real titles; months are imprint evidence
        # only when the line also carries a digit ("October 1899" = a date)
        assert not _looks_like_imprint("October Sky")
        assert not _looks_like_imprint("The Hunt for Red October")
        assert _looks_like_imprint("Octuber 1899")
        assert _looks_like_imprint("September 1, 1923")

    def test_lines_title_assembles_wrapped_title_block(self):
        """Display titles wrap across detection lines; adjacent same-height
        title-plausible lines join into one title (real layout from
        photos/16 in data/evals/eval_r4_cpu_hedge.json)."""
        from bbocr_tpu.extract.heuristics import heuristic_extract_lines

        lines = [
            ("THE LEGAL CLASSICS LIBRARY", 0.17, 0.07, 0),
            ("A TREATISE ON THE", 0.20, 0.12, 0),
            ("CONTRACT OF SALE", 0.92, 0.14, 0),
            ("PUBLISHER", 0.85, 0.08, 0),
        ]
        meta = heuristic_extract_lines(lines)
        assert meta["title"] == "A TREATISE ON THE CONTRACT OF SALE"

    def test_lines_title_multiword_beats_lone_name(self):
        """A lone high-confidence name (the author) must not outrank the
        multi-word title line at near-equal height (covers/book4)."""
        from bbocr_tpu.extract.heuristics import heuristic_extract_lines

        lines = [
            ("ALFRED", 0.98, 0.16, 0),
            ("H ENDURANCE ID ANAE", 0.55, 0.17, 0),
        ]
        meta = heuristic_extract_lines(lines)
        assert "ENDURANCE" in meta["title"]

    def test_lines_title_skips_garbled_imprint(self):
        from bbocr_tpu.extract.heuristics import heuristic_extract_lines

        lines = [
            ("Published Ortther 1915", 0.07, 1.0, 2),
            ("J Bevond the Pronter", 0.17, 0.54, 1),
            ("By RANDALL PARRISH", 0.33, 0.20, 1),
        ]
        meta = heuristic_extract_lines(lines)
        assert meta["title"] == "J Bevond the Pronter"
        assert meta["authors"] == ["RANDALL PARRISH"]

    def test_author_noise_tokens_stripped(self):
        from bbocr_tpu.extract.heuristics import heuristic_extract_lines

        lines = [("By N MARTHA a FINLEY", 0.4, 0.3, 1)]
        assert heuristic_extract_lines(lines)["authors"] == ["MARTHA FINLEY"]
        # runs of 2+ single letters are undotted initials, not noise
        lines = [("By J K Rowling", 0.4, 0.3, 1)]
        assert heuristic_extract_lines(lines)["authors"] == ["J K Rowling"]

    def test_publisher_leading_junk_trimmed(self):
        from bbocr_tpu.extract.heuristics import _clean_publisher

        assert _clean_publisher("by Houghton Mifflin & Company") == "Houghton Mifflin & Company"
        assert _clean_publisher("ss kz HarperCollins Publishers") == "HarperCollins Publishers"
        assert _clean_publisher("First Chronicle Books") == "Chronicle Books"
        # dotted initials are real name parts, never trimmed
        assert _clean_publisher("A. L. BURT COMPANY") == "A. L. BURT COMPANY"

    def test_publisher_suffix_beats_junk_tail(self):
        meta = heuristic_extract(
            "Published by Arensenerts with a\nA. L. BURT COMPANY\nNew York"
        )
        assert meta["publisher"] == "A. L. BURT COMPANY"


class TestExtractorPipeline:
    def test_default_ocr_indices(self):
        ext = make_extractor(llm_backend="heuristic", use_preprocessing=False)
        meta = ext.extract_metadata_from_images(fake_images(3))
        # two OCR pages (indices 1,2) both produced text under the cap
        assert meta["_processing_info"]["ocr_images_processed"] == 2
        assert meta["_processing_info"]["total_images"] == 3
        assert ext._engine.calls == 2

    def test_single_image_no_ocr(self):
        ext = make_extractor(llm_backend="heuristic", use_preprocessing=False)
        meta = ext.extract_metadata_from_images(fake_images(1))
        assert meta["_processing_info"]["ocr_images_processed"] == 0

    def test_ocr_char_cap_drops_long_text(self):
        long_text = "x " * 400
        ext = make_extractor(
            engine=FakeEngine(long_text), llm_backend="heuristic", use_preprocessing=False
        )
        meta = ext.extract_metadata_from_images(fake_images(2), capture_trace=True)
        assert meta["_processing_info"]["ocr_images_processed"] == 0
        steps = [s["step"] for s in meta["_trace"]["steps"]]
        assert "ocr_skip_long" in steps
        assert meta["_trace"]["images"][1]["ocr_skipped_long"] is True

    def test_heuristic_backend_structures_ocr(self):
        ext = make_extractor(llm_backend="heuristic", use_preprocessing=False)
        meta = ext.extract_metadata_from_images(fake_images(2))
        assert meta["isbn_13"] == "9780306406157"
        assert meta["publisher"] == "Penguin Books"
        validate_schema(meta_without_private(meta))

    def test_llm_success_path(self, monkeypatch):
        ext = make_extractor(use_preprocessing=False)
        response = json.dumps(dict(empty_metadata(), title="LLM Title"))
        monkeypatch.setattr(ext, "_call_llm", lambda p, i: f"```json\n{response}\n```")
        meta = ext.extract_metadata_from_images(fake_images(3), capture_trace=True)
        assert meta["title"] == "LLM Title"
        assert meta["_processing_info"]["ocr_images_processed"] == 2
        assert "fallback_used" not in meta["_processing_info"]
        steps = [s["step"] for s in meta["_trace"]["steps"]]
        for expected in ("seed_images", "start_ocr", "ocr", "build_prompt", "encode_images", "request_sent", "vlm_raw"):
            assert expected in steps, f"missing trace step {expected}"
        assert meta["_trace"]["ollama_raw"].startswith("```json")
        assert meta["_trace"]["enhanced_prompt"].startswith("You are")

    def test_llm_garbage_falls_back_to_nulls(self, monkeypatch):
        ext = make_extractor(use_preprocessing=False)
        monkeypatch.setattr(ext, "_call_llm", lambda p, i: "I could not read the book, sorry!")
        meta = ext.extract_metadata_from_images(fake_images(2))
        assert meta["title"] is None
        assert meta["_processing_info"]["fallback_used"] is True

    def test_schema_violation_raises(self, monkeypatch):
        ext = make_extractor(use_preprocessing=False)
        monkeypatch.setattr(ext, "_call_llm", lambda p, i: '{"title": 123}')
        with pytest.raises(Exception, match="JSON validation failed"):
            ext.extract_metadata_from_images(fake_images(2))

    def test_debug_autocrop_stub(self, monkeypatch):
        monkeypatch.setenv("BB_OCR_DEBUG_AUTOCROP", "1")
        ext = make_extractor(llm_backend="ollama", use_preprocessing=False)
        meta = ext.extract_metadata_from_images(fake_images(2))
        assert meta["_processing_info"]["model_skipped"] is True
        assert meta["title"] is None

    def test_trace_sink_receives_updates(self):
        ext = make_extractor(llm_backend="heuristic", use_preprocessing=False)
        seen = []
        meta = ext.extract_metadata_from_images(
            fake_images(2), capture_trace=True, trace_sink=seen.append
        )
        assert len(seen) >= 3
        assert "images" in seen[0]

    def test_process_book_directory(self, tmp_path):
        from PIL import Image

        book = tmp_path / "books" / "7"
        book.mkdir(parents=True)
        for i, img in enumerate(fake_images(3)):
            Image.fromarray(img).save(book / f"IMG_{i:04d}.JPG")
        ext = make_extractor(llm_backend="heuristic", use_preprocessing=False)
        meta = ext.process_book_directory(str(book))
        assert meta["_processing_info"]["total_images"] == 3


def meta_without_private(meta):
    return {k: v for k, v in meta.items() if not k.startswith("_")}


class TestNativeVLMBackend:
    """llm_backend='tpu' routes through NativeVLMClient (BASELINE config 5)."""

    def test_extractor_parses_pagereader_output(self, tmp_path, monkeypatch):
        import numpy as np
        from PIL import Image

        from bbocr_tpu.extract.extractor import BookMetadataExtractor
        from bbocr_tpu.llm import native_vlm

        monkeypatch.setattr(
            native_vlm.NativeVLMClient,
            "generate",
            lambda self, model, prompt, images, timeout_seconds=300.0:
                '{"title":"Red Men","authors":["M. Tuttle"],"publisher":null,'
                '"year":"1915","isbn_10":null,"isbn_13":null,"edition":null,'
                '"binding":null}',
        )
        p = tmp_path / "page.png"
        Image.fromarray(np.full((64, 48), 255, np.uint8)).save(p)
        ext = BookMetadataExtractor(
            llm_backend="tpu", ocr_engine="tesseract", warm_model=False
        )
        meta = ext.extract_metadata_from_images([str(p)], ocr_image_indices=[])
        assert meta["title"] == "Red Men"
        assert meta["year"] == "1915"


class TestLineProminenceHeuristics:
    def test_title_is_big_confident_text_not_first_junk(self):
        from bbocr_tpu.extract.heuristics import heuristic_extract_lines

        lines = [
            ("2-- yrk WEE", 0.1, 0.4),            # texture junk (low conf)
            ("A. L. BURT COMPANY", 0.6, 0.4),      # imprint (rejected as title)
            ("Beyond the Frontier", 0.5, 1.0),     # big confident text
            ("by RANDALL PARRISH", 0.45, 0.5),
            ("Copyright 1915", 0.7, 0.2),
        ]
        meta = heuristic_extract_lines(lines)
        assert meta["title"] == "Beyond the Frontier"
        assert meta["authors"] == ["RANDALL PARRISH"]
        assert meta["year"] == "1915"
        assert meta["publisher"] == "A. L. BURT COMPANY"

    def test_pattern_fields_scan_low_confidence_lines(self):
        from bbocr_tpu.extract.heuristics import heuristic_extract_lines

        # the copyright line read at conf 0.2 must still provide the year
        lines = [
            ("The Texas Cookbook", 0.6, 1.0),
            ("COPYRIGHT 1965 BY HOUGHTON, MIFFLIN & COMPANY", 0.2, 0.3),
        ]
        meta = heuristic_extract_lines(lines)
        assert meta["year"] == "1965"
        assert meta["title"] == "The Texas Cookbook"

    def test_isbn13_recovered_from_fused_label_digits(self):
        # 'ISBN' misread as digits fuses into the run: I->1 S->5 B->8 N->0
        from bbocr_tpu.extract.heuristics import find_isbns

        got = find_isbns("colophon 15809787853601424 printed")
        assert got["isbn_13"] == "9787853601424"


class RoutingFakeEngine:
    """Records which engine entry point the extractor's OCR routing picks."""

    def __init__(self):
        self.calls = []
        q = np.array([[0, 0], [40, 0], [40, 10], [0, 10]], np.float32)
        self._res = [(q, "HELLO", 0.9), (q + 20, "WORLD", 0.35)]

    def readtext(self, image):
        self.calls.append("readtext")
        return list(self._res)

    def readtext_fast(self, image):
        self.calls.append("fast")
        return list(self._res)

    def reread_low_conf(self, image, results, *, conf_ths=0.5, **kw):
        self.calls.append("reread")
        return [(q, t, max(c, 0.8)) for q, t, c in results]


class TestFastPathRouting:
    """Single-photo OCR routing (round-2 VERDICT #5: ship readtext_fast)."""

    def _ex(self, **kw):
        return make_extractor(
            engine=RoutingFakeEngine(), llm_backend="heuristic",
            use_preprocessing=False, **kw,
        )

    def test_small_upright_image_uses_fast_path(self):
        ex = self._ex()
        img = np.full((480, 640), 200.0, np.float32)  # webcam capture
        text, lines, infos = ex._ocr_text(img, image_index=0)
        assert ex._engine.calls[0] == "fast"
        assert "readtext" not in ex._engine.calls
        assert "HELLO" in text
        # the low-confidence re-read composes with the fast path
        assert "reread" in ex._engine.calls

    def test_camera_photo_keeps_full_rotation_path(self):
        ex = self._ex()
        img = np.full((1600, 1200), 200.0, np.float32)  # camera-shaped
        ex._ocr_text(img, image_index=1)
        assert "fast" not in ex._engine.calls
        assert ex._engine.calls.count("readtext") == 4  # rotation vote

    def test_fast_single_false_forces_full_path(self):
        ex = self._ex(fast_single=False)
        img = np.full((480, 640), 200.0, np.float32)
        ex._ocr_text(img, image_index=0)
        assert "fast" not in ex._engine.calls
        assert "readtext" in ex._engine.calls

    def test_fast_single_true_overrides_for_upright(self):
        ex = self._ex(fast_single=True, auto_rotate=False)
        img = np.full((1600, 1200), 200.0, np.float32)
        ex._ocr_text(img, image_index=1)
        assert ex._engine.calls[0] == "fast"
