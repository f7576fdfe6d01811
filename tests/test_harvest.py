"""Real-crop harvest + real-CER validation loop (cli/harvest_real_crops,
cli/train --val-real)."""

import json

import numpy as np
from PIL import Image


class TestSpanAlignment:
    def test_close_decodes_align_to_gt_spans(self):
        from bbocr_tpu.cli.harvest_real_crops import best_span_label

        label, cer = best_span_label("ENDORANCE", ["SHACKLETON'S", "ENDURANCE"])
        assert label == "ENDURANCE" and cer < 0.2
        label, _ = best_span_label(
            "INEREDIBLE WOVALE", ["Shackleton's Incredible Voyage"]
        )
        assert label == "Incredible Voyage"

    def test_junk_and_short_decodes_are_rejected(self):
        from bbocr_tpu.cli.harvest_real_crops import best_span_label

        assert best_span_label("54 U 054 A A91", ["HARRY", "POTTER"])[0] is None
        assert best_span_label("i", ["HARRY"])[0] is None
        assert best_span_label("", ["HARRY"])[0] is None

    def test_margin_identifies_hard_but_unambiguous_decodes(self):
        """A decode too mangled for the flat CER gate still identifies its
        source line when every other phrase matches far worse — the margin
        lets synthetic harvests keep exactly these hard crops."""
        from bbocr_tpu.cli.harvest_real_crops import best_span_with_margin

        span, cer, runner = best_span_with_margin(
            "SHACMIEIONS", ["SHACKLETON'S", "1853-698-80217", "SAID PRESS"]
        )
        assert span == "SHACKLETON'S"
        assert cer > 0.3  # the flat gate would drop it
        assert runner - cer > 0.25  # but it is unambiguous

        # ambiguous junk: margin stays small, so margin-accept still rejects
        _, cer2, runner2 = best_span_with_margin(
            "AEIEIEA", ["SHACKLETON'S", "SAID PRESS"]
        )
        assert (runner2 - cer2) < 0.25 or cer2 > 0.6

    def test_span_is_contiguous_words_with_original_casing(self):
        from bbocr_tpu.cli.harvest_real_crops import best_span_label

        label, _ = best_span_label(
            "and the Philosopher's", ["and the Philosopher's Stone"]
        )
        assert label == "and the Philosopher's"


class TestRealValLoader:
    def test_loads_resizes_and_pads(self, tmp_path):
        from bbocr_tpu.cli.train import _load_real_val

        d = tmp_path / "crops"
        d.mkdir()
        Image.fromarray(np.full((32, 100), 200, np.uint8)).save(d / "a.png")
        Image.fromarray(np.full((48, 900), 50, np.uint8)).save(d / "b.png")
        json.dump(
            {"a.png": {"label": "HELLO"}, "b.png": {"label": "WORLD"}},
            open(d / "labels.json", "w"),
        )
        crops, refs = _load_real_val(str(d), 512)
        assert crops.shape == (64, 32, 512)  # padded to a multiple of 64
        assert refs == ["HELLO", "WORLD"]
        # edge replication beyond the true width, not zeros
        assert crops[0, :, -1].mean() == 200

    def test_shipped_val_set_is_loadable(self):
        """data/real_crops ships with the repo; the loader must accept it."""
        import os

        from bbocr_tpu.cli.train import _load_real_val

        path = os.path.join(os.path.dirname(__file__), "..", "data", "real_crops")
        crops, refs = _load_real_val(path, 512)
        assert len(refs) >= 50
        assert crops.shape[0] % 64 == 0 and crops.shape[1:] == (32, 512)
        assert all(isinstance(r, str) and r for r in refs)
