"""Cross-request batching wrapper + CTC beam search tests."""

import threading
import time

import numpy as np
import pytest

from bbocr_tpu.decode.beam import ctc_beam_decode, ctc_beam_decode_batch
from bbocr_tpu.models.charset import EN_CHARSET
from bbocr_tpu.runtime.batching import BatchingOCR


class CountingEngine:
    def __init__(self, delay=0.02):
        self.calls = []
        self.delay = delay

    def readtext_batch(self, images):
        self.calls.append(len(images))
        time.sleep(self.delay)
        return [[(np.zeros((4, 2)), f"img{np.asarray(im).sum():.0f}", 0.9)] for im in images]

    def timings(self):
        return {}


class TestBatchingOCR:
    def test_single_request(self):
        eng = CountingEngine()
        b = BatchingOCR(eng, max_batch=8, max_wait_ms=5)
        res = b.readtext(np.ones((4, 4)))
        assert res[0][1] == "img16"
        b.close()

    def test_concurrent_requests_coalesce(self):
        eng = CountingEngine(delay=0.05)
        b = BatchingOCR(eng, max_batch=16, max_wait_ms=30)
        results = {}

        def worker(i):
            results[i] = b.readtext(np.full((2, 2), i, np.float32))

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 10
        for i in range(10):
            assert results[i][0][1] == f"img{i * 4}"
        # fewer dispatches than requests -> coalescing happened
        assert b.batches_dispatched < 10
        assert sum(eng.calls) == 10
        b.close()

    def test_error_propagates(self):
        class Boom:
            def readtext_batch(self, images):
                raise RuntimeError("device on fire")

        b = BatchingOCR(Boom(), max_wait_ms=1)
        with pytest.raises(RuntimeError, match="device on fire"):
            b.readtext(np.zeros((2, 2)))
        b.close()

    def test_close_rejects_and_drains(self):
        class Slow:
            def readtext_batch(self, images):
                time.sleep(0.2)
                return [[] for _ in images]

        b = BatchingOCR(Slow(), max_batch=1, max_wait_ms=1)
        # occupy the worker, then queue a request that close() must fail
        t = threading.Thread(target=lambda: b.readtext(np.zeros((2, 2)), timeout=2))
        t.start()
        time.sleep(0.05)
        fut = b._submit(np.zeros((2, 2)))
        b.close()
        with pytest.raises(RuntimeError, match="closed"):
            fut.result(timeout=1)
        with pytest.raises(RuntimeError, match="closed"):
            b.readtext(np.zeros((2, 2)))
        t.join()


class TestBeamDecode:
    def _logits(self, frames, n_cls=4, hot=8.0):
        out = np.full((len(frames), n_cls), -hot / 2, np.float64)
        for t, c in enumerate(frames):
            out[t, c] = hot
        return out

    def test_matches_greedy_on_clean_input(self):
        logits = self._logits([1, 1, 0, 2, 2, 0, 3])
        labels, logp = ctc_beam_decode_batch(logits[None])[0]
        assert labels == (1, 2, 3)
        assert logp < 0

    def test_beam_beats_greedy_on_ambiguity(self):
        # Greedy picks per-frame argmax; construct frames where the blank is
        # marginally best each frame but a consistent symbol path dominates
        # in total probability.
        t_len, n_cls = 4, 3
        logits = np.zeros((t_len, n_cls))
        logits[:, 0] = 1.00  # blank slightly ahead per frame
        logits[:, 1] = 0.95  # symbol 1 close behind, every frame
        logits[:, 2] = -5.0
        labels, _ = ctc_beam_decode(
            logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        )
        # greedy decodes to () (all blanks); beam recovers the symbol since
        # sum of many symbol-path alignments outweighs the single blank path
        assert labels == (1,)

    def test_length_masking(self):
        logits = self._logits([1, 1, 2, 2, 2, 2])
        (labels, _), = ctc_beam_decode_batch(logits[None], lengths=[2])
        assert labels == (1,)

    def test_roundtrip_with_charset(self):
        text = "ISBN 42"
        ids = EN_CHARSET.encode(text)
        frames = []
        for i in ids:
            frames += [i, 0]
        logits = self._logits(frames, n_cls=EN_CHARSET.num_classes)
        labels, _ = ctc_beam_decode_batch(logits[None])[0]
        assert EN_CHARSET.decode_ids(labels) == text


class TestIsbnDecode:
    def _logits_for(self, text, confusions=None, t_per_char=2):
        """Construct (T, C) logits spelling ``text`` with optional frames
        where a confusing char slightly outscores the true one."""
        from bbocr_tpu.models.charset import EN_CHARSET

        lut = {c: i + 1 for i, c in enumerate(EN_CHARSET.chars)}
        n_cls = EN_CHARSET.num_classes
        frames = []
        for pos, ch in enumerate(text):
            f = np.zeros(n_cls)
            f[lut[ch]] = 6.0
            if confusions and pos in confusions:
                f[lut[confusions[pos]]] = 6.4  # confuser wins unbiased
                f[lut[ch]] = 6.0
            frames.append(f)
            blank = np.zeros(n_cls)
            blank[0] = 6.0
            frames.extend([blank] * (t_per_char - 1))
        return np.asarray(frames, np.float64)

    def test_clean_isbn10_decodes(self):
        from bbocr_tpu.decode.isbn import decode_isbn

        logits = self._logits_for("0306406152")
        assert decode_isbn(logits) == "0306406152"

    def test_confused_digit_recovered_by_bias_and_checksum(self):
        """'5'->'S' confusion: unbiased greedy yields a checksum-broken
        string; digit bias + checksum recovers the valid ISBN."""
        from bbocr_tpu.decode.isbn import decode_isbn
        from bbocr_tpu.models.charset import EN_CHARSET

        logits = self._logits_for("0306406152", confusions={8: "S"})
        # sanity: greedy decode is wrong
        greedy = EN_CHARSET.ctc_collapse(np.argmax(logits, axis=-1))
        assert greedy != "0306406152"
        assert decode_isbn(logits) == "0306406152"

    def test_isbn13_with_dashes(self):
        from bbocr_tpu.decode.isbn import decode_isbn

        logits = self._logits_for("978-0-306-40615-7")
        assert decode_isbn(logits) == "9780306406157"

    def test_invalid_checksum_returns_none(self):
        from bbocr_tpu.decode.isbn import decode_isbn

        logits = self._logits_for("0306406153")  # bad check digit
        assert decode_isbn(logits) is None

    def test_suspect_patterns(self):
        from bbocr_tpu.decode.isbn import is_isbn_suspect

        assert is_isbn_suspect("ISBN 0-306-40615-2")
        assert is_isbn_suspect("97803O6406157")  # OCR confusions
        assert not is_isbn_suspect("A Novel")
        assert not is_isbn_suspect("")

    def test_engine_reread_contract(self):
        """isbn_logits/reread_isbn run end-to-end on a tiny engine."""
        import jax.numpy as jnp

        from bbocr_tpu.runtime import EngineConfig, OCREngine
        from bbocr_tpu.runtime.bucketing import CanvasSpec

        cfg = EngineConfig(
            canvases=(CanvasSpec(128, 96),),
            width_buckets=(32, 64),
            batch_capacities=(4, 8),
            compute_dtype=jnp.float32,
        )
        engine = OCREngine.create(seed=0, config=cfg)
        img = np.random.default_rng(0).integers(0, 255, (300, 220), np.uint8)
        quad = np.array([[40, 100], [180, 100], [180, 130], [40, 130]], np.float32)
        logits, frames = engine.isbn_logits(img, quad, bucket_w=64)
        assert logits.ndim == 2 and logits.shape[0] >= frames
        out = engine.reread_isbn(img, [(quad, "ISBN 123456789", 0.5)])
        assert out is None or isinstance(out, str)
