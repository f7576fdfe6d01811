"""Chain-level golden tests: full preprocessing recipe vs cv2+PIL composition,
auto-crop behavior, and the native connected-components labeler."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
from PIL import Image, ImageEnhance, ImageFilter  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from bbocr_tpu.preprocess import (  # noqa: E402
    BOOK_COVER_STEPS,
    auto_crop_text_region,
    central_edge_crop,
    preprocess_for_book_cover,
    preprocess_for_book_cover_batch,
)


def golden_chain(img_gray: np.ndarray) -> np.ndarray:
    """The reference recipe composed from cv2/PIL directly (test-only)."""
    x = img_gray
    h, w = x.shape
    x = cv2.resize(x, (int(w * 1.5), int(h * 1.5)), interpolation=cv2.INTER_CUBIC)
    x = cv2.GaussianBlur(x, (3, 3), 3)
    x = np.array(ImageEnhance.Contrast(Image.fromarray(x)).enhance(1.9))
    x = np.array(ImageEnhance.Brightness(Image.fromarray(x)).enhance(1.2))
    x = cv2.createCLAHE(clipLimit=2.5, tileGridSize=(8, 8)).apply(x)
    x = np.array(
        Image.fromarray(x).filter(ImageFilter.UnsharpMask(radius=1.0, percent=30, threshold=3))
    )
    return x


def _cover_img(h=120, w=96):
    img = np.full((h, w), 190, np.uint8)
    cv2.putText(img, "TITLE", (6, 40), cv2.FONT_HERSHEY_SIMPLEX, 0.8, 40, 2)
    cv2.putText(img, "AUTHOR", (6, 80), cv2.FONT_HERSHEY_SIMPLEX, 0.6, 60, 1)
    noise = np.random.default_rng(1).integers(-12, 12, (h, w))
    return np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)


class TestChain:
    def test_matches_reference_recipe(self):
        img = _cover_img()
        ref = golden_chain(img)
        got, steps = preprocess_for_book_cover(jnp.asarray(img, jnp.float32))
        got = np.asarray(got)
        assert got.shape == ref.shape
        assert steps == list(BOOK_COVER_STEPS)
        diff = np.abs(got.astype(np.float64) - ref.astype(np.float64))
        # Chained rounding drift compounds; what matters is OCR-visible
        # fidelity, so gate on distributional closeness.
        assert np.mean(diff) <= 2.0, f"mean diff {np.mean(diff):.3f}"
        assert np.quantile(diff, 0.99) <= 12, f"p99 diff {np.quantile(diff, 0.99)}"

    def test_batched_matches_single(self):
        img = _cover_img()
        single, _ = preprocess_for_book_cover(jnp.asarray(img, jnp.float32))
        batch = preprocess_for_book_cover_batch(
            jnp.asarray(np.stack([img, img]), jnp.float32)
        )
        np.testing.assert_array_equal(np.asarray(batch[0]), np.asarray(single))
        np.testing.assert_array_equal(np.asarray(batch[1]), np.asarray(single))


class TestNativeCC:
    def test_components_match_cv2(self):
        from bbocr_tpu.native import connected_components, native_available

        rng = np.random.default_rng(3)
        mask = (rng.random((64, 80)) > 0.7).astype(np.uint8)
        mask = cv2.dilate(mask, np.ones((2, 2), np.uint8))
        n_ref, _, stats_ref, _ = cv2.connectedComponentsWithStats(mask, connectivity=8)
        labels, stats = connected_components(mask, connectivity=8)
        assert stats.shape[0] == n_ref - 1  # cv2 counts background
        # Same total foreground pixel count and identical bbox multiset.
        assert int(stats[:, 4].sum()) == int(mask.sum())
        ref_boxes = sorted(
            (int(s[0]), int(s[1]), int(s[0] + s[2] - 1), int(s[1] + s[3] - 1))
            for s in stats_ref[1:]
        )
        got_boxes = sorted((int(s[0]), int(s[1]), int(s[2]), int(s[3])) for s in stats)
        assert got_boxes == ref_boxes
        assert native_available() or True  # numpy fallback is acceptable

    def test_scores(self):
        from bbocr_tpu.native import connected_components

        mask = np.zeros((10, 10), np.uint8)
        mask[2:4, 2:5] = 1
        mask[7:9, 6:9] = 1
        score = np.zeros((10, 10), np.float32)
        score[3, 3] = 0.9
        score[8, 7] = 0.4
        _, stats = connected_components(mask, score)
        assert sorted(np.round(stats[:, 10], 4)) == [0.4, 0.9]


class TestAutoCrop:
    def test_crops_text_region(self):
        h, w = 240, 200
        img = np.full((h, w), 235, np.uint8)
        cv2.putText(img, "METADATA", (30, 100), cv2.FONT_HERSHEY_SIMPLEX, 0.9, 10, 2)
        cv2.putText(img, "ISBN 12345", (30, 140), cv2.FONT_HERSHEY_SIMPLEX, 0.7, 10, 2)
        rect = auto_crop_text_region(img, margin=16)
        assert rect is not None
        x0, y0, x1, y1 = rect
        # Crop must include the text block and be a genuine sub-rectangle.
        assert x0 <= 30 and y0 <= 85 and x1 >= 160 and y1 >= 140
        assert (x1 - x0) * (y1 - y0) <= h * w

    def test_edge_crop(self):
        rect = central_edge_crop((200, 100), 10.0)
        assert rect == (10, 20, 90, 180)
        assert central_edge_crop((200, 100), 0.0) is None
        assert central_edge_crop((20, 20), 45.0) is None
