"""Golden-image tests: bbocr_tpu.ops vs OpenCV / PIL reference semantics.

The build's quality gate is CER parity, not bit-exactness (SURVEY.md §7), but
each primitive should track its cv2/PIL counterpart to within a couple of
uint8 levels so chained behavior matches the reference.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
from PIL import Image, ImageEnhance, ImageFilter  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from bbocr_tpu import ops  # noqa: E402


def _rand_img(h=96, w=120, channels=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels is None else (h, w, channels)
    base = rng.integers(0, 256, size=shape).astype(np.uint8)
    # Smooth a bit so it looks image-like (pure noise stresses rounding).
    base = cv2.GaussianBlur(base, (5, 5), 2)
    return base.astype(np.uint8)


def _text_img(h=160, w=200):
    img = np.full((h, w), 210, np.uint8)
    cv2.putText(img, "BOOK", (10, 60), cv2.FONT_HERSHEY_SIMPLEX, 1.4, 30, 3)
    cv2.putText(img, "1984", (20, 120), cv2.FONT_HERSHEY_SIMPLEX, 1.2, 50, 2)
    return img


def maxdiff(a, b):
    return np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)))


def meandiff(a, b):
    return np.mean(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)))


class TestColor:
    def test_rgb_to_grayscale(self):
        img = _rand_img(channels=3)
        ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        got = ops.rgb_to_grayscale(jnp.asarray(img, jnp.float32))
        assert maxdiff(got, ref) <= 1.0


class TestGaussianBlur:
    @pytest.mark.parametrize("sigma", [0.0, 3.0])
    def test_ksize3(self, sigma):
        img = _rand_img()
        ref = cv2.GaussianBlur(img, (3, 3), sigma)
        got = ops.gaussian_blur(jnp.asarray(img, jnp.float32), 3, sigma)
        assert maxdiff(got, ref) <= 1.0
        assert meandiff(got, ref) <= 0.1


class TestResize:
    @pytest.mark.parametrize("scale", [1.5, 0.5])
    def test_bicubic(self, scale):
        img = _rand_img(64, 80)
        out_h, out_w = int(64 * scale), int(80 * scale)
        ref = cv2.resize(img, (out_w, out_h), interpolation=cv2.INTER_CUBIC)
        got = ops.resize_bicubic(jnp.asarray(img, jnp.float32), out_h, out_w)
        assert maxdiff(got, ref) <= 2.0
        assert meandiff(got, ref) <= 0.2


class TestPilEnhance:
    def test_contrast(self):
        img = _rand_img()
        ref = np.array(ImageEnhance.Contrast(Image.fromarray(img)).enhance(1.9))
        got = ops.adjust_contrast(jnp.asarray(img, jnp.float32), 1.9)
        assert maxdiff(got, ref) <= 1.0

    def test_brightness(self):
        img = _rand_img()
        ref = np.array(ImageEnhance.Brightness(Image.fromarray(img)).enhance(1.2))
        got = ops.adjust_brightness(jnp.asarray(img, jnp.float32), 1.2)
        assert maxdiff(got, ref) <= 1.0


class TestClahe:
    @pytest.mark.parametrize("shape", [(96, 120), (97, 123)])
    def test_clahe(self, shape):
        img = _rand_img(*shape)
        ref = cv2.createCLAHE(clipLimit=2.5, tileGridSize=(8, 8)).apply(img)
        got = ops.clahe(jnp.asarray(img, jnp.float32), 2.5, (8, 8))
        assert maxdiff(got, ref) <= 2.0
        assert meandiff(got, ref) <= 0.2


class TestEqualize:
    def test_equalize_hist(self):
        img = _rand_img()
        ref = cv2.equalizeHist(img)
        got = ops.equalize_hist(jnp.asarray(img, jnp.float32))
        assert maxdiff(got, ref) <= 1.0


class TestThreshold:
    @pytest.mark.parametrize(
        "method,block,c,inv",
        [
            ("mean", 35, 10, True),
            ("gaussian", 31, 5, True),
            ("gaussian", 11, 2, False),
        ],
    )
    def test_adaptive(self, method, block, c, inv):
        img = _text_img()
        cv_method = (
            cv2.ADAPTIVE_THRESH_MEAN_C if method == "mean" else cv2.ADAPTIVE_THRESH_GAUSSIAN_C
        )
        cv_type = cv2.THRESH_BINARY_INV if inv else cv2.THRESH_BINARY
        ref = cv2.adaptiveThreshold(img, 255, cv_method, cv_type, block, c)
        got = np.asarray(
            ops.adaptive_threshold(
                jnp.asarray(img, jnp.float32), 255.0, method, block, c, inv
            )
        )
        # The local-mean rounding can flip pixels whose value sits exactly on
        # the threshold; allow a small fraction of disagreeing pixels.
        frac = np.mean(got != ref)
        assert frac <= 0.02, f"{frac:.4f} of pixels differ"

    def test_otsu(self):
        img = _text_img()
        tref, ref = cv2.threshold(img, 0, 255, cv2.THRESH_BINARY_INV + cv2.THRESH_OTSU)
        from bbocr_tpu.ops.histogram import otsu_threshold_value

        tgot = float(otsu_threshold_value(jnp.asarray(img, jnp.float32)))
        assert abs(tgot - tref) <= 1.0
        got = np.asarray(ops.otsu_threshold(jnp.asarray(img, jnp.float32), 255.0, inverse=True))
        assert np.mean(got != ref) <= 0.01


class TestSobel:
    def test_sobel_magnitude(self):
        img = _text_img()
        gx = cv2.Sobel(img, cv2.CV_16S, 1, 0, ksize=3)
        gy = cv2.Sobel(img, cv2.CV_16S, 0, 1, ksize=3)
        ref = cv2.addWeighted(cv2.convertScaleAbs(gx), 1.0, cv2.convertScaleAbs(gy), 1.0, 0)
        got = ops.sobel_magnitude_u8(jnp.asarray(img, jnp.float32))
        assert maxdiff(got, ref) <= 1.0


class TestMorphology:
    def test_close_open_dilate(self):
        img = (_text_img() < 128).astype(np.uint8) * 255
        k1 = cv2.getStructuringElement(cv2.MORPH_RECT, (9, 3))
        k2 = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
        k3 = cv2.getStructuringElement(cv2.MORPH_RECT, (11, 3))
        ref = cv2.morphologyEx(img, cv2.MORPH_CLOSE, k1, iterations=2)
        ref = cv2.morphologyEx(ref, cv2.MORPH_OPEN, k2, iterations=1)
        ref = cv2.dilate(ref, k3, iterations=1)
        x = jnp.asarray(img, jnp.float32)
        got = ops.morph_close(x, (9, 3), 2)
        got = ops.morph_open(got, (3, 3), 1)
        got = ops.dilate(got, (11, 3), 1)
        assert np.array_equal(np.asarray(got, np.uint8), ref)


class TestUnsharp:
    def test_pil_gaussian_kernel(self):
        # Impulse response reveals Pillow's effective kernel (3-pass extended
        # box blur); uint8 per-pass rounding allows ~1 LSB drift.
        size = 21
        imp = np.zeros((size, size), np.uint8)
        imp[size // 2, size // 2] = 255
        ref = np.array(Image.fromarray(imp).filter(ImageFilter.GaussianBlur(1.0)))
        from bbocr_tpu.ops.filters import pil_gaussian_blur

        got = np.asarray(ops.quantize_u8(pil_gaussian_blur(jnp.asarray(imp, jnp.float32), 1.0)))
        assert maxdiff(got, ref) <= 1.5

    def test_unsharp(self):
        img = _text_img()
        ref = np.array(
            Image.fromarray(img).filter(
                ImageFilter.UnsharpMask(radius=1.0, percent=30, threshold=3)
            )
        )
        got = ops.unsharp_mask(jnp.asarray(img, jnp.float32), 1.0, 30, 3)
        # Pillow rounds per box-blur pass; tolerate small deviations plus a
        # few threshold-boundary flips.
        assert meandiff(got, ref) <= 0.6
        assert np.quantile(np.abs(np.asarray(got, np.float64) - ref), 0.995) <= 4
