"""Pallas kernel parity vs the XLA ops implementations (interpret on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from bbocr_tpu import ops
from bbocr_tpu.kernels import blur3_u8_pallas, enhance_u8_pallas, unsharp_u8_pallas


def _imgs(n=2, h=70, w=90, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 256, (n, h, w)).astype(np.float32))


class TestPallasKernels:
    def test_blur3(self):
        x = _imgs()
        ref = ops.gaussian_blur(x, 3, 3.0)
        got = blur3_u8_pallas(x, 3.0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_unsharp(self):
        x = jnp.asarray(ops.quantize_u8(_imgs(seed=1)))
        ref = ops.unsharp_mask(x, 1.0, 30, 3)
        got = unsharp_u8_pallas(x, 30, 3, 1.0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_enhance(self):
        x = jnp.asarray(ops.quantize_u8(_imgs(seed=2)))
        ref = ops.adjust_brightness(ops.adjust_contrast(x, 1.9), 1.2)
        mean = jnp.floor(jnp.mean(x, axis=(1, 2)) + 0.5)
        got = enhance_u8_pallas(x, mean, 1.9, 1.2)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_nonaligned_shapes(self):
        x = _imgs(1, 33, 41, seed=3)  # not multiples of anything
        ref = ops.gaussian_blur(x, 3, 3.0)
        got = blur3_u8_pallas(x, 3.0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestPallasChain:
    def test_full_chain_parity(self):
        """Pallas-variant chain must match the XLA chain bit-for-bit."""
        from bbocr_tpu.preprocess import preprocess_for_book_cover

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (80, 64)).astype(np.float32)
        ref, _ = preprocess_for_book_cover(jnp.asarray(img), use_pallas=False)
        got, _ = preprocess_for_book_cover(jnp.asarray(img), use_pallas=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
