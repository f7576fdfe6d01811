"""CRNN recognizer (CNN -> BiLSTM -> CTC head) as a JAX/flax forward pass.

Replaces the libtorch recognizer inside EasyOCR (None-VGG-BiLSTM-CTC,
"generation 2" english model) the reference invokes via ``readtext``
(``enhanced_extractor.py:520``). Topology matches the published recognizer —
VGG feature extractor collapsing a 32px-high grayscale crop to a T=W/4-1
sequence of 256-d features, two BiLSTM blocks, and a linear CTC head — so
pretrained weights can be imported.

TPU-first formulation of the LSTM:
- The input projection for ALL timesteps is one large matmul
  (B, T, C) x (C, 4H) done on the MXU before the scan.
- ``lax.scan`` then carries only the (B, H) recurrent matmul per step.
- Widths are static per bucket (runtime pads crops into width buckets), so
  every compiled program has fixed T.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

INPUT_HEIGHT = 32  # recognizer crop height, fixed by the architecture


def _lstm_bias_init(key, shape, dtype=jnp.float32):
    """Zeros with the forget-gate quarter set to +1 (gates: i, f, g, o)."""
    b = jnp.zeros(shape, dtype)
    h = shape[0] // 4
    return b.at[h : 2 * h].set(1.0)


class LSTMScan(nn.Module):
    """Unidirectional LSTM over (B, T, C) -> (B, T, H), scan-based."""

    hidden: int
    reverse: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        h = self.hidden
        init = nn.initializers.lecun_normal()
        w_ih = self.param("w_ih", init, (c, 4 * h))
        # forget-gate bias init +1 stabilizes early CTC training
        b_ih = self.param("b_ih", _lstm_bias_init, (4 * h,))
        w_hh = self.param("w_hh", nn.initializers.orthogonal(), (h, 4 * h))
        dt = self.dtype
        # One big MXU matmul for all timesteps, time-major for the scan.
        xz = x.astype(dt) @ w_ih.astype(dt) + b_ih.astype(dt)  # (B, T, 4H)
        xz = jnp.swapaxes(xz, 0, 1)  # (T, B, 4H)
        if self.reverse:
            xz = jnp.flip(xz, axis=0)
        w_hh_dt = w_hh.astype(dt)

        def step(carry, xz_t):
            h_prev, c_prev = carry
            z = xz_t + h_prev @ w_hh_dt
            i, f, g, o = jnp.split(z, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c_new = f * c_prev + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        carry0 = (jnp.zeros((b, h), dt), jnp.zeros((b, h), dt))
        _, ys = jax.lax.scan(step, carry0, xz)
        if self.reverse:
            ys = jnp.flip(ys, axis=0)
        return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


class BiLSTM(nn.Module):
    """Bidirectional LSTM + linear merge (the published BidirectionalLSTM)."""

    hidden: int
    out: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        fwd = LSTMScan(self.hidden, reverse=False, dtype=self.dtype, name="fwd")(x)
        bwd = LSTMScan(self.hidden, reverse=True, dtype=self.dtype, name="bwd")(x)
        y = jnp.concatenate([fwd, bwd], axis=-1)
        return nn.Dense(self.out, dtype=self.dtype, name="proj")(y)


class VGGFeatures(nn.Module):
    """32xW grayscale -> (B, T=W/4-1, C=out) sequence features."""

    out: int = 256
    dtype: Any = jnp.bfloat16
    # "group" (default, trainable end-to-end) or "batch" (frozen running
    # stats, for imported torch recognizer weights; inference only).
    norm: str = "group"

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = [self.out // 8, self.out // 4, self.out // 2, self.out]
        conv = lambda f, k=3, p="SAME", bias=True: nn.Conv(
            f, (k, k), padding=p, use_bias=bias, dtype=self.dtype
        )
        x = nn.relu(conv(oc[0])(x))
        x = nn.max_pool(x, (2, 2), (2, 2))  # 16 x W/2
        x = nn.relu(conv(oc[1])(x))
        x = nn.max_pool(x, (2, 2), (2, 2))  # 8 x W/4
        x = nn.relu(conv(oc[2])(x))
        x = nn.relu(conv(oc[2])(x))
        x = nn.max_pool(x, (2, 1), (2, 1))  # 4 x W/4
        # GroupNorm instead of the published BatchNorm: stateless, so the
        # train and inference paths are identical programs (no running-stat
        # plumbing through jit); equivalent quality for OCR. "batch" keeps
        # the published layout for imported torch weights.
        def norm():
            if self.norm == "batch":
                return nn.BatchNorm(use_running_average=True, dtype=self.dtype)
            return nn.GroupNorm(num_groups=32, dtype=self.dtype)

        x = conv(oc[3], bias=False)(x)
        x = norm()(x)
        x = nn.relu(x)
        x = conv(oc[3], bias=False)(x)
        x = norm()(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 1), (2, 1))  # 2 x W/4
        x = nn.relu(nn.Conv(oc[3], (2, 2), padding="VALID", dtype=self.dtype)(x))
        # (B, 1, W/4-1, C) -> (B, T, C)
        return x[:, 0, :, :]


class CRNN(nn.Module):
    """(B, 32, W, 1) grayscale in [-1, 1] -> (B, T, num_classes) CTC logits."""

    num_classes: int
    hidden: int = 256
    features: int = 256
    dtype: Any = jnp.bfloat16
    norm: str = "group"

    @nn.compact
    def __call__(self, x, train: bool = False):
        seq = VGGFeatures(self.features, dtype=self.dtype, norm=self.norm)(x, train)
        seq = BiLSTM(self.hidden, self.hidden, dtype=self.dtype, name="rnn0")(seq)
        seq = BiLSTM(self.hidden, self.hidden, dtype=self.dtype, name="rnn1")(seq)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(seq)
        return logits.astype(jnp.float32)
