"""CRAFT text detector as a JAX/flax forward pass.

Replaces the libtorch CRAFT the reference drives through
``easyocr.Reader.readtext`` (``enhanced_extractor.py:520``): a VGG16-BN
backbone, a U-shaped decoder with skip connections, and a 2-channel head
producing character-region and affinity score maps at half input resolution.

TPU-first choices:
- NHWC layout, bfloat16 compute / float32 params (MXU-friendly convs).
- Bilinear upsampling via ``jax.image.resize`` (lowers to XLA gather/dot the
  compiler tiles well); all shapes static.
- Stage widths/strides mirror the published CRAFT topology. Note that only
  the CRNN recognizer supports torch weight import via
  ``bbocr_tpu.models.weights``; CRAFT's decoder skip taps differ from the
  published checkpoint layout, so its weights come from first-party training
  (see ``bbocr_tpu/train``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

# ImageNet normalization used by the published CRAFT preprocessing.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_image(rgb01: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) floats in [0,1] -> ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN, rgb01.dtype)
    std = jnp.asarray(IMAGENET_STD, rgb01.dtype)
    return (rgb01 - mean) / std


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    use_bn: bool = True
    dtype: Any = jnp.bfloat16
    # "group": stateless GroupNorm — train == inference program (used by the
    # framework's own training). "batch": frozen BatchNorm running stats —
    # required when importing published torch VGG16-BN/CRAFT weights
    # (inference only; see bbocr_tpu.models.weights).
    norm: str = "group"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME" if self.kernel > 1 else "VALID",
            use_bias=not self.use_bn,
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            if self.norm == "batch":
                x = nn.BatchNorm(use_running_average=True, dtype=self.dtype)(x)
            else:
                x = nn.GroupNorm(num_groups=min(32, self.features), dtype=self.dtype)(x)
        return nn.relu(x)


def _maxpool(x, window=2, stride=2, padding="VALID"):
    return nn.max_pool(x, (window, window), (stride, stride), padding)


class VGG16BN(nn.Module):
    """Backbone emitting the four skip features CRAFT consumes."""

    dtype: Any = jnp.bfloat16
    norm: str = "group"
    # Serving fast path: input is ONE raw-gray channel in [0,255]; a
    # constant ones-plane is concatenated so conv1 (re-folded by
    # models.weights.fold_gray_stem into a (3,3,2,out) kernel) reproduces
    # /255 + ImageNet normalize + gray->RGB repeat EXACTLY, including the
    # SAME-zero-padding semantics: the ones-plane zero-pads to 0, which
    # cancels the mean-shift at padded taps just like the reference path.
    gray_input: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda f: ConvBN(f, dtype=self.dtype, norm=self.norm)
        if self.gray_input:
            x = jnp.concatenate([x, jnp.ones_like(x)], axis=-1)
        x = c(64)(x, train)
        x = c(64)(x, train)
        x = _maxpool(x)  # /2
        x = c(128)(x, train)
        f1 = c(128)(x, train)  # 128 @ /2
        x = _maxpool(f1)  # /4
        x = c(256)(x, train)
        x = c(256)(x, train)
        f2 = c(256)(x, train)  # 256 @ /4
        x = _maxpool(f2)  # /8
        x = c(512)(x, train)
        x = c(512)(x, train)
        f3 = c(512)(x, train)  # 512 @ /8
        x = _maxpool(f3)  # /16
        x = c(512)(x, train)
        x = c(512)(x, train)
        f4 = c(512)(x, train)  # 512 @ /16
        # fc6/fc7 conversion: stride-1 pool + dilated 1024 convs.
        x = nn.max_pool(f4, (3, 3), (1, 1), "SAME")
        x = ConvBN(1024, kernel=3, dilation=6, use_bn=False, dtype=self.dtype)(x, train)
        f5 = ConvBN(1024, kernel=1, use_bn=False, dtype=self.dtype)(x, train)  # 1024 @ /16
        return f1, f2, f3, f4, f5


class DoubleConv(nn.Module):
    mid: int
    out: int
    dtype: Any = jnp.bfloat16
    norm: str = "group"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.mid, kernel=1, dtype=self.dtype, norm=self.norm)(x, train)
        return ConvBN(self.out, kernel=3, dtype=self.dtype, norm=self.norm)(x, train)


def _upsample_to(x, ref):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, ref.shape[1], ref.shape[2], c), method="bilinear")


class CRAFT(nn.Module):
    """Input: (B, H, W, 3) ImageNet-normalized; H, W multiples of 32.

    Output: (B, H/2, W/2, 2) — channel 0 region score, channel 1 affinity.
    """

    dtype: Any = jnp.bfloat16
    norm: str = "group"
    # The published CRAFT emits raw (approximately [0,1]) scores; our
    # from-scratch training uses a sigmoid head. Imported torch weights set
    # final_sigmoid=False to keep the published score semantics.
    final_sigmoid: bool = True
    # See VGG16BN.gray_input (folded raw-gray serving stem).
    gray_input: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        f1, f2, f3, f4, f5 = VGG16BN(
            dtype=self.dtype, norm=self.norm, gray_input=self.gray_input
        )(x, train)
        y = jnp.concatenate([f5, f4], axis=-1)  # 1536 @ /16
        y = DoubleConv(512, 256, self.dtype, self.norm)(y, train)
        y = jnp.concatenate([_upsample_to(y, f3), f3], axis=-1)  # 256+512 @ /8
        y = DoubleConv(256, 128, self.dtype, self.norm)(y, train)
        y = jnp.concatenate([_upsample_to(y, f2), f2], axis=-1)  # 128+256 @ /4
        y = DoubleConv(128, 64, self.dtype, self.norm)(y, train)
        y = jnp.concatenate([_upsample_to(y, f1), f1], axis=-1)  # 64+128 @ /2
        feat = DoubleConv(64, 32, self.dtype, self.norm)(y, train)
        h = ConvBN(32, use_bn=False, dtype=self.dtype)(feat, train)
        h = ConvBN(32, use_bn=False, dtype=self.dtype)(h, train)
        h = ConvBN(16, use_bn=False, dtype=self.dtype)(h, train)
        h = ConvBN(16, kernel=1, use_bn=False, dtype=self.dtype)(h, train)
        out = nn.Conv(2, (1, 1), dtype=self.dtype)(h)
        out = out.astype(jnp.float32)
        # Score maps are probabilities; sigmoid keeps train/infer consistent.
        return jax.nn.sigmoid(out) if self.final_sigmoid else out


class LiteBackbone(nn.Module):
    """Slim detection backbone: ~8x fewer FLOPs than VGG16BN at equal input.

    Design rationale (round-3 profile: detect is 37 ms/photo at 1408x1024 on
    chip — the ~27 photos/s ceiling; VERDICT round-3 #3 targets <=12 ms):
    the VGG backbone spends most of its FLOPs on 64-channel full-resolution
    convs, but CRAFT's OUTPUT is at /2 — so the stem here is a single
    stride-2 conv and the only full-resolution op is one cheap 2->32 conv.
    Stage widths 32/64/128/256 (vs VGG's 64/128/256/512) and two convs per
    stage; a dilated 3x3 at /16 recovers receptive field for display type.
    All-conv, static shapes, NHWC bf16: the whole thing is MXU work.
    """

    dtype: Any = jnp.bfloat16
    norm: str = "group"
    # Same folded raw-gray serving stem contract as VGG16BN.gray_input.
    gray_input: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda f: ConvBN(f, dtype=self.dtype, norm=self.norm)
        if self.gray_input:
            x = jnp.concatenate([x, jnp.ones_like(x)], axis=-1)
        # stem: the ONLY full-resolution op (stride-2, tiny channel count)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=32, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = c(32)(x, train)
        f1 = c(32)(x, train)          # 32 @ /2
        x = _maxpool(f1)
        x = c(64)(x, train)
        f2 = c(64)(x, train)          # 64 @ /4
        x = _maxpool(f2)
        x = c(128)(x, train)
        f3 = c(128)(x, train)         # 128 @ /8
        x = _maxpool(f3)
        x = c(256)(x, train)
        x = c(256)(x, train)
        # dilated context: cheap at /16, widens the receptive field so
        # 300+px display type still activates coherent regions.
        f4 = ConvBN(256, kernel=3, dilation=6, dtype=self.dtype,
                    norm=self.norm)(x, train)  # 256 @ /16
        return f1, f2, f3, f4


class CRAFTLite(nn.Module):
    """Slim CRAFT: same contract as :class:`CRAFT` — input (B, H, W, 3)
    ImageNet-normalized (H, W multiples of 32), output (B, H/2, W/2, 2)
    region/affinity scores — at ~1/8 the FLOPs. Trained from scratch (or
    distilled from the big CRAFT); selected by param-tree sniffing in the
    serving engine, so ``checkpoints/craft.npz`` can hold either arch.
    """

    dtype: Any = jnp.bfloat16
    norm: str = "group"
    final_sigmoid: bool = True
    gray_input: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        f1, f2, f3, f4 = LiteBackbone(
            dtype=self.dtype, norm=self.norm, gray_input=self.gray_input
        )(x, train)
        y = jnp.concatenate([_upsample_to(f4, f3), f3], axis=-1)  # 256+128 @ /8
        y = DoubleConv(128, 96, self.dtype, self.norm)(y, train)
        y = jnp.concatenate([_upsample_to(y, f2), f2], axis=-1)   # 96+64 @ /4
        y = DoubleConv(64, 64, self.dtype, self.norm)(y, train)
        y = jnp.concatenate([_upsample_to(y, f1), f1], axis=-1)   # 64+32 @ /2
        feat = DoubleConv(64, 32, self.dtype, self.norm)(y, train)
        h = ConvBN(16, use_bn=False, dtype=self.dtype)(feat, train)
        out = nn.Conv(2, (1, 1), dtype=self.dtype)(h)
        out = out.astype(jnp.float32)
        return jax.nn.sigmoid(out) if self.final_sigmoid else out


# ---------------------------------------------------------------------------
# Published-layout variant (torch weight import)
# ---------------------------------------------------------------------------
#
# The published CRAFT (the detector easyocr drives at
# ``pipeline_demo/extractor/enhanced_extractor.py:520``) taps its VGG16-BN
# backbone mid-stage and PRE-ReLU: slice boundaries fall after the BatchNorm
# of the 2nd conv of stages 2-5 (torchvision features indices 11/18/28/38),
# with each following slice starting with the pending ReLU. The from-scratch
# CRAFT above uses stage-aligned post-ReLU taps, so published checkpoints
# cannot drive it; this variant reproduces the published dataflow exactly so
# ``models.weights.import_craft_from_torch`` gives reference users their
# detector weights for free (VERDICT round-2 item #2).


class _BNConvSeq(nn.Module):
    """Sequential [optional leading ReLU] + interleaved Conv/BN(+ReLU) with a
    pool inserted at ``pool_before`` (conv index), ending PRE-ReLU."""

    features: tuple
    pool_before: int = -1  # insert 2x2/2 maxpool before this conv index
    leading_relu: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if self.leading_relu:
            x = nn.relu(x)
        for i, f in enumerate(self.features):
            if i == self.pool_before:
                x = _maxpool(x)
            if i > 0:
                x = nn.relu(x)
            x = nn.Conv(f, (3, 3), padding="SAME", use_bias=True, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=True, dtype=self.dtype)(x)
        return x  # pre-ReLU, like the published slice outputs


class _Slice5(nn.Module):
    """fc6/fc7: stride-1 3x3 maxpool + dilated conv1024 + 1x1 conv1024
    (bias, no BN, no ReLU — published slice5 layout)."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.max_pool(x, (3, 3), (1, 1), "SAME")
        x = nn.Conv(1024, (3, 3), kernel_dilation=(6, 6), padding="SAME",
                    use_bias=True, dtype=self.dtype)(x)
        return nn.Conv(1024, (1, 1), use_bias=True, dtype=self.dtype)(x)


class _DoubleConvBN(nn.Module):
    """Published upconv block: 1x1 -> BN -> ReLU -> 3x3 -> BN -> ReLU."""

    mid: int
    out: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.mid, (1, 1), use_bias=True, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out, (3, 3), padding="SAME", use_bias=True, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype)(x)
        return nn.relu(x)


class CRAFTPublished(nn.Module):
    """CRAFT with the published torch dataflow, for imported weights.

    Input: (B, H, W, 3) ImageNet-normalized, H/W multiples of 32 (gray
    inputs: repeat to 3 channels first — use ``fold_gray_stem`` for the
    serving path). Output: (B, H/2, W/2, 2) raw region/affinity scores
    (published semantics: no sigmoid; values approximately in [0, 1]).
    """

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torchvision vgg16_bn feature indices in comments
        s1 = _BNConvSeq((64, 64, 128, 128), pool_before=2,
                        dtype=self.dtype, name="slice1")(x)          # 0-11: 128 @ /2
        s2 = _BNConvSeq((256, 256), pool_before=0, leading_relu=True,
                        dtype=self.dtype, name="slice2")(s1)         # 12-18: 256 @ /4
        s3 = _BNConvSeq((256, 512, 512), pool_before=1, leading_relu=True,
                        dtype=self.dtype, name="slice3")(s2)         # 19-28: 512 @ /8
        s4 = _BNConvSeq((512, 512, 512), pool_before=1, leading_relu=True,
                        dtype=self.dtype, name="slice4")(s3)         # 29-38: 512 @ /16
        fc7 = _Slice5(dtype=self.dtype, name="slice5")(s4)           # 1024 @ /16

        y = jnp.concatenate([fc7, s4], axis=-1)                      # 1536 @ /16
        y = _DoubleConvBN(512, 256, self.dtype, name="upconv1")(y)
        y = jnp.concatenate([_upsample_to(y, s3), s3], axis=-1)      # 768 @ /8
        y = _DoubleConvBN(256, 128, self.dtype, name="upconv2")(y)
        y = jnp.concatenate([_upsample_to(y, s2), s2], axis=-1)      # 384 @ /4
        y = _DoubleConvBN(128, 64, self.dtype, name="upconv3")(y)
        y = jnp.concatenate([_upsample_to(y, s1), s1], axis=-1)      # 192 @ /2
        y = _DoubleConvBN(64, 32, self.dtype, name="upconv4")(y)

        h = nn.relu(nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype)(y))
        h = nn.relu(nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype)(h))
        h = nn.relu(nn.Conv(16, (3, 3), padding="SAME", dtype=self.dtype)(h))
        h = nn.relu(nn.Conv(16, (1, 1), dtype=self.dtype)(h))
        out = nn.Conv(2, (1, 1), dtype=self.dtype)(h)
        return out.astype(jnp.float32)
