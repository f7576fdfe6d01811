"""Pallas TPU kernels for the preprocessing chain's hot passes.

The reference runs its OpenCV/PIL chain as ~7 separate full-image passes on
the host CPU (``image_preprocessor.py:147-160``); SURVEY.md §2.9 marks this
chain as the fused-Pallas target. The XLA version in
``bbocr_tpu.preprocess.chain`` already fuses the elementwise algebra; these
kernels additionally fuse the small separable convolutions with their
quantize/blend epilogues so each stage is ONE HBM read + ONE HBM write:

- ``blur3_u8_pallas``: 3x3 Gaussian + uint8 quantize.
- ``enhance_u8_pallas``: PIL contrast blend + brightness blend + quantize
  (per-image mean arrives as a scalar-prefetch operand).
- ``unsharp_u8_pallas``: Pillow's 3-pass box Gaussian collapsed to one
  7-tap separable conv + threshold/sharpen epilogue.

Pattern: the padded image stays in HBM (``pltpu.ANY``); each grid step DMAs
a row-block WITH its halo into VMEM scratch (overlapping reads are not
expressible as BlockSpecs), computes on the VPU, and writes a disjoint
output block. Interpret mode keeps the kernels testable on CPU.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bbocr_tpu.ops.filters import gaussian_kernel_1d, pil_gaussian_kernel_1d
from bbocr_tpu.utils.env import on_tpu

ROW_BLOCK = 64  # rows per grid step


def pallas_available() -> bool:
    return True  # interpret mode on CPU; compiled on TPU


def _interpret() -> bool:
    return not on_tpu()


def _quant(x):
    return jnp.clip(jnp.round(x), 0.0, 255.0)


# ---------------------------------------------------------------------------
# Separable conv + epilogue, halo'd row blocks
# ---------------------------------------------------------------------------


# Halo rows are over-fetched to this sublane-aligned margin: the tunneled
# Mosaic AOT compiler rejects DMAs whose sublane extent is not a multiple
# of 8, so each block reads [i*BR, i*BR + BR + 2*HALO_PAD) of the padded
# image and indexes the true halo inside the window.
HALO_PAD = 8


def _sepconv_kernel(img_hbm, out_ref, scratch, sem, *, taps, w_out, epilogue):
    """One row-block: aligned-window DMA + separable filter + epilogue."""
    halo = (len(taps) - 1) // 2
    i = pl.program_id(1)
    n = pl.program_id(0)
    rows = ROW_BLOCK + 2 * HALO_PAD
    dma = pltpu.make_async_copy(
        img_hbm.at[n, pl.ds(i * ROW_BLOCK, rows), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    x = scratch[:]
    # vertical pass: output row k reads padded rows HALO_PAD + k - halo + t
    v = None
    for t_idx, t in enumerate(taps):
        off = HALO_PAD - halo + t_idx
        term = float(t) * x[off : off + ROW_BLOCK, :]
        v = term if v is None else v + term
    # horizontal pass: columns were padded by `halo` on the left
    h = None
    for t_idx, t in enumerate(taps):
        term = float(t) * v[:, t_idx : t_idx + w_out]
        h = term if h is None else h + term
    out_ref[0] = epilogue(h, x[HALO_PAD : HALO_PAD + ROW_BLOCK, halo : halo + w_out])


def _run_sepconv(img: jnp.ndarray, taps: Sequence[float], epilogue, border: str = "reflect") -> jnp.ndarray:
    """img: (N, H, W) float32 -> filtered (N, H, W).

    ``border``: numpy pad mode — "reflect" (cv2 REFLECT_101) or "edge"
    (cv2/PIL replicate)."""
    n, h, w = img.shape
    halo = (len(taps) - 1) // 2
    h_pad = -(-h // ROW_BLOCK) * ROW_BLOCK
    # border pad for the filter, then alignment pad: HALO_PAD rows top and
    # bottom of the whole stack, lanes to a 128 multiple.
    padded = jnp.pad(img, ((0, 0), (halo, halo), (halo, halo)), mode=border)
    w_lanes = -(-(w + 2 * halo) // 128) * 128
    padded = jnp.pad(
        padded,
        (
            (0, 0),
            (HALO_PAD - halo, (HALO_PAD - halo) + (h_pad - h) + HALO_PAD),
            (0, w_lanes - (w + 2 * halo)),
        ),
    )

    kernel = functools.partial(
        _sepconv_kernel, taps=tuple(taps), w_out=w, epilogue=epilogue
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, h_pad // ROW_BLOCK),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, ROW_BLOCK, w), lambda ni, i: (ni, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_pad, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ROW_BLOCK + 2 * HALO_PAD, w_lanes), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(padded)
    return out[:, :h, :]


# ---------------------------------------------------------------------------
# Public kernels
# ---------------------------------------------------------------------------


def blur3_u8_pallas(img: jnp.ndarray, sigma: float = 3.0) -> jnp.ndarray:
    """cv2.GaussianBlur((3,3), sigma) + uint8 store, (N, H, W) float32."""
    taps = gaussian_kernel_1d(3, sigma)
    return _run_sepconv(img, taps, lambda conv, center: _quant(conv), border="reflect")


def unsharp_u8_pallas(
    img: jnp.ndarray, percent: int = 30, threshold: int = 3, radius: float = 1.0
) -> jnp.ndarray:
    """PIL UnsharpMask: blur, then sharpen where |src-blur| >= threshold."""
    taps = pil_gaussian_kernel_1d(radius)

    def epilogue(conv, center):
        blurred = _quant(conv)
        src = _quant(center)
        diff = src - blurred
        scaled = diff * float(percent)
        adj = jnp.sign(scaled) * jnp.floor(jnp.abs(scaled) / 100.0)
        return _quant(jnp.where(jnp.abs(diff) >= threshold, src + adj, src))

    return _run_sepconv(img, taps, epilogue, border="edge")


def _enhance_kernel(mean_ref, img_ref, out_ref, *, contrast, brightness):
    x = img_ref[0]
    mean = mean_ref[pl.program_id(0)]
    # PIL Contrast: blend with solid(mean); rounds half-up, clips.
    y = jnp.clip(jnp.floor(mean + contrast * (x - mean) + 0.5), 0.0, 255.0)
    # PIL Brightness: blend with black.
    out_ref[0] = jnp.clip(jnp.floor(brightness * y + 0.5), 0.0, 255.0)


def enhance_u8_pallas(
    img: jnp.ndarray, mean: jnp.ndarray, contrast: float, brightness: float
) -> jnp.ndarray:
    """Fused PIL Contrast(c) + Brightness(b); ``mean``: (N,) rounded means."""
    n, h, w = img.shape
    h_pad = -(-h // ROW_BLOCK) * ROW_BLOCK
    padded = jnp.pad(img, ((0, 0), (0, h_pad - h), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_enhance_kernel, contrast=contrast, brightness=brightness),
        grid=(n, h_pad // ROW_BLOCK),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ROW_BLOCK, w), lambda ni, i: (ni, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ROW_BLOCK, w), lambda ni, i: (ni, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_pad, w), jnp.float32),
        interpret=_interpret(),
    )(mean.astype(jnp.float32), padded)
    return out[:, :h, :]
