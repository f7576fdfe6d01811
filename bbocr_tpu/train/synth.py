"""Synthetic training data: rendered text crops + detection heatmaps.

The reference consumes pretrained EasyOCR weights; this rebuild owns its
training loop, so it needs a data source. Book covers/imprint pages are
short latin text on low-texture backgrounds — synthetic rendering with real
fonts covers that distribution well (the PP-OCR line of work trains
production recognizers largely on synthetic data).

Host-side generation (PIL rasterization), arranged for async prefetch into
device batches by the trainer.
"""

from __future__ import annotations

import glob
import os
import random
import string
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from bbocr_tpu.models.charset import EN_CHARSET, Charset
from bbocr_tpu.models.crnn import INPUT_HEIGHT

_FONT_DIRS = (
    "/usr/share/fonts/truetype/dejavu",
    "/usr/share/fonts/truetype",
    "/usr/share/fonts",
)

_WORDS = (
    "the of and a to in is was he for it with as his on be at by had not are "
    "but from or have an they which one you were her all she there would "
    "their we him been has when who will more no if out so said what up its "
    "press books publishing edition library first second copyright printed "
    "published reserved rights international paperback hardcover isbn new "
    "york london chapter novel author history science art house random"
).split()


def _find_fonts() -> List[str]:
    fonts: List[str] = []
    for d in _FONT_DIRS:
        fonts.extend(sorted(glob.glob(os.path.join(d, "**", "*.ttf"), recursive=True)))
        if fonts:
            break
    return fonts


@dataclass
class SynthConfig:
    charset: Charset = EN_CHARSET
    max_label_len: int = 24
    height: int = INPUT_HEIGHT
    invert_prob: float = 0.3
    noise_std: float = 6.0


class TextLineGenerator:
    """Random text line crops for recognizer training."""

    def __init__(self, config: SynthConfig = SynthConfig(), seed: int = 0):
        self.config = config
        self.rng = random.Random(seed)
        self.np_rng = np.random.default_rng(seed)
        self.fonts = _find_fonts()
        self._font_cache = {}

    def _font(self, size: int):
        if not self.fonts:
            return ImageFont.load_default(size=size)
        path = self.rng.choice(self.fonts)
        key = (path, size)
        if key not in self._font_cache:
            self._font_cache[key] = ImageFont.truetype(path, size)
        return self._font_cache[key]

    def sample_text(self) -> str:
        r = self.rng.random()
        if r < 0.25:
            # numbers / ISBN-ish strings (digit-heavy CTC per BASELINE config 3)
            n = self.rng.randint(4, 17)
            chars = string.digits + "-"
            return "".join(self.rng.choice(chars) for _ in range(n))
        if r < 0.35:
            year = self.rng.randint(1850, 2029)
            return self.rng.choice([f"© {year}", f"Copyright {year}", str(year)])
        n_words = self.rng.randint(1, 4)
        words = [self.rng.choice(_WORDS) for _ in range(n_words)]
        style = self.rng.random()
        text = " ".join(words)
        if style < 0.3:
            return text.upper()
        if style < 0.6:
            return text.title()
        return text

    def render(self, text: Optional[str] = None, width: int = 256) -> Tuple[np.ndarray, str]:
        """Render one (height, width) float32 crop in [0,255] + its label."""
        cfg = self.config
        if text is None:
            text = self.sample_text()
        # Cap label length so a CTC alignment exists in T = width/4 - 1
        # frames (worst case needs ~2 frames per char: char + separator).
        frames = width // 4 - 1
        max_chars = max(1, min(cfg.max_label_len, (frames - 1) // 2))
        text = "".join(c for c in text if c in cfg.charset.chars)[:max_chars]
        if not text:
            text = self.rng.choice(_WORDS)
        size = self.rng.randint(18, 30)
        font = self._font(size)
        bg = self.rng.randint(170, 255)
        fg = self.rng.randint(0, 90)
        if self.rng.random() < cfg.invert_prob:
            bg, fg = fg, bg
        img = Image.new("L", (width * 2, cfg.height * 2), bg)
        draw = ImageDraw.Draw(img)
        x0 = self.rng.randint(0, 6)
        y0 = self.rng.randint(0, max(1, cfg.height * 2 - size - 8))
        draw.text((x0, y0), text, fill=fg, font=font)
        bbox = img.getbbox() if bg == 0 else ImageDraw.Draw(img).textbbox((x0, y0), text, font=font)
        left, top, right, bottom = bbox
        pad = self.rng.randint(1, 4)
        crop = img.crop((max(0, left - pad), max(0, top - pad), right + pad, bottom + pad))
        # Loose-crop augmentation: detected quads include margins around the
        # glyphs (CRAFT dilation growth), so the text occupies only part of
        # the rectified 32px crop; train with the same looseness.
        text_h = int(cfg.height * self.rng.uniform(0.45, 1.0))
        w = max(8, min(int(crop.width * text_h / max(crop.height, 1)), width))
        crop = crop.resize((w, text_h), Image.BILINEAR)
        out = np.full((cfg.height, width), bg, np.float32)
        y_off = self.rng.randint(0, cfg.height - text_h) if cfg.height > text_h else 0
        x_off = self.rng.randint(0, max(0, min(6, width - w)))
        out[y_off : y_off + text_h, x_off : x_off + w] = np.asarray(crop, np.float32)
        edge = min(x_off + w, width - 1)
        out[:, edge:] = out[:, edge - 1 : edge]  # edge-replicate like the engine
        # photo-like jitter: small rotation (book photos are hand-held) and
        # mild blur, matching what rectified crops of real captures look like
        if self.rng.random() < 0.5:
            from PIL import Image as _Image

            angle = self.rng.uniform(-2.5, 2.5)
            pil = _Image.fromarray(out.astype(np.uint8))
            out = np.asarray(
                pil.rotate(angle, resample=_Image.BILINEAR, fillcolor=int(bg)),
                np.float32,
            )
        if self.rng.random() < 0.3:
            k = np.array([0.25, 0.5, 0.25])
            out = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 1, out)
        noise = self.np_rng.normal(0.0, cfg.noise_std, out.shape)
        out = np.clip(out + noise, 0, 255)
        return out.astype(np.float32), text

    def batch(self, batch_size: int, width: int = 256):
        """(B, H, W) crops, (B, L) labels, (B,) label_lens, (B,) frame_lens."""
        cfg = self.config
        crops = np.zeros((batch_size, cfg.height, width), np.float32)
        labels = np.zeros((batch_size, cfg.max_label_len), np.int32)
        label_lens = np.zeros(batch_size, np.int32)
        for i in range(batch_size):
            crop, text = self.render(width=width)
            crops[i] = crop
            enc = cfg.charset.encode(text)[: cfg.max_label_len]
            labels[i, : len(enc)] = enc
            label_lens[i] = len(enc)
        frame_lens = np.full(batch_size, width // 4 - 1, np.int32)
        return crops, labels, label_lens, frame_lens


class PageGenerator:
    """Synthetic pages + CRAFT-style region/affinity heatmaps for the detector."""

    def __init__(self, config: SynthConfig = SynthConfig(), seed: int = 0):
        self.config = config
        self.rng = random.Random(seed + 7)
        self.lines = TextLineGenerator(config, seed + 13)

    def render(self, height: int = 256, width: int = 192):
        """Returns (page (H, W) float32, heatmaps (H/2, W/2, 2) float32)."""
        bg = self.rng.randint(160, 250)
        page = np.full((height, width), bg, np.float32)
        region = np.zeros((height // 2, width // 2), np.float32)
        affinity = np.zeros((height // 2, width // 2), np.float32)
        n_lines = self.rng.randint(1, 5)
        y = self.rng.randint(4, 24)
        for _ in range(n_lines):
            text = self.lines.sample_text()
            # wide font-size range: detection must fire across text scales
            font = self.lines._font(self.rng.randint(10, 34))
            tmp = Image.new("L", (width, 48), bg)
            d = ImageDraw.Draw(tmp)
            bbox = d.textbbox((2, 2), text, font=font)
            d.text((2, 2), text, fill=self.rng.randint(0, 80), font=font)
            tw = min(bbox[2] + 2, width)
            th = min(bbox[3] + 2, 48)
            if y + th >= height:
                break
            x = self.rng.randint(0, width - tw) if width > tw else 0
            patch = np.asarray(tmp, np.float32)[:th, :tw]
            page[y : y + th, x : x + tw] = patch
            # char-level gaussians: approximate per-character centers evenly
            n_chars = max(len(text), 1)
            cw = tw / n_chars
            for ci in range(n_chars):
                if text[ci] == " ":
                    continue
                cx = (x + (ci + 0.5) * cw) / 2.0
                cy = (y + th / 2.0) / 2.0
                _add_gaussian(region, cx, cy, max(cw, th) / 4.0)
                if ci + 1 < n_chars and text[ci + 1] != " ":
                    ax = (x + (ci + 1.0) * cw) / 2.0
                    _add_gaussian(affinity, ax, cy, max(cw, th) / 5.0)
            y += th + self.rng.randint(4, 20)
        noise = np.random.default_rng(self.rng.randint(0, 1 << 31)).normal(
            0, self.config.noise_std, page.shape
        )
        page = np.clip(page + noise, 0, 255).astype(np.float32)
        maps = np.stack([region, affinity], axis=-1)
        return page, np.clip(maps, 0.0, 1.0).astype(np.float32)

    def batch(self, batch_size: int, height: int = 256, width: int = 192):
        pages = np.zeros((batch_size, height, width), np.float32)
        maps = np.zeros((batch_size, height // 2, width // 2, 2), np.float32)
        for i in range(batch_size):
            pages[i], maps[i] = self.render(height, width)
        return pages, maps


def _add_gaussian(canvas: np.ndarray, cx: float, cy: float, sigma: float) -> None:
    h, w = canvas.shape
    r = max(int(3 * sigma), 2)
    x0, x1 = max(0, int(cx - r)), min(w, int(cx + r) + 1)
    y0, y1 = max(0, int(cy - r)), min(h, int(cy + r) + 1)
    if x0 >= x1 or y0 >= y1:
        return
    ys = np.arange(y0, y1)[:, None] - cy
    xs = np.arange(x0, x1)[None, :] - cx
    g = np.exp(-(xs**2 + ys**2) / (2 * sigma * sigma))
    canvas[y0:y1, x0:x1] = np.maximum(canvas[y0:y1, x0:x1], g)
