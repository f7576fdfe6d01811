"""Round-trip parity: published torch CRAFT -> import_craft_from_torch ->
CRAFTPublished.

The torch reference below is assembled in-test from the published
architecture spec (VGG16-BN features with CRAFT's slice taps at indices
11/18/28/38, fc6/fc7 slice5, double_conv upconvs, conv_cls head) — the
detector easyocr runs at ``pipeline_demo/extractor/enhanced_extractor.py:520``.
Random weights, eval mode: if the mapped flax model reproduces the same
score maps, real published checkpoints (craft_mlt_25k.pth) drive the TPU
engine unchanged.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from bbocr_tpu.models.craft import CRAFTPublished
from bbocr_tpu.models.weights import import_craft_from_torch


def _vgg16_bn_features():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
           512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.BatchNorm2d(v),
                       nn.ReLU(inplace=True)]
            in_ch = v
    return nn.Sequential(*layers)


class _TorchBase(nn.Module):
    def __init__(self):
        super().__init__()
        feats = _vgg16_bn_features()
        self.slice1 = nn.Sequential()
        self.slice2 = nn.Sequential()
        self.slice3 = nn.Sequential()
        self.slice4 = nn.Sequential()
        for i in range(12):
            self.slice1.add_module(str(i), feats[i])
        for i in range(12, 19):
            self.slice2.add_module(str(i), feats[i])
        for i in range(19, 29):
            self.slice3.add_module(str(i), feats[i])
        for i in range(29, 39):
            self.slice4.add_module(str(i), feats[i])
        self.slice5 = nn.Sequential(
            nn.MaxPool2d(kernel_size=3, stride=1, padding=1),
            nn.Conv2d(512, 1024, kernel_size=3, padding=6, dilation=6),
            nn.Conv2d(1024, 1024, kernel_size=1),
        )

    def forward(self, x):
        h = self.slice1(x)
        s1 = h
        h = self.slice2(h)
        s2 = h
        h = self.slice3(h)
        s3 = h
        h = self.slice4(h)
        s4 = h
        fc7 = self.slice5(h)
        return s1, s2, s3, s4, fc7


def _double_conv(in_ch, mid, out):
    return nn.Sequential(
        nn.Conv2d(in_ch + mid, mid, 1), nn.BatchNorm2d(mid), nn.ReLU(inplace=True),
        nn.Conv2d(mid, out, 3, padding=1), nn.BatchNorm2d(out), nn.ReLU(inplace=True),
    )


class _TorchCRAFT(nn.Module):
    def __init__(self):
        super().__init__()
        self.basenet = _TorchBase()
        self.upconv1 = nn.Module()
        self.upconv1.conv = _double_conv(1024, 512, 256)
        self.upconv2 = nn.Module()
        self.upconv2.conv = _double_conv(512, 256, 128)
        self.upconv3 = nn.Module()
        self.upconv3.conv = _double_conv(256, 128, 64)
        self.upconv4 = nn.Module()
        self.upconv4.conv = _double_conv(128, 64, 32)
        self.conv_cls = nn.Sequential(
            nn.Conv2d(32, 32, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(32, 32, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(32, 16, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(16, 16, 1), nn.ReLU(inplace=True),
            nn.Conv2d(16, 2, 1),
        )

    def forward(self, x):
        s1, s2, s3, s4, fc7 = self.basenet(x)
        y = torch.cat([fc7, s4], dim=1)
        y = self.upconv1.conv(y)
        y = F.interpolate(y, size=s3.shape[2:], mode="bilinear", align_corners=False)
        y = torch.cat([y, s3], dim=1)
        y = self.upconv2.conv(y)
        y = F.interpolate(y, size=s2.shape[2:], mode="bilinear", align_corners=False)
        y = torch.cat([y, s2], dim=1)
        y = self.upconv3.conv(y)
        y = F.interpolate(y, size=s1.shape[2:], mode="bilinear", align_corners=False)
        y = torch.cat([y, s1], dim=1)
        y = self.upconv4.conv(y)
        return self.conv_cls(y)


def _randomize_bn_stats(model, gen):
    # fresh BN modules ship mean=0/var=1; randomize so the test actually
    # exercises the running-stats mapping
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=gen) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=gen) + 0.5)


@pytest.mark.parametrize("hw", [(64, 64), (96, 64)])
def test_torch_roundtrip_score_parity(hw):
    gen = torch.Generator().manual_seed(7)
    ref = _TorchCRAFT()
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        _randomize_bn_stats(ref, gen)
    ref.eval()

    x = torch.randn((1, 3, hw[0], hw[1]), generator=gen)
    with torch.no_grad():
        want = ref(x).permute(0, 2, 3, 1).numpy()  # NCHW -> NHWC

    variables = import_craft_from_torch(ref.state_dict())
    model = CRAFTPublished(dtype=jnp.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))

    assert got.shape == want.shape == (1, hw[0] // 2, hw[1] // 2, 2)
    assert np.max(np.abs(got - want)) < 2e-3, float(np.max(np.abs(got - want)))


def test_module_prefix_stripped():
    gen = torch.Generator().manual_seed(3)
    ref = _TorchCRAFT()
    ref.eval()
    sd = {f"module.{k}": v for k, v in ref.state_dict().items()}
    variables = import_craft_from_torch(sd)
    assert "slice1" in variables["params"]
    assert variables["params"]["slice1"]["Conv_0"]["kernel"].shape == (3, 3, 3, 64)


def test_pth_roundtrip(tmp_path):
    ref = _TorchCRAFT()
    ref.eval()
    p = tmp_path / "craft_mlt_25k.pth"
    torch.save(ref.state_dict(), p)
    from bbocr_tpu.models.weights import load_craft_torch_checkpoint

    variables = load_craft_torch_checkpoint(str(p))
    assert variables["params"]["Conv_4"]["kernel"].shape == (1, 1, 16, 2)
    assert "batch_stats" in variables


def test_engine_autoselects_published_variant(tmp_path):
    """from_checkpoint with a published-layout tree runs the published
    dataflow end to end (readtext on a small page)."""
    import jax

    from bbocr_tpu.models.craft import CRAFTPublished
    from bbocr_tpu.models.crnn import CRNN, INPUT_HEIGHT
    from bbocr_tpu.models.charset import EN_CHARSET
    from bbocr_tpu.runtime.engine import EngineConfig, OCREngine
    from bbocr_tpu.runtime.bucketing import CanvasSpec
    from bbocr_tpu.utils.checkpoint import load_params, save_params

    craft = CRAFTPublished(dtype=jnp.float32)
    cv = craft.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    crnn = CRNN(num_classes=EN_CHARSET.num_classes)
    rv = crnn.init(jax.random.PRNGKey(1), jnp.zeros((1, INPUT_HEIGHT, 64, 1), jnp.float32))
    cp, rp = tmp_path / "craft.npz", tmp_path / "crnn.npz"
    save_params(str(cp), jax.device_get(cv))
    save_params(str(rp), jax.device_get(rv))

    config = EngineConfig(canvases=(CanvasSpec(64, 64),), compute_dtype=jnp.float32)
    engine = OCREngine.from_checkpoint(str(cp), str(rp), config=config)
    assert type(engine.craft).__name__ == "CRAFTPublished"
    assert engine._fold is False
    out = engine.readtext(np.full((60, 60), 220, np.float32))
    assert isinstance(out, list)  # random weights: any box list is fine
