"""Torch recognizer weight import: structural round-trip on a synthetic
state dict shaped exactly like the published gen-2 recognizer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bbocr_tpu.models import CRNN
from bbocr_tpu.models.weights import import_crnn_from_torch


def synthetic_state_dict(n_cls=97, hidden=256, out_ch=256, rng=None):
    rng = rng or np.random.default_rng(0)
    sd = {}

    def conv(idx, cin, cout, k=3, bias=True):
        sd[f"module.FeatureExtraction.ConvNet.{idx}.weight"] = rng.normal(
            0, 0.05, (cout, cin, k, k)
        ).astype(np.float32)
        if bias:
            sd[f"module.FeatureExtraction.ConvNet.{idx}.bias"] = np.zeros(cout, np.float32)

    def bn(idx, ch):
        sd[f"module.FeatureExtraction.ConvNet.{idx}.weight"] = np.ones(ch, np.float32)
        sd[f"module.FeatureExtraction.ConvNet.{idx}.bias"] = np.zeros(ch, np.float32)
        sd[f"module.FeatureExtraction.ConvNet.{idx}.running_mean"] = np.zeros(ch, np.float32)
        sd[f"module.FeatureExtraction.ConvNet.{idx}.running_var"] = np.ones(ch, np.float32)

    oc = [out_ch // 8, out_ch // 4, out_ch // 2, out_ch]
    conv(0, 1, oc[0])
    conv(3, oc[0], oc[1])
    conv(6, oc[1], oc[2])
    conv(8, oc[2], oc[2])
    conv(11, oc[2], oc[3], bias=False)
    bn(12, oc[3])
    conv(14, oc[3], oc[3], bias=False)
    bn(15, oc[3])
    conv(18, oc[3], oc[3], k=2)

    def lstm(i, cin):
        for sfx in ("", "_reverse"):
            sd[f"module.SequenceModeling.{i}.rnn.weight_ih_l0{sfx}"] = rng.normal(
                0, 0.05, (4 * hidden, cin)
            ).astype(np.float32)
            sd[f"module.SequenceModeling.{i}.rnn.weight_hh_l0{sfx}"] = rng.normal(
                0, 0.05, (4 * hidden, hidden)
            ).astype(np.float32)
            sd[f"module.SequenceModeling.{i}.rnn.bias_ih_l0{sfx}"] = np.zeros(4 * hidden, np.float32)
            sd[f"module.SequenceModeling.{i}.rnn.bias_hh_l0{sfx}"] = np.zeros(4 * hidden, np.float32)
        sd[f"module.SequenceModeling.{i}.linear.weight"] = rng.normal(
            0, 0.05, (hidden, 2 * hidden)
        ).astype(np.float32)
        sd[f"module.SequenceModeling.{i}.linear.bias"] = np.zeros(hidden, np.float32)

    lstm(0, out_ch)
    lstm(1, hidden)
    sd["module.Prediction.weight"] = rng.normal(0, 0.05, (n_cls, hidden)).astype(np.float32)
    sd["module.Prediction.bias"] = np.zeros(n_cls, np.float32)
    return sd


class TestCRNNImport:
    def test_structure_matches_init(self):
        """Imported tree must be leaf-for-leaf identical in structure/shape
        to a freshly-initialized norm='batch' CRNN."""
        variables = import_crnn_from_torch(synthetic_state_dict())
        model = CRNN(num_classes=97, norm="batch", dtype=jnp.float32)
        ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 1)))

        flat_ref = {
            str(path): np.shape(leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(ref)[0]
        }
        flat_got = {
            str(path): np.shape(leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]
        }
        assert set(flat_ref) == set(flat_got)
        for path in flat_ref:
            assert flat_ref[path] == flat_got[path], path

    def test_forward_runs(self):
        variables = import_crnn_from_torch(synthetic_state_dict())
        model = CRNN(num_classes=97, norm="batch", dtype=jnp.float32)
        x = jnp.zeros((2, 32, 64, 1), jnp.float32)
        logits = model.apply(
            jax.tree_util.tree_map(jnp.asarray, variables), x
        )
        assert logits.shape == (2, 15, 97)
        assert np.isfinite(np.asarray(logits)).all()

    def test_torch_pth_roundtrip(self, tmp_path):
        """Real torch serialization: save a .pth, load via the helper."""
        torch = pytest.importorskip("torch")
        sd = {k: torch.from_numpy(np.asarray(v)) for k, v in synthetic_state_dict().items()}
        path = tmp_path / "english_g2.pth"
        torch.save(sd, str(path))

        from bbocr_tpu.models.weights import load_crnn_torch_checkpoint

        variables = load_crnn_torch_checkpoint(str(path))
        assert "params" in variables and "batch_stats" in variables
