"""On-device CTC prefix beam (decode/beam_device.py) vs the host oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from bbocr_tpu.decode.beam import ctc_beam_decode
from bbocr_tpu.decode.beam_device import ctc_beam_decode_device


def _host(lp, w, k):
    return ctc_beam_decode(lp, beam_width=w, top_k_per_frame=k)


class TestDeviceBeamParity:
    def test_labels_match_host_small_space(self):
        """Full symbol expansion: identical algorithm, identical labels."""
        rng = np.random.default_rng(4)
        t_len, n_cls = 6, 5
        for _ in range(20):
            logits = rng.normal(0, 2.0, (1, t_len, n_cls)).astype(np.float32)
            ids, lens, score = ctc_beam_decode_device(
                jnp.asarray(logits), beam_width=4, top_k=5, max_len=8
            )
            lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[0]), -1))
            lab, lp_best = _host(lp, 4, 5)
            dev = tuple(np.asarray(ids)[0][: int(lens[0])].tolist())
            assert dev == lab
            assert abs(lp_best - float(score[0])) < 2e-3

    def test_never_worse_than_host(self):
        """The device beam always applies the blank transition (the host
        only when blank lands in its per-frame top-k), so its best score
        must never be below the host's."""
        rng = np.random.default_rng(7)
        for t_len, n_cls, w, k in ((24, 20, 8, 12), (16, 40, 8, 8)):
            for _ in range(10):
                logits = rng.normal(0, 2.0, (1, t_len, n_cls)).astype(np.float32)
                _, _, score = ctc_beam_decode_device(
                    jnp.asarray(logits), beam_width=w, top_k=k, max_len=32
                )
                lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[0]), -1))
                _, lp_best = _host(lp, w, min(k + 1, n_cls))
                assert float(score[0]) >= lp_best - 2e-3

    def test_batched_with_padded_frames(self):
        """lengths mask: frames past the valid count are deterministic
        blanks and must not change the decode."""
        rng = np.random.default_rng(11)
        t_len, n_cls = 20, 12
        logits = rng.normal(0, 2.0, (3, t_len, n_cls)).astype(np.float32)
        lengths = jnp.asarray([20, 12, 5], jnp.int32)
        ids, lens, _ = ctc_beam_decode_device(
            jnp.asarray(logits), lengths, beam_width=6, top_k=8, max_len=16
        )
        # row 1 truncated at 12 frames == decoding the 12-frame slice alone
        ids_s, lens_s, _ = ctc_beam_decode_device(
            jnp.asarray(logits[1:2, :12]), beam_width=6, top_k=8, max_len=16
        )
        a = np.asarray(ids)[1][: int(lens[1])].tolist()
        b = np.asarray(ids_s)[0][: int(lens_s[0])].tolist()
        assert a == b

    def test_peaky_sequence_decodes_exactly(self):
        """A near-one-hot frame sequence must decode to its collapsed
        label with probability ~1."""
        seq = [3, 3, 0, 3, 1, 0, 0, 2, 2]
        n_cls = 5
        logits = np.full((1, len(seq), n_cls), -8.0, np.float32)
        for t, c in enumerate(seq):
            logits[0, t, c] = 8.0
        ids, lens, score = ctc_beam_decode_device(
            jnp.asarray(logits), beam_width=4, top_k=4, max_len=8
        )
        assert np.asarray(ids)[0][: int(lens[0])].tolist() == [3, 3, 1, 2]
        assert float(score[0]) > -0.01
