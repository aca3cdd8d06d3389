"""Length-bucketed batch decoding == per-utterance decoding."""

import numpy as np
import pytest

from kaldi_tpu.decoder.batching import bucket_boundaries, decode_batched
from kaldi_tpu.decoder.dense import DenseViterbiDecoder

from test_dense_decoder import yesno_graph  # noqa: F401


def test_bucket_boundaries():
    b = bucket_boundaries([70, 100, 400, 900], max_buckets=4, min_len=64)
    assert b[0] >= 64 and b[-1] >= 900
    assert all(b[i] < b[i + 1] for i in range(len(b) - 1))


def test_decode_batched_matches_single(yesno_graph):
    packed, model, utts = yesno_graph
    dec = DenseViterbiDecoder(packed)

    def score_fn(feats):
        return model.am.loglikes_np(feats)

    keyed = [(u, f) for (u, f, _w) in utts]
    got = decode_batched(dec, keyed, score_fn, batch_size=4,
                         max_buckets=3)
    assert set(got) == {u for (u, _f) in keyed}
    for (u, f) in keyed:
        single = dec.decode(model.am.loglikes_np(f[None]),
                            np.array([f.shape[0]]))[0]
        assert got[u][0] == single[0], u
        assert got[u][2] == pytest.approx(single[2], abs=0.05)
