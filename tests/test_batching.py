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


@pytest.mark.slow
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


def test_decodable_adapters():
    """decodable-matrix/mapped/sum semantics as tensor transforms
    (ref: decoder/decodable-matrix.h, decodable-mapped.h, decodable-sum.h)."""
    import numpy as np
    import jax.numpy as jnp
    from kaldi_tpu.decoder.decodable import (
        scale_loglikes, map_loglikes, index_map_loglikes, sum_loglikes)
    lls = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    np.testing.assert_allclose(np.asarray(scale_loglikes(lls, 0.5)),
                               np.asarray(lls) * 0.5)
    id2pdf = np.array([-1, 0, 0, 1, 2, 3], np.int32)  # tids 1..5
    mapped = map_loglikes(lls, id2pdf, acoustic_scale=2.0)
    assert mapped.shape == (3, 6)
    np.testing.assert_allclose(np.asarray(mapped[:, 3]),
                               2.0 * np.asarray(lls[:, 1]))
    remap = index_map_loglikes(lls, np.array([3, 2, 1, 0]))
    np.testing.assert_allclose(np.asarray(remap),
                               np.asarray(lls)[:, ::-1])
    s = sum_loglikes([lls, lls], scales=[1.0, -0.5])
    np.testing.assert_allclose(np.asarray(s), 0.5 * np.asarray(lls))
    import pytest
    with pytest.raises(ValueError):
        sum_loglikes([lls], scales=[1.0, 2.0])
