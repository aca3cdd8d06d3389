"""Sharded batched decode over an 8-device mesh equals single-device decode.

(ref: SURVEY.md §2.11 — utterance job-sharding becomes a sharded batch dim.)
"""

import numpy as np
import pytest

import jax

from kaldi_tpu.parallel.mesh import make_mesh, decode_sharded
from kaldi_tpu.decoder.dense import DenseViterbiDecoder

from test_dense_decoder import yesno_graph  # noqa: F401


def test_decode_sharded_matches_single(yesno_graph):
    packed, model, utts = yesno_graph
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    B = 8
    T = max(f.shape[0] for (_u, f, _w) in utts[:B])
    D = utts[0][1].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _w) in enumerate(utts[:B]):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    ll = model.am.loglikes_np(feats)
    dec = DenseViterbiDecoder(packed)
    single = dec.decode(ll, nf)

    mesh = make_mesh(data=8, model=1)
    sharded = decode_sharded(dec, ll, nf, mesh)
    for b in range(B):
        assert sharded[b][0] == single[b][0]
        assert sharded[b][2] == pytest.approx(single[b][2], abs=1e-3)
