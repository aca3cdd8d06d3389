"""Sharded beam search: utterance sharding (GSPMD) and frontier sharding
(shard_map + all_gather) must equal single-device decoding exactly.

(ref: SURVEY.md §2.11 — job-array decode parallelism becomes a sharded
batch dim; the frontier exchange for giant graphs uses ICI collectives.)
"""

import numpy as np
import pytest
import jax

from kaldi_tpu.decoder.biggraph import make_big_hclg, BigGraphConfig
from kaldi_tpu.decoder.csr_beam import CsrBeamDecoder, CsrBeamOpts
from kaldi_tpu.decoder.beam_search import BeamSearchDecoder, BeamSearchOpts
from kaldi_tpu.parallel.mesh import make_mesh, decode_sharded
from kaldi_tpu.parallel.frontier_decode import decode_frontier_sharded


@pytest.fixture(scope="module")
def graph():
    g, _ = make_big_hclg(BigGraphConfig(vocab=200, avg_bigram_succ=12,
                                        num_pdfs=48, seed=3))
    return g


@pytest.fixture(scope="module")
def ll_nf():
    rng = np.random.RandomState(11)
    B, T, P = 8, 40, 48
    ll = (rng.randn(B, T, P) * 3).astype(np.float32)
    nf = np.array([40, 30, 40, 25, 40, 40, 33, 40], np.int32)
    return ll, nf


def _same(a, b):
    assert (a is None) == (b is None)
    if a is None:
        return
    assert a[0] == b[0]
    assert a[1] == b[1]
    assert abs(a[2] - b[2]) < 1e-2


@pytest.mark.slow
def test_utterance_sharded_beam_search(graph, ll_nf):
    """decode_sharded (GSPMD over 'data') == single for BeamSearchDecoder
    and CsrBeamDecoder."""
    ll, nf = ll_nf
    mesh = make_mesh(data=8, model=1)
    for dec in (
        BeamSearchDecoder(graph, BeamSearchOpts(
            beam=1e9, max_active=128, acoustic_scale=0.1)),
        CsrBeamDecoder(graph, CsrBeamOpts(
            beam=1e9, max_active=128, acoustic_scale=0.1,
            expand_budget=4096, eps_budget=512)),
    ):
        single = dec.decode(ll, nf)
        sharded = decode_sharded(dec, ll, nf, mesh)
        for b in range(len(nf)):
            _same(single[b], sharded[b])


def test_frontier_sharded_beam_search(graph, ll_nf):
    """Frontier-sharded decode (token slices per device, candidate
    all_gather over the mesh axis) == the unsharded CSR decoder."""
    ll, nf = ll_nf
    mesh = make_mesh(data=1, model=8)
    dec = CsrBeamDecoder(graph, CsrBeamOpts(
        beam=1e9, max_active=128, acoustic_scale=0.1,
        expand_budget=4096, eps_budget=512))
    single = dec.decode(ll[:2], nf[:2])
    sharded = decode_frontier_sharded(dec, ll[:2], nf[:2], mesh,
                                      axis="model")
    for b in range(2):
        _same(single[b], sharded[b])
