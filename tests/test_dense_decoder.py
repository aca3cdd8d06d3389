"""Dense full-state decoder == beam decoder on small graphs.

(ref: the reference validates FasterDecoder against SimpleDecoder; here the
 beam decoder, already validated end-to-end, is the oracle.)
"""

import numpy as np
import pytest

from kaldi_tpu.decoder.dense import DenseViterbiDecoder, make_decoder
from kaldi_tpu.decoder.beam_search import BeamSearchDecoder, BeamSearchOpts


@pytest.fixture(scope="module")
def yesno_graph():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_yesno_e2e import synth_utterance, YESNO_ARPA, SR
    import jax.numpy as jnp
    from kaldi_tpu.fst.lang import Lexicon, prepare_lang
    from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
    from kaldi_tpu.fst.graph import make_hclg
    from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
    from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
    from kaldi_tpu.decoder.graph_pack import pack_graph

    rng = np.random.RandomState(21)
    lex = Lexicon.parse("YES Y1 Y2\nNO N1 N2")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    fo = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def featize(w):
        return np.asarray(add_deltas(mfcc(jnp.asarray(w), fo), order=2,
                                     window=2))

    utts = []
    for i in range(10):
        ws = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 4))]
        utts.append((f"u{i}", featize(synth_utterance(ws, rng)), ws))
    model = train_mono(lang, utts, MonoTrainOpts(
        num_iters=8, totgauss=30, max_iter_inc=6,
        realign_iters=tuple(range(1, 8))))
    g = arpa_to_g(ArpaLm.parse(YESNO_ARPA), lang.words)
    graph = make_hclg(lang, g, model.trans_model, model.ctx_dep,
                      self_loop_scale=0.1)
    packed = pack_graph(graph.fst, model.trans_model.id2pdf_array)
    return packed, model, utts


def test_dense_matches_beam(yesno_graph):
    packed, model, utts = yesno_graph
    B = len(utts)
    T = max(f.shape[0] for (_u, f, _w) in utts)
    D = utts[0][1].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _w) in enumerate(utts):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    ll = model.am.loglikes_np(feats)

    beam = BeamSearchDecoder(packed, BeamSearchOpts(
        beam=100.0, max_active=packed.num_states + 8, acoustic_scale=0.1))
    dense = DenseViterbiDecoder(packed)
    r_beam = beam.decode(ll, nf)
    r_dense = dense.decode(ll, nf)
    for b in range(B):
        assert r_dense[b] is not None
        assert r_dense[b][0] == r_beam[b][0], b           # words
        assert r_dense[b][2] == pytest.approx(r_beam[b][2], abs=0.05)
        assert len(r_dense[b][1]) == int(nf[b])           # one tid per frame


def test_assoc_path_matches_sequential(yesno_graph):
    """The time-parallel (associative-scan) forward pass must produce the
    same words/costs as the sequential scan, including padded frames."""
    import dataclasses as dc
    from kaldi_tpu.decoder.dense import DenseDecoderOpts
    packed, model, utts = yesno_graph
    B = len(utts)
    T = max(f.shape[0] for (_u, f, _w) in utts) + 17   # force ragged pad
    D = utts[0][1].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _w) in enumerate(utts):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    ll = model.am.loglikes_np(feats)
    seq = DenseViterbiDecoder(packed, DenseDecoderOpts(assoc_max_states=0))
    par = DenseViterbiDecoder(packed, DenseDecoderOpts(assoc_max_states=64))
    r_seq = seq.decode(ll, nf)
    r_par = par.decode(ll, nf)
    for b in range(B):
        assert r_par[b][0] == r_seq[b][0]
        assert r_par[b][1] == r_seq[b][1]
        assert r_par[b][2] == pytest.approx(r_seq[b][2], abs=0.02)


def test_make_decoder_dispatch(yesno_graph):
    packed, _model, _utts = yesno_graph
    d = make_decoder(packed)
    assert isinstance(d, DenseViterbiDecoder)
    d2 = make_decoder(packed, dense_threshold=1)
    assert isinstance(d2, BeamSearchDecoder)
