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


def _mini_graph(arcs, num_states, start=0, finals=(1,)):
    """arcs: [(src, dst, ilabel, olabel, cost, pdf)]."""
    from kaldi_tpu.decoder.graph_pack import PackedGraph
    arcs = sorted(arcs, key=lambda a: (a[0], -(a[2] > 0)))
    arc_start = np.zeros(num_states + 1, np.int32)
    src = np.array([a[0] for a in arcs])
    for s in range(num_states):
        arc_start[s + 1] = np.searchsorted(src, s + 1)
    final = np.full(num_states, np.inf, np.float32)
    for f in finals:
        final[f] = 0.0
    return PackedGraph(
        arc_start=arc_start,
        ilabel=np.array([a[2] for a in arcs], np.int32),
        olabel=np.array([a[3] for a in arcs], np.int32),
        cost=np.array([a[4] for a in arcs], np.float32),
        nextstate=np.array([a[1] for a in arcs], np.int32),
        final=final, start=start,
        pdf=np.array([a[5] for a in arcs], np.int32))


def test_deep_eps_chain_decodes():
    """Regression: a graph needing MORE closure rounds than the default 3
    must raise eps_expansions, not silently fail."""
    from kaldi_tpu.decoder.beam_search import (BeamSearchDecoder,
                                               BeamSearchOpts,
                                               eps_chain_depth)
    # emit from 0->1, then 5 chained eps arcs 1..6, state 6 final
    arcs = [(0, 1, 1, 9, 0.1, 0)]
    for k in range(5):
        arcs.append((1 + k, 2 + k, 0, 0, 0.1, -1))
    g = _mini_graph(arcs, 7, finals=(6,))
    assert eps_chain_depth(g) == 5
    ll = np.zeros((1, 1, 1), np.float32)
    nf = np.array([1], np.int32)
    for dec in (BeamSearchDecoder(g, BeamSearchOpts(beam=100.0,
                                                    max_active=8,
                                                    acoustic_scale=1.0)),
                DenseViterbiDecoder(g)):
        res = dec.decode(ll, nf)
        assert res[0] is not None, type(dec).__name__
        assert res[0][0] == [9]
        assert res[0][2] == pytest.approx(0.6, abs=1e-4)


def test_eps_free_graph_decodes():
    """Regression: graphs with NO eps arcs (eps_expansions=0) used to
    crash in the traceback's empty stack."""
    from kaldi_tpu.decoder.beam_search import (BeamSearchDecoder,
                                               BeamSearchOpts)
    arcs = [(0, 1, 1, 7, 0.5, 0), (1, 1, 2, 0, 0.25, 0)]
    g = _mini_graph(arcs, 2, finals=(1,))
    ll = np.zeros((1, 3, 1), np.float32)
    nf = np.array([3], np.int32)
    for dec in (BeamSearchDecoder(g, BeamSearchOpts(beam=100.0,
                                                    max_active=8,
                                                    acoustic_scale=1.0)),
                DenseViterbiDecoder(g)):
        res = dec.decode(ll, nf)
        assert res[0] is not None, type(dec).__name__
        assert res[0][0] == [7]
        assert len(res[0][1]) == 3
        assert res[0][2] == pytest.approx(1.0, abs=1e-4)


def test_pack_without_pdf_rejected():
    from kaldi_tpu.decoder.beam_search import BeamSearchDecoder
    from kaldi_tpu.decoder.graph_pack import PackedGraph
    g = PackedGraph(arc_start=np.array([0, 1, 1]),
                    ilabel=np.array([1], np.int32),
                    olabel=np.array([0], np.int32),
                    cost=np.zeros(1, np.float32),
                    nextstate=np.array([1], np.int32),
                    final=np.zeros(2, np.float32), start=0, pdf=None)
    with pytest.raises(AssertionError):
        BeamSearchDecoder(g)
    with pytest.raises(AssertionError):
        DenseViterbiDecoder(g)


def test_make_decoder_dispatch(yesno_graph):
    packed, _model, _utts = yesno_graph
    d = make_decoder(packed)
    assert isinstance(d, DenseViterbiDecoder)
    d2 = make_decoder(packed, dense_threshold=1)
    assert isinstance(d2, BeamSearchDecoder)


def test_checkpointed_traceback_matches_full_arena():
    """_dense_decode_ckpt must produce identical results to the full
    arena path, including with T not a multiple of the chunk and
    per-utterance lengths."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from kaldi_tpu.decoder.dense import DenseViterbiDecoder, DenseDecoderOpts
    from kaldi_tpu.decoder.graph_pack import PackedGraph
    rng = np.random.RandomState(7)
    S, deg, P = 120, 3, 16
    A = S * deg
    arc_start = np.arange(S + 1, dtype=np.int32) * deg
    il = np.zeros(A, np.int32)
    ol = np.zeros(A, np.int32)
    pdf = np.full(A, -1, np.int32)
    nxt = rng.randint(0, S, A).astype(np.int32)
    cost = rng.uniform(0.1, 2.0, A).astype(np.float32)
    for k in range(deg - 1):
        idx = np.arange(S) * deg + k
        il[idx] = rng.randint(1, 40, S)
        pdf[idx] = rng.randint(0, P, S)
        ol[idx] = rng.randint(0, 6, S)
    final = np.full(S, np.inf, np.float32)
    final[rng.randint(0, S, 10)] = 0.0
    g = PackedGraph(start=0, arc_start=arc_start, ilabel=il, olabel=ol,
                    cost=cost, nextstate=nxt, pdf=pdf, final=final)
    B, T = 3, 37   # deliberately not a multiple of the chunk
    ll = rng.randn(B, T, P).astype(np.float32)
    nf = np.array([37, 20, 31], np.int32)
    # the random eps subgraph is cyclic: closure rounds must be given
    # explicitly (auto-inference raises — see test_cyclic_eps_raises)
    dec_full = DenseViterbiDecoder(
        g, DenseDecoderOpts(acoustic_scale=0.3, eps_expansions=3))
    dec_ckpt = DenseViterbiDecoder(
        g, DenseDecoderOpts(acoustic_scale=0.3, eps_expansions=3,
                            traceback_chunk=8))
    out_full = dec_full.decode(ll, nf)
    out_ckpt = dec_ckpt.decode(ll, nf)
    for b in range(B):
        assert (out_full[b] is None) == (out_ckpt[b] is None)
        if out_full[b] is None:
            continue
        wf, tf, cf = out_full[b]
        wc, tc, cc = out_ckpt[b]
        assert wf == wc, b
        assert tf == tc, b
        assert abs(cf - cc) < 1e-3, b


def test_make_decoder_picks_checkpointed_dense():
    from kaldi_tpu.decoder.dense import (make_decoder, DenseViterbiDecoder)
    from kaldi_tpu.decoder.beam_search import (BeamSearchDecoder,
                                               BeamSearchOpts)
    import numpy as np
    from kaldi_tpu.decoder.graph_pack import PackedGraph
    S = 5000
    g = PackedGraph(start=0,
                    arc_start=np.zeros(S + 1, np.int32),
                    ilabel=np.zeros(0, np.int32),
                    olabel=np.zeros(0, np.int32),
                    cost=np.zeros(0, np.float32),
                    nextstate=np.zeros(0, np.int32),
                    pdf=np.zeros(0, np.int32),
                    final=np.zeros(S, np.float32))
    # small batch: full arena fits -> plain dense
    d = make_decoder(g, batch_hint=(4, 100))
    assert isinstance(d, DenseViterbiDecoder)
    assert d.opts.traceback_chunk == 0
    # big batch: arena too big -> checkpointed dense (this eps-free graph
    # runs 1 round, so pin the budget to force chunking)
    d = make_decoder(g, batch_hint=(64, 2000), arena_budget_bytes=1 << 30)
    assert isinstance(d, DenseViterbiDecoder)
    assert d.opts.traceback_chunk > 0
    # enormous graph -> beam
    d = make_decoder(g, dense_threshold=1000)
    assert isinstance(d, BeamSearchDecoder)
