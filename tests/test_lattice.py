"""Lattice subsystem tests: generation from the batched decoder (checked
against decoder 1-best), forward-backward, pruning, n-best, word-level
determinization, LM-score swapping."""

import math

import numpy as np
import pytest

from kaldi_tpu.lat.lattice import Lattice
from kaldi_tpu.lat.functions import (
    lattice_forward_backward, prune_lattice, lattice_best_path,
    lattice_scale, add_word_ins_penalty, nbest, determinize_lattice,
    compose_lattice_with_lm,
)


def make_diamond():
    """Two paths: cheap (words [5]) and expensive (words [6])."""
    lat = Lattice()
    s0, s1, s2, s3 = (lat.add_state() for _ in range(4))
    lat.start = s0
    lat.add_arc(s0, 1, 5, 0.5, 1.0, s1)   # cheap
    lat.add_arc(s0, 2, 6, 1.0, 3.0, s2)   # expensive
    lat.add_arc(s1, 3, 0, 0.0, 0.5, s3)
    lat.add_arc(s2, 4, 0, 0.0, 0.5, s3)
    lat.set_final(s3, 0.0, 0.0)
    return lat


def test_best_path_and_nbest():
    lat = make_diamond()
    words, tids, cost = lattice_best_path(lat)
    assert words == [5] and tids == [1, 3]
    assert cost == pytest.approx(2.0)
    nb = nbest(lat, 5)
    assert len(nb) == 2
    assert nb[0][2] == pytest.approx(2.0)
    assert nb[1][0] == [6] and nb[1][2] == pytest.approx(4.5)


def test_forward_backward():
    lat = make_diamond()
    post, tot, alpha, beta = lattice_forward_backward(lat)
    # total likelihood = logsumexp(-2.0, -4.5)
    want = np.logaddexp(-2.0, -4.5)
    assert tot == pytest.approx(want, abs=1e-6)
    # posteriors of the two initial arcs sum to 1
    assert post[(0, 0)] + post[(0, 1)] == pytest.approx(1.0, abs=1e-6)
    assert post[(0, 0)] > post[(0, 1)]
    # and equal the softmax of path costs
    p_cheap = math.exp(-2.0 - want)
    assert post[(0, 0)] == pytest.approx(p_cheap, abs=1e-6)


def test_prune():
    lat = make_diamond()
    pruned = prune_lattice(lat, beam=1.0)  # expensive path is 2.5 worse
    paths = pruned.paths()
    assert len(paths) == 1 and paths[0][0] == (5,)
    keep = prune_lattice(lat, beam=5.0)
    assert len(keep.paths()) == 2


def test_scale_and_penalty():
    lat = make_diamond()
    lattice_scale(lat, lm_scale=2.0, acoustic_scale=0.5)
    words, _t, cost = lattice_best_path(lat)
    # cheap: graph 0.5*2 + acoustic 1.5*0.5 = 1.75
    assert cost == pytest.approx(1.75)
    add_word_ins_penalty(lat, 10.0)
    _w, _t, cost2 = lattice_best_path(lat)
    assert cost2 == pytest.approx(11.75)


def test_determinize_keeps_best_per_wordseq():
    lat = Lattice()
    s0, s1, s2, s3 = (lat.add_state() for _ in range(4))
    lat.start = s0
    # two alignments of word 7 with different costs + one word-8 path
    lat.add_arc(s0, 1, 7, 0.0, 2.0, s1)
    lat.add_arc(s0, 2, 7, 0.0, 1.0, s2)
    lat.add_arc(s1, 3, 0, 0.0, 0.0, s3)
    lat.add_arc(s2, 4, 0, 0.0, 0.0, s3)
    lat.add_arc(s0, 5, 8, 0.0, 5.0, s3)
    lat.set_final(s3)
    det = determinize_lattice(lat)
    paths = det.paths()
    by_words = {p[0]: p[2] for p in paths}
    assert set(by_words) == {(7,), (8,)}
    assert by_words[(7,)] == pytest.approx(1.0)
    assert by_words[(8,)] == pytest.approx(5.0)


def test_compose_with_lm():
    from kaldi_tpu.fst.fst import Fst, SymbolTable
    from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
    words = SymbolTable()
    wa, wb = words.add("a"), words.add("b")
    bo = words.add("#0")
    lm = ArpaLm.parse("""
\\data\\
ngram 1=4

\\1-grams:
-0.3\ta
-0.7\tb
-99\t<s>
-0.2\t</s>

\\end\\
""")
    g = arpa_to_g(lm, words)
    lat = make_diamond()
    # relabel words 5->a, 6->b
    for s in range(lat.num_states):
        for a in lat.arcs[s]:
            if a.olabel == 5:
                a.olabel = wa
            elif a.olabel == 6:
                a.olabel = wb
    out = compose_lattice_with_lm(lat, g, bo, lm_scale=1.0)
    paths = {p[0]: p[2] for p in out.paths()}
    ln10 = math.log(10)
    assert paths[(wa,)] == pytest.approx(2.0 + (0.3 + 0.2) * ln10, abs=1e-4)
    assert paths[(wb,)] == pytest.approx(4.5 + (0.7 + 0.2) * ln10, abs=1e-4)


@pytest.mark.slow
def test_lattice_from_decoder_yesno():
    """Generate lattices on a tiny trained system; 1-best through the
    lattice must equal the decoder's 1-best, and the lattice must contain
    multiple hypotheses at finite beam."""
    import jax.numpy as jnp
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_yesno_e2e import (synth_utterance, YESNO_ARPA, SR)
    from kaldi_tpu.fst.lang import Lexicon, prepare_lang
    from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
    from kaldi_tpu.fst.graph import make_hclg
    from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
    from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
    from kaldi_tpu.decoder.graph_pack import pack_graph
    from kaldi_tpu.decoder.beam_search import (BeamSearchDecoder,
                                               BeamSearchOpts)
    from kaldi_tpu.lat.generate import decode_to_lattices

    rng = np.random.RandomState(5)
    lex = Lexicon.parse("YES Y1 Y2\nNO N1 N2")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    fo = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def featize(w):
        return np.asarray(add_deltas(mfcc(jnp.asarray(w), fo),
                                     order=2, window=2))

    utts = []
    for i in range(12):
        ws = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 5))]
        utts.append((f"u{i}", featize(synth_utterance(ws, rng)), ws))
    model = train_mono(lang, utts, MonoTrainOpts(
        num_iters=8, totgauss=30, max_iter_inc=6,
        realign_iters=tuple(range(1, 8))))
    g = arpa_to_g(ArpaLm.parse(YESNO_ARPA), lang.words)
    graph = make_hclg(lang, g, model.trans_model, model.ctx_dep,
                      self_loop_scale=0.1)
    packed = pack_graph(graph.fst, model.trans_model.id2pdf_array)
    dec = BeamSearchDecoder(packed, BeamSearchOpts(
        beam=1000.0, max_active=64, acoustic_scale=0.1))
    test = utts[:3]
    B = len(test)
    T = max(f.shape[0] for (_u, f, _w) in test)
    D = test[0][1].shape[1]
    fb = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _w) in enumerate(test):
        fb[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    ll = model.am.loglikes_np(fb)
    one_best = dec.decode(ll, nf)
    lats = decode_to_lattices(dec, ll, nf, lattice_beam=100.0)
    for b in range(B):
        assert lats[b] is not None
        words, tids, cost = lattice_best_path(lats[b])
        assert words == one_best[b][0], (b, words, one_best[b][0])
        assert cost == pytest.approx(one_best[b][2], abs=0.1)
        # frame count: emitting arcs on the best path == num frames
        assert len(tids) == int(nf[b])
        # with a huge lattice beam there should be alternatives
        assert len(nbest(lats[b], 5)) >= 2
