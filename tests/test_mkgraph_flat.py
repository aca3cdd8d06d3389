"""Flat/native mkgraph pipeline vs the Fst-object reference pipeline:
the built HCLGs must decode identically, and the at-scale pieces
(add_self_loops_flat, pack_graph_flat, synthetic lexicon/ARPA) must
match their object-level counterparts.

(ref: egs/wsj/s5/utils/mkgraph.sh:64-104)
"""

import numpy as np
import pytest

from kaldi_tpu.fst.lang import Lexicon, prepare_lang
from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
from kaldi_tpu.fst.graph import make_hclg
from kaldi_tpu.fst.flat import FlatFst
from kaldi_tpu.fst import native_ops
from kaldi_tpu.fst.mkgraph_flat import (make_hclg_flat, add_self_loops_flat,
                                        pack_graph_flat)
from kaldi_tpu.tree.context_dep import MonophoneContextDependency
from kaldi_tpu.hmm.transition_model import TransitionModel
from kaldi_tpu.decoder.graph_pack import pack_graph
from kaldi_tpu.decoder.dense import DenseViterbiDecoder

pytestmark = pytest.mark.skipif(not native_ops.available(),
                                reason="native toolchain unavailable")


def _lang_and_g():
    lex = Lexicon.parse(
        "YES Y1 Y2\nNO N1 N2\nMAYBE M A Y1\nNO2 N1 A\nOK O K\nKO K O")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    ctx = MonophoneContextDependency.from_topo(lang.topo)
    tm = TransitionModel(lang.topo, lambda ph, pc: ctx.compute([ph], pc))
    g = arpa_to_g(ArpaLm.parse(
        "\\data\\\nngram 1=7\nngram 2=4\n\n\\1-grams:\n"
        "-0.9\tNO\t-0.3\n-0.9\tYES\t-0.3\n-1.2\tMAYBE\n-1.4\tNO2\n"
        "-1.3\tOK\t-0.2\n-1.5\tKO\n-99\t<s>\t-0.1\n-0.5\t</s>\n\n"
        "\\2-grams:\n-0.3\tYES NO\n-0.4\tNO YES\n-0.5\tOK OK\n"
        "-0.6\t<s> YES\n\n\\end\\\n"), lang.words)
    return lang, g, tm, ctx


def test_flat_pipeline_decodes_like_reference_pipeline():
    lang, g, tm, ctx = _lang_and_g()
    ref = make_hclg(lang, g, tm, ctx, self_loop_scale=0.1)
    flat, stats = make_hclg_flat(lang, g, tm, ctx, self_loop_scale=0.1)
    p_ref = pack_graph(ref.fst, tm.id2pdf_array)
    p_flat = pack_graph_flat(flat, tm.id2pdf_array)
    assert stats["hclg_states"] == flat.num_states
    d_ref = DenseViterbiDecoder(p_ref)
    d_flat = DenseViterbiDecoder(p_flat)
    rng = np.random.RandomState(0)
    B, T = 4, 50
    ll = (rng.randn(B, T, tm.num_pdfs) * 2).astype(np.float32)
    nf = np.array([50, 40, 30, 25], np.int32)
    r_ref = d_ref.decode(ll, nf)
    r_flat = d_flat.decode(ll, nf)
    for b in range(B):
        assert r_ref[b][0] == r_flat[b][0], b          # words
        assert r_ref[b][1] == r_flat[b][1], b          # tids
        assert abs(r_ref[b][2] - r_flat[b][2]) < 1e-2  # cost


def test_add_self_loops_flat_matches_object_version():
    from kaldi_tpu.fst.hmm_graph import add_self_loops
    lang, g, tm, ctx = _lang_and_g()
    # build HCLGa (no self-loops) through the object pipeline pieces
    from kaldi_tpu.fst.compose import compose
    from kaldi_tpu.fst.determinize import determinize_star
    from kaldi_tpu.fst.graph import mono_context
    from kaldi_tpu.fst.hmm_graph import make_h_transducer
    from kaldi_tpu.fst.epsilon import remove_symbols
    lg = determinize_star(compose(lang.L_disambig, g), use_log=True)
    clg, ilabel_info = mono_context(lg, lang)
    ha, dt = make_h_transducer(ilabel_info, ctx, tm, 1.0)
    hclga = determinize_star(compose(ha, clg), use_log=True)
    remove_symbols(hclga, dt)
    want = add_self_loops(hclga.copy(), tm, (), 0.1, reorder=True)
    want.connect()
    got = native_ops.connect_flat(
        add_self_loops_flat(FlatFst.from_fst(hclga), tm, (), 0.1)).to_fst()
    # same sizes and identical decode behavior
    assert want.num_states == got.num_states
    assert want.num_arcs == got.num_arcs
    p_w = pack_graph(want, tm.id2pdf_array)
    p_g = pack_graph(got, tm.id2pdf_array)
    rng = np.random.RandomState(1)
    ll = (rng.randn(2, 40, tm.num_pdfs) * 2).astype(np.float32)
    nf = np.full(2, 40, np.int32)
    r_w = DenseViterbiDecoder(p_w).decode(ll, nf)
    r_g = DenseViterbiDecoder(p_g).decode(ll, nf)
    for b in range(2):
        assert r_w[b][0] == r_g[b][0] and r_w[b][1] == r_g[b][1]
        assert abs(r_w[b][2] - r_g[b][2]) < 1e-2


def test_synth_arpa_is_well_formed():
    from kaldi_tpu.lm.synth import synth_lexicon_text, synth_trigram_arpa
    rng = np.random.default_rng(0)
    text, words = synth_lexicon_text(200, n_phones=20, rng=rng)
    lm = synth_trigram_arpa(words, n_bigrams=800, n_trigrams=600, rng=rng)
    assert lm.order == 3
    assert len(lm.ngrams[0]) == 202                 # words + <s> + </s>
    assert len(lm.ngrams[1]) > 400
    assert len(lm.ngrams[2]) > 100
    # per-history probability mass (successors + backoff reserve) <= 1
    lex = Lexicon.parse(text)
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    g = arpa_to_g(lm, lang.words)
    assert g.start >= 0
    assert g.num_states > 200
    # every state has a path to a final (connect keeps everything)
    c = g.copy().connect()
    assert c.num_states == g.num_states


@pytest.mark.slow
def test_mkgraph_flat_mid_scale():
    """A 2k-word vocab trigram build through the full flat pipeline:
    completes quickly, produces a decodable graph of plausible size."""
    import time
    from kaldi_tpu.lm.synth import synth_lexicon_text, synth_trigram_arpa
    from kaldi_tpu.decoder.csr_beam import CsrBeamDecoder, CsrBeamOpts
    rng = np.random.default_rng(1)
    text, words = synth_lexicon_text(2000, n_phones=39, rng=rng)
    lm = synth_trigram_arpa(words, n_bigrams=20000, n_trigrams=10000,
                            rng=rng)
    lex = Lexicon.parse(text)
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    ctx = MonophoneContextDependency.from_topo(lang.topo)
    tm = TransitionModel(lang.topo, lambda ph, pc: ctx.compute([ph], pc))
    g = arpa_to_g(lm, lang.words)
    t0 = time.time()
    hclg, stats = make_hclg_flat(lang, g, tm, ctx, self_loop_scale=0.1)
    dt = time.time() - t0
    assert dt < 120, f"mid-scale mkgraph took {dt:.0f}s"
    assert hclg.num_states > 10000
    assert hclg.num_arcs > hclg.num_states
    packed = pack_graph_flat(hclg, tm.id2pdf_array)
    dec = CsrBeamDecoder(packed, CsrBeamOpts(beam=14.0, max_active=512,
                                             acoustic_scale=0.1,
                                             expand_budget=8192))
    rng2 = np.random.RandomState(0)
    ll = (rng2.randn(2, 40, tm.num_pdfs) * 2).astype(np.float32)
    res = dec.decode(ll, np.full(2, 40, np.int32))
    assert all(r[2] < 1e9 for r in res)


@pytest.mark.slow
def test_flat_pipeline_triphone_matches_reference_pipeline():
    """Native on-the-fly context composition (fst_compose_context) in the
    flat pipeline must decode identically to the object pipeline's
    compose_context on a real trained triphone system
    (ref: fstext/context-fst.h:491, fstbin/fstcomposecontext.cc)."""
    import jax.numpy as jnp
    from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
    from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
    from kaldi_tpu.steps.deltas import train_deltas, DeltasTrainOpts
    from test_triphone_e2e import synth, LEXICON, ARPA, WORDS, SR

    rng = np.random.RandomState(11)
    lex = Lexicon.parse(LEXICON)
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    opts = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def featize(wave):
        return np.asarray(add_deltas(mfcc(jnp.asarray(wave), opts),
                                     order=2, window=2))

    utts = []
    for i in range(16):
        ws = [WORDS[rng.randint(len(WORDS))] for _ in range(rng.randint(2, 4))]
        utts.append((f"u{i}", featize(synth(ws, rng)), ws))
    mono = train_mono(lang, utts, MonoTrainOpts(
        num_iters=8, totgauss=40, max_iter_inc=6,
        realign_iters=tuple(range(1, 8))))
    tri = train_deltas(lang, utts, mono, DeltasTrainOpts(
        num_iters=8, totgauss=80, max_iter_inc=6, num_leaves=40,
        realign_iters=(1, 2, 3, 4, 6)))
    assert tri.ctx_dep.context_width == 3

    g = arpa_to_g(ArpaLm.parse(ARPA), lang.words)
    ref = make_hclg(lang, g, tri.trans_model, tri.ctx_dep,
                    self_loop_scale=0.1)
    flat, stats = make_hclg_flat(lang, g, tri.trans_model, tri.ctx_dep,
                                 self_loop_scale=0.1)
    assert "clg_arcs" in stats
    d_ref = DenseViterbiDecoder(pack_graph(ref.fst,
                                           tri.trans_model.id2pdf_array))
    d_flat = DenseViterbiDecoder(pack_graph_flat(
        flat, tri.trans_model.id2pdf_array))
    rng2 = np.random.RandomState(3)
    B, T = 4, 45
    ll = (rng2.randn(B, T, tri.trans_model.num_pdfs) * 2).astype(np.float32)
    nf = np.array([45, 40, 35, 30], np.int32)
    r_ref = d_ref.decode(ll, nf)
    r_flat = d_flat.decode(ll, nf)
    for b in range(B):
        assert r_ref[b][0] == r_flat[b][0], b
        assert r_ref[b][1] == r_flat[b][1], b
        assert abs(r_ref[b][2] - r_flat[b][2]) < 1e-2


def test_flat_pipeline_synthetic_triphone_tree():
    """The synthetic tied-triphone tree (tree/synth.py) must drive the
    full flat triphone pipeline: C o LG via the native context
    composition, Ha composition, and a successful decode — the
    scale-benchmark configuration at toy size (scripts/mkgraph_scale.py
    runs the same stack at 60k words)."""
    from kaldi_tpu.lm.synth import synth_lexicon_text, synth_trigram_arpa
    from kaldi_tpu.tree.synth import synth_triphone_tree
    from kaldi_tpu.steps.deltas import transition_model_from_tree
    from kaldi_tpu.decoder.csr_beam import CsrBeamDecoder, CsrBeamOpts
    rng = np.random.default_rng(5)
    text, words = synth_lexicon_text(50, n_phones=10, rng=rng)
    lex = Lexicon.parse(text)
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    sil_ids = [lang.phones["SIL"]]
    ctx = synth_triphone_tree(lang.topo, sil_phones=sil_ids,
                              n_left_groups=3, n_right_groups=3, rng=rng)
    assert ctx.context_width == 3
    tm = transition_model_from_tree(lang, ctx)
    assert tm.num_pdfs == ctx.num_pdfs
    lm = synth_trigram_arpa(words, 300, 200, rng=rng)
    g = arpa_to_g(lm, lang.words)
    flat, stats = make_hclg_flat(lang, g, tm, ctx, self_loop_scale=0.1)
    assert "clg_arcs" in stats          # the triphone context branch ran
    packed = pack_graph_flat(flat, tm.id2pdf_array)
    dec = CsrBeamDecoder(packed, CsrBeamOpts(beam=14.0, max_active=512,
                                             acoustic_scale=0.1,
                                             expand_budget=8192))
    rng2 = np.random.RandomState(0)
    ll = (rng2.randn(2, 40, tm.num_pdfs) * 2).astype(np.float32)
    res = dec.decode(ll, np.full(2, 40, np.int32))
    assert all(r is not None and r[2] < 1e9 for r in res)
    # distinct contexts of the same center phone can get distinct pdfs
    p = [p_ for p_ in lang.topo.phones if p_ not in sil_ids][0]
    others = [q for q in lang.topo.phones if q != p]
    outs = {ctx.compute([l, p, r], 0)
            for l in others[:4] for r in others[:4]}
    assert len(outs) > 1
