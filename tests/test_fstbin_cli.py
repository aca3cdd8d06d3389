"""fstext long-tail tools: subsequential loop + full context FST
equivalence against the dynamic composition, chain factoring
round-trip, rho composition, final propagation, random FSTs, context
symbols, ilabel dedup, graph compilation from word FSTs.

(ref: fstbin/*.cc, bin/make-ilabel-transducer.cc,
 bin/compile-train-graphs-fsts.cc.)
"""

import json

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.fst.fst import Fst, INF
from kaldi_tpu.fst.compose import compose
from kaldi_tpu.fst.context import compose_context, make_context_fst
from kaldi_tpu.fst.factor import factor
from kaldi_tpu.fst.special import rho_compose, prop_final
from kaldi_tpu.fst.text_io import load_fst, save_fst


def _random_acceptor(rng, labels, n_states=8):
    f = Fst()
    for _ in range(n_states):
        f.add_state()
    f.start = 0
    for s in range(n_states - 1):
        for _ in range(rng.randint(1, 3)):
            d = int(rng.randint(s + 1, n_states))
            l = int(rng.choice(labels))
            f.add_arc(s, l, l, float(rng.uniform(0, 1)), d)
    f.set_final(n_states - 1, 0.0)
    f.connect()
    return f


def test_context_fst_matches_dynamic_composition():
    """compose(C, LG+$loop) and compose_context(LG) accept the same
    weighted phone language (window labels compared via ilabel_info)."""
    rng = np.random.RandomState(0)
    phones = [1, 2, 3]
    subseq = 99
    for trial in range(3):
        lg = _random_acceptor(rng, phones, n_states=7)
        clg_dyn, info_dyn = compose_context(lg, set(), N=3, P=1)

        lg2 = lg.copy()
        finals = [s for s in range(lg2.num_states)
                  if lg2.final(s) < INF]
        sf = lg2.add_state()
        lg2.add_arc(sf, subseq, 0, 0.0, sf)
        lg2.set_final(sf, 0.0)
        for s in finals:
            # original final weights stay (AddSubsequentialLoop keeps
            # them); C only accepts through the flush path anyway
            lg2.add_arc(s, subseq, 0, lg2.final(s), sf)
        C, info_full = make_context_fst(phones, set(), subseq, N=3, P=1)
        clg_full = compose(C, lg2)

        r_dyn = clg_dyn.shortest_path()
        r_full = clg_full.shortest_path()
        assert abs(r_dyn[2] - r_full[2]) < 1e-9, trial


def test_fstfactor_roundtrip(tmp_path):
    P = lambda n: str(tmp_path / n)
    rng = np.random.RandomState(1)
    # graph with obvious chains: two linear branches
    f = Fst()
    for _ in range(9):
        f.add_state()
    f.start = 0
    for (s, il, d) in [(0, 1, 1), (1, 2, 2), (2, 3, 3), (3, 4, 8),
                       (0, 5, 4), (4, 6, 5), (5, 7, 8)]:
        f.add_arc(s, il, 0, 0.25, d)
    f.set_final(8, 0.0)
    factored, expander = factor(f)
    assert factored.num_arcs < f.num_arcs
    recon = compose(expander, factored)
    r0, r1 = f.shortest_path(), recon.shortest_path()
    assert abs(r0[2] - r1[2]) < 1e-9
    # CLI round trip
    save_fst(P("f.fst"), f)
    main(["fstfactor", P("f.fst"), P("f1.fst"), P("f2.fst")])
    assert load_fst(P("f1.fst")).num_arcs == factored.num_arcs


def test_rho_compose_and_propfinal(tmp_path):
    P = lambda n: str(tmp_path / n)
    # a: accepts "5 7"; b: matches 5 exactly, rho (label 100) for rest
    a = Fst.linear_acceptor([5, 7])
    b = Fst()
    s0, s1, s2 = b.add_state(), b.add_state(), b.add_state()
    b.start = s0
    b.add_arc(s0, 5, 5, 0.5, s1)
    b.add_arc(s1, 100, 100, 1.5, s2)
    b.set_final(s2, 0.0)
    out = rho_compose(a, b, 100)
    res = out.shortest_path()
    assert abs(res[2] - 2.0) < 1e-9
    # rho rewrites the output label to the consumed one
    assert res[1] == [5, 7]

    # propfinal: phi arcs (label 42) into a final state make the source
    # final with the summed weight, through chains
    f = Fst()
    s0, s1, s2 = f.add_state(), f.add_state(), f.add_state()
    f.start = s0
    f.add_arc(s0, 42, 0, 0.5, s1)
    f.add_arc(s1, 42, 0, 0.25, s2)
    f.set_final(s2, 1.0)
    g = prop_final(f, 42)
    assert abs(g.final(s1) - 1.25) < 1e-9
    assert abs(g.final(s0) - 1.75) < 1e-9
    save_fst(P("pf.fst"), f)
    main(["fstpropfinal", "42", P("pf.fst"), P("pf2.fst")])
    assert abs(load_fst(P("pf2.fst")).final(s0) - 1.75) < 1e-9


def test_fstrand_and_contextsyms(tmp_path, capsys):
    P = lambda n: str(tmp_path / n)
    main(["fstrand", P("r.fst"), "--seed", "3"])
    f = load_fst(P("r.fst"))
    assert f.num_states >= 2
    assert f.shortest_path()[2] < 1e9

    # makecontextfst + makecontextsyms over a 2-phone inventory
    with open(P("phones.txt"), "w") as fh:
        fh.write("<eps> 0\na 1\nb 2\n")
    main(["fstmakecontextfst", P("phones.txt"), "9",
          P("ilabels.json"), P("C.fst")])
    info = json.load(open(P("ilabels.json")))
    assert [0] in info                      # the #-1 empty window
    assert any(len(w) == 3 for w in info)   # triphone windows
    capsys.readouterr()
    main(["fstmakecontextsyms", P("phones.txt"), P("ilabels.json")])
    out = capsys.readouterr().out.splitlines()
    assert len(out) == len(info)
    assert any("a/b/a" in l or "a/a/a" in l for l in out)


def test_subsequential_loop_cli(tmp_path):
    P = lambda n: str(tmp_path / n)
    f = Fst.linear_acceptor([1, 2])
    save_fst(P("x.fst"), f)
    main(["fstaddsubsequentialloop", "77", P("x.fst"), P("y.fst")])
    g = load_fst(P("y.fst"))
    assert g.num_states == f.num_states + 1
    subseq_arcs = [(s, a) for s in range(g.num_states)
                   for a in g.arcs[s] if a[0] == 77]
    assert len(subseq_arcs) == 2  # one from the old final, one loop


@pytest.mark.slow
def test_ilabel_transducer_and_graphs_fsts(tmp_path):
    from test_gmmbin_cli import _tiny_corpus
    _tiny_corpus(tmp_path, n_utts=6, seed=5)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz"),
          "--num-iters", "4", "--totgauss", "20"])

    # a mono system: every length-1 window with the same pdf tuple
    # dedupes onto itself (mapping is injective on distinct phones)
    from kaldi_tpu.io.model_io import load_gmm_system
    model = load_gmm_system(P("mono.npz"))
    phones = sorted({ph for (ph, _s, _p) in model.trans_model.tuples})
    info = [[], [0]] + [[p] for p in phones]
    with open(P("old.json"), "w") as f:
        json.dump(info, f)
    main(["make-ilabel-transducer", P("old.json"), P("mono.npz"),
          P("new.json"), "--old2new-map", P("map.txt")])
    new_info = json.load(open(P("new.json")))
    assert len(new_info) == len(info)   # mono: nothing merges

    # compile-train-graphs-fsts: a 2-word loop grammar decodes
    words = [w for w in model.lang.words.symbols()
             if w not in ("<eps>", "<s>", "</s>", "#0")][:2]
    g = Fst()
    s0 = g.add_state()
    g.start = s0
    g.set_final(s0, 0.0)
    for w in words:
        g.add_arc(s0, model.lang.words[w], model.lang.words[w], 0.7, s0)
    with open(P("g.fsts"), "w") as f:
        from kaldi_tpu.fst.text_io import write_fst_text
        f.write("utt1\n")
        write_fst_text(f, g)
        f.write("\n")
    main(["compile-train-graphs-fsts", P("mono.npz"),
          f"ark:{P('g.fsts')}", f"ark:{P('graphs.fsts')}"])
    from kaldi_tpu.cli_fst import _read_fst_ark
    graphs = dict(_read_fst_ark(P("graphs.fsts")))
    assert "utt1" in graphs and graphs["utt1"].num_states > 2
