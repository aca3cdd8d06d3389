"""WFST algebra tests: oracle = brute-force path enumeration on small FSTs
(mirrors the reference's rand-fst equivalence strategy, SURVEY.md §4.3)."""

import math
import random

import numpy as np
import pytest

from kaldi_tpu.fst.fst import Fst, EPS, SymbolTable
from kaldi_tpu.fst.compose import compose
from kaldi_tpu.fst.determinize import determinize_star
from kaldi_tpu.fst.minimize import minimize_encoded
from kaldi_tpu.fst.epsilon import remove_eps_local, rm_epsilon, remove_symbols
from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
from kaldi_tpu.fst.lang import Lexicon, prepare_lang, add_lex_disambig


def rand_acyclic_fst(rng, n_states=6, n_arcs=10, n_syms=3, eps_prob=0.2):
    f = Fst()
    for _ in range(n_states):
        f.add_state()
    f.start = 0
    f.set_final(n_states - 1, round(rng.uniform(0, 2), 3))
    for _ in range(n_arcs):
        s = rng.randrange(0, n_states - 1)
        d = rng.randrange(s + 1, n_states)  # forward arcs only => acyclic
        i = 0 if rng.random() < eps_prob else rng.randrange(1, n_syms + 1)
        o = 0 if rng.random() < eps_prob else rng.randrange(1, n_syms + 1)
        f.add_arc(s, i, o, round(rng.uniform(0, 2), 3), d)
    f.connect()
    return f


def test_linear_acceptor():
    f = Fst.linear_acceptor([3, 1, 2])
    il, ol, cost = f.get_linear_symbol_sequence()
    assert il == [3, 1, 2] and ol == [3, 1, 2] and cost == 0.0


def test_shortest_path():
    f = Fst()
    for _ in range(4):
        f.add_state()
    f.start = 0
    f.add_arc(0, 1, 1, 1.0, 1)
    f.add_arc(0, 2, 2, 0.25, 2)
    f.add_arc(1, 3, 3, 0.1, 3)
    f.add_arc(2, 3, 3, 0.5, 3)
    f.set_final(3, 0.0)
    il, ol, c = f.shortest_path()
    assert il == [2, 3]
    assert abs(c - 0.75) < 1e-9


def test_compose_oracle():
    """compose(a,b) path set == brute-force relational composition."""
    rng = random.Random(7)
    for trial in range(25):
        a = rand_acyclic_fst(rng)
        b = rand_acyclic_fst(rng)
        if a.start < 0 or b.start < 0:
            continue
        c = compose(a, b)
        # oracle: pair up paths of a and b on matching middle strings
        want = {}
        for (ia, oa, wa) in a.paths():
            for (ib, ob, wb) in b.paths():
                if oa == ib:
                    key = (ia, ob)
                    want[key] = min(want.get(key, np.inf), wa + wb)
        got = {}
        for (i, o, w) in c.paths():
            got[(i, o)] = min(got.get((i, o), np.inf), w)
        assert set(got) == set(want), f"trial {trial}"
        for k in want:
            assert abs(got[k] - want[k]) < 1e-6, f"trial {trial} {k}"


def test_determinize_star_oracle():
    rng = random.Random(3)
    checked = 0
    for trial in range(25):
        f = rand_acyclic_fst(rng, n_states=5, n_arcs=8)
        if f.start < 0:
            continue
        # determinize-star requires functional FSTs; our random FSTs may be
        # ambiguous, which determinize-star now rejects (like the reference)
        try:
            d = determinize_star(f)
        except RuntimeError as e:
            assert "not functional" in str(e)
            continue
        assert d.is_deterministic(allow_eps=True) or d.num_states == 0
        # istring -> min cost must be preserved
        want, got = {}, {}
        for (i, o, w) in f.paths():
            want[i] = min(want.get(i, np.inf), w)
        for (i, o, w) in d.paths():
            got[i] = min(got.get(i, np.inf), w)
        assert set(want) == set(got), f"trial {trial}"
        for k in want:
            assert abs(want[k] - got[k]) < 1e-5, f"trial {trial} {k}"
        checked += 1
    assert checked > 10


def test_determinize_star_functional_transducer():
    """On a functional FST, output strings must be preserved too."""
    f = Fst()
    for _ in range(4):
        f.add_state()
    f.start = 0
    # two paths for input "1 2" with same output, different costs
    f.add_arc(0, 1, 5, 1.0, 1)
    f.add_arc(0, 1, 5, 2.0, 2)
    f.add_arc(1, 2, 6, 0.5, 3)
    f.add_arc(2, 2, 6, 0.25, 3)
    f.set_final(3, 0.0)
    d = determinize_star(f)
    assert d.is_deterministic(allow_eps=True)
    paths = d.paths()
    assert len(paths) == 1
    il, ol, c = paths[0]
    assert il == (1, 2) and ol == (5, 6)
    assert abs(c - 1.5) < 1e-6


def test_determinize_star_log():
    """--use-log: costs combine by log-add (stochasticity preserved)."""
    f = Fst()
    for _ in range(3):
        f.add_state()
    f.start = 0
    f.add_arc(0, 1, 1, -math.log(0.3), 1)
    f.add_arc(0, 1, 1, -math.log(0.7), 2)
    f.set_final(1, 0.0)
    f.set_final(2, 0.0)
    d = determinize_star(f, use_log=True)
    paths = d.paths()
    assert len(paths) == 1
    assert abs(paths[0][2] - 0.0) < 1e-6  # -log(0.3+0.7)


def test_minimize_encoded():
    rng = random.Random(11)
    for trial in range(20):
        f = rand_acyclic_fst(rng)
        if f.start < 0:
            continue
        try:
            d = determinize_star(f)
        except RuntimeError:
            continue  # random FST was not functional
        m = minimize_encoded(d.copy())
        assert m.num_states <= d.num_states
        assert m.equivalent_paths(d), f"trial {trial}"


def test_rm_epsilon():
    f = Fst()
    for _ in range(4):
        f.add_state()
    f.start = 0
    f.add_arc(0, EPS, EPS, 0.5, 1)
    f.add_arc(1, 2, 3, 0.25, 2)
    f.add_arc(2, EPS, EPS, 0.125, 3)
    f.set_final(3, 1.0)
    g = rm_epsilon(f.copy())
    paths = g.paths()
    assert len(paths) == 1
    assert paths[0][0] == (2,) and abs(paths[0][2] - 1.875) < 1e-9
    h = remove_eps_local(f.copy())
    assert h.equivalent_paths(f)


def test_remove_symbols():
    f = Fst.linear_acceptor([1, 9, 2])
    remove_symbols(f, [9])
    il, ol, _ = f.get_linear_symbol_sequence()
    assert il == [1, 2] and ol == [1, 9, 2]


def test_arpa_parse_and_score():
    text = """
\\data\\
ngram 1=4
ngram 2=3

\\1-grams:
-0.5\t<s>\t-0.4
-0.6\tA\t-0.3
-0.9\tB\t-0.2
-0.8\t</s>

\\2-grams:
-0.2\t<s> A
-0.3\tA B
-0.4\tB </s>

\\end\\
"""
    lm = ArpaLm.parse(text)
    assert lm.order == 2
    ln10 = math.log(10)
    # P(<s> A B </s>) = P(A|<s>) P(B|A) P(</s>|B), all explicit bigrams
    want = (-0.2 - 0.3 - 0.4) * ln10
    assert abs(lm.score_sentence(["A", "B"]) - want) < 1e-9
    # P(A|B) backs off: bow(B) + P(A)
    want2 = (-0.2 - 0.3) * ln10 + ((-0.2) + (-0.6)) * ln10 + (-0.4) * ln10
    # <s> A (exp), A B (exp), B A (backoff), A </s> (backoff: bow(A)+P(</s>))
    want2 = ((-0.2) + (-0.3) + ((-0.2) + (-0.6)) + ((-0.3) + (-0.8))) * ln10
    assert abs(lm.score_sentence(["A", "B", "A"]) - want2) < 1e-9


def test_arpa_to_g_scores():
    text = """
\\data\\
ngram 1=4

\\1-grams:
-1\tNO
-1\tYES
-99\t<s>
-1\t</s>

\\end\\
"""
    lm = ArpaLm.parse(text)
    words = SymbolTable()
    words.add("NO")
    words.add("YES")
    words.add("#0")
    g = arpa_to_g(lm, words)
    assert g.num_states > 0
    # every sentence over {YES,NO} scores P(w1)..P(wn)P(</s>)
    for sent in (["YES"], ["NO", "YES"], ["YES", "YES", "NO"]):
        acc = Fst.linear_acceptor([words[w] for w in sent])
        # treat #0 as eps for scoring composition
        g2 = g.copy()
        remove_symbols(g2, [words["#0"]])
        acc.arcsort("olabel")
        c = compose(acc, g2)
        _, _, cost = c.shortest_path()
        want = (len(sent) + 1) * math.log(10)
        assert abs(cost - want) < 1e-5, sent


def test_lexicon_disambig():
    lex = Lexicon.parse("A a b\nB a b\nC a\nD d")
    prons, maxd = add_lex_disambig(lex)
    # A and B share a pron -> #1/#2; C is a prefix of a/b -> #1; D clean
    assert prons[0] == ["a", "b", "#1"]
    assert prons[1] == ["a", "b", "#2"]
    assert prons[2] == ["a", "#1"]
    assert prons[3] == ["d"]
    assert maxd == 2


def test_prepare_lang_and_l_fst():
    lex = Lexicon.parse("YES Y\nNO N")
    lang = prepare_lang(lex, ["SIL"], "SIL")
    assert "Y" in lang.phones and "NO" in lang.words
    # compose a phone string with L: Y N -> YES NO (allowing optional SIL)
    acc = Fst.linear_acceptor([lang.phones["Y"], lang.phones["N"]])
    lang.L.arcsort("ilabel")
    c = compose(acc.arcsort("olabel"), lang.L)
    words_out = set()
    for (_i, o, _w) in c.paths():
        words_out.add(tuple(lang.words.sym(x) for x in o))
    assert ("YES", "NO") in words_out


# ---------------------------------------------------------------------------
# log-semiring exactness (regression: residual propagation, Mohri 2002).
# The old closure re-propagated each state's FULL accumulated weight on
# every re-relaxation, double-counting path mass in the log semiring, and
# rm_epsilon's tropical improvement gate dropped equal-cost path mass.
# ---------------------------------------------------------------------------

def _log_mass(paths):
    """Total probability mass of an enumerated path set: -log sum exp(-c)."""
    m = min(c for (_i, _o, c) in paths)
    return m - math.log(sum(math.exp(-(c - m)) for (_i, _o, c) in paths))


def _eps_diamond():
    """0 -eps-> {1,2}, 1 -eps-> 2, 2 -eps-> 3, 3 -x-> 4: state 2 is relaxed
    twice, so a full-value (non-residual) relaxation forwards state 2's
    first-arrival mass to 3 twice."""
    f = Fst()
    for _ in range(5):
        f.add_state()
    f.start = 0
    f.add_arc(0, EPS, EPS, 0.2, 1)
    f.add_arc(0, EPS, EPS, 1.5, 2)
    f.add_arc(1, EPS, EPS, 0.1, 2)
    f.add_arc(2, EPS, EPS, 0.3, 3)
    f.add_arc(3, 7, 9, 0.25, 4)
    f.set_final(4, 0.125)
    return f


def test_determinize_star_log_mass_exact():
    f = _eps_diamond()
    want = _log_mass(f.paths())
    d = determinize_star(f, use_log=True)
    got = _log_mass(d.paths())
    # determinize-star rounds subset weights to 1e-6 for keying
    assert abs(got - want) < 1e-5
    assert len(d.paths()) == 1  # and it really determinized


def test_rm_epsilon_log_mass_exact():
    f = _eps_diamond()
    want = _log_mass(f.paths())
    g = rm_epsilon(f.copy(), use_log=True)
    assert abs(_log_mass(g.paths()) - want) < 1e-9

    # equal-cost eps paths to the same state: both must contribute mass
    h = Fst()
    for _ in range(5):
        h.add_state()
    h.start = 0
    h.add_arc(0, EPS, EPS, 0.5, 1)
    h.add_arc(0, EPS, EPS, 0.7, 2)
    h.add_arc(1, EPS, EPS, 0.2, 3)
    h.add_arc(2, EPS, EPS, 0.0, 3)
    h.add_arc(3, 5, 5, 0.0, 4)
    h.set_final(4, 0.0)
    want = _log_mass(h.paths())  # 0.7 - log 2
    g = rm_epsilon(h.copy(), use_log=True)
    assert abs(_log_mass(g.paths()) - want) < 1e-9


def test_shortest_distance_log_exact():
    f = _eps_diamond()
    d = f.shortest_distance("log")
    # oracle per state by brute-force path enumeration
    import itertools
    want4 = _log_mass(f.paths())  # total to final 4 + final weight
    # distance to state 3: two eps paths 0->2->3 and 0->1->2->3
    w3 = -math.log(math.exp(-(1.5 + 0.3)) + math.exp(-(0.2 + 0.1 + 0.3)))
    assert abs(d[3] - w3) < 1e-9
    assert abs(d[4] - (w3 + 0.25)) < 1e-9
    rd = f.shortest_distance("log", reverse=True)
    assert abs(rd[0] - want4) < 1e-9


def test_determinize_star_nonfunctional_raises():
    """Two different output strings for one input: not functional; the
    reference DeterminizeStar errors out rather than silently dropping one
    (ref: fstext/determinize-star-inl.h 'was not functional')."""
    f = Fst()
    for _ in range(2):
        f.add_state()
    f.start = 0
    f.add_arc(0, 1, 5, 0.0, 1)
    f.add_arc(0, 1, 6, 0.0, 1)
    f.set_final(1, 0.0)
    with pytest.raises(RuntimeError, match="not functional"):
        determinize_star(f)


def test_compose_does_not_mutate_operands():
    a = Fst.linear_acceptor([2, 1])
    b = Fst()
    for _ in range(2):
        b.add_state()
    b.start = 0
    b.add_arc(0, 2, 9, 0.0, 1)   # deliberately NOT ilabel-sorted
    b.add_arc(0, 1, 8, 0.0, 1)
    b.add_arc(1, 1, 7, 0.0, 1)
    b.set_final(1, 0.0)
    snap = [list(arcs) for arcs in b.arcs]
    c = compose(a, b)
    assert b.arcs == snap
    assert len(c.paths()) == 1


def test_make_preceding_input_classes_start_seeded():
    """A state entered by emitting arcs that is ALSO the start must be
    split so the original start keeps the 'entered by nothing' class 0 —
    else add_self_loops would hang a self-loop on the start state
    (ref: MakePrecedingInputSymbolsSameClass(start_is_epsilon=true))."""
    from kaldi_tpu.fst.hmm_graph import _make_preceding_input_classes_same
    f = Fst()
    for _ in range(2):
        f.add_state()
    f.start = 0
    f.add_arc(0, 5, EPS, 0.1, 1)
    f.add_arc(1, 7, EPS, 0.2, 0)   # emitting arc re-enters the start
    f.set_final(0, 0.0)
    classof = lambda i: 0 if i == EPS else 1
    _make_preceding_input_classes_same(f, classof)
    for s in range(f.num_states):
        for (i, _o, _w, d) in f.arcs[s]:
            assert not (d == f.start and classof(i) != 0)
    # language unchanged: paths (), (5 7), (5 7 5 7) ... spot-check
    il = {p[0] for p in f.paths(max_paths=50)}
    assert () in il and (5, 7) in il


def test_lexicon_initial_silence_routes_through_disambig():
    """With sil_disambig given, the start-state optional silence must also
    emit the disambig symbol (ref: utils/make_lexicon_fst.pl sildisambig
    handling) — otherwise L_disambig is non-determinizable against
    sil-prefixed homophones."""
    from kaldi_tpu.fst.lang import make_lexicon_fst
    lex = Lexicon.parse("A a\nB a")
    prons, maxd = add_lex_disambig(lex)
    phones = SymbolTable()
    phones.add("<eps>")
    for p in ["SIL", "a"] + [f"#{k}" for k in range(maxd + 2)]:
        phones.add(p)
    words = SymbolTable()
    words.add("<eps>")
    for w in ["A", "B"]:
        words.add(w)
    sil_dis = f"#{maxd + 1}"
    L = make_lexicon_fst(lex, phones, words, prons_disambig=prons,
                         sil_phone="SIL", sil_prob=0.5, sil_disambig=sil_dis)
    sil, dis = phones["SIL"], phones[sil_dis]
    for (i, _o, _w, d) in L.arcs[L.start]:
        if i == sil:
            labels = {a[0] for a in L.arcs[d]}
            assert labels == {dis}, "initial SIL must go via sil_disambig"
