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
        # ambiguous, in which case min-cost per (istring) must still agree
        d = determinize_star(f)
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
        d = determinize_star(f)
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
