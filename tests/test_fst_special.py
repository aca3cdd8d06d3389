"""Phi composition and push-special.

(ref: fstbin/fstphicompose.cc, fstext/push-special.h — oracles:
 exact backoff LM scoring / path-weight preservation.)
"""

import numpy as np
import pytest

from kaldi_tpu.fst.fst import Fst, INF
from kaldi_tpu.fst.special import phi_compose, push_special

PHI = 99


def _linear_acceptor(labels):
    f = Fst()
    f.start = f.add_state()
    cur = f.start
    for l in labels:
        n = f.add_state()
        f.add_arc(cur, l, l, 0.0, n)
        cur = n
    f.set_final(cur)
    return f


def _backoff_bigram():
    """States: 0=unigram, 1=after 'a'. Bigram a->b cheap; everything else
    backs off via phi to unigram costs."""
    g = Fst()
    uni = g.add_state()
    after_a = g.add_state()
    g.start = uni
    g.add_arc(uni, 1, 1, 1.0, after_a)     # unigram a
    g.add_arc(uni, 2, 2, 2.0, uni)         # unigram b
    g.add_arc(after_a, 2, 2, 0.1, uni)     # bigram a->b
    g.add_arc(after_a, PHI, 0, 0.5, uni)   # backoff
    g.set_final(uni, 0.3)
    g.set_final(after_a, INF) if False else None
    return g


def test_phi_compose_backoff_semantics():
    g = _backoff_bigram()
    # "a b": uses the bigram (NO backoff cost) = 1.0 + 0.1 + 0.3
    ab = phi_compose(_linear_acceptor([1, 2]), g, PHI)
    il, ol, cost = ab.shortest_path()
    assert cost == pytest.approx(1.4)
    # "a a": no bigram a->a, must back off mid-string AND again for the
    # final (both a's land in the bigram state): 1.0+0.5+1.0+0.5+0.3
    aa = phi_compose(_linear_acceptor([1, 1]), g, PHI)
    _i, _o, cost = aa.shortest_path()
    assert cost == pytest.approx(3.3)
    # final through phi: "a" ends in after_a (not final) -> phi to uni
    a = phi_compose(_linear_acceptor([1]), g, PHI)
    _i, _o, cost = a.shortest_path()
    assert cost == pytest.approx(1.0 + 0.5 + 0.3)


def test_phi_vs_eps_difference():
    """With eps-backoff the cheap backoff path can bypass an existing
    bigram; phi must NOT (the reason fstphicompose exists)."""
    g = Fst()
    uni, after_a = g.add_state(), g.add_state()
    g.start = uni
    g.add_arc(uni, 1, 1, 1.0, after_a)
    g.add_arc(uni, 2, 2, 0.05, uni)        # very cheap unigram b
    g.add_arc(after_a, 2, 2, 0.9, uni)     # pricier bigram a->b
    g.add_arc(after_a, PHI, 0, 0.0, uni)   # free backoff
    g.set_final(uni)
    ab = phi_compose(_linear_acceptor([1, 2]), g, PHI)
    _i, _o, cost = ab.shortest_path()
    # phi: must take the bigram (0.9), not backoff+unigram (0.05)
    assert cost == pytest.approx(1.0 + 0.9)


def test_push_special_preserves_paths_on_cyclic_fst():
    f = Fst()
    s0, s1 = f.add_state(), f.add_state()
    f.start = s0
    f.add_arc(s0, 1, 1, 2.0, s1)
    f.add_arc(s1, 2, 2, 1.0, s1)           # self-loop (cycle)
    f.add_arc(s1, 3, 3, 3.0, s0)           # back edge (cycle)
    f.set_final(s1, 4.0)
    pushed = push_special(f)

    def path_cost(g, labels):
        s = g.start
        tot = 0.0
        for l in labels:
            arc = next(a for a in g.arcs[s] if a[0] == l)
            tot += arc[2]
            s = arc[3]
        return tot + g.final(s)

    for labels in ([1], [1, 2], [1, 2, 2], [1, 3, 1], [1, 2, 3, 1]):
        assert path_cost(pushed, labels) == pytest.approx(
            path_cost(f, labels), abs=1e-2)
    # pushed: best suffix from every co-accessible state ~ 0
    n = pushed.num_states
    V = np.full(n, np.inf)
    for s, c in pushed.finals.items():
        V[s] = c
    for _ in range(50):
        for s in range(n):
            for (il, ol, w, d) in pushed.arcs[s]:
                V[s] = min(V[s], w + V[d])
    assert abs(V[s1]) < 0.05
