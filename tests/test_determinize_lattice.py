"""Pruned lattice determinization: subset construction vs brute force.

(ref: lat/determinize-lattice-pruned.h:112-267 — output semantics: one
path per word sequence carrying the minimum cost and the best path's
transition-id alignment; beam prunes word sequences worse than
best+beam.)
"""

import time

import numpy as np
import pytest

from kaldi_tpu.lat.lattice import Lattice
from kaldi_tpu.lat.functions import determinize_lattice, lattice_best_path


def _random_lattice(rng, n_states=30, n_arcs=90, n_words=5, n_tids=12):
    """Random acyclic lattice (arcs go low->high state id)."""
    lat = Lattice()
    for _ in range(n_states):
        lat.add_state()
    lat.start = 0
    for _ in range(n_arcs):
        s = rng.randint(0, n_states - 1)
        d = rng.randint(s + 1, n_states)
        ol = rng.randint(0, n_words + 1) if rng.rand() < 0.4 else 0
        il = rng.randint(1, n_tids + 1) if rng.rand() < 0.8 else 0
        lat.add_arc(s, il, ol, round(rng.uniform(0, 2), 3),
                    round(rng.uniform(-1, 2), 3), d)
    for s in range(n_states - 3, n_states):
        lat.set_final(s, round(rng.uniform(0, 1), 3), 0.0)
    return lat.connect()


def _det_paths(det):
    """Enumerate det-lattice paths -> {words: (total, tids)} where tids
    concatenates the per-arc .tids attributes."""
    out = {}

    def rec(s, words, tids, cost):
        if s in det.finals:
            g, a = det.finals[s]
            key = tuple(words)
            tot = cost + g + a
            assert key not in out, f"duplicate word seq {key} (not det!)"
            out[key] = (tot, tuple(tids))
        for arc in det.arcs[s]:
            rec(arc.nextstate,
                words + ([arc.olabel] if arc.olabel else []),
                tids + list(getattr(arc, "tids", ())),
                cost + arc.cost)

    if det.start >= 0:
        rec(det.start, [], [], 0.0)
    return out


def _brute_force(lat):
    """Best (cost, tids) per word sequence by full path enumeration."""
    best = {}
    for words, tids, cost in lat.paths(max_paths=500000):
        cur = best.get(words)
        if cur is None or (cost, tids) < cur:
            best[words] = (cost, tids)
    return best


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_determinize_matches_brute_force(seed):
    rng = np.random.RandomState(seed)
    lat = _random_lattice(rng)
    if lat.start < 0:
        return
    det = determinize_lattice(lat)
    got = _det_paths(det)
    want = _brute_force(lat)
    assert set(got) == set(want)
    for words in want:
        assert got[words][0] == pytest.approx(want[words][0], abs=1e-4), \
            words
        # alignment is the best path's tid string
        assert got[words][1] == want[words][1], words


def test_determinize_beam_prunes():
    rng = np.random.RandomState(7)
    lat = _random_lattice(rng, n_states=25, n_arcs=70)
    want = _brute_force(lat)
    best = min(v[0] for v in want.values())
    beam = 2.0
    det = determinize_lattice(lat, beam=beam)
    got = _det_paths(det)
    # everything kept is within beam; everything within beam/2 is kept
    for words, (tot, _t) in got.items():
        assert tot <= best + beam + 1e-4
    for words, (tot, _t) in want.items():
        if tot <= best + beam / 2:
            assert words in got, (words, tot, best)
    # best path survives exactly
    bp = lattice_best_path(det)
    assert bp is not None
    assert bp[2] == pytest.approx(best, abs=1e-4)


def test_determinize_no_budget_on_large_lattice():
    """Regression (round-1 verdict): the old implementation enumerated
    paths under a hard 200k budget — exponential or silently truncated.
    A ~1e5-arc sausage-like lattice (astronomically many paths) must
    determinize in seconds with pruning."""
    lat = Lattice()
    n_seg = 4000           # 4000 segments x 5 alternatives x 5 arcs
    rng = np.random.RandomState(0)
    prev = lat.add_state()
    lat.start = prev
    n_words = 50
    for k in range(n_seg):
        nxt = lat.add_state()
        for j in range(5):
            w = rng.randint(1, n_words)
            lat.add_arc(prev, rng.randint(1, 10), w,
                        round(rng.uniform(0, 1), 3),
                        round(rng.uniform(0, 1), 3), nxt)
        prev = nxt
    lat.set_final(prev, 0.0, 0.0)
    assert lat.num_arcs == 5 * n_seg
    t0 = time.time()
    det = determinize_lattice(lat, beam=0.8)
    dt = time.time() - t0
    assert dt < 30.0, f"determinization took {dt:.1f}s"
    assert det.num_states > 0
    bp_in = lattice_best_path(lat)
    bp_out = lattice_best_path(det)
    assert bp_out[2] == pytest.approx(bp_in[2], abs=1e-3)


def test_determinize_empty_and_trivial():
    assert determinize_lattice(Lattice()).num_states == 0
    lat = Lattice()
    s0 = lat.add_state()
    s1 = lat.add_state()
    lat.start = s0
    lat.add_arc(s0, 3, 7, 0.5, 0.25, s1)
    lat.set_final(s1, 0.1, 0.0)
    det = determinize_lattice(lat)
    got = _det_paths(det)
    assert got == {(7,): (pytest.approx(0.85), (3,))}
