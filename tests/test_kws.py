"""KWS: factor-index search posteriors, TWV scoring, proxy keywords.

(ref test strategy: src/kws has no unit tests in-tree; correctness there
 is recipe-level (babel). We instead verify the index's posterior algebra
 against exhaustive path enumeration on small lattices.)
"""

import numpy as np
import pytest

from kaldi_tpu.lat.lattice import Lattice
from kaldi_tpu.kws import (
    lattice_to_kws_index, search_index, TwvOptions, compute_twv,
    generate_proxy_keywords,
)


def _two_path_lattice():
    """frame 0: word 7 (p=pa) or word 8; frame 1: word 9 on both paths."""
    lat = Lattice()
    s0, s1, s2, s3 = (lat.add_state() for _ in range(4))
    lat.start = s0
    lat.add_arc(s0, 1, 7, 1.0, 0.0, s1)   # cost 1
    lat.add_arc(s0, 2, 8, 2.0, 0.0, s1)   # cost 2
    lat.add_arc(s1, 3, 9, 0.0, 0.0, s2)
    lat.add_arc(s2, 0, 0, 0.0, 0.0, s3)   # eps tail
    lat.set_final(s3)
    return lat


def test_single_word_posterior_matches_forward_backward():
    lat = _two_path_lattice()
    idx = lattice_to_kws_index(lat, "utt1")
    hits7 = search_index([idx], [7])
    hits8 = search_index([idx], [8])
    pa = np.exp(-1) / (np.exp(-1) + np.exp(-2))
    assert len(hits7) == 1 and len(hits8) == 1
    assert hits7[0][3] == pytest.approx(pa, abs=1e-6)
    assert hits8[0][3] == pytest.approx(1 - pa, abs=1e-6)
    # times: word 7 spans frame 0..1
    assert hits7[0][1] == 0 and hits7[0][2] == 1


def test_multi_word_factor_search():
    lat = _two_path_lattice()
    idx = lattice_to_kws_index(lat, "utt1")
    hits = search_index([idx], [7, 9])
    pa = np.exp(-1) / (np.exp(-1) + np.exp(-2))
    assert len(hits) == 1
    assert hits[0][3] == pytest.approx(pa, abs=1e-6)
    assert (hits[0][1], hits[0][2]) == (0, 2)
    # word 9 follows both branches: posterior 1
    hits9 = search_index([idx], [9])
    assert hits9[0][3] == pytest.approx(1.0, abs=1e-6)
    # non-adjacent factor: 8 then 7 never occurs
    assert search_index([idx], [8, 7]) == []


def test_factor_search_through_eps():
    """Words separated by eps arcs still join (word-aligned lattices keep
    eps silence arcs between words)."""
    lat = Lattice()
    s0, s1, s2, s3 = (lat.add_state() for _ in range(4))
    lat.start = s0
    lat.add_arc(s0, 1, 5, 0.5, 0.0, s1)
    lat.add_arc(s1, 0, 0, 0.1, 0.0, s2)   # eps (e.g. silence)
    lat.add_arc(s2, 2, 6, 0.5, 0.0, s3)
    lat.set_final(s3)
    idx = lattice_to_kws_index(lat, "u")
    hits = search_index([idx], [5, 6])
    assert len(hits) == 1
    assert hits[0][3] == pytest.approx(1.0, abs=1e-6)


def test_twv_scoring():
    refs = {"kw1": [("u1", 100, 130), ("u2", 50, 80)],
            "kw2": [("u1", 300, 340)]}
    # kw1: one correct hit + one FA; kw2: missed
    hits = {"kw1": [("u1", 105, 128, 0.9), ("u3", 10, 40, 0.8)],
            "kw2": []}
    res = compute_twv(refs, hits, audio_duration_sec=600.0)
    opts = TwvOptions()
    # NIST convention: one FA trial per SECOND of audio (regression: the
    # old frames-based trial count made P_fa ~100x too small)
    n_trials = 600.0
    exp_kw1 = 1.0 - 0.5 - opts.beta * (1.0 / (n_trials - 2))
    exp_kw2 = 0.0  # 1 - p_miss(1) - 0
    assert res["per_kw"]["kw1"] == pytest.approx(exp_kw1, abs=1e-6)
    assert res["per_kw"]["kw2"] == pytest.approx(exp_kw2, abs=1e-6)
    assert res["atwv"] == pytest.approx((exp_kw1 + exp_kw2) / 2, abs=1e-6)
    # STWV ignores FAs and thresholds: kw1 hit found -> 0.5, kw2 -> 0
    assert res["stwv"] == pytest.approx(0.25, abs=1e-6)


def test_twv_score_threshold():
    refs = {"kw": [("u1", 10, 20)]}
    hits = {"kw": [("u1", 12, 22, 0.2)]}   # below threshold 0.5
    res = compute_twv(refs, hits, audio_duration_sec=100.0)
    assert res["per_kw"]["kw"] == pytest.approx(0.0)   # miss at threshold
    assert res["stwv"] == pytest.approx(1.0)            # found ignoring score


def test_proxy_keywords():
    lexicon = {
        "cat": [["k", "ae", "t"]],
        "cut": [["k", "ah", "t"]],
        "dog": [["d", "ao", "g"]],
        "at": [["ae", "t"]],
        "kay": [["k", "ey"]],
    }
    oov = ["k", "ae", "d"]  # like 'cad'
    conf = {("d", "t"): 0.3, ("t", "d"): 0.3}
    proxies = generate_proxy_keywords(oov, lexicon, conf, nbest=3, beam=2.0)
    assert proxies, "no proxies generated"
    words, cost = proxies[0]
    # 'cat' with d->t confusion (cost 0.3) must be the best proxy
    assert words == ("cat",)
    assert cost == pytest.approx(0.3)
    # all returned costs within beam and sorted
    costs = [c for _w, c in proxies]
    assert costs == sorted(costs) and all(c <= 2.0 for c in costs)
