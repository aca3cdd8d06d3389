"""Scoring sweep (score.sh parity): LM-scale grid + word insertion penalty
over decode lattices must pick the operating point with the lowest WER.
"""

import numpy as np
import pytest

from kaldi_tpu.lat.lattice import Lattice
from kaldi_tpu.steps.score import score_lattices


def _lat(word_costs):
    """Linear lattice alternatives: {(w1, w2...): (graph, acoustic)}."""
    lat = Lattice()
    lat.start = lat.add_state()
    for words, (g, a) in word_costs.items():
        cur = lat.start
        n = len(words)
        for i, w in enumerate(words):
            ns = lat.add_state()
            lat.add_arc(cur, 1, w, g / n, a / n, ns)
            cur = ns
        lat.set_final(cur)
    return lat


def test_sweep_picks_operating_point():
    # utt1: acoustics prefer the WRONG 2-word path; graph prefers the
    # right 1-word path -> high lmwt (downweighting acoustics) fixes it.
    lattices = {
        "u1": _lat({(5, 6): (6.0, 0.5), (7,): (2.0, 5.0)}),
        "u2": _lat({(8,): (1.0, 1.0)}),
    }
    refs = {"u1": [7], "u2": [8]}
    stats, (lmwt, wip), grid = score_lattices(
        lattices, refs, words=None,
        lm_scales=(1, 5, 15), word_ins_penalties=(0.0, 1.0),
        decode_acoustic_scale=1.0)
    assert stats.wer == 0.0
    # at lmwt=1 (acoustics dominant) u1 is wrong
    assert grid[(1, 0.0)].wer > 0.0
    # the chosen point is the argmin over the grid
    assert stats.wer == min(s.wer for s in grid.values())


def test_word_ins_penalty_kills_insertions():
    # acoustics slightly prefer inserting an extra word
    lattices = {"u": _lat({(5, 6): (1.0, 0.9), (5,): (1.0, 1.0)})}
    refs = {"u": [5]}
    stats, (lmwt, wip), grid = score_lattices(
        lattices, refs, lm_scales=(1,), word_ins_penalties=(0.0, 0.5),
        decode_acoustic_scale=1.0)
    assert grid[(1, 0.0)].wer > 0.0       # insertion without penalty
    assert grid[(1, 0.5)].wer == 0.0      # penalty removes it
    assert wip == 0.5 and stats.wer == 0.0
