"""Lattice surgery + compressed storage tests.

(ref: lat/{word-align-lattice,phone-align-lattice,push-lattice,
 minimize-lattice,confidence}.h, latbin/lattice-{oracle,union,interp}.cc,
 matrix/compressed-matrix.h.)
"""

import numpy as np
import pytest

from kaldi_tpu.lat.lattice import Lattice
from kaldi_tpu.lat.functions import lattice_best_path, nbest
from kaldi_tpu.lat.align import (
    ali_to_phones, words_to_ctm, lattice_oracle, lattice_confidence,
    push_lattice, minimize_lattice, lattice_union, lattice_interp,
)
from kaldi_tpu.io.compressed import CompressedMatrix


class TmStub:
    """tids encode (phone*100 + hmm_state*10 + selfloop)."""

    def transition_id_to_phone(self, tid):
        return tid // 100

    def transition_id_to_hmm_state(self, tid):
        return (tid % 100) // 10

    def is_self_loop(self, tid):
        return tid % 10 == 1

    def is_final(self, tid):
        # last hmm state, non-self-loop
        return (tid % 100) // 10 == 1 and tid % 10 == 0


def test_ali_to_phones():
    tm = TmStub()
    # phone 3: states 0,0(sl),1; phone 5: states 0,1
    tids = [300, 301, 310, 500, 510]
    segs = ali_to_phones(tm, tids)
    assert segs == [(3, 0, 3), (5, 3, 2)]
    pf = ali_to_phones(tm, tids, per_frame=True)
    assert pf == [3, 3, 3, 5, 5]


def test_words_to_ctm():
    tm = TmStub()
    # word 42 = phones (3, 5); word 43 = phone (7)
    lex = {42: [(3, 5)], 43: [(7,)]}
    tids = [300, 301, 310, 500, 510, 700, 710, 711]
    ctm = words_to_ctm(tids, [42, 43], tm, lex)
    assert ctm == [(42, 0, 5), (43, 5, 3)]


def _abc_lattice():
    """Paths: A-B (cost 1), A-C (cost 2), D (cost 5)."""
    lat = Lattice()
    s = [lat.add_state() for _ in range(5)]
    lat.start = s[0]
    lat.add_arc(s[0], 1, 10, 0.5, 0.0, s[1])   # A
    lat.add_arc(s[1], 2, 11, 0.5, 0.0, s[2])   # B
    lat.add_arc(s[1], 3, 12, 1.5, 0.0, s[3])   # C
    lat.add_arc(s[0], 4, 13, 5.0, 0.0, s[4])   # D
    for t in (s[2], s[3], s[4]):
        lat.set_final(t)
    return lat


def test_lattice_oracle():
    lat = _abc_lattice()
    edits, oracle = lattice_oracle(lat, [10, 11])
    assert edits == 0 and oracle == [10, 11]
    edits, oracle = lattice_oracle(lat, [10, 99])
    assert edits == 1 and oracle in ([10, 11], [10, 12])
    edits, _ = lattice_oracle(lat, [13])
    assert edits == 0
    edits, _ = lattice_oracle(lat, [99, 98, 97])
    assert edits == 3  # 2-word path: 2 subs + 1 del; 1-word path: 1 sub + 2 dels


def test_lattice_confidence():
    lat = _abc_lattice()
    conf = lattice_confidence(lat)
    assert conf == pytest.approx(1.0)   # best 1.0 (A,B), next seq (A,C) 2.0
    # single path lattice -> inf
    one = Lattice()
    a, b = one.add_state(), one.add_state()
    one.start = a
    one.add_arc(a, 1, 5, 0.3, 0.0, b)
    one.set_final(b)
    assert lattice_confidence(one) == float("inf")


def test_push_preserves_path_costs():
    lat = _abc_lattice()
    before = sorted((tuple(w), round(c, 6)) for (w, _t, c) in nbest(lat, 10))
    pushed = push_lattice(lat)
    after = sorted((tuple(w), round(c, 6)) for (w, _t, c) in nbest(pushed, 10))
    assert before == after
    # after pushing, the best continuation from every state costs ~0
    # (check start: minimum outgoing arc cost+suffix is the total best)
    w, _t, c = lattice_best_path(pushed)
    assert c == pytest.approx(1.0)


def test_minimize_merges_shared_suffixes():
    lat = Lattice()
    s = [lat.add_state() for _ in range(6)]
    lat.start = s[0]
    # two prefixes reaching identical suffix structures
    lat.add_arc(s[0], 1, 10, 1.0, 0.0, s[1])
    lat.add_arc(s[0], 2, 11, 2.0, 0.0, s[2])
    lat.add_arc(s[1], 3, 12, 1.0, 0.0, s[3])
    lat.add_arc(s[2], 3, 12, 1.0, 0.0, s[4])
    lat.set_final(s[3])
    lat.set_final(s[4])
    before = sorted((tuple(w), round(c, 6)) for (w, _t, c) in nbest(lat, 10))
    mini = minimize_lattice(lat)
    after = sorted((tuple(w), round(c, 6)) for (w, _t, c) in nbest(mini, 10))
    assert before == after
    assert mini.num_states < lat.num_states


def test_union_and_interp():
    a = _abc_lattice()
    b = Lattice()
    s0, s1, s2 = b.add_state(), b.add_state(), b.add_state()
    b.start = s0
    b.add_arc(s0, 1, 10, 0.2, 0.0, s1)
    b.add_arc(s1, 2, 11, 0.2, 0.0, s2)
    b.set_final(s2)

    u = lattice_union(a, b)
    seqs = {tuple(w) for (w, _t, _c) in nbest(u, 20)}
    assert (10, 11) in seqs and (13,) in seqs

    interp = lattice_interp(a, b, alpha=0.5)
    paths = nbest(interp, 10)
    assert len(paths) == 1                      # only A-B is in both
    assert tuple(paths[0][0]) == (10, 11)
    assert paths[0][2] == pytest.approx(0.5 * 1.0 + 0.5 * 0.4)


def test_review_regressions():
    """Regressions from the lat/ code review."""
    from kaldi_tpu.lat.io import write_lattice_ark, read_lattice_ark
    from kaldi_tpu.lat.functions import prune_lattice
    from kaldi_tpu.lat.mbr import expected_wer
    import tempfile, os

    # 1. numeric utterance keys parse
    lat = _abc_lattice()
    d = tempfile.mkdtemp()
    path = os.path.join(d, "l.txt")
    write_lattice_ark(path, {"1089-134686-0001": lat})
    got = dict(read_lattice_ark(path))
    assert "1089-134686-0001" in got

    # 2. stashed tids survive connect() and serialization
    lat2 = _abc_lattice()
    lat2.arcs[0][0].tids = (5, 6, 7)
    lat2.connect()
    assert getattr(lat2.arcs[0][0], "tids", None) == (5, 6, 7)
    write_lattice_ark(path, {"u": lat2})
    back = dict(read_lattice_ark(path))["u"]
    assert any(getattr(a, "tids", None) == (5, 6, 7)
               for arcs in back.arcs for a in arcs)

    # 3. empty-lattice guards
    assert prune_lattice(Lattice(), 5.0).num_states == 0
    assert expected_wer(Lattice(), [1, 2]) == float("inf")
    empty_union = lattice_union(_abc_lattice(), Lattice())
    seqs = {tuple(w) for (w, _t, _c) in nbest(empty_union, 20)}
    assert (10, 11) in seqs and () not in seqs


def test_confidence_many_alignments():
    """Confidence must see the competitor even when the best word sequence
    has many alignments (computed over the determinization now)."""
    lat = Lattice()
    s0 = lat.add_state()
    lat.start = s0
    end = lat.add_state()
    # 40 equal-cost alignments of word 7
    for k in range(40):
        mid = lat.add_state()
        lat.add_arc(s0, k + 1, 7, 0.5, 0.0, mid)
        lat.add_arc(mid, k + 100, 0, 0.5, 0.0, end)
    # one competitor word 8, 0.1 worse
    mid2 = lat.add_state()
    lat.add_arc(s0, 99, 8, 0.6, 0.0, mid2)
    lat.add_arc(mid2, 199, 0, 0.5, 0.0, end)
    lat.set_final(end)
    conf = lattice_confidence(lat)
    assert conf == pytest.approx(0.1, abs=1e-4)


def test_word_align_multi_pron():
    """Words with prons of several lengths must emit on the EXACT match,
    not the first length match."""
    from kaldi_tpu.lat.align import word_align_lattice
    from kaldi_tpu.lat.posteriors import lattice_state_times
    tm = TmStub()
    # word 7 prons: (3,) and (3, 5); path pronounces (3, 5)
    lex = {7: [(3,), (3, 5)]}
    lat = Lattice()
    s = [lat.add_state() for _ in range(5)]
    lat.start = s[0]
    # tids: phone 3 (310 = final state of phone 3), phone 5 (510)
    lat.add_arc(s[0], 300, 7, 0.1, 0.0, s[1])
    lat.add_arc(s[1], 310, 0, 0.1, 0.0, s[2])
    lat.add_arc(s[2], 500, 0, 0.1, 0.0, s[3])
    lat.add_arc(s[3], 510, 0, 0.1, 0.0, s[4])
    lat.set_final(s[4])
    aligned = word_align_lattice(lat, tm, lex)
    # exactly one arc carries word 7 and it is an arc of phone 5 (the
    # completion of the (3,5) pron) OR of phone 3 if the (3,) pron was
    # taken — but then the path must NOT be emitted a second time
    word_arcs = [(si, a) for si in range(aligned.num_states)
                 for a in aligned.arcs[si] if a.olabel == 7]
    paths = aligned.paths()
    assert paths, "alignment dropped the path"
    for (_w, tids, _c) in paths:
        # every complete path carries word 7 exactly once
        pass
    counts = [sum(1 for w in wseq if w == 7) for (wseq, _t, _c) in paths]
    assert all(c == 1 for c in counts)


def test_compressed_matrix_roundtrip():
    rng = np.random.RandomState(0)
    # feature-like data: smooth column stats and outliers
    x = rng.randn(500, 13).astype(np.float32) * np.linspace(1, 5, 13)
    x[10, 3] = 40.0
    c = CompressedMatrix.compress(x)
    y = c.decompress()
    assert y.shape == x.shape
    # quantization error bounded by segment width / 64 per column
    err = np.abs(y - x)
    col_range = x.max(0) - x.min(0)
    assert np.all(err.max(0) <= col_range / 16.0 + 1e-3)
    # typical error is small (inner quartiles quantized at 128 steps)
    assert np.median(err) < np.median(col_range) / 100.0
    # storage ~ 1 byte per element
    assert c.nbytes < x.size * 1.2 + 200


def test_phone_align_lattice_linear():
    """A linear tid lattice splits into one arc per phone instance with
    summed costs and the word label preserved
    (ref: lat/phone-align-lattice.h)."""
    import numpy as np
    from kaldi_tpu.hmm.topology import HmmTopology
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.lat.lattice import Lattice
    from kaldi_tpu.lat.align import phone_align_lattice
    topo = HmmTopology.three_state([1, 2], num_states=1)
    tm = TransitionModel(topo, lambda ph, pc: ph - 1)
    fwd = {}
    sl = {}
    for tid in range(1, tm.num_transition_ids + 1):
        ph = tm.transition_id_to_phone(tid)
        if tm.is_self_loop(tid):
            sl[ph] = tid
        else:
            fwd[ph] = tid
    # phone 1 for 2 frames (fwd, sl), then phone 2 for 1 frame (fwd);
    # word 9 on the first arc
    ali = [(fwd[1], 9), (sl[1], 0), (fwd[2], 0)]
    lat = Lattice()
    states = [lat.add_state() for _ in range(len(ali) + 1)]
    lat.start = states[0]
    for k, (tid, w) in enumerate(ali):
        lat.add_arc(states[k], tid, w, 0.1, 0.5, states[k + 1])
    lat.set_final(states[-1])
    # NOTE: in our 1-state reordered convention fwd IS the phone-final
    # transition; its self-loop frames trail it
    al = phone_align_lattice(lat, tm)
    paths = []
    s = al.start
    arcs_per_phone = []
    while True:
        assert len(al.arcs[s]) <= 1
        if not al.arcs[s]:
            break
        a = al.arcs[s][0]
        arcs_per_phone.append(a)
        s = a.nextstate
    assert len(arcs_per_phone) == 2  # two phone instances
    a1, a2 = arcs_per_phone
    assert getattr(a1, "tids") == (fwd[1], sl[1])
    assert getattr(a2, "tids") == (fwd[2],)
    assert a1.olabel == 9 and a2.olabel == 0
    assert abs(a1.graph_cost - 0.2) < 1e-6
    assert abs(a1.acoustic_cost - 1.0) < 1e-6
    # replace_output_symbols: phone ids on the arcs
    al2 = phone_align_lattice(lat, tm, replace_output_symbols=True)
    ols = []
    s = al2.start
    while al2.arcs[s]:
        ols.append(al2.arcs[s][0].olabel)
        s = al2.arcs[s][0].nextstate
    assert ols == [1, 2]


def test_phone_align_lattice_branching_no_duplicate_arcs():
    """Regression: a completed phone at a state with multiple outgoing
    arcs must be flushed ONCE, not once per successor arc (duplicates
    double path multiplicity in downstream forward-backward)."""
    import numpy as np
    from kaldi_tpu.hmm.topology import HmmTopology
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.lat.lattice import Lattice
    from kaldi_tpu.lat.align import phone_align_lattice
    topo = HmmTopology.three_state([1, 2, 3], num_states=1)
    tm = TransitionModel(topo, lambda ph, pc: ph - 1)
    fwd, sl = {}, {}
    for tid in range(1, tm.num_transition_ids + 1):
        ph = tm.transition_id_to_phone(tid)
        (sl if tm.is_self_loop(tid) else fwd)[ph] = tid
    lat = Lattice()
    s = [lat.add_state() for _ in range(4)]
    lat.start = s[0]
    # phone 1 (2 frames), then branch: phone 2 or phone 3
    lat.add_arc(s[0], fwd[1], 7, 0.0, 0.5, s[1])
    lat.add_arc(s[1], sl[1], 0, 0.0, 0.5, s[2])
    lat.add_arc(s[2], fwd[2], 8, 0.0, 1.0, s[3])
    lat.add_arc(s[2], fwd[3], 9, 0.0, 2.0, s[3])
    lat.set_final(s[3])
    al = phone_align_lattice(lat, tm)
    # start state must have exactly ONE arc (the single phone-1 instance)
    assert len(al.arcs[al.start]) == 1
    a1 = al.arcs[al.start][0]
    assert a1.tids == (fwd[1], sl[1])
    # its destination branches into phone 2 and phone 3
    nxt = al.arcs[a1.nextstate]
    assert sorted(a.olabel for a in nxt) == [8, 9]
    # path count preserved: exactly 2 full paths
    n_paths = 0
    stack = [(al.start, 0)]
    while stack:
        st, depth = stack.pop()
        if st in al.finals and not al.arcs[st]:
            n_paths += 1
        for a in al.arcs[st]:
            stack.append((a.nextstate, depth + 1))
    assert n_paths == 2
