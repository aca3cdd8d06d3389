"""Native graph ops (native/fst_ops.cc) vs the Python reference
implementations: compose must match arc-for-arc (identical BFS), and
determinize-star must be path-set equivalent with identical
determinism/functionality semantics.

(ref: fstext/table-matcher.h:329, fstext/determinize-star.h:86)
"""

import numpy as np
import pytest

from kaldi_tpu.fst.fst import Fst
from kaldi_tpu.fst.compose import compose
from kaldi_tpu.fst.determinize import determinize_star
from kaldi_tpu.fst.flat import FlatFst
from kaldi_tpu.fst import native_ops

pytestmark = pytest.mark.skipif(not native_ops.available(),
                                reason="native toolchain unavailable")


def _random_fst(rng, n_states=12, n_arcs=30, n_labels=5, acyclic=False,
                eps_prob=0.25):
    f = Fst()
    for _ in range(n_states):
        f.add_state()
    f.start = 0
    for _ in range(n_arcs):
        s = int(rng.integers(n_states - 1))
        d = int(rng.integers(s + 1, n_states)) if acyclic \
            else int(rng.integers(n_states))
        il = 0 if rng.random() < eps_prob else int(rng.integers(1, n_labels))
        ol = 0 if rng.random() < eps_prob else int(rng.integers(1, n_labels))
        f.add_arc(s, il, ol, float(np.round(rng.random() * 3, 3)), d)
    for _ in range(2):
        f.set_final(int(rng.integers(1, n_states)),
                    float(np.round(rng.random(), 3)))
    return f


def _assert_same_fst(a: Fst, b: Fst):
    assert a.num_states == b.num_states
    assert a.num_arcs == b.num_arcs
    assert a.start == b.start
    for s in range(a.num_states):
        aa = [(i, o, round(w, 4), d) for (i, o, w, d) in a.arcs[s]]
        bb = [(i, o, round(w, 4), d) for (i, o, w, d) in b.arcs[s]]
        assert aa == bb, s
    fa = {s: round(w, 4) for s, w in a.finals.items()}
    fb = {s: round(w, 4) for s, w in b.finals.items()}
    assert fa == fb


def test_flat_roundtrip():
    rng = np.random.default_rng(0)
    f = _random_fst(rng)
    g = FlatFst.from_fst(f).to_fst()
    _assert_same_fst(f, g)


def test_native_compose_matches_python():
    rng = np.random.default_rng(1)
    for trial in range(20):
        a = _random_fst(rng, n_states=int(rng.integers(3, 15)),
                        n_arcs=int(rng.integers(5, 40)))
        b = _random_fst(rng, n_states=int(rng.integers(3, 15)),
                        n_arcs=int(rng.integers(5, 40)))
        want = compose(a, b, connect=True)
        got = native_ops.compose_flat(FlatFst.from_fst(a),
                                      FlatFst.from_fst(b),
                                      connect=True).to_fst()
        # identical BFS + identical connect renumbering => identical FST
        _assert_same_fst(want, got)


def test_native_compose_unconnected():
    rng = np.random.default_rng(2)
    a = _random_fst(rng)
    b = _random_fst(rng)
    want = compose(a, b, connect=False)
    got = native_ops.compose_flat(FlatFst.from_fst(a), FlatFst.from_fst(b),
                                  connect=False).to_fst()
    _assert_same_fst(want, got)


def _functional_transducer(rng, n_words=6, max_len=4):
    """A lexicon-union FST (each input string maps to one output): the
    shape determinize-star consumes in mkgraph (L or LG)."""
    f = Fst()
    root = f.add_state()
    f.start = root
    end = f.add_state()
    f.set_final(end, 0.0)
    for w in range(1, n_words + 1):
        seq = rng.integers(1, 5, size=int(rng.integers(1, max_len + 1)))
        cur = root
        for k, ph in enumerate(seq):
            nxt = f.add_state()
            f.add_arc(cur, int(ph), w if k == 0 else 0,
                      float(np.round(rng.random(), 3)), nxt)
            cur = nxt
        # homophones would make this non-functional without disambig
        # symbols; a unique disambig input label per word (L_disambig's
        # #1/#2 role) guarantees functionality
        f.add_arc(cur, 1000 + w, 0, 0.0, end)
    return f


@pytest.mark.parametrize("use_log", [False, True])
def test_native_determinize_star_matches_python(use_log):
    rng = np.random.default_rng(3)
    for trial in range(15):
        f = _functional_transducer(rng, n_words=int(rng.integers(2, 8)))
        want = determinize_star(f, use_log=use_log)
        got = native_ops.determinize_star_flat(
            FlatFst.from_fst(f), use_log=use_log).to_fst()
        assert got.is_deterministic(allow_eps=True) or got.num_states <= 1
        assert want.equivalent_paths(got, tol=1e-3), trial


def test_native_determinize_star_eps_and_strings():
    """Input-eps closure + multi-label output strings (eps chains)."""
    f = Fst()
    s0, s1, s2, s3 = (f.add_state() for _ in range(4))
    f.start = s0
    f.add_arc(s0, 0, 7, 0.5, s1)        # input-eps emitting 7
    f.add_arc(s1, 2, 8, 0.25, s2)       # input "2" -> outputs (7, 8)
    f.add_arc(s0, 3, 9, 1.5, s3)
    f.add_arc(s3, 0, 10, 0.0, s2)       # input "3" -> outputs (9, 10)
    f.set_final(s2, 0.125)
    want = determinize_star(f)
    got = native_ops.determinize_star_flat(FlatFst.from_fst(f)).to_fst()
    assert want.equivalent_paths(got, tol=1e-3)


def test_native_determinize_star_nonfunctional_raises():
    f = Fst()
    s0, s1 = f.add_state(), f.add_state()
    f.start = s0
    f.add_arc(s0, 1, 5, 0.0, s1)
    f.add_arc(s0, 1, 6, 0.0, s1)   # same input, different output
    f.set_final(s1, 0.0)
    with pytest.raises(RuntimeError, match="not functional"):
        native_ops.determinize_star_flat(FlatFst.from_fst(f))
    with pytest.raises(RuntimeError, match="not functional"):
        determinize_star(f)


def test_native_connect_matches_python():
    rng = np.random.default_rng(4)
    for _ in range(10):
        f = _random_fst(rng, n_states=20, n_arcs=25)
        want = f.copy().connect()
        got = native_ops.connect_flat(FlatFst.from_fst(f)).to_fst()
        _assert_same_fst(want, got)


def test_native_pipeline_on_lang_graph():
    """L∘G -> det*(log) through the native path must equal the Python
    path on a real (yesno-like) lang dir — the exact mkgraph stage
    sequence (ref: utils/mkgraph.sh:64-104)."""
    from kaldi_tpu.fst.lang import Lexicon, prepare_lang
    from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
    lex = Lexicon.parse("YES Y1 Y2\nNO N1 N2\nMAYBE M A Y\nNO2 N1 A")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    g = arpa_to_g(ArpaLm.parse(
        "\\data\\\nngram 1=5\n\n\\1-grams:\n-0.9\tNO\n-0.9\tYES\n"
        "-1.2\tMAYBE\n-1.2\tNO2\n-99\t<s>\n-0.4\t</s>\n\n\\end\\\n"),
        lang.words)
    want = determinize_star(compose(lang.L_disambig, g), use_log=True)
    lg = native_ops.compose_flat(FlatFst.from_fst(lang.L_disambig),
                                 FlatFst.from_fst(g))
    got = native_ops.determinize_star_flat(lg, use_log=True).to_fst()
    # LG is cyclic (word loop): the rand-equivalence oracle is composing
    # both with random linear input acceptors and comparing shortest
    # paths (the reference's fstequivalent-by-randgen strategy)
    rng = np.random.default_rng(0)
    checked = 0
    for trial in range(100):
        if checked >= 8:
            break
        # random walk on `want` to draw an accepted input string
        s, seq = want.start, []
        for _ in range(int(rng.integers(3, 25))):
            if not want.arcs[s]:
                break
            (i, o, w, d) = want.arcs[s][int(rng.integers(len(want.arcs[s])))]
            if i != 0:
                seq.append(i)
            s = d
        if s not in want.finals or not seq:
            continue
        acc = Fst.linear_acceptor(seq)
        _, ow, costw = compose(acc, want).shortest_path()
        _, og, costg = compose(acc, got).shortest_path()
        assert ow == og, seq
        assert abs(costw - costg) < 1e-3
        checked += 1
    assert checked >= 8


def test_native_minimize_encoded_matches_python():
    """Minimized FST must be path-equivalent with the same (minimal)
    state count as fst/minimize.py's Moore refinement."""
    from kaldi_tpu.fst.minimize import minimize_encoded
    rng = np.random.default_rng(5)
    for trial in range(10):
        f = _functional_transducer(rng, n_words=int(rng.integers(3, 8)))
        det = determinize_star(f)
        want = minimize_encoded(det.copy())
        got = native_ops.minimize_encoded_flat(
            FlatFst.from_fst(det)).to_fst()
        assert got.num_states == want.num_states, trial
        assert got.num_arcs == want.num_arcs, trial
        assert want.equivalent_paths(got, tol=1e-3), trial


def test_native_minimize_encoded_label_hash_collision():
    """Distinct (il, ol, w) triples must never share an encoded label.

    Regression: the encoder keyed its map on a folded multiply/xor hash;
    the triples (0, 0, w=1.000003) and (0, 1, w=0.0) collide under
    ((il*1000003)^ol)*1000003^round(w/1e-6), so two non-equivalent states
    distinguished only by these arcs were merged, silently corrupting the
    minimized graph. The key is now the exact triple."""
    f = Fst()
    for _ in range(4):
        f.add_state()
    f.start = 0
    f.add_arc(0, 1, 1, 0.0, 1)
    f.add_arc(0, 2, 2, 0.0, 2)
    f.add_arc(1, 0, 0, 1.000003, 3)     # colliding pair under old hash
    f.add_arc(2, 0, 1, 0.0, 3)
    f.set_final(3, 0.0)
    got = native_ops.minimize_encoded_flat(FlatFst.from_fst(f)).to_fst()
    # states 1 and 2 are NOT equivalent (different arc labels/weights):
    # nothing may merge, and both paths must survive with their weights
    assert got.num_states == 4
    from kaldi_tpu.fst.minimize import minimize_encoded
    want = minimize_encoded(f.copy())
    assert got.num_states == want.num_states
    assert want.equivalent_paths(got, tol=1e-6)
