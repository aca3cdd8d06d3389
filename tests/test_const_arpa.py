"""ConstArpaLm: packed LM parity with the ArpaLm oracle + lattice rescoring.

(ref test strategy: src/lm/lm-lib-test.cc uses input.arpa plus adversarial
 missing_backoffs.arpa / unused_backoffs.arpa; we score sentences through
 both the dict-based ArpaLm (oracle) and the packed ConstArpaLm and demand
 agreement, then check const-arpa lattice rescoring end to end.)
"""

import math

import numpy as np
import pytest

from kaldi_tpu.fst.fst import SymbolTable
from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
from kaldi_tpu.lm.const_arpa import ConstArpaLm, lattice_lmrescore_const_arpa
from kaldi_tpu.lat.lattice import Lattice
from kaldi_tpu.lat.functions import lattice_best_path, compose_lattice_with_lm

REF_LM_DIR = "/root/reference/src/lm"


def _words_table(*syms):
    t = SymbolTable()
    t.add("<eps>")  # no-op if present
    for s in syms:
        t.add(s)
    t.add("#0")
    return t


@pytest.mark.parametrize("arpa_file", ["input.arpa", "missing_backoffs.arpa",
                                       "unused_backoffs.arpa"])
def test_const_arpa_matches_oracle(arpa_file):
    with open(f"{REF_LM_DIR}/{arpa_file}") as f:
        text = f.read()
    lm = ArpaLm.parse(text)
    words = _words_table("a", "b", "<s>", "</s>")
    clm = ConstArpaLm(lm, words)
    rng = np.random.RandomState(0)
    for _ in range(30):
        sent = [rng.choice(["a", "b"]) for _ in range(rng.randint(1, 6))]
        oracle = lm.score_sentence(sent)
        got = clm.sentence_logprob([words[w] for w in sent])
        assert got == pytest.approx(oracle, abs=1e-4), sent


def test_const_arpa_ngram_state_tracking():
    """Higher-order context must be used when available: P(b | <s> a) is the
    trigram from input.arpa, not a backed-off bigram."""
    with open(f"{REF_LM_DIR}/input.arpa") as f:
        lm = ArpaLm.parse(f.read())
    words = _words_table("a", "b", "<s>", "</s>")
    clm = ConstArpaLm(lm, words)
    s = clm.start_state()
    s, _c = clm.step(s, words["a"])
    _s2, c = clm.step(s, words["b"])
    assert c == pytest.approx(0.34958 * math.log(10), abs=1e-4)


def test_lattice_lmrescore_const_arpa_swaps_lm_scores():
    """Build a 2-path word lattice; rescoring with a LM that prefers the
    other path must flip the best path (latbin/lattice-lmrescore-const-arpa)."""
    words = _words_table("a", "b", "<s>", "</s>")
    A, B = words["a"], words["b"]
    lat = Lattice()
    s0, s1, s2 = lat.add_state(), lat.add_state(), lat.add_state()
    lat.start = s0
    lat.add_arc(s0, 1, A, 0.0, 1.0, s1)   # "a": acoustic 1.0
    lat.add_arc(s0, 2, B, 0.0, 1.1, s2)   # "b": acoustic 1.1 (worse)
    lat.set_final(s1)
    lat.set_final(s2)
    assert lattice_best_path(lat)[0] == [A]

    # LM strongly prefers "b"
    arpa = ("\\data\\\nngram 1=4\n\n\\1-grams:\n"
            "-9\ta\n-0.01\tb\n-99\t<s>\n-0.01\t</s>\n\n\\end\\\n")
    lm = ArpaLm.parse(arpa)
    clm = ConstArpaLm(lm, words)
    res = lattice_lmrescore_const_arpa(lat, clm, lm_scale=1.0)
    assert lattice_best_path(res)[0] == [B]
    # and removing it again (scale -1) restores the acoustic ranking
    back = lattice_lmrescore_const_arpa(res, clm, lm_scale=-1.0)
    assert lattice_best_path(back)[0] == [A]


@pytest.mark.parametrize("arpa_file", ["input.arpa",
                                       "missing_backoffs.arpa",
                                       "unused_backoffs.arpa"])
def test_const_arpa_agrees_with_g_fst_composition(arpa_file):
    """Rescoring through ConstArpaLm must match composing with the G FST
    built from the same ARPA (same total costs on the best path) — also
    on the adversarial missing/unused-backoff files, where G must create
    proper context states for histories without their own entries."""
    with open(f"{REF_LM_DIR}/{arpa_file}") as f:
        lm = ArpaLm.parse(f.read())
    words = _words_table("a", "b", "<s>", "</s>")
    clm = ConstArpaLm(lm, words)
    g = arpa_to_g(lm, words)

    lat = Lattice()
    s0, s1, s2 = lat.add_state(), lat.add_state(), lat.add_state()
    lat.start = s0
    lat.add_arc(s0, 1, words["a"], 0.0, 0.3, s1)
    lat.add_arc(s1, 2, words["b"], 0.0, 0.4, s2)
    lat.set_final(s2)

    via_fst = compose_lattice_with_lm(lat, g, words["#0"], lm_scale=1.0)
    via_clm = lattice_lmrescore_const_arpa(lat, clm, lm_scale=1.0)
    c_fst = lattice_best_path(via_fst)[2]
    c_clm = lattice_best_path(via_clm)[2]
    assert c_clm == pytest.approx(c_fst, abs=1e-4)


def test_const_arpa_serialization_and_cli(tmp_path):
    """(ref: lmbin/arpa-to-const-arpa.cc + ConstArpaLm::Write/Read) —
    the packed artifact round-trips and scores identically to the
    freshly-built LM."""
    from kaldi_tpu.cli import main as cli_main
    from kaldi_tpu.io.model_io import save_const_arpa, load_const_arpa
    from kaldi_tpu.fst.fst import SymbolTable

    words = SymbolTable()
    for w in ("a", "b", "c"):
        words.add(w)
    arpa_text = ("\\data\\\nngram 1=5\nngram 2=3\n\n\\1-grams:\n"
                 "-0.5\ta -0.2\n-0.7\tb -0.1\n-0.9\tc\n-99\t<s> -0.3\n"
                 "-0.6\t</s>\n\n\\2-grams:\n-0.1\ta b\n-0.2\tb c\n"
                 "-0.4\t<s> a\n\n\\end\\\n")
    lm = ArpaLm.parse(arpa_text)
    clm = ConstArpaLm(lm, words)
    p = str(tmp_path / "lm.clm.npz")
    save_const_arpa(p, clm)
    clm2 = load_const_arpa(p)
    for sent in (["a", "b", "c"], ["b"], ["c", "a"], ["a", "b"]):
        ids = [words[w] for w in sent]
        assert clm2.sentence_logprob(ids) == \
            pytest.approx(clm.sentence_logprob(ids), abs=1e-6)
    # CLI build path
    wtxt = tmp_path / "words.txt"
    lines = ["<eps> 0"] + [f"{w} {words[w]}" for w in ("a", "b", "c")]
    wtxt.write_text("\n".join(lines) + "\n")
    atxt = tmp_path / "lm.arpa"
    atxt.write_text(arpa_text)
    out = str(tmp_path / "cli.clm.npz")
    cli_main(["arpa-to-const-arpa", str(wtxt), str(atxt), out])
    clm3 = load_const_arpa(out)
    ids = [words[w] for w in ("a", "b")]
    # note: the CLI's symbol table lacks <s>/</s> entries here, so only
    # compare against a build from the same table
    from kaldi_tpu.fst.fst import SymbolTable as ST
    words2 = ST.read(str(wtxt))
    ref = ConstArpaLm(ArpaLm.parse(arpa_text), words2)
    ids2 = [words2[w] for w in ("a", "b")]
    assert clm3.sentence_logprob(ids2) == \
        pytest.approx(ref.sentence_logprob(ids2), abs=1e-6)


@pytest.mark.parametrize("arpa_file", ["input.arpa", "missing_backoffs.arpa",
                                       "unused_backoffs.arpa"])
def test_step_batch_matches_scalar(arpa_file):
    """Vectorized step_batch must equal step() query-for-query, including
    backoff chains, unknown words, and the adversarial backoff fixtures."""
    import os
    path = os.path.join(REF_LM_DIR, arpa_file)
    if not os.path.exists(path):
        pytest.skip("reference lm fixtures unavailable")
    lm = ArpaLm.parse(open(path).read())
    vocab = sorted({w for d in lm.ngrams for ng in d for w in ng}
                   - {"<s>", "</s>"})
    words = _words_table(*vocab)
    clm = ConstArpaLm(lm, words)
    rng = np.random.RandomState(0)
    N = 500
    states = rng.randint(0, clm.num_states, N)
    wids = rng.randint(1, len(words) - 1, N)   # skip eps and #0
    nb, cb = clm.step_batch(states, wids)
    for i in range(N):
        ns, cs = clm.step(int(states[i]), int(wids[i]))
        assert ns == nb[i], (i, states[i], wids[i])
        assert abs(cs - cb[i]) < 1e-4, (i, states[i], wids[i])
    fb = clm.final_cost_batch(states[:50])
    for i in range(50):
        assert abs(clm.final_cost(int(states[i])) - fb[i]) < 1e-4


@pytest.mark.parametrize("arpa_file", ["input.arpa", "missing_backoffs.arpa"])
def test_step_batch_out_of_domain_words(arpa_file):
    """Word ids beyond the packed column domain (word+3 >= W) must take the
    unk path, not alias into a neighbouring state's composite-key range.
    Regression: step_batch(state=0, word=W-3+k) returned a foreign entry's
    cost/next-state instead of the unk cost. Lattice rescoring passes
    arbitrary olabels, so this mis-scored any word id above the LM's max."""
    import os
    path = os.path.join(REF_LM_DIR, arpa_file)
    if not os.path.exists(path):
        pytest.skip("reference lm fixtures unavailable")
    lm = ArpaLm.parse(open(path).read())
    words = _words_table("a", "b", "<s>", "</s>")
    clm = ConstArpaLm(lm, words)
    clm._batch_tables()
    W = clm._wspan
    rng = np.random.RandomState(1)
    states = rng.randint(0, clm.num_states, 40)
    # word ids straddling and beyond the aliasing threshold W-3
    wids = np.concatenate([np.arange(W - 5, W + 10),
                           rng.randint(W, 4 * W, 25)]).astype(np.int64)
    states = np.resize(states, len(wids))
    nb, cb = clm.step_batch(states, wids)
    for i in range(len(wids)):
        ns, cs = clm.step(int(states[i]), int(wids[i]))
        assert ns == nb[i], (i, states[i], wids[i])
        assert abs(cs - cb[i]) < 1e-4, (i, states[i], wids[i])


def test_lattice_lmrescore_batch_matches_scalar():
    """The vectorized rescorer must produce the same weighted path set
    as the scalar reference implementation on random topo lattices."""
    arpa = ("\\data\\\nngram 1=5\nngram 2=4\n\n\\1-grams:\n"
            "-0.7\tA\t-0.3\n-0.8\tB\t-0.2\n-1.0\tC\n-99\t<s>\t-0.1\n"
            "-0.6\t</s>\n\n\\2-grams:\n-0.2\tA B\n-0.5\tB A\n-0.9\tB C\n"
            "-0.4\t<s> A\n\n\\end\\\n")
    lm = ArpaLm.parse(arpa)
    words = _words_table("A", "B", "C")
    clm = ConstArpaLm(lm, words)
    from kaldi_tpu.lm.const_arpa import lattice_lmrescore_const_arpa_batch
    rng = np.random.RandomState(1)
    wid = [words["A"], words["B"], words["C"], 0]
    for trial in range(6):
        n = int(rng.randint(5, 12))
        lat = Lattice()
        for _ in range(n):
            lat.add_state()
        lat.start = 0
        for _ in range(int(rng.randint(n, 3 * n))):
            s = int(rng.randint(0, n - 1))
            d = int(rng.randint(s + 1, n))
            lat.add_arc(s, int(rng.randint(1, 9)),
                        wid[int(rng.randint(4))],
                        float(np.round(rng.rand(), 3)),
                        float(np.round(rng.rand(), 3)), d)
        lat.set_final(n - 1, 0.25, 0.0)
        if int(rng.randint(2)):
            lat.set_final(int(rng.randint(1, n)), 0.5, 0.0)
        for scale in (1.0, -1.0, 0.5):
            want = lattice_lmrescore_const_arpa(lat, clm, scale)
            got = lattice_lmrescore_const_arpa_batch(lat, clm, scale)
            pw = {(w, t): round(c, 3)
                  for (w, t, c) in want.paths(max_paths=100000)}
            pg = {(w, t): round(c, 3)
                  for (w, t, c) in got.paths(max_paths=100000)}
            assert pw == pg, (trial, scale)
