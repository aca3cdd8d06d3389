"""Remaining bin/fstbin primitives: acc summers, phi composition,
mapped alignment, pdf->tid transducer, two-level trees.

(ref: bin/{sum-lda-accs,sum-mllt-accs,align-mapped,
 make-pdf-to-tid-transducer,build-tree-two-level,
 copy-transition-model}.cc, fstbin/fstphicompose.cc.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import open_rspecifier

from test_gmmbin_cli import _tiny_corpus

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def system(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("binx")
    _tiny_corpus(tmp, n_utts=12, seed=13)
    P = lambda n: str(tmp / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz")])
    main(["gmm-align", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}"])
    main(["ali-to-post", f"ark:{P('ali.ark')}", P("post.txt")])
    return tmp


def test_acc_summers(system):
    P = lambda n: str(system / n)
    utts = sorted(l.split()[0] for l in open(P("text")))
    post_lines = {l.split()[0]: l for l in open(P("post.txt"))}
    for name, keys in (("p1.txt", utts[:6]), ("p2.txt", utts[6:])):
        with open(P(name), "w") as f:
            for u in keys:
                f.write(post_lines[u])
    for acc_cmd, sum_cmd, key in (
            ("acc-lda", "sum-lda-accs", "total_second"),
            ("gmm-acc-mllt", "sum-mllt-accs", "G")):
        main([acc_cmd, P("mono.npz"), f"ark:{P('feats.ark')}",
              P("p1.txt"), P("x1.npz")])
        main([acc_cmd, P("mono.npz"), f"ark:{P('feats.ark')}",
              P("p2.txt"), P("x2.npz")])
        main([sum_cmd, P("xs.npz"), P("x1.npz"), P("x2.npz")])
        main([acc_cmd, P("mono.npz"), f"ark:{P('feats.ark')}",
              P("post.txt"), P("xa.npz")])
        np.testing.assert_allclose(np.load(P("xs.npz"))[key],
                                   np.load(P("xa.npz"))[key], rtol=1e-7)


def test_phi_compose(system, tmp_path):
    """Composing a linear acceptor with a backoff bigram via phi arcs
    matches the ARPA sentence score."""
    P = lambda n: str(tmp_path / n)
    # bigram over {1, 2}: state 0 = <s>, 1 = backoff/unigram,
    # 2 = after-1, 3 = after-2 (no bigrams out of after-2)
    with open(P("g.txt"), "w") as f:
        f.write("0\t2\t1\t1\t0.1\n"      # bigram "1 | <s>"
                "0\t1\t99\t99\t0.5\n"    # <s> backoff
                "1\t2\t1\t1\t1.0\n"      # unigram 1
                "1\t3\t2\t2\t2.0\n"      # unigram 2
                "2\t3\t2\t2\t0.2\n"      # bigram "2 | 1"
                "2\t1\t99\t99\t0.3\n"    # after-1 backoff
                "3\t1\t99\t99\t0.4\n"    # after-2 backoff
                "1\n2\n3\n")
    with open(P("a.txt"), "w") as f:
        f.write("0\t1\t1\t1\n1\t2\t2\t2\n2\t3\t2\t2\n3\n")
    main(["fst-phi-compose", "99", P("a.txt"), P("g.txt"),
          P("c.txt")])
    from kaldi_tpu.fst.text_io import load_fst
    out = load_fst(P("c.txt"))
    res = out.shortest_path()
    assert res is not None
    _il, ol, cost = res
    assert ol == [1, 2, 2]
    # "1"@0.1 -> "2|1"@0.2 -> (after-2: phi 0.4) unigram 2 @2.0
    assert abs(cost - (0.1 + 0.2 + 0.4 + 2.0)) < 1e-4


def test_align_mapped_and_pdf_transducer(system, capsys):
    P = lambda n: str(system / n)
    main(["gmm-compute-likes", P("mono.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('likes.ark')}"])
    main(["align-mapped", P("mono.npz"), P("text"),
          f"ark:{P('likes.ark')}", f"ark:{P('mali.ark')}"])
    a = dict(open_rspecifier(f"ark:{P('ali.ark')}"))
    b = dict(open_rspecifier(f"ark:{P('mali.ark')}"))
    assert set(a) == set(b)
    # gmm-align scores the whole batch in one GEMM while the ark path
    # scores per utterance — last-ulp differences jitter exact-tie
    # Viterbi boundaries, so compare the collapsed phone sequences
    from itertools import groupby
    from kaldi_tpu.io.model_io import load_gmm_system
    tm = load_gmm_system(P("mono.npz")).trans_model
    for k in a:
        pa = [p for p, _g in groupby(
            tm.transition_id_to_phone(int(t)) for t in a[k])]
        pb = [p for p, _g in groupby(
            tm.transition_id_to_phone(int(t)) for t in b[k])]
        assert pa == pb, k

    main(["make-pdf-to-tid-transducer", P("mono.npz"), P("p2t.txt")])
    from kaldi_tpu.fst.text_io import load_fst
    from kaldi_tpu.io.model_io import load_gmm_system
    tm = load_gmm_system(P("mono.npz")).trans_model
    f = load_fst(P("p2t.txt"))
    assert f.num_arcs == tm.num_transition_ids
    for (il, ol, _w, _d) in f.arcs[f.start]:
        assert tm.transition_id_to_pdf(ol) == il - 1


def test_build_tree_two_level(system):
    P = lambda n: str(system / n)
    main(["acc-tree-stats", P("mono.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}", P("ts.npz")])
    main(["cluster-phones", P("ts.npz"), P("questions.txt")])
    main(["build-tree-two-level", P("mono.npz"), P("ts.npz"),
          P("questions.txt"), P("tree2.npz"), P("map.txt"),
          "--max-leaves-first", "10", "--max-leaves-second", "30"])
    from kaldi_tpu.io.model_io import load_tree
    ctx = load_tree(P("tree2.npz"))
    assert ctx.num_pdfs <= 30
    mapping = dict(tuple(map(int, l.split()))
                   for l in open(P("map.txt")))
    assert len(mapping) == ctx.num_pdfs
    assert len(set(mapping.values())) <= 10

    main(["copy-transition-model", P("mono.npz"), P("tmcopy.npz")])
    from kaldi_tpu.io.model_io import load_gmm_system
    m = load_gmm_system(P("tmcopy.npz"))
    assert m.trans_model.num_transition_ids > 0
