"""Posterior-algebra and info/util CLI batch.

(ref: bin/{copy-post,scale-post,weight-post,thresh-post,rand-prune-post,
 post-to-pdf-post,post-to-phone-post,prob-to-post,logprob-to-post,
 get-post-on-ali,post-to-tacc,hmm-info,am-info,copy-tree,
 show-alignments,analyze-counts,matrix-dim,matrix-sum-rows,
 vector-scale,transform-vec,decode-faster-mapped}.cc.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import write_ark, read_ark, open_rspecifier
from kaldi_tpu.hmm.posterior import read_post_ark

from test_gmmbin_cli import _tiny_corpus


@pytest.fixture(scope="module")
def system(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("postcli")
    _tiny_corpus(tmp, n_utts=8, seed=4)
    P = lambda n: str(tmp / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz"),
          "--num-iters", "6", "--totgauss", "40"])
    main(["gmm-align", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}"])
    main(["ali-to-post", f"ark:{P('ali.ark')}", P("post.txt")])
    return tmp


def test_post_algebra(system, capsys):
    P = lambda n: str(system / n)
    main(["copy-post", P("post.txt"), P("p1.txt")])
    assert open(P("p1.txt")).read() == open(P("post.txt")).read()
    main(["scale-post", P("post.txt"), P("p05.txt"), "--scale", "0.5"])
    for (_u, a), (_u2, b) in zip(read_post_ark(P("post.txt")),
                                 read_post_ark(P("p05.txt"))):
        for fa, fb in zip(a, b):
            assert all(abs(wb - 0.5 * wa) < 1e-6
                       for (_, wa), (_, wb) in zip(fa, fb))
    # weight-post with per-frame weights of 2.0
    feats = dict(open_rspecifier(f"ark:{P('feats.ark')}"))
    write_ark(P("w.ark"), {u: np.full(f.shape[0], 2.0, np.float32)
                           for u, f in feats.items()})
    main(["weight-post", P("post.txt"), f"ark:{P('w.ark')}",
          P("p2.txt")])
    for (_u, a), (_u2, b) in zip(read_post_ark(P("post.txt")),
                                 read_post_ark(P("p2.txt"))):
        for fa, fb in zip(a, b):
            assert all(abs(wb - 2.0 * wa) < 1e-6
                       for (_, wa), (_, wb) in zip(fa, fb))
    # thresh-post drops everything below 2.0 after halving
    main(["thresh-post", P("p05.txt"), P("pt.txt"),
          "--threshold", "0.9"])
    assert all(not fr for (_u, post) in read_post_ark(P("pt.txt"))
               for fr in post)
    # rand-prune-post with scale below min weight keeps everything
    main(["rand-prune-post", P("post.txt"), P("pr.txt"),
          "--scale", "0.5"])
    assert open(P("pr.txt")).read() == open(P("post.txt")).read()


def test_post_mappings_and_tacc(system):
    P = lambda n: str(system / n)
    from kaldi_tpu.io.model_io import load_gmm_system
    tm = load_gmm_system(P("mono.npz")).trans_model
    main(["post-to-pdf-post", P("mono.npz"), P("post.txt"),
          P("pdf.txt")])
    for _u, post in read_post_ark(P("pdf.txt")):
        for fr in post:
            assert all(0 <= i < tm.num_pdfs for (i, _w) in fr)
    main(["post-to-phone-post", P("mono.npz"), P("post.txt"),
          P("ph.txt")])
    phones = {ph for (ph, _s, _p) in tm.tuples}
    for _u, post in read_post_ark(P("ph.txt")):
        for fr in post:
            assert all(i in phones for (i, _w) in fr)
    # get-post-on-ali of a hard alignment is identically 1
    main(["get-post-on-ali", P("post.txt"), f"ark:{P('ali.ark')}",
          f"ark:{P('conf.ark')}"])
    for _u, c in read_ark(P("conf.ark")):
        np.testing.assert_allclose(c, 1.0)
    # tacc sums to the total frame count
    main(["post-to-tacc", P("mono.npz"), P("post.txt"), P("tacc.ark")])
    (tacc,) = [v for _, v in read_ark(P("tacc.ark"))]
    total_frames = sum(f.shape[0] for _u, f in
                       open_rspecifier(f"ark:{P('feats.ark')}"))
    assert abs(tacc.sum() - total_frames) < 1e-3
    # prob-to-post roundtrip on a soft matrix
    probs = {"u0": np.array([[0.7, 0.3, 0.0], [0.05, 0.9, 0.05]],
                            np.float32)}
    write_ark(P("probs.ark"), probs)
    main(["prob-to-post", f"ark:{P('probs.ark')}", P("pp.txt"),
          "--min-post", "0.1"])
    (u, post), = list(read_post_ark(P("pp.txt")))
    assert post[0] == [(0, 0.7), (1, pytest.approx(0.3))]
    assert [i for (i, _w) in post[1]] == [1]


def test_info_and_misc(system, capsys):
    P = lambda n: str(system / n)
    from kaldi_tpu.io.model_io import load_gmm_system
    model = load_gmm_system(P("mono.npz"))
    capsys.readouterr()
    main(["hmm-info", P("mono.npz")])
    info = capsys.readouterr().out
    assert f"number of pdfs {model.am.num_pdfs}" in info
    main(["am-info", P("mono.npz")])
    info = capsys.readouterr().out
    assert f"number of gaussians {model.am.total_gauss}" in info
    assert "feature dimension 39" in info
    main(["show-alignments", P("mono.npz"), f"ark:{P('ali.ark')}"])
    out = capsys.readouterr().out
    assert "SIL[" in out or "Y1[" in out or "N1[" in out

    main(["ali-to-pdf", P("mono.npz"), f"ark:{P('ali.ark')}",
          f"ark:{P('pdfali.ark')}"])
    main(["analyze-counts", f"ark:{P('pdfali.ark')}", P("cnt.ark")])
    (cnt,) = [v for _, v in read_ark(P("cnt.ark"))]
    total_frames = sum(f.shape[0] for _u, f in
                       open_rspecifier(f"ark:{P('feats.ark')}"))
    assert cnt.sum() == total_frames

    capsys.readouterr()
    main(["matrix-dim", f"ark:{P('feats.ark')}"])
    lines = capsys.readouterr().out.strip().splitlines()
    assert all(l.split()[2] == "39" for l in lines)

    main(["matrix-sum-rows", f"ark:{P('feats.ark')}",
          f"ark:{P('rows.ark')}"])
    feats = dict(open_rspecifier(f"ark:{P('feats.ark')}"))
    for k, v in read_ark(P("rows.ark")):
        np.testing.assert_allclose(v, feats[k].sum(0), rtol=1e-3,
                                   atol=1e-2)

    vecs = {"a": np.array([1.0, 2.0], np.float32)}
    write_ark(P("v.ark"), vecs)
    main(["vector-scale", f"ark:{P('v.ark')}", f"ark:{P('vs.ark')}",
          "--scale", "3"])
    (vs,) = [v for _, v in read_ark(P("vs.ark"))]
    np.testing.assert_allclose(vs, [3.0, 6.0])
    # affine transform-vec
    M = np.array([[0.0, 1.0, 10.0], [1.0, 0.0, -10.0]], np.float32)
    write_ark(P("m.ark"), {"m": M})
    main(["transform-vec", P("m.ark"), f"ark:{P('v.ark')}",
          f"ark:{P('vt.ark')}"])
    (vt,) = [v for _, v in read_ark(P("vt.ark"))]
    np.testing.assert_allclose(vt, [12.0, -9.0])

    main(["copy-tree", P("mono.npz"), P("tree2.npz")])
    from kaldi_tpu.io.model_io import load_tree
    t2 = load_tree(P("tree2.npz"))
    assert t2.num_pdfs == model.ctx_dep.num_pdfs


def test_decode_faster_mapped(system):
    P = lambda n: str(system / n)
    main(["mkgraph", P("mono.npz"), P("lm.arpa"), P("hclg.npz")])
    main(["gmm-compute-likes", P("mono.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('likes.ark')}"])
    main(["decode-faster-mapped", P("hclg.npz"), f"ark:{P('likes.ark')}",
          "--transcription-out", P("hyp_int.txt")])
    main(["decode-faster", P("mono.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--transcription-out", P("hyp.txt")])
    from kaldi_tpu.io.model_io import load_gmm_system
    words = load_gmm_system(P("mono.npz")).lang.words
    mapped = {}
    for line in open(P("hyp_int.txt")):
        parts = line.split()
        mapped[parts[0]] = " ".join(words.sym(int(w))
                                    for w in parts[1:])
    direct = {l.split()[0]: " ".join(l.split()[1:])
              for l in open(P("hyp.txt"))}
    assert mapped == direct
