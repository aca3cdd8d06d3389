"""Vector/matrix/i-vector utility CLIs and the nnet3 model utilities
(ref: bin/{copy-vector,copy-int-vector,matrix-sum,vector-sum}.cc,
 ivectorbin/{ivector-mean,ivector-normalize-length,
 ivector-subtract-global-mean,logistic-regression-train,-eval}.cc,
 nnet3bin/{nnet3-info,nnet3-copy,nnet3-compute}.cc).
"""

import contextlib
import io

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import read_ark, write_ark, open_rspecifier


def test_vector_utils(tmp_path):
    P = lambda n: str(tmp_path / n)
    rng = np.random.RandomState(0)
    vecs = {f"u{i}": rng.randn(8).astype(np.float32) for i in range(6)}
    write_ark(P("v.ark"), vecs)

    # global mean
    main(["ivector-mean", f"ark:{P('v.ark')}", f"ark:{P('mean.ark')}"])
    (mean,) = [v for _, v in read_ark(P("mean.ark"))]
    np.testing.assert_allclose(mean, np.mean(list(vecs.values()), axis=0),
                               rtol=1e-5)
    # per-speaker mean
    (tmp_path / "spk2utt").write_text("s0 u0 u1 u2\ns1 u3 u4 u5\n")
    main(["ivector-mean", f"ark:{P('v.ark')}", f"ark:{P('spkmean.ark')}",
          "--spk2utt", P("spk2utt")])
    sm = dict(read_ark(P("spkmean.ark")))
    np.testing.assert_allclose(
        sm["s0"], np.mean([vecs["u0"], vecs["u1"], vecs["u2"]], axis=0),
        rtol=1e-5)

    # subtract global mean (computed and precomputed agree)
    main(["ivector-subtract-global-mean", f"ark:{P('v.ark')}",
          f"ark:{P('c1.ark')}"])
    main(["ivector-subtract-global-mean", f"ark:{P('v.ark')}",
          f"ark:{P('c2.ark')}", "--mean", P("mean.ark")])
    c1, c2 = dict(read_ark(P("c1.ark"))), dict(read_ark(P("c2.ark")))
    for k in vecs:
        np.testing.assert_allclose(c1[k], c2[k], atol=1e-5)
    assert np.abs(np.mean(list(c1.values()), axis=0)).max() < 1e-5

    # normalize length: ||v|| == sqrt(dim)
    main(["ivector-normalize-length", f"ark:{P('v.ark')}",
          f"ark:{P('n.ark')}"])
    for _k, v in read_ark(P("n.ark")):
        assert abs(np.linalg.norm(v) - np.sqrt(v.size)) < 1e-3

    # copy-vector / copy-int-vector roundtrip
    main(["copy-vector", f"ark:{P('v.ark')}", f"ark:{P('vc.ark')}"])
    for k, v in read_ark(P("vc.ark")):
        np.testing.assert_allclose(v, vecs[k], rtol=1e-6)
    ints = {"a": np.array([1, 2, 3], np.int32),
            "b": np.array([7], np.int32)}
    write_ark(P("i.ark"), ints)
    main(["copy-int-vector", f"ark:{P('i.ark')}", f"ark:{P('ic.ark')}"])
    got = dict(read_ark(P("ic.ark")))
    for k in ints:
        np.testing.assert_array_equal(got[k], ints[k])


def test_matrix_and_vector_sum(tmp_path):
    P = lambda n: str(tmp_path / n)
    rng = np.random.RandomState(1)
    a = {f"k{i}": rng.randn(3, 4).astype(np.float32) for i in range(3)}
    b = {f"k{i}": rng.randn(3, 4).astype(np.float32) for i in range(3)}
    write_ark(P("a.ark"), a)
    write_ark(P("b.ark"), b)
    main(["matrix-sum", f"ark:{P('s.ark')}", f"ark:{P('a.ark')}",
          f"ark:{P('b.ark')}"])
    s = dict(read_ark(P("s.ark")))
    for k in a:
        np.testing.assert_allclose(s[k], a[k] + b[k], rtol=1e-5)
    main(["matrix-sum", f"ark:{P('avg.ark')}", f"ark:{P('a.ark')}",
          f"ark:{P('b.ark')}", "--average"])
    avg = dict(read_ark(P("avg.ark")))
    for k in a:
        np.testing.assert_allclose(avg[k], (a[k] + b[k]) / 2, rtol=1e-5)
    va = {"x": np.arange(5, dtype=np.float32)}
    vb = {"x": np.ones(5, np.float32)}
    write_ark(P("va.ark"), va)
    write_ark(P("vb.ark"), vb)
    main(["vector-sum", f"ark:{P('vs.ark')}", f"ark:{P('va.ark')}",
          f"ark:{P('vb.ark')}"])
    (vs,) = [v for _, v in read_ark(P("vs.ark"))]
    np.testing.assert_allclose(vs, va["x"] + vb["x"], rtol=1e-6)


def test_logistic_regression_cli(tmp_path):
    """Linearly separable 3-class clusters -> perfect held-in accuracy
    (the lre07-style i-vector language-id scoring path)."""
    P = lambda n: str(tmp_path / n)
    rng = np.random.RandomState(2)
    centers = np.array([[4.0, 0, 0], [0, 4.0, 0], [0, 0, 4.0]])
    names = ["eng", "spa", "deu"]
    vecs, labels = {}, []
    for i in range(60):
        c = i % 3
        vecs[f"u{i}"] = (centers[c]
                         + rng.randn(3) * 0.3).astype(np.float32)
        labels.append(f"u{i} {names[c]}")
    write_ark(P("x.ark"), vecs)
    (tmp_path / "utt2lang").write_text("\n".join(labels) + "\n")
    main(["logistic-regression-train", f"ark:{P('x.ark')}",
          P("utt2lang"), P("lr.npz"), "--max-steps", "200"])
    main(["logistic-regression-eval", P("lr.npz"), f"ark:{P('x.ark')}",
          f"ark:{P('post.ark')}", "--utt2label", P("utt2lang")])
    post = dict(read_ark(P("post.ark")))
    assert len(post) == 60
    z = np.load(P("lr.npz"))
    got_names = z["classes"].tobytes().decode().split("\n")
    for u, v in vecs.items():
        lp = post[u]
        assert abs(np.exp(lp).sum() - 1.0) < 1e-3   # normalized
        truth = dict(l.split() for l in labels)[u]
        assert got_names[int(np.argmax(lp))] == truth


def test_nnet3_utils_cli(tmp_path, capsys):
    P = lambda n: str(tmp_path / n)
    import jax
    from kaldi_tpu.nnet3.network import Nnet3
    from kaldi_tpu.nnet3.configs import make_tdnn_config
    from kaldi_tpu.nnet3.training import AmNnet3
    from kaldi_tpu.io.model_io import save_am_nnet3
    cfg = make_tdnn_config(8, 5, splice_indexes=((-1, 0, 1), (0,)),
                           hidden_dim=16)
    net = Nnet3(cfg)
    params = net.init(jax.random.PRNGKey(0))
    am = AmNnet3(net, params)
    save_am_nnet3(P("am.npz"), am)

    capsys.readouterr()
    main(["nnet3-info", P("am.npz")])
    info = capsys.readouterr().out
    assert "input-dim 8" in info and "output-dim 5" in info
    assert "num-parameters" in info

    # copy with scale halves the net output deltas relative to zero-net
    main(["nnet3-copy", P("am.npz"), P("am0.npz"), "--scale", "0.0"])
    rng = np.random.RandomState(3)
    feats = {"u0": rng.randn(12, 8).astype(np.float32)}
    from kaldi_tpu.io.kaldi_io import write_ark as _wa
    _wa(P("f.ark"), feats)
    main(["nnet3-compute", P("am.npz"), f"ark:{P('f.ark')}",
          f"ark:{P('y.ark')}"])
    main(["nnet3-compute", P("am0.npz"), f"ark:{P('f.ark')}",
          f"ark:{P('y0.ark')}"])
    (y,) = [v for _, v in read_ark(P("y.ark"))]
    (y0,) = [v for _, v in read_ark(P("y0.ark"))]
    assert y.shape == (12, 5)
    # zero-scaled parameters give a constant (uniform-logit) output
    assert np.abs(y0 - y0[0:1]).max() < 1e-4
    assert np.abs(y - y0).max() > 1e-3   # the real net is not constant
    # --use-priors shifts by log-priors (uniform by default -> +log C)
    main(["nnet3-compute", P("am.npz"), f"ark:{P('f.ark')}",
          f"ark:{P('yl.ark')}", "--use-priors"])
    (yl,) = [v for _, v in read_ark(P("yl.ark"))]
    np.testing.assert_allclose(yl, y - np.log(1.0 / 5), rtol=1e-4)


@pytest.mark.slow
def test_sgmm2_cli_end_to_end(tmp_path, capsys):
    """train-mono -> train-sgmm2 -> sgmm2-info / sgmm2-latgen-faster;
    the SGMM decodes its training set at WER 0
    (ref: steps/train_sgmm2.sh + sgmm2bin/sgmm2-latgen-faster.cc)."""
    from test_gmmbin_cli import _tiny_corpus
    _tiny_corpus(tmp_path, n_utts=16, seed=0)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz")])
    main(["train-sgmm2", P("mono.npz"), P("text"),
          f"ark:{P('feats.ark')}", P("sgmm.npz"),
          "--phn-dim", "8", "--num-iters", "6"])
    capsys.readouterr()
    main(["sgmm2-info", P("sgmm.npz")])
    info = capsys.readouterr().out
    assert "number of states 15" in info
    assert "phone-space dimension 8" in info
    main(["mkgraph", P("mono.npz"), P("lm.arpa"), P("hclg.npz")])
    main(["sgmm2-latgen-faster", P("sgmm.npz"), P("mono.npz"),
          P("hclg.npz"), f"ark:{P('feats.ark')}",
          "--transcription-out", P("hyp.txt"),
          "--lattice-out", P("lat.ark")])
    main(["compute-wer", P("text"), P("hyp.txt"), "--max-wer", "0"])
    from kaldi_tpu.lat.io import read_lattice_ark
    lats = dict(read_lattice_ark(P("lat.ark")))
    assert len(lats) == 16


@pytest.mark.slow
def test_global_gmm_tools_and_est_pca(tmp_path, capsys):
    """gmm-global-{info,acc-stats,est,get-frame-likes} on diag and full
    UBMs: one EM step via the CLI raises the average loglike
    (ref: gmmbin/gmm-global-*.cc, fgmmbin/fgmm-global-*.cc)."""
    P = lambda n: str(tmp_path / n)
    rng = np.random.RandomState(4)
    # two-cluster data so EM has something to learn
    feats = {f"u{i}": np.concatenate([
        rng.randn(30, 5) + 4.0, rng.randn(30, 5) - 4.0
    ]).astype(np.float32) for i in range(4)}
    write_ark(P("f.ark"), feats)
    for flag, name in ((["--full"], "fgmm"), ([], "gmm")):
        ubm = f"{name}_ubm.npz"
        main(["train-ubm", f"ark:{P('f.ark')}", P(ubm),
              "--num-gauss", "4", "--num-iters", "2"] + flag)
        capsys.readouterr()
        main([f"{name}-global-info", P(ubm)])
        info = capsys.readouterr().out
        assert "number of gaussians 4" in info
        assert ("full" if flag else "diagonal") in info
        main([f"{name}-global-acc-stats", P(ubm), f"ark:{P('f.ark')}",
              P("acc0.npz")])
        main([f"{name}-global-est", P(ubm), P("acc0.npz"),
              P("ubm1.npz"), "--min-gaussian-occupancy", "3"])
        main([f"{name}-global-acc-stats", P("ubm1.npz"),
              f"ark:{P('f.ark')}", P("acc1.npz")])
        l0 = float(np.load(P("acc0.npz"))["tot_like"])
        l1 = float(np.load(P("acc1.npz"))["tot_like"])
        assert l1 >= l0, (name, l0, l1)
        main([f"{name}-global-get-frame-likes", P("ubm1.npz"),
              f"ark:{P('f.ark')}", f"ark:{P('likes.ark')}"])
        likes = dict(read_ark(P("likes.ark")))
        assert all(v.shape == (60,) for v in likes.values())

    # est-pca: projecting onto the top component separates the clusters
    main(["est-pca", f"ark:{P('f.ark')}", P("pca.ark"), "--dim", "2"])
    (W,) = [v for _, v in read_ark(P("pca.ark"))]
    assert W.shape == (2, 6)
    main(["transform-feats", P("pca.ark"), f"ark:{P('f.ark')}",
          f"ark:{P('fp.ark')}"])
    fp = dict(read_ark(P("fp.ark")))
    x = fp["u0"]
    assert x.shape == (60, 2)
    # first PCA dim separates the two clusters linearly
    assert (x[:30, 0] > 0).all() != (x[30:, 0] > 0).all()


@pytest.mark.slow
def test_basis_fmllr_cli(tmp_path):
    """Basis estimated over training speakers; per-speaker coefficients
    beat identity on the fMLLR auxiliary (ref:
    gmmbin/gmm-basis-fmllr-{training,est}.cc)."""
    from test_gmmbin_cli import _tiny_corpus
    _tiny_corpus(tmp_path, n_utts=12, seed=0)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz"),
          "--num-iters", "6", "--totgauss", "40"])
    main(["gmm-align", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}"])
    main(["ali-to-post", f"ark:{P('ali.ark')}", P("post.txt")])
    utts = sorted(l.split()[0] for l in open(P("text")))
    with open(P("utt2spk"), "w") as f:
        for i, u in enumerate(utts):
            f.write(f"{u} spk{i % 3}\n")
    main(["gmm-basis-fmllr-training", P("mono.npz"),
          f"ark:{P('feats.ark')}", P("post.txt"), P("basis.npz"),
          "--utt2spk", P("utt2spk"), "--basis-size", "20"])
    basis = np.load(P("basis.npz"))["basis"]
    assert basis.shape == (20, 39, 40)
    # basis elements are linearly independent (orthonormal in the
    # preconditioned-Hessian space; see transform/basis_fmllr.py)
    V = basis.reshape(20, -1)
    assert np.linalg.matrix_rank(V) == 20
    main(["gmm-est-basis-fmllr", P("mono.npz"), P("basis.npz"),
          f"ark:{P('feats.ark')}", P("post.txt"),
          f"ark:{P('trans.ark')}", "--utt2spk", P("utt2spk")])
    trans = dict(read_ark(P("trans.ark")))
    assert sorted(trans) == ["spk0", "spk1", "spk2"]
    for W in trans.values():
        assert W.shape == (39, 40)
        assert not np.allclose(W, np.concatenate(
            [np.eye(39), np.zeros((39, 1))], axis=1))
