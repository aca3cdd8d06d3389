"""SGMM/SGMM2 long-tail CLI: init/copy/mixup/normalize/write-ubm/
project/calc-distances (fast, synthetic model), and the gpost + fMLLR +
rescore + est-multi pipeline over a trained system (slow).

(ref: sgmmbin/*.cc, sgmm2bin/*.cc — the v1 aliases resolve onto the
 sgmm2 implementations, see kaldi_tpu/cli_sgmm.py module docstring.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.gmm.full_gmm import FullGmm
from kaldi_tpu.io.kaldi_io import read_ark, write_ark
from kaldi_tpu.io.model_io import (load_sgmm2, load_sgmm2_accs,
                                   load_ubm, save_sgmm2, save_sgmm2_accs)
from kaldi_tpu.sgmm.estimate import Sgmm2Accs
from kaldi_tpu.sgmm.model import AmSgmm2
from kaldi_tpu.steps.sgmm_steps import SgmmAm


def _toy_sgmm(tmp_path, J=6, I=8, D=5, S=4, spk_dim=2, seed=0):
    rng = np.random.RandomState(seed)
    means = rng.randn(I, D) * 2.0
    covars = np.stack([np.eye(D) + 0.1 * np.outer(v, v)
                       for v in rng.randn(I, D)])
    ubm = FullGmm(np.full(I, 1.0 / I), means, covars)
    sgmm = AmSgmm2(ubm, J, S, spk_dim=spk_dim, seed=seed)
    for j in range(J):
        sgmm.v[j][0] = sgmm.v[j][0] + 0.3 * rng.randn(S)
    sgmm._update_derived()
    am = SgmmAm(sgmm, num_gselect=4)
    path = str(tmp_path / "sgmm.npz")
    save_sgmm2(path, am)
    return path, am


def test_sgmm_model_surgery_cli(tmp_path):
    P = lambda n: str(tmp_path / n)
    path, am0 = _toy_sgmm(tmp_path)
    rng = np.random.RandomState(1)
    feats = rng.randn(20, am0.sgmm.dim)

    # copy (legacy alias) round-trips likelihoods exactly
    main(["sgmm-copy", path, P("c.npz")])
    am1 = load_sgmm2(P("c.npz"))
    ll0 = am0.sgmm.loglikes_matrix(feats, 4)
    np.testing.assert_allclose(am1.sgmm.loglikes_matrix(feats, 4), ll0)

    # mixup: substates + dims grow, model still evaluates finite
    occs = Sgmm2Accs(am0.sgmm)
    for j in range(am0.sgmm.num_states):
        occs.gamma[j] += 1.0 + j
    save_sgmm2_accs(P("occs.npz"), occs)
    main(["sgmm-mixup", path, P("m.npz"), "--num-substates", "10",
          "--read-occs", P("occs.npz"), "--increase-phn-dim", "6",
          "--increase-spk-dim", "3"])
    am2 = load_sgmm2(P("m.npz"))
    assert sum(len(c) for c in am2.sgmm.c) == 10
    assert am2.sgmm.phn_dim == 6 and am2.sgmm.spk_dim == 3
    assert np.isfinite(am2.sgmm.loglikes_matrix(feats, 4)).all()
    main(["sgmm-mixup", P("m.npz"), P("m2.npz"),
          "--remove-speaker-space"])
    assert load_sgmm2(P("m2.npz")).sgmm.spk_dim == 0

    # normalize with ONE subset covering everything == global softmax
    I = am0.sgmm.num_gauss
    write_ark(P("sets1.ark"), {"all": np.arange(I, dtype=np.float32)})
    main(["sgmm-normalize", path, f"ark:{P('sets1.ark')}", P("n1.npz")])
    np.testing.assert_allclose(
        load_sgmm2(P("n1.npz")).sgmm.loglikes_matrix(feats, 4), ll0,
        rtol=1e-10)
    # two subsets: weights renormalize per subset (model changes but
    # stays finite); non-covering sets are rejected
    write_ark(P("sets2.ark"),
              {"m": np.arange(I // 2, dtype=np.float32),
               "f": np.arange(I // 2, I, dtype=np.float32)})
    main(["sgmm-normalize", path, f"ark:{P('sets2.ark')}", P("n2.npz")])
    assert np.isfinite(
        load_sgmm2(P("n2.npz")).sgmm.loglikes_matrix(feats, 4)).all()
    write_ark(P("sets3.ark"), {"m": np.arange(2, dtype=np.float32)})
    with pytest.raises(SystemExit):
        main(["sgmm-normalize", path, f"ark:{P('sets3.ark')}",
              P("n3.npz")])

    # write-ubm: full-covariance GMM with the shared parameters
    main(["sgmm-write-ubm", path, P("ubm.npz")])
    ubm = load_ubm(P("ubm.npz"))
    assert ubm.means.shape == (I, am0.sgmm.dim)
    np.testing.assert_allclose(ubm.means, am0.sgmm.M[:, :, 0])

    # project with the identity transform leaves likelihoods unchanged
    D = am0.sgmm.dim
    write_ark(P("eye.ark"), {"t": np.eye(D, dtype=np.float32)})
    main(["sgmm2-project", path, P("eye.ark"), P("p.npz"),
          P("proj.ark"), "--start-dim", "0", "--end-dim", str(D)])
    np.testing.assert_allclose(
        load_sgmm2(P("p.npz")).sgmm.loglikes_matrix(feats, 4), ll0,
        rtol=1e-8)

    # calc-distances: zero diagonal, symmetric, non-negative
    main(["sgmm-calc-distances", path, P("occs.npz"), P("dist.ark")])
    d = dict(read_ark(P("dist.ark")))["distances"]
    J = am0.sgmm.num_states
    assert d.shape == (J, J)
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-6)
    np.testing.assert_allclose(d, d.T, rtol=1e-5, atol=1e-6)
    assert (d >= -1e-6).all()

    # comp-prexform: pre/inv compose to the identity affine map
    main(["sgmm2-comp-prexform", path, P("occs.npz"), P("px.npz")])
    am3 = load_sgmm2(P("px.npz"))
    pre, inv = am3.pre_xform, am3.inv_xform
    A, b = pre[:, :D], pre[:, D]
    Ai, bi = inv[:, :D], inv[:, D]
    np.testing.assert_allclose(A @ Ai, np.eye(D), atol=1e-8)
    np.testing.assert_allclose(A @ bi + b, 0.0, atol=1e-8)


@pytest.mark.slow
def test_sgmm_pipeline_cli(tmp_path):
    from test_gmmbin_cli import _tiny_corpus
    _tiny_corpus(tmp_path, n_utts=10, seed=3)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz"),
          "--num-iters", "5", "--totgauss", "30"])
    main(["gmm-align", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}"])
    main(["ali-to-post", f"ark:{P('ali.ark')}", P("post.txt")])
    main(["train-sgmm2", P("mono.npz"), P("text"),
          f"ark:{P('feats.ark')}", P("sgmm.npz"),
          "--num-iters", "3", "--ubm-gauss", "12", "--phn-dim", "8"])

    # acc-stats-ali == acc-stats over ali-to-post posteriors
    main(["sgmm-acc-stats-ali", P("sgmm.npz"), P("mono.npz"),
          f"ark:{P('feats.ark')}", f"ark:{P('ali.ark')}", P("aa.npz")])
    main(["sgmm2-acc-stats", P("sgmm.npz"), P("mono.npz"),
          f"ark:{P('feats.ark')}", P("post.txt"), P("ap.npz")])
    sa, sp = load_sgmm2_accs(P("aa.npz")), load_sgmm2_accs(P("ap.npz"))
    np.testing.assert_allclose(sa.Y, sp.Y, rtol=1e-7)

    # post -> gpost -> acc-stats-gpost reproduces the E-step stats
    main(["sgmm2-post-to-gpost", P("sgmm.npz"), P("mono.npz"),
          f"ark:{P('feats.ark')}", P("post.txt"), P("gpost.pkl")])
    main(["sgmm2-acc-stats-gpost", P("sgmm.npz"),
          f"ark:{P('feats.ark')}", P("gpost.pkl"), P("ag.npz")])
    sg = load_sgmm2_accs(P("ag.npz"))
    # gpost posteriors ride as float32 (ref stores BaseFloat too) —
    # compare at f32 accumulation precision
    np.testing.assert_allclose(sg.Y, sp.Y, rtol=1e-3, atol=1e-2)
    for j in range(len(sg.gamma)):
        np.testing.assert_allclose(sg.gamma[j], sp.gamma[j],
                                   rtol=1e-3, atol=1e-4)

    # acc-stats2 with all-positive posts: num == acc-stats, den empty
    main(["sgmm2-acc-stats2", P("sgmm.npz"), P("mono.npz"),
          f"ark:{P('feats.ark')}", P("post.txt"), P("num.npz"),
          P("den.npz")])
    np.testing.assert_allclose(load_sgmm2_accs(P("num.npz")).Y, sp.Y,
                               rtol=1e-7)
    assert load_sgmm2_accs(P("den.npz")).tot_frames == 0.0

    # per-speaker fMLLR: square-plus-bias transforms out
    with open(P("utt2spk"), "w") as f:
        for line in open(P("text")):
            f.write(f"{line.split()[0]} spk0\n")
    main(["sgmm2-est-fmllr", P("sgmm.npz"), P("mono.npz"),
          f"ark:{P('feats.ark')}", P("post.txt"),
          f"ark:{P('fmllr.ark')}", "--utt2spk", P("utt2spk"),
          "--fmllr-min-count", "10"])
    mats = dict(read_ark(P("fmllr.ark")))
    D = next(iter(read_ark(P("feats.ark"))))[1].shape[1]
    assert mats["spk0"].shape == (D, D + 1)

    # fMLLR basis: stats -> basis stored in the model
    main(["sgmm-acc-fmllrbasis-ali", P("sgmm.npz"), P("mono.npz"),
          f"ark:{P('feats.ark')}", f"ark:{P('ali.ark')}",
          P("fb.pkl"), "--utt2spk", P("utt2spk")])
    main(["sgmm-est-fmllrbasis", P("sgmm.npz"), P("sgmm_fb.npz"),
          P("fb.pkl"), "--num-bases", "5"])
    amb = load_sgmm2(P("sgmm_fb.npz"))
    assert amb.fmllr_basis.shape == (5, D, D + 1)

    # rescore-lattice: decode, rescore with the same model -> lattices
    main(["mkgraph", P("mono.npz"), P("lm.arpa"), P("hclg.npz")])
    main(["sgmm2-latgen-faster", P("sgmm.npz"), P("mono.npz"),
          P("hclg.npz"), f"ark:{P('feats.ark')}",
          "--lattice-out", P("lat.ark"), "--beam", "14"])
    main(["sgmm-rescore-lattice", P("sgmm.npz"), P("mono.npz"),
          P("lat.ark"), f"ark:{P('feats.ark')}", P("lat2.ark")])
    from kaldi_tpu.lat.io import read_lattice_ark
    n = sum(1 for _ in read_lattice_ark(P("lat2.ark")))
    assert n >= 1

    # est-multi ties globals across two models
    main(["sgmm-est-multi", P("sgmm.npz"), P("ap.npz"), P("e1.npz"),
          P("sgmm.npz"), P("ap.npz"), P("e2.npz")])
    m1, m2 = load_sgmm2(P("e1.npz")), load_sgmm2(P("e2.npz"))
    np.testing.assert_allclose(m1.sgmm.M, m2.sgmm.M)
    np.testing.assert_allclose(m1.sgmm.w, m2.sgmm.w)

    # init + init-from-tree-stats produce decodable flat models
    from kaldi_tpu.io.model_io import load_gmm_system, save_tree
    gmm = load_gmm_system(P("mono.npz"))
    save_tree(P("tree.npz"), gmm.ctx_dep)
    main(["sgmm-write-ubm", P("sgmm.npz"), P("ubm.npz")])
    main(["sgmm-init", P("mono.npz"), P("ubm.npz"), P("flat.npz"),
          "--phn-dim", "6"])
    flat = load_sgmm2(P("flat.npz"))
    assert flat.kind == "sgmm"
    assert flat.sgmm.num_states == gmm.am.num_pdfs
    main(["sgmm-init-from-tree-stats", P("flat.npz"), P("tree.npz"),
          P("flat2.npz")])
    assert load_sgmm2(P("flat2.npz")).sgmm.num_states == \
        gmm.ctx_dep.num_pdfs
