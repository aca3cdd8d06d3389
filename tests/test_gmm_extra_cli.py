"""GMM/fgmm long-tail CLI: global gselect-to-post / twofeats stats,
fgmm init-from-accs / merge / mixdown, init-ubm clustering, flat model
init, accs algebra, gpost, fMPE derivative tools.

(ref: gmmbin/*.cc, fgmmbin/*.cc — cited per command in
 kaldi_tpu/cli_gmm_extra.py.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.gmm.full_gmm import FullGmm
from kaldi_tpu.io.kaldi_io import read_ark, write_ark
from kaldi_tpu.io.model_io import load_ubm, save_ubm


def _toy_fgmm(I=4, D=3, seed=0):
    rng = np.random.RandomState(seed)
    means = rng.randn(I, D) * 3
    covars = np.stack([np.eye(D) * (1 + 0.2 * k) for k in range(I)])
    return FullGmm(np.full(I, 1.0 / I), means, covars)


def test_global_gmm_tools(tmp_path):
    P = lambda n: str(tmp_path / n)
    ubm = _toy_fgmm()
    save_ubm(P("ubm.npz"), ubm)
    rng = np.random.RandomState(1)
    x = rng.randn(25, 3).astype(np.float32)
    write_ark(P("f.ark"), {"u": x})

    # fgmm-gselect -> gselect-to-post: posteriors over selected comps
    main(["fgmm-gselect", P("ubm.npz"), f"ark:{P('f.ark')}",
          P("gsel.txt"), "--n", "2"])
    main(["fgmm-global-gselect-to-post", P("ubm.npz"),
          f"ark:{P('f.ark')}", P("gsel.txt"), P("post.txt")])
    from kaldi_tpu.hmm.posterior import read_post_ark
    post = dict(read_post_ark(P("post.txt")))["u"]
    assert len(post) == 25
    for frame in post:
        assert 1 <= len(frame) <= 2
        assert abs(sum(w for (_i, w) in frame) - 1.0) < 1e-5

    # twofeats == plain stats when both streams are identical
    write_ark(P("f2.ark"), {"u": x})
    main(["fgmm-global-acc-stats-twofeats", P("ubm.npz"),
          f"ark:{P('f.ark')}", f"ark:{P('f2.ark')}", P("tf.npz")])
    main(["fgmm-global-acc-stats", P("ubm.npz"), f"ark:{P('f.ark')}",
          P("plain.npz")])
    a, b = np.load(P("tf.npz")), np.load(P("plain.npz"))
    np.testing.assert_allclose(a["mean_acc"], b["mean_acc"], rtol=1e-4)

    # init-from-accs: recovers a sensible model from the stats
    main(["fgmm-global-init-from-accs", P("plain.npz"), "4",
          P("init.npz"), "--min-gaussian-occupancy", "0.1"])
    m = load_ubm(P("init.npz"))
    assert isinstance(m, FullGmm)
    assert m.num_gauss >= 1
    assert np.isfinite(m.loglike(x.astype(np.float64))).all()

    # merge doubles the component count; sizes file written
    main(["fgmm-global-merge", P("merged.npz"), P("sizes.txt"),
          P("ubm.npz"), P("ubm.npz")])
    merged = load_ubm(P("merged.npz"))
    assert merged.num_gauss == 2 * ubm.num_gauss
    assert open(P("sizes.txt")).read().split() == ["4", "4"]

    # mixdown halves it again; likelihood stays finite
    main(["fgmm-global-mixdown", P("merged.npz"), P("down.npz"),
          "--mixdown-target", "4"])
    down = load_ubm(P("down.npz"))
    assert down.num_gauss == 4
    assert np.isfinite(down.loglike(x.astype(np.float64))).all()


@pytest.mark.slow
def test_am_gmm_tools(tmp_path):
    from test_gmmbin_cli import _tiny_corpus
    _tiny_corpus(tmp_path, n_utts=8, seed=6)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz"),
          "--num-iters", "5", "--totgauss", "30"])
    main(["gmm-align", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}"])
    main(["ali-to-post", f"ark:{P('ali.ark')}", P("post.txt")])
    main(["gmm-acc-stats-ali", P("mono.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}", P("acc.npz")])

    # init-ubm: cluster the AM into a UBM
    main(["init-ubm", P("mono.npz"), P("acc.npz"), P("ubm.npz"),
          "--ubm-num-gauss", "8"])
    ubm = load_ubm(P("ubm.npz"))
    assert isinstance(ubm, FullGmm) and 1 <= ubm.num_gauss <= 8

    # gmm-diff-accs: acc - acc == zero occupancy
    main(["gmm-diff-accs", P("acc.npz"), P("acc.npz"), P("zero.npz")])
    from kaldi_tpu.io.model_io import load_gmm_accs
    z, _tc = load_gmm_accs(P("zero.npz"))
    assert all(abs(a.occ).sum() < 1e-9 for a in z.accs)

    # gmm-est-rescale with identical stats leaves the model unchanged
    from kaldi_tpu.io.model_io import load_gmm_system
    main(["gmm-est-rescale", P("mono.npz"), P("acc.npz"), P("acc.npz"),
          P("rescaled.npz"), "--min-variance", "1e-10"])
    m0 = load_gmm_system(P("mono.npz"))
    m1 = load_gmm_system(P("rescaled.npz"))
    for p0, p1 in zip(m0.am.pdfs, m1.am.pdfs):
        np.testing.assert_allclose(p0.means, p1.means, atol=1e-8)
        np.testing.assert_allclose(p0.vars, p1.vars, rtol=1e-6)

    # twofeats with identical streams == plain acc-stats
    main(["gmm-acc-stats-twofeats", P("mono.npz"),
          f"ark:{P('feats.ark')}", f"ark:{P('feats.ark')}",
          P("post.txt"), P("acc2.npz")])
    a1, _t = load_gmm_accs(P("acc.npz"))
    a2, _t2 = load_gmm_accs(P("acc2.npz"))
    for x, y in zip(a1.accs, a2.accs):
        np.testing.assert_allclose(x.occ, y.occ, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(x.mean_acc, y.mean_acc, rtol=1e-3,
                                   atol=1e-2)

    # gpost: per-frame component posteriors sum to the state posterior
    main(["gmm-post-to-gpost", P("mono.npz"), f"ark:{P('feats.ark')}",
          P("post.txt"), P("gpost.pkl")])
    import pickle
    gp = pickle.load(open(P("gpost.pkl"), "rb"))
    utt, frames = next(iter(gp.items()))
    for frame in frames:
        for (_pdf, cp) in frame:
            assert abs(cp.sum() - 1.0) < 1e-4

    # feat derivative: finite, right shape
    main(["gmm-get-feat-deriv", P("mono.npz"), f"ark:{P('feats.ark')}",
          P("post.txt"), f"ark:{P('deriv.ark')}"])
    d = dict(read_ark(P("deriv.ark")))
    f = dict(read_ark(P("feats.ark")))
    for k in d:
        assert d[k].shape == f[k].shape
        assert np.isfinite(d[k]).all()

    # stats derivative: num == den -> discriminative part vanishes
    main(["gmm-get-stats-deriv", P("mono.npz"), P("acc.npz"),
          P("acc.npz"), P("acc.npz"), P("sd.npz")])
    sd = np.load(P("sd.npz"))
    assert abs(sd["dmu0"]).max() < 1e-9

    # flat init + init-trans over the mono tree
    from kaldi_tpu.io.model_io import save_tree
    save_tree(P("tree.npz"), m0.ctx_dep)
    main(["gmm-init-model-flat", P("mono.npz"), P("tree.npz"),
          P("flat.npz"), f"ark:{P('feats.ark')}"])
    flat = load_gmm_system(P("flat.npz"))
    assert flat.am.num_pdfs == m0.am.num_pdfs
    assert all(p.num_gauss == 1 for p in flat.am.pdfs)
    main(["gmm-init-trans", P("mono.npz"), P("tree.npz"), P("it.npz")])
    it = load_gmm_system(P("it.npz"))
    assert it.trans_model.num_transition_ids == \
        m0.trans_model.num_transition_ids
