"""i-vector primitive-command layer: extractor EM over files (init ->
acc-stats sharded -> sum -> est), LDA, cosine scoring, PLDA
adaptation/copy, UBM posterior dumping.

(ref: ivectorbin/{ivector-extractor-init,-acc-stats,-sum-accs,-est,
 ivector-compute-lda,ivector-transform,ivector-compute-dot-products,
 ivector-adapt-plda,ivector-copy-plda}.cc,
 gmmbin/{gmm-global-get-post,gmm-global-to-fgmm}.cc.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import write_ark, read_ark, open_rspecifier


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Two-cluster synthetic 'speakers' for UBM/i-vector tooling."""
    tmp = tmp_path_factory.mktemp("ivcli")
    rng = np.random.RandomState(11)
    # shared 'phonetic' content (two clusters at +-3) with a constant
    # per-speaker offset — i-vectors model exactly this deviation from
    # the UBM means
    spk_off = {0: np.full(5, 0.8), 1: np.full(5, -0.8)}
    feats = {}
    for i in range(8):
        content = np.where(rng.rand(60, 1) < 0.5, 3.0, -3.0)
        feats[f"u{i}"] = (rng.randn(60, 5) + content
                          + spk_off[i % 2]).astype(np.float32)
    write_ark(str(tmp / "f.ark"), feats)
    main(["train-ubm", f"ark:{tmp / 'f.ark'}", str(tmp / "ubm.npz"),
          "--num-gauss", "4", "--num-iters", "3"])
    return tmp


def test_extractor_primitive_em(corpus):
    P = lambda n: str(corpus / n)
    main(["ivector-extractor-init", P("ubm.npz"), P("ext0.npz"),
          "--ivector-dim", "6"])
    # sharded accumulation == unsharded, and the M-step changes M
    utts = [f"u{i}" for i in range(8)]
    feats = dict(open_rspecifier(f"ark:{P('f.ark')}"))
    write_ark(P("f1.ark"), {u: feats[u] for u in utts[:4]})
    write_ark(P("f2.ark"), {u: feats[u] for u in utts[4:]})
    main(["ivector-extractor-acc-stats", P("ext0.npz"),
          f"ark:{P('f1.ark')}", P("s1.npz")])
    main(["ivector-extractor-acc-stats", P("ext0.npz"),
          f"ark:{P('f2.ark')}", P("s2.npz")])
    main(["ivector-extractor-sum-accs", P("s.npz"), P("s1.npz"),
          P("s2.npz")])
    main(["ivector-extractor-acc-stats", P("ext0.npz"),
          f"ark:{P('f.ark')}", P("s_all.npz")])
    np.testing.assert_allclose(np.load(P("s.npz"))["A"],
                               np.load(P("s_all.npz"))["A"], rtol=1e-8)
    main(["ivector-extractor-est", P("ext0.npz"), P("s.npz"),
          P("ext1.npz")])
    # two more EM iterations through the primitive loop
    for it in (1, 2):
        main(["ivector-extractor-acc-stats", P(f"ext{it}.npz"),
              f"ark:{P('f.ark')}", P(f"s{it}_all.npz")])
        main(["ivector-extractor-est", P(f"ext{it}.npz"),
              P(f"s{it}_all.npz"), P(f"ext{it + 1}.npz")])
    from kaldi_tpu.io.model_io import load_ivector_extractor
    e0 = load_ivector_extractor(P("ext0.npz"))
    e1 = load_ivector_extractor(P("ext1.npz"))
    assert not np.allclose(e0.M, e1.M)
    # a second EM iteration through the CLI also runs
    main(["ivector-extract", P("ext3.npz"), f"ark:{P('f.ark')}",
          f"ark:{P('iv.ark')}"])
    ivs = dict(read_ark(P("iv.ark")))
    assert all(v.shape == (6,) for v in ivs.values())
    # i-vectors separate the two synthetic 'speakers'
    a = np.stack([ivs[f"u{i}"] for i in range(0, 8, 2)])
    b = np.stack([ivs[f"u{i}"] for i in range(1, 8, 2)])
    da = np.linalg.norm(a.mean(0) - b.mean(0))
    within = (np.linalg.norm(a - a.mean(0), axis=1).mean()
              + np.linalg.norm(b - b.mean(0), axis=1).mean()) / 2
    assert da > within


def test_lda_cosine_plda_tools(corpus):
    P = lambda n: str(corpus / n)
    with open(P("utt2spk"), "w") as f:
        for i in range(8):
            f.write(f"u{i} spk{i % 2}\n")
    main(["ivector-extract", P("ext3.npz"), f"ark:{P('f.ark')}",
          f"ark:{P('iv.ark')}"])
    main(["ivector-compute-lda", f"ark:{P('iv.ark')}", P("utt2spk"),
          P("lda.ark"), "--dim", "2"])
    (L,) = [v for _, v in read_ark(P("lda.ark"))]
    assert L.shape == (2, 7)
    main(["ivector-transform", P("lda.ark"), f"ark:{P('iv.ark')}",
          f"ark:{P('ivl.ark')}"])
    assert all(v.shape == (2,) for _k, v in read_ark(P("ivl.ark")))

    # cosine scoring: same-speaker trials outscore cross-speaker
    with open(P("trials"), "w") as f:
        f.write("u0 u2\nu0 u1\n")
    import io as _io
    import contextlib
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["ivector-compute-dot-products", P("trials"),
              f"ark:{P('iv.ark')}"])
    scores = {(l.split()[0], l.split()[1]): float(l.split()[2])
              for l in buf.getvalue().strip().splitlines()}
    assert scores[("u0", "u2")] > scores[("u0", "u1")]

    # PLDA train -> copy (smoothed) -> adapt; all valid models that
    # still rank the same-speaker trial higher
    with open(P("spk2utt"), "w") as f:
        f.write("spk0 u0 u2 u4 u6\nspk1 u1 u3 u5 u7\n")
    main(["ivector-compute-plda", P("spk2utt"), f"ark:{P('iv.ark')}",
          P("plda.npz")])
    main(["ivector-copy-plda", P("plda.npz"), P("plda_s.npz"),
          "--smoothing", "0.1"])
    from kaldi_tpu.io.model_io import load_plda
    p0, ps = load_plda(P("plda.npz")), load_plda(P("plda_s.npz"))
    assert np.all(ps.psi >= p0.psi)
    main(["ivector-adapt-plda", P("plda.npz"), f"ark:{P('iv.ark')}",
          P("plda_a.npz")])
    pa = load_plda(P("plda_a.npz"))
    assert pa.transform.shape == p0.transform.shape
    ivs = dict(read_ark(P("iv.ark")))
    for plda in (p0, pa):
        s_same = plda.score_trials({"e": ivs["u0"]},
                                   {"t": ivs["u2"]})[("e", "t")]
        s_diff = plda.score_trials({"e": ivs["u0"]},
                                   {"t": ivs["u1"]})[("e", "t")]
        assert s_same > s_diff


def test_ubm_post_and_fgmm(corpus, capsys):
    P = lambda n: str(corpus / n)
    main(["gmm-global-get-post", P("ubm.npz"), f"ark:{P('f.ark')}",
          P("gp.txt"), "--n", "3"])
    from kaldi_tpu.hmm.posterior import read_post_ark
    for _u, post in read_post_ark(P("gp.txt")):
        for fr in post:
            assert 1 <= len(fr) <= 3
            assert abs(sum(w for (_i, w) in fr) - 1.0) < 1e-4
    main(["gmm-global-to-fgmm", P("ubm.npz"), P("fubm.npz")])
    capsys.readouterr()
    main(["fgmm-global-info", P("fubm.npz")])
    info = capsys.readouterr().out
    assert "covariance type full" in info
    # the converted full-cov UBM scores identically to the diag one
    main(["gmm-global-get-frame-likes", P("ubm.npz"),
          f"ark:{P('f.ark')}", f"ark:{P('l1.ark')}"])
    main(["fgmm-global-get-frame-likes", P("fubm.npz"),
          f"ark:{P('f.ark')}", f"ark:{P('l2.ark')}"])
    l1 = dict(read_ark(P("l1.ark")))
    l2 = dict(read_ark(P("l2.ark")))
    for k in l1:
        np.testing.assert_allclose(l1[k], l2[k], rtol=1e-4, atol=1e-3)
