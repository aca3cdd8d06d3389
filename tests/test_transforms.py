"""Transform tests: objective-improvement & recovery oracles
(style of transform/fmllr-diag-gmm-test.cc etc.: apply a known transform to
data, re-estimate, check recovery / likelihood gain)."""

import numpy as np
import pytest

from kaldi_tpu.transform.cmvn import CmvnStats, apply_cmvn
from kaldi_tpu.transform.lda import LdaStats, estimate_lda, apply_lda
from kaldi_tpu.transform.mllt import MlltStats, update_mllt, mllt_objf
from kaldi_tpu.transform.fmllr import (
    FmllrStats, estimate_fmllr, fmllr_auxf, apply_affine_transform)
from kaldi_tpu.gmm.diag_gmm import DiagGmm


def test_cmvn():
    rng = np.random.RandomState(0)
    x = rng.randn(500, 5) * 3.0 + 7.0
    st = CmvnStats(5)
    st.accumulate(x)
    y = np.asarray(apply_cmvn(x.astype(np.float32), st, norm_vars=True))
    assert abs(y.mean()) < 1e-3
    np.testing.assert_allclose(y.var(axis=0), 1.0, atol=1e-2)
    back = np.asarray(apply_cmvn(y, st, norm_vars=True, reverse=True))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-2)


def test_lda_separates_classes():
    rng = np.random.RandomState(1)
    D, K = 10, 3
    # classes differ only in the first 2 dims
    means = np.zeros((K, D))
    means[:, 0] = [0, 5, -5]
    means[:, 1] = [5, -5, 0]
    st = LdaStats(K, D)
    for k in range(K):
        x = rng.randn(400, D) + means[k]
        st.accumulate(x, np.full(400, k))
    T, evals = estimate_lda(st, 2)
    assert T.shape == (2, D + 1)
    # projected class means should be well separated vs within-class stddev
    proj_means = [apply_lda(means[k], T) for k in range(K)]
    dists = [np.linalg.norm(proj_means[i] - proj_means[j])
             for i in range(K) for j in range(i + 1, K)]
    assert min(dists) > 3.0
    # within-class variance ~ 1 after LDA whitening
    xk = apply_lda(rng.randn(400, D) + means[0], T)
    np.testing.assert_allclose(xk.var(axis=0), 1.0, atol=0.3)


def test_mllt_recovers_rotation():
    """Data generated with correlated dims; MLLT should improve the
    diagonal-likelihood objective and be near-orthogonal-ish recovery."""
    rng = np.random.RandomState(2)
    D = 4
    # latent diagonal gaussians rotated by Q
    Q, _ = np.linalg.qr(rng.randn(D, D))
    means = rng.randn(3, D) * 4
    variances = np.abs(rng.rand(3, D)) + 0.3
    st = MlltStats(D)
    feats_all = []
    for m in range(3):
        z = rng.randn(600, D) * np.sqrt(variances[m]) + means[m]
        x = z @ Q.T  # rotated observations
        post = np.zeros((600, 3))
        post[:, m] = 1.0
        # model means in rotated space (what a GMM would estimate pre-MLLT)
        st.accumulate(x, (means @ Q.T), (variances @ (Q.T ** 2)), post)
    M, impr = update_mllt(st, num_iters=50)
    assert impr > 0.0
    obj_ident = mllt_objf(st, np.eye(D))
    obj_m = mllt_objf(st, M)
    assert obj_m > obj_ident + 1.0


def test_fmllr_recovers_affine():
    """Apply a known affine distortion; fMLLR should (a) improve the
    auxiliary objective and (b) approximately invert the distortion."""
    rng = np.random.RandomState(3)
    D = 5
    gmm = DiagGmm(
        np.ones(4) / 4,
        rng.randn(4, D) * 3,
        np.abs(rng.rand(4, D)) + 0.5,
    )
    # sample from the model
    comps = rng.randint(0, 4, 2000)
    x = (gmm.means[comps]
         + rng.randn(2000, D) * np.sqrt(gmm.vars[comps]))
    # distort: y = A x + b
    A = np.eye(D) + 0.2 * rng.randn(D, D)
    b = rng.randn(D) * 2.0
    y = x @ A.T + b

    post = gmm.posteriors(y.astype(np.float32)).astype(np.float64)
    st = FmllrStats(D)
    st.accumulate(y, gmm.means, gmm.vars, post)
    W, impr, count = estimate_fmllr(st, num_iters=30, min_count=100)
    assert impr > 0.0 and count == pytest.approx(2000, rel=1e-3)
    z = np.asarray(apply_affine_transform(y.astype(np.float32), W))
    # likelihood of transformed data should beat distorted data
    ll_y = gmm.loglike(y.astype(np.float32)).mean()
    ll_z = gmm.loglike(z).mean()
    ll_x = gmm.loglike(x.astype(np.float32)).mean()
    assert ll_z > ll_y + 1.0
    assert ll_z > ll_x - 0.5  # nearly recovers the undistorted likelihood


def test_fmllr_below_mincount_is_identity():
    D = 3
    st = FmllrStats(D)
    st.beta = 10.0
    st.G += np.eye(D + 1)
    W, impr, _ = estimate_fmllr(st, min_count=500)
    np.testing.assert_allclose(W[:, :D], np.eye(D))
    assert impr == 0.0


def test_mllt_accumulate_from_gmm_post_matches_direct():
    """The pdf-posterior accumulation path must equal direct accumulation
    with explicitly computed component posteriors
    (ref: transform/mllt.h:78 AccumulateFromPosteriors)."""
    from kaldi_tpu.transform.mllt import MlltStats
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.gmm.am_gmm import AmDiagGmm

    rng = np.random.RandomState(0)
    D, T = 3, 40
    g0 = DiagGmm(np.array([0.6, 0.4]),
                 rng.randn(2, D), np.abs(rng.rand(2, D)) + 0.5)
    g1 = DiagGmm(np.array([1.0]),
                 rng.randn(1, D), np.abs(rng.rand(1, D)) + 0.5)
    am = AmDiagGmm([g0, g1])
    feats = rng.randn(T, D)
    pdf_post = [[(t % 2, 1.0)] for t in range(T)]

    s1 = MlltStats(D)
    s1.accumulate_from_gmm_post(feats, am, pdf_post)

    s2 = MlltStats(D)
    for pdf, g in ((0, g0), (1, g1)):
        idx = np.array([t for t in range(T) if t % 2 == pdf])
        x = feats[idx]
        ll = (np.log(g.weights)[None]
              - 0.5 * np.sum(np.log(2 * np.pi * g.vars), axis=1)[None]
              - 0.5 * np.sum((x[:, None] - g.means[None]) ** 2
                             / g.vars[None], axis=2))
        m = ll.max(axis=1, keepdims=True)
        post = np.exp(ll - m)
        post /= post.sum(axis=1, keepdims=True)
        s2.accumulate(x, g.means, g.vars, post)

    assert s1.beta == pytest.approx(s2.beta)
    np.testing.assert_allclose(s1.G, s2.G, rtol=1e-10)
