"""L-BFGS / CG / PCA + posterior algebra.

(ref: matrix/optimization-test.cc (quadratic recovery), hmm/posterior.h
 tools.)
"""

import numpy as np
import pytest

from kaldi_tpu.utils.optimization import lbfgs, linear_cgd, est_pca
from kaldi_tpu.hmm.posterior import (
    ali_to_post, scale_post, weight_post, sum_post, post_to_weights,
    post_to_pdf_post, weight_silence_post)


def test_lbfgs_quadratic_and_rosenbrock():
    rng = np.random.RandomState(0)
    A = rng.randn(6, 6)
    A = A @ A.T + 0.1 * np.eye(6)
    b = rng.randn(6)

    def fq(x):
        return 0.5 * x @ A @ x - b @ x, A @ x - b

    x, f, it = lbfgs(fq, np.zeros(6))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), atol=1e-5)

    def rosen(x):
        f = 100 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2
        g = np.array([-400 * x[0] * (x[1] - x[0] ** 2) - 2 * (1 - x[0]),
                      200 * (x[1] - x[0] ** 2)])
        return f, g

    x, f, it = lbfgs(rosen, np.array([-1.2, 1.0]), max_iters=500)
    np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-3)


def test_linear_cgd():
    rng = np.random.RandomState(1)
    A = rng.randn(20, 20)
    A = A @ A.T + np.eye(20)
    b = rng.randn(20)
    x, it = linear_cgd(A, b)
    np.testing.assert_allclose(A @ x, b, atol=1e-6)
    # preconditioning (exact diagonal) should not break correctness
    d = np.diag(A)
    x2, it2 = linear_cgd(A, b, precond=lambda v: v / d)
    np.testing.assert_allclose(A @ x2, b, atol=1e-6)


def test_est_pca():
    rng = np.random.RandomState(2)
    # variance concentrated in 2 directions
    basis = rng.randn(2, 6)
    data = rng.randn(500, 2) * np.array([5.0, 2.0]) @ basis \
        + rng.randn(500, 6) * 0.1 + 3.0
    T = est_pca(data, 2)
    proj = data @ T[:, :6].T + T[:, 6]
    assert abs(proj.mean(0)).max() < 1e-8          # mean removed
    # projected variance captures most of the total
    assert proj.var(0).sum() > 0.95 * data.var(0).sum()
    Tn = est_pca(data, 2, normalize_variance=True)
    pn = data @ Tn[:, :6].T + Tn[:, 6]
    np.testing.assert_allclose(pn.var(0), 1.0, rtol=0.05)


class TmStub:
    def transition_id_to_pdf(self, t):
        return t // 10

    def transition_id_to_phone(self, t):
        return t // 100


def test_posterior_algebra():
    post = ali_to_post([105, 213])
    assert post == [[(105, 1.0)], [(213, 1.0)]]
    assert scale_post(post, 0.5) == [[(105, 0.5)], [(213, 0.5)]]
    assert weight_post(post, [1.0, 0.0]) == [[(105, 1.0)], []]
    s = sum_post(post, [[(105, 0.5)], [(99, 1.0)]])
    assert s == [[(105, 1.5)], [(99, 1.0), (213, 1.0)]]
    np.testing.assert_allclose(post_to_weights(s), [1.5, 2.0])
    tm = TmStub()
    assert post_to_pdf_post(post, tm) == [[(10, 1.0)], [(21, 1.0)]]
    w = weight_silence_post(post, tm, silence_phones={1}, silence_scale=0.0)
    assert w == [[], [(213, 1.0)]]
    w2 = weight_silence_post(post, tm, {1}, 0.25)
    assert w2 == [[(105, 0.25)], [(213, 1.0)]]
