"""Adaptation extras: regtree MLLR/fMLLR, basis fMLLR, LVTLN, HLDA, fMPE.

(ref: transform/{regression-tree,regtree-*,basis-fmllr-*,lvtln,hlda,fmpe}.h;
 test strategy mirrors the reference's randomized recovery tests, e.g.
 transform/fmllr-diag-gmm-test.cc: synthesize a known transform, accumulate
 stats, and check the estimator recovers it / improves the objective.)
"""

import numpy as np
import pytest

from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.gmm.am_gmm import AmDiagGmm
from kaldi_tpu.transform.fmllr import (FmllrStats, estimate_fmllr,
                                       fmllr_auxf, apply_affine_transform)
from kaldi_tpu.transform.regtree import (
    RegressionTree, RegtreeStats, estimate_regtree_fmllr,
    MllrStats, estimate_mllr, apply_mllr_to_means)
from kaldi_tpu.transform.basis_fmllr import (
    BasisFmllrAccus, estimate_fmllr_basis, compute_basis_fmllr_transform)
from kaldi_tpu.transform.lvtln import LinearVtln
from kaldi_tpu.transform.hlda import HldaStats, estimate_hlda
from kaldi_tpu.transform.fmpe import Fmpe, FmpeOptions, compose_transforms


def _toy_am(rng, num_pdfs=3, num_gauss=2, dim=4):
    pdfs = []
    for _ in range(num_pdfs):
        means = rng.randn(num_gauss, dim) * 3
        variances = np.ones((num_gauss, dim)) * (0.5 + rng.rand(num_gauss, dim))
        w = rng.rand(num_gauss) + 0.5
        pdfs.append(DiagGmm(w / w.sum(), means, variances))
    return AmDiagGmm(pdfs)


def test_mllr_recovers_mean_shift():
    """Data generated from shifted means; MLLR must recover the shift."""
    rng = np.random.RandomState(0)
    am = _toy_am(rng)
    dim = am.dim
    shift = rng.randn(dim) * 0.8
    stats = MllrStats(dim)
    for pdf, g in enumerate(am.pdfs):
        for m in range(g.num_gauss):
            x = (g.means[m] + shift
                 + rng.randn(400, dim) * np.sqrt(g.vars[m]))
            post = np.zeros((400, g.num_gauss))
            post[:, m] = 1.0
            stats.accumulate(x, g.means, g.vars, post)
    W = estimate_mllr(stats)
    np.testing.assert_allclose(W[:, :dim], np.eye(dim), atol=0.1)
    np.testing.assert_allclose(W[:, dim], shift, atol=0.15)
    new_am = apply_mllr_to_means(am, W)
    np.testing.assert_allclose(new_am.pdfs[0].means[0],
                               W[:, :dim] @ am.pdfs[0].means[0] + W[:, dim])


def test_regression_tree_and_regtree_fmllr():
    rng = np.random.RandomState(1)
    am = _toy_am(rng, num_pdfs=4, num_gauss=2, dim=3)
    tree = RegressionTree(am, num_base_classes=4)
    assert len(tree.leaves) == 4
    assert tree.gauss2leaf.shape[0] == 8
    # stats from identity-transformed data: per-gauss samples
    acc = RegtreeStats(tree, am.dim)
    feats, post = [], []
    for pdf, g in enumerate(am.pdfs):
        for m in range(g.num_gauss):
            x = g.means[m] + rng.randn(80, am.dim) * np.sqrt(g.vars[m])
            feats.append(x)
            post.extend([[(pdf, 1.0)]] * 80)
    feats = np.concatenate(feats)
    acc.accumulate(am, feats, post)
    # min_count high enough that single-Gaussian leaves (whose fMLLR has a
    # reflection ambiguity) back off to their parents — the reference's
    # default is 500 for the same reason
    xf = estimate_regtree_fmllr(acc, min_count=200.0)
    assert set(xf.keys()) == set(range(8))
    # with matched data the transforms should be near identity
    for W in xf.values():
        np.testing.assert_allclose(W[:, :am.dim], np.eye(am.dim), atol=0.35)
    # occupancy backoff: distinct leaves sharing a low-count subtree get
    # the same (ancestor) transform
    assert len({W.tobytes() for W in xf.values()}) < 8


def test_basis_fmllr():
    """Basis trained on speakers with random rotations; a test speaker's
    transform from few frames must improve the fMLLR auxiliary, with
    coefficient count limited by frames."""
    rng = np.random.RandomState(2)
    dim = 3
    g = DiagGmm(np.ones(2) / 2, rng.randn(2, dim) * 2,
                np.ones((2, dim)))
    accus = BasisFmllrAccus(dim)
    for spk in range(12):
        A = np.eye(dim) + rng.randn(dim, dim) * 0.1
        b = rng.randn(dim) * 0.3
        stats = FmllrStats(dim)
        for m in range(2):
            x = g.means[m] + rng.randn(150, dim)
            x = x @ A.T + b
            post = np.zeros((150, 2))
            post[:, m] = 1.0
            stats.accumulate(x, g.means, g.vars, post)
        accus.accumulate_from_speaker(stats)
    basis = estimate_fmllr_basis(accus, basis_size=6)
    assert basis.shape == (6, dim, dim + 1)
    # basis elements orthonormal in the H̄ (average per-frame Hessian)
    # inner product — the preconditioned space the basis lives in
    from kaldi_tpu.transform.basis_fmllr import _hbar
    V = basis.reshape(6, -1)
    np.testing.assert_allclose(V @ _hbar(accus) @ V.T, np.eye(6),
                               atol=1e-8)

    # test speaker
    A = np.eye(dim) * 1.1
    b = np.array([0.5, -0.2, 0.1])
    stats = FmllrStats(dim)
    for m in range(2):
        x = g.means[m] + rng.randn(60, dim)
        x = x @ A.T + b
        post = np.zeros((60, 2))
        post[:, m] = 1.0
        stats.accumulate(x, g.means, g.vars, post)
    W, n_used, impr = compute_basis_fmllr_transform(stats, basis, eta=0.05)
    assert 1 <= n_used <= 6
    assert impr > 0.0
    ident = np.concatenate([np.eye(dim), np.zeros((dim, 1))], axis=1)
    assert fmllr_auxf(W, stats) > fmllr_auxf(ident, stats)


def test_lvtln_selects_matching_warp():
    rng = np.random.RandomState(3)
    dim = 4
    lv = LinearVtln(dim, warps=[0.9, 1.0, 1.1])
    # synthesize 'warped' features as known linear maps of originals
    maps = {0: np.eye(dim) * 0.8 + 0.05, 1: np.eye(dim),
            2: np.eye(dim) * 1.25 - 0.05}
    X = rng.randn(2000, dim)
    for c, M in maps.items():
        lv.train_class(c, X, X @ M.T)
    np.testing.assert_allclose(lv.A[1], np.eye(dim), atol=1e-3)

    # a 'speaker' whose features look like class-2 warped versions of
    # model-matched data: class 2 must win
    g = DiagGmm(np.ones(1), np.zeros((1, dim)), np.ones((1, dim)))
    x_model = rng.randn(500, dim)
    x_speaker = x_model @ np.linalg.inv(maps[2]).T  # A_2 x_speaker ≈ model
    stats = FmllrStats(dim)
    stats.accumulate(x_speaker, g.means, g.vars, np.ones((500, 1)))
    c, W, auxfs = lv.select_class(stats)
    assert c == 2
    assert auxfs[2] > auxfs[1] > auxfs[0]


def test_hlda_finds_informative_dims():
    """Classes separated only in the first 2 dims; HLDA's accepted rows
    must span (mostly) those dims."""
    rng = np.random.RandomState(4)
    D, keep = 5, 2
    stats = HldaStats(D)
    class_means = np.zeros((3, D))
    class_means[:, 0] = [-4, 0, 4]
    class_means[:, 1] = [3, -3, 0]
    for c in range(3):
        x = class_means[c] + rng.randn(500, D)
        stats.accumulate(x, np.full(500, c), 3)
    A, impr = estimate_hlda(stats, keep_dims=keep)
    assert A.shape == (keep, D)
    assert impr >= -1e-6
    # projections of class means through A must stay separated
    proj = class_means @ A.T
    d01 = np.linalg.norm(proj[0] - proj[1])
    d02 = np.linalg.norm(proj[0] - proj[2])
    assert d01 > 1.0 and d02 > 1.0
    # nuisance dims (2..4) contribute little to the accepted rows
    energy_useful = np.abs(A[:, :2]).sum()
    energy_nuisance = np.abs(A[:, 2:]).sum()
    assert energy_useful > energy_nuisance


def test_fmpe_offsets_move_toward_targets():
    """One pdf at +mu: positive MPE posterior must push features toward
    the pdf mean."""
    rng = np.random.RandomState(5)
    dim = 3
    ugmm = DiagGmm(np.ones(2) / 2, rng.randn(2, dim), np.ones((2, dim)))
    am = AmDiagGmm([DiagGmm(np.ones(1), np.full((1, dim), 2.0),
                            np.ones((1, dim)))])
    fmpe = Fmpe(ugmm, dim, FmpeOptions(learning_rate=0.02))
    x = rng.randn(100, dim)  # centered at 0, pdf mean at +2
    post = [[(0, 1.0)]] * 100
    before = np.linalg.norm(fmpe.apply(x).mean(0) - 2.0)
    for _ in range(10):
        out = fmpe.apply(x)
        diff = fmpe.direct_differential(am, out, post)
        fmpe.train_step(x, diff)
    after = np.linalg.norm(fmpe.apply(x).mean(0) - 2.0)
    assert after < before


def test_compose_transforms():
    rng = np.random.RandomState(6)
    D = 3
    a = np.concatenate([rng.randn(D, D), rng.randn(D, 1)], axis=1)
    b = np.concatenate([rng.randn(D, D), rng.randn(D, 1)], axis=1)
    ab = compose_transforms(a, b)
    x = rng.randn(10, D)
    y1 = apply_affine_transform(apply_affine_transform(x, b), a)
    y2 = apply_affine_transform(x, ab)
    np.testing.assert_allclose(y1, y2, atol=1e-4)
