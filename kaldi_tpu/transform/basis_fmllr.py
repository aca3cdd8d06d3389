"""Basis fMLLR: speaker transforms as a sum over a trained basis, with the
coefficient count proportional to the speaker's frame count.

(ref: transform/basis-fmllr-diag-gmm.h — BasisFmllrAccus (gradient scatter
 over training speakers), BasisFmllrEstimate::EstimateFmllrBasis and
 ComputeTransform; Povey & Yao 2012. W(s) = W0 + Σ_k d_k B_k with
 N(s) = min(basis_size, η·β(s)) coefficients.)
"""

from __future__ import annotations

import numpy as np

from kaldi_tpu.transform.fmllr import FmllrStats, fmllr_auxf


def _auxf_gradient(W: np.ndarray, stats: FmllrStats) -> np.ndarray:
    """∂auxf/∂W = beta·[A⁻ᵀ, 0] + K − per-row G w_d."""
    D = W.shape[0]
    A = W[:, :D]
    grad = stats.K.copy()
    inv_at = np.linalg.inv(A).T
    grad[:, :D] += stats.beta * inv_at
    for d in range(D):
        grad[d] -= stats.G[d] @ W[d]
    return grad


class BasisFmllrAccus:
    """Gradient scatter over training speakers
    (ref: basis-fmllr-diag-gmm.h:63 BasisFmllrAccus)."""

    def __init__(self, dim: int):
        self.dim = dim
        self.grad_scatter = np.zeros((dim * (dim + 1), dim * (dim + 1)))
        self.beta = 0.0

    def accumulate_from_speaker(self, stats: FmllrStats):
        D = self.dim
        W0 = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)
        grad = _auxf_gradient(W0, stats) / max(np.sqrt(stats.beta), 1e-10)
        v = grad.reshape(-1)
        self.grad_scatter += np.outer(v, v)
        self.beta += stats.beta


def estimate_fmllr_basis(accus: BasisFmllrAccus, basis_size: int):
    """-> basis [basis_size, D, D+1], orthonormal in the vectorized space,
    from the top eigenvectors of the gradient scatter."""
    D = accus.dim
    w, V = np.linalg.eigh(accus.grad_scatter)
    order = np.argsort(-w)[:basis_size]
    return np.stack([V[:, i].reshape(D, D + 1) for i in order])


def compute_basis_fmllr_transform(
    stats: FmllrStats,
    basis: np.ndarray,
    eta: float = 0.2,          # coefficients per frame (ref default ~ N∝β)
    num_iters: int = 10,
    step_sizes: int = 10,
):
    """-> (W [D, D+1], num_coeffs_used, auxf_impr_per_frame).

    Gradient ascent over the coefficients d (the reference optimizes the
    same objective via a conjugate-gradient-flavoured iteration; at
    N ≤ basis_size ≤ D(D+1) dims a backtracking gradient step converges
    to the same optimum of this concave objective)."""
    D = stats.K.shape[0]
    W0 = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)
    if stats.beta <= 0:
        return W0, 0, 0.0
    N = int(min(len(basis), max(1, np.floor(eta * stats.beta))))
    B = basis[:N]
    d = np.zeros(N)
    W = W0.copy()
    base = fmllr_auxf(W0, stats)
    cur = base
    for _ in range(num_iters):
        grad_w = _auxf_gradient(W, stats)
        grad_d = np.array([np.sum(b * grad_w) for b in B])
        # backtracking line search along the basis-projected gradient
        step = 1.0 / max(stats.beta, 1.0)
        improved = False
        for _ in range(step_sizes):
            d_try = d + step * grad_d
            W_try = W0 + np.einsum("k,kij->ij", d_try, B)
            if abs(np.linalg.det(W_try[:, :D])) > 1e-10:
                f = fmllr_auxf(W_try, stats)
                if f > cur:
                    d, W, cur = d_try, W_try, f
                    improved = True
                    break
            step *= 0.5
        if not improved:
            break
    return W, N, (cur - base) / stats.beta
