"""Basis fMLLR: speaker transforms as a sum over a trained basis, with the
coefficient count proportional to the speaker's frame count.

(ref: transform/basis-fmllr-diag-gmm.h — BasisFmllrAccus (gradient scatter
 over training speakers), BasisFmllrEstimate::EstimateFmllrBasis and
 ComputeTransform; Povey & Yao 2012. W(s) = W0 + Σ_k d_k B_k with
 N(s) = min(basis_size, η·β(s)) coefficients.)

The basis is estimated in the space preconditioned by the average per-frame
Hessian H̄ of the fMLLR auxiliary (the blockdiag-G part, which dominates):
bases are the top eigenvectors of H̄^{-1/2} S H̄^{-1/2} mapped back through
H̄^{-1/2}, so they are H̄-orthonormal and the per-coefficient curvature is
roughly uniform — this is what makes a plain projected-gradient iteration
with a second-order step size converge (a raw-I-orthonormal basis mixes
directions whose curvatures differ by ~10 orders of magnitude, and gradient
ascent stalls; ref basis-fmllr-diag-gmm.cc preconditions the same way).
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
    """Gradient scatter + average-Hessian accumulation over training
    speakers (ref: basis-fmllr-diag-gmm.h:63 BasisFmllrAccus)."""

    def __init__(self, dim: int):
        self.dim = dim
        n = dim * (dim + 1)
        self.grad_scatter = np.zeros((n, n))
        # blockdiag(G_d) summed over speakers: the −∂²auxf/∂W² of the
        # quadratic term, which dominates the logdet curvature.
        self.H = np.zeros((n, n))
        self.beta = 0.0

    def accumulate_from_speaker(self, stats: FmllrStats):
        D = self.dim
        W0 = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)
        grad = _auxf_gradient(W0, stats) / max(np.sqrt(stats.beta), 1e-10)
        v = grad.reshape(-1)
        self.grad_scatter += np.outer(v, v)
        for d in range(D):
            s = d * (D + 1)
            self.H[s:s + D + 1, s:s + D + 1] += stats.G[d]
        self.beta += stats.beta


def _hbar(accus: BasisFmllrAccus) -> np.ndarray:
    """Average per-frame Hessian, ridged so dims the data never excited
    stay invertible."""
    Hbar = accus.H / max(accus.beta, 1e-10)
    return Hbar + np.eye(Hbar.shape[0]) * (1e-4 * np.trace(Hbar) /
                                           Hbar.shape[0] + 1e-10)


def estimate_fmllr_basis(accus: BasisFmllrAccus, basis_size: int):
    """-> basis [basis_size, D, D+1], H̄-orthonormal, from the top
    eigenvectors of the Hessian-preconditioned gradient scatter."""
    D = accus.dim
    Hbar = _hbar(accus)
    e, U = np.linalg.eigh(Hbar)
    H_mhalf = (U / np.sqrt(e)) @ U.T
    M = H_mhalf @ accus.grad_scatter @ H_mhalf
    w, V = np.linalg.eigh(M)
    order = np.argsort(-w)[:basis_size]
    B = H_mhalf @ V[:, order]          # columns: H̄-orthonormal bases
    return np.stack([B[:, i].reshape(D, D + 1) for i in range(len(order))])


def compute_basis_fmllr_transform(
    stats: FmllrStats,
    basis: np.ndarray,
    eta: float = 0.2,          # coefficients per frame (ref default ~ N∝β)
    num_iters: int = 10,
    step_sizes: int = 20,
):
    """-> (W [D, D+1], num_coeffs_used, auxf_impr_per_frame).

    Projected gradient ascent over the coefficients d with a
    second-order step size t* = m1/m2 along each search direction
    (m1 = ⟨grad, ΔW⟩, m2 = Σ_d ΔW_d G_d ΔW_d — the exact curvature of
    the quadratic term), backtracked against the exact auxiliary so the
    logdet singularity can never be crossed. Matches the iteration of
    ref basis-fmllr-diag-gmm.cc ComputeTransform / CalBasisFmllrStepSize."""
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
        dW = np.einsum("k,kij->ij", grad_d, B)
        m1 = float(np.sum(grad_w * dW))
        m2 = sum(float(dW[r] @ stats.G[r] @ dW[r]) for r in range(D))
        if m1 <= 0 or m2 <= 0:
            break
        step = m1 / m2
        improved = False
        for _ in range(step_sizes):
            d_try = d + step * grad_d
            W_try = W0 + np.einsum("k,kij->ij", d_try, B)
            if abs(np.linalg.det(W_try[:, :D])) > 1e-10:
                f = fmllr_auxf(W_try, stats)
                if f > cur:
                    rel = f - cur
                    d, W, cur = d_try, W_try, f
                    improved = True
                    break
            step *= 0.5
        if not improved:
            break
        if rel < 1e-5 * max(abs(cur), 1.0):
            break
    return W, N, (cur - base) / stats.beta
