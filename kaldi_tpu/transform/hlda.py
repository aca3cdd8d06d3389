"""HLDA: maximum-likelihood dimension-reducing linear transform.

(ref: transform/hlda.h HldaAccsDiagGmm; Kumar & Andreou 1998 HLDA with
 diagonal within-class covariance. The useful rows' G matrix is the
 within-class scatter; the rejected rows' is the total scatter; rows are
 optimized cyclically by the same cofactor update as MLLT.)
"""

from __future__ import annotations

import numpy as np


class HldaStats:
    def __init__(self, dim: int):
        self.dim = dim
        self.beta = 0.0
        self.mean_acc = np.zeros(dim)
        self.total_2nd = np.zeros((dim, dim))   # Σ x xᵀ
        self.class_beta: list = []
        self.class_mean_acc: list = []

    def accumulate(self, feats: np.ndarray, class_ids: np.ndarray,
                   num_classes: int):
        self.beta += len(feats)
        self.mean_acc += feats.sum(0)
        self.total_2nd += feats.T @ feats
        while len(self.class_beta) < num_classes:
            self.class_beta.append(0.0)
            self.class_mean_acc.append(np.zeros(self.dim))
        for c in range(num_classes):
            sel = class_ids == c
            if sel.any():
                self.class_beta[c] += sel.sum()
                self.class_mean_acc[c] += feats[sel].sum(0)

    def scatters(self):
        """-> (total covariance T, within-class covariance W)."""
        mu = self.mean_acc / self.beta
        T = self.total_2nd / self.beta - np.outer(mu, mu)
        B = np.zeros_like(T)
        for cb, cm in zip(self.class_beta, self.class_mean_acc):
            if cb > 0:
                cmu = cm / cb
                B += cb * np.outer(cmu - mu, cmu - mu)
        B /= self.beta
        W = T - B
        return T, W


def estimate_hlda(stats: HldaStats, keep_dims: int,
                  num_iters: int = 50) -> tuple[np.ndarray, float]:
    """-> (transform [keep_dims, D] (the accepted rows), objf_impr/frame).

    Full square A optimized: auxf = β log|det A| − β/2 Σ_d log(a_d G_d a_dᵀ)
    with G_d = within-class scatter for d < keep_dims else total scatter;
    then the top keep_dims rows are returned (Gales' efficient HLDA)."""
    D = stats.dim
    T, W = stats.scatters()
    G = [W if d < keep_dims else T for d in range(D)]
    # only two distinct G matrices exist: invert once
    Gi = {id(W): np.linalg.inv(W + 1e-10 * np.eye(D)),
          id(T): np.linalg.inv(T + 1e-10 * np.eye(D))}
    A = np.eye(D)

    def auxf(A):
        _s, logdet = np.linalg.slogdet(A)
        v = sum(np.log(max(A[d] @ G[d] @ A[d], 1e-20)) for d in range(D))
        return stats.beta * logdet - 0.5 * stats.beta * v

    base = auxf(A)
    for _ in range(num_iters):
        for d in range(D):
            cof = np.linalg.inv(A).T[d]
            w = Gi[id(G[d])] @ cof
            denom = cof @ w
            if denom <= 0:
                continue
            # scale so that a_d G_d a_dᵀ = cofᵀG⁻¹cof ⇒ row update à la MLLT
            A[d] = w * np.sqrt(1.0 / denom)
    impr = (auxf(A) - base) / stats.beta
    return A[:keep_dims].copy(), float(impr)
