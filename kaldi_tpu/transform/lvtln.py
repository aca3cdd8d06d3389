"""Linear-approximation VTLN (LVTLN) and feature-space VTLN selection.

(ref: transform/lvtln.h LinearVtln — one linear transform A_c per warp
 class, trained to mimic the effect of mel-warp factor w_c on features;
 per speaker, pick the class maximizing the fMLLR-style auxiliary, with
 an optional bias (offset) estimated jointly; gmmbin/gmm-est-lvtln-trans.)
"""

from __future__ import annotations

import numpy as np

from kaldi_tpu.transform.fmllr import FmllrStats, fmllr_auxf


class LinearVtln:
    def __init__(self, dim: int, warps):
        """warps: list of warp factors, must include 1.0 (identity class)."""
        self.warps = list(warps)
        self.default_class = self.warps.index(1.0)
        self.A = np.stack([np.eye(dim) for _ in self.warps])

    @property
    def dim(self):
        return self.A.shape[1]

    def train_class(self, c: int, feats_orig: np.ndarray,
                    feats_warped: np.ndarray, ridge: float = 1e-6):
        """Least-squares A_c: feats_warped ≈ feats_orig Aᵀ
        (ref: featbin/get-post-warp / lvtln training via
        gmm-train-lvtln-special: pairs of (unwarped, warped) features)."""
        X, Y = feats_orig, feats_warped
        G = X.T @ X + ridge * np.eye(X.shape[1])
        self.A[c] = np.linalg.solve(G, X.T @ Y).T

    def select_class(self, stats: FmllrStats, estimate_bias: bool = True):
        """-> (class, transform [D, D+1], auxf values per class).

        For each class, the transform is [A_c, b_c] with the bias b_c
        maximizing the auxiliary given A_c (closed form from the stats);
        pick the class with the best auxiliary
        (ref: lvtln.cc ComputeTransform)."""
        D = self.dim
        best, best_auxf, best_W = -1, -np.inf, None
        auxfs = []
        for c, A in enumerate(self.A):
            W = np.concatenate([A, np.zeros((D, 1))], axis=1)
            if estimate_bias and stats.beta > 0:
                # per-dim optimal bias: G_d is [D+1,D+1]; solving d auxf/d b
                # b_d = (K[d,D] - Σ_j G[d][D,j] a_dj) / G[d][D,D]
                for d in range(D):
                    num = stats.K[d, D] - stats.G[d][D, :D] @ A[d]
                    den = stats.G[d][D, D]
                    if den > 0:
                        W[d, D] = num / den
            f = fmllr_auxf(W, stats) if stats.beta > 0 else -np.inf
            auxfs.append(f)
            if f > best_auxf:
                best, best_auxf, best_W = c, f, W
        if best_W is None:
            best = self.default_class
            best_W = np.concatenate([self.A[best], np.zeros((D, 1))], axis=1)
        return best, best_W, auxfs

    def warp_of(self, c: int) -> float:
        return self.warps[c]
