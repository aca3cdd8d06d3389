"""fMLLR for SGMM2 acoustic models (full-covariance feature transform).

(ref: sgmm2/fmllr-sgmm2.h FmllrSgmm2Accs / Sgmm2FmllrGlobalParams — a
 per-speaker affine transform W = [A b] maximizing the SGMM likelihood
 of W x̂. The reference optimizes with pre-transforms + gradient steps
 because full covariances couple the rows; here the same exact auxiliary

   Q(W) = β log|det A|
        − ½ Σ_i tr(Σ_i⁻¹ (W G_i Wᵀ)) + tr(Kᵀ W) + const

 with per-UBM-index quadratic stats G_i = Σ_t γ_ti x̂_t x̂_tᵀ and cross
 stats K = Σ_{t,jmi} γ Σ_i⁻¹ μ_jmi x̂_tᵀ is maximized by gradient ascent
 with backtracking — W is d×(d+1), so a few dozen dense steps converge.)
"""

from __future__ import annotations

import numpy as np

from kaldi_tpu.sgmm.model import AmSgmm2, Sgmm2SpeakerState


class FmllrSgmm2Accs:
    """Sufficient statistics for the SGMM fMLLR auxiliary."""

    def __init__(self, model: AmSgmm2):
        D = model.dim
        I = model.num_gauss
        self.beta = 0.0
        self.K = np.zeros((D, D + 1))
        self.G = np.zeros((I, D + 1, D + 1))

    def accumulate(self, model: AmSgmm2, feats: np.ndarray, state_post,
                   num_gselect: int = 10,
                   spk: Sgmm2SpeakerState | None = None):
        """state_post[t] = [(state j, weight)] (ref: FmllrSgmm2Accs::
        AccumulateForFmllrSubspace — γ from the CURRENT model/transform)."""
        gsel = model.gselect(feats, num_gselect)
        D = model.dim
        for t, frame in enumerate(state_post):
            x = np.append(feats[t], 1.0)                    # x̂ [D+1]
            xx = np.outer(x, x)
            for j, wgt in frame:
                post, _ll = model.component_posteriors(j, feats[t],
                                                       gsel[t], spk)
                post = post * wgt                           # [M, I]
                gamma_i = post.sum(axis=0)                  # [I]
                self.beta += float(post.sum())
                V, _logw, mu = model._substate_quantities(j, spk)
                # K += Σ_mi γ_mi Σ_i⁻¹ μ_mi x̂ᵀ
                wm = np.einsum("mi,mid->id", post, mu)      # [I, D]
                sm = np.einsum("ide,ie->id", model.Sigma_inv, wm)
                self.K += np.einsum("id,e->de", sm, x)
                self.G += gamma_i[:, None, None] * xx[None]


def estimate_sgmm2_fmllr(accs: FmllrSgmm2Accs, model: AmSgmm2,
                         num_iters: int = 100, min_count: float = 100.0):
    """-> (W [D, D+1], auxf improvement per frame). Identity if the
    occupancy is under min_count (ref: FmllrSgmm2Accs::Update)."""
    D = model.dim
    ident = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)
    if accs.beta < min_count:
        return ident, 0.0
    Sinv = model.Sigma_inv                                  # [I, D, D]
    K, G, beta = accs.K, accs.G, accs.beta

    def auxf(W):
        sign, logdet = np.linalg.slogdet(W[:, :D])
        if sign <= 0:
            return -np.inf
        # pairwise contraction (NOT one naive 4-operand einsum, which
        # iterates the full I*D*D*(D+1)^2 index space): WG_i = W G_i,
        # then sum_i tr(Sigma_i^-1 W G_i W^T)
        WG = np.einsum("df,ifg->idg", W, G, optimize=True)   # [I, D, D+1]
        quad = np.einsum("ide,ieg,dg->", Sinv, WG, W, optimize=True)
        return beta * logdet - 0.5 * quad + np.sum(K * W)

    def grad(W):
        g = np.zeros_like(W)
        g[:, :D] = beta * np.linalg.inv(W[:, :D]).T
        WG = np.einsum("ef,ifg->ieg", W, G, optimize=True)
        g -= np.einsum("ide,ieg->dg", Sinv, WG, optimize=True)
        return g + K

    W = ident.copy()
    base = auxf(W)
    cur = base
    step = 1.0 / max(beta, 1.0)
    for _ in range(num_iters):
        gr = grad(W)
        # backtracking line search along the gradient
        improved = False
        s = step
        for _bt in range(25):
            cand = W + s * gr
            val = auxf(cand)
            if val > cur:
                W, cur = cand, val
                step = s * 1.5   # try growing next time
                improved = True
                break
            s *= 0.5
        if not improved:
            break
    return W, (cur - base) / beta


def apply_fmllr(W: np.ndarray, feats: np.ndarray) -> np.ndarray:
    """y = A x + b for every frame."""
    D = feats.shape[1]
    return feats @ W[:, :D].T + W[:, D]
