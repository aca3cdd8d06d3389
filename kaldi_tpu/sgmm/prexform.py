"""SGMM fMLLR pre-transform, fMLLR basis, and state distances.

(ref: sgmm2/fmllr-sgmm2.h Sgmm2FmllrGlobalParams (pre_xform_ /
 inv_xform_ / mean_scatter_), sgmm2bin/sgmm2-comp-prexform.cc,
 sgmmbin/sgmm-est-fmllrbasis.cc, sgmmbin/sgmm-calc-distances.cc.)
"""

from __future__ import annotations

import numpy as np

from kaldi_tpu.sgmm.model import AmSgmm2
from kaldi_tpu.sgmm.fmllr import FmllrSgmm2Accs


def _occ_weighted_moments(model: AmSgmm2, state_occs: np.ndarray):
    """-> (global mean [D], within-class covariance [D, D]) under the
    model's substate-mean distribution weighted by state occupancies."""
    I, D, _S = model.M.shape
    tot_w = 0.0
    mean = np.zeros(D)
    second = np.zeros((D, D))
    within = np.zeros((D, D))
    Sigma = np.linalg.inv(model.Sigma_inv)                  # [I, D, D]
    for j in range(model.num_states):
        occ = float(state_occs[j])
        if occ <= 0:
            continue
        V = np.stack(model.v[j])                            # [M, S]
        logw = V @ model.w.T
        logw = logw - _lse(logw, axis=1, keepdims=True)
        wmi = np.exp(logw) * np.asarray(model.c[j])[:, None]  # [M, I]
        mu = np.einsum("ids,ms->mid", model.M, V)           # [M, I, D]
        w_flat = occ * wmi                                   # [M, I]
        tot_w += float(w_flat.sum())
        mean += np.einsum("mi,mid->d", w_flat, mu)
        second += np.einsum("mi,mid,mie->de", w_flat, mu, mu)
        within += np.einsum("mi,ide->de", w_flat, Sigma)
    tot_w = max(tot_w, 1e-10)
    mean /= tot_w
    within /= tot_w
    between = second / tot_w - np.outer(mean, mean)
    return mean, within, between


def compute_prexform(model: AmSgmm2, state_occs: np.ndarray):
    """-> (pre_xform [D, D+1], inv_xform [D, D+1], mean_scatter [D]).

    The pre-transform maps features so the occupancy-weighted
    within-class covariance is identity and the global mean is zero;
    mean_scatter is the between-class scatter diagonal in that basis
    (ref: AmSgmm2::ComputeFmllrPreXform — the basis in which fMLLR
    row optimization decouples)."""
    D = model.dim
    mean, within, between = _occ_weighted_moments(model, state_occs)
    within = 0.5 * (within + within.T) + 1e-6 * np.eye(D)
    w_eig, U = np.linalg.eigh(within)
    W_half_inv = (U / np.sqrt(np.maximum(w_eig, 1e-10))) @ U.T  # Σ_w^-1/2
    A = W_half_inv
    b = -A @ mean
    pre = np.concatenate([A, b[:, None]], axis=1)
    A_inv = np.linalg.inv(A)
    inv = np.concatenate([A_inv, mean[:, None]], axis=1)
    scat = np.diag(A @ between @ A.T).copy()
    return pre, inv, scat


def fmllr_grad_at_identity(accs: FmllrSgmm2Accs,
                           model: AmSgmm2) -> np.ndarray:
    """Gradient of the fMLLR auxiliary at W = [I 0] (the per-speaker
    direction the basis is built from)."""
    D = model.dim
    W = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)
    g = np.zeros_like(W)
    g[:, :D] = accs.beta * np.eye(D)
    WG = np.einsum("ef,ifg->ieg", W, accs.G, optimize=True)
    g -= np.einsum("ide,ieg->dg", model.Sigma_inv, WG, optimize=True)
    return g + accs.K


def estimate_fmllr_basis(model: AmSgmm2, spk_accs: list,
                         num_bases: int = 50) -> np.ndarray:
    """-> basis [N, D, D+1]: principal directions of the per-speaker
    beta-normalized fMLLR gradients (ref: sgmmbin/sgmm-est-fmllrbasis.cc
    — eigenvectors of the scatter of sqrt(beta)-scaled gradients)."""
    D = model.dim
    n = D * (D + 1)
    scatter = np.zeros((n, n))
    for accs in spk_accs:
        if accs.beta <= 0:
            continue
        g = fmllr_grad_at_identity(accs, model).reshape(-1)
        scatter += np.outer(g, g) / accs.beta
    w_eig, U = np.linalg.eigh(scatter)
    order = np.argsort(-w_eig)[:min(num_bases, n)]
    basis = U[:, order].T.reshape(-1, D, D + 1)
    return np.ascontiguousarray(basis)


def state_distances(model: AmSgmm2, state_occs: np.ndarray) -> np.ndarray:
    """[J, J] symmetrized approximate KL divergences between states
    (single-substate approximation, ref: sgmmbin/sgmm-calc-distances.cc):
    d(j,k) = 0.5 Σ_i w̄_i (v_j − v_k)ᵀ H_i (v_j − v_k) with w̄ the
    occupancy-weighted average component weights."""
    J = model.num_states
    V = np.stack([vj[0] for vj in model.v])                 # [J, S]
    logw = V @ model.w.T
    logw = logw - _lse(logw, axis=1, keepdims=True)
    occ = np.asarray(state_occs, np.float64)
    occ = occ / max(occ.sum(), 1e-10)
    wbar = occ @ np.exp(logw)                               # [I]
    Hbar = np.einsum("i,ist->st", wbar, model.H)            # [S, S]
    dv = V[:, None, :] - V[None, :, :]                      # [J, J, S]
    return 0.5 * np.einsum("jks,st,jkt->jk", dv, Hbar, dv)


def _lse(a, axis=None, keepdims=False):
    m = np.max(a, axis=axis, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    out = m + np.log(np.sum(np.exp(a - m), axis=axis, keepdims=True))
    if not keepdims and axis is not None:
        out = np.squeeze(out, axis=axis)
    return out
