"""SGMM2 discriminative (Extended Baum-Welch) estimation.

(ref: sgmm2/estimate-am-sgmm2-ebw.h:56 EbwAmSgmm2Options, and the update
 equations of estimate-am-sgmm2-ebw.cc re-derived in numpy:
 per-parameter smoothing D = E * denominator-count + tau, the quadratic
 smoothing scatter taken from the combined num+den statistics, learning
 rates applied by inflating the quadratic term — see the header's long
 comment. Speaker-subspace (N, u) updates are omitted: the discriminative
 recipes here train speaker-independent SGMMs.)

Numerator and denominator statistics are both ordinary Sgmm2Accs
(sgmm/estimate.py) — the reference reuses MleAmSgmm2Accs the same way.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from kaldi_tpu.sgmm.model import AmSgmm2
from kaldi_tpu.sgmm.estimate import Sgmm2Accs, _lse


@dataclasses.dataclass(frozen=True)
class EbwSgmm2Options:
    """(ref: sgmm2/estimate-am-sgmm2-ebw.h:56 — same defaults)"""

    tau_v: float = 50.0
    lrate_v: float = 0.5
    tau_M: float = 500.0
    lrate_M: float = 0.5
    tau_c: float = 10.0
    tau_w: float = 50.0
    lrate_w: float = 1.0
    tau_Sigma: float = 500.0
    lrate_Sigma: float = 0.5
    min_substate_weight: float = 1e-5
    cov_min_value: float = 0.5
    ridge: float = 1e-5


def _phone_vec_stats(model: AmSgmm2, gam, y, w_jm, gamma_jm, v):
    """g_jm / H_jm for one substate from one acc's stats
    (ref: EbwAmSgmm2Updater::ComputePhoneVecStats)."""
    I, S = model.w.shape
    q = np.maximum(gam, gamma_jm * w_jm)                     # [I]
    scalar = gam - gamma_jm * w_jm + q * (model.w @ v)
    g = y + scalar @ model.w                                 # [S]
    H = np.einsum("i,ist->st", gam, model.H) \
        + np.einsum("i,is,it->st", q, model.w, model.w)
    return g, H


def _solve_quadratic(Q, g, max_cond: float = 1e5):
    """argmax gᵀδ − ½ δᵀQδ with eigenvalue-floored conditioning and a
    verified improvement (ref: matrix/sp-matrix.h SolveQuadraticProblem —
    eigenvalues below eig_max/K are floored; if the floored solution
    fails to improve the TRUE objective, the ill-conditioned directions
    are dropped entirely)."""
    S = Q.shape[0]
    w, V = np.linalg.eigh(0.5 * (Q + Q.T))
    wmax = float(w.max(initial=0.0))
    if wmax <= 0.0:
        return np.zeros(S), 0.0
    floor = wmax / max_cond
    gV = V.T @ g
    delta = V @ (gV / np.maximum(w, floor))
    impr = float(g @ delta - 0.5 * delta @ Q @ delta)
    if impr >= 0.0:
        return delta, impr
    # drop floored directions (the flooring overshot in them)
    good = w >= floor
    delta = V @ np.where(good, gV / np.maximum(w, floor), 0.0)
    impr = float(g @ delta - 0.5 * delta @ Q @ delta)
    if impr < 0.0:
        return np.zeros(S), 0.0
    return delta, impr


def _solve_quadratic_matrix(Q, L, max_cond: float = 1e5):
    """argmax tr(ΔᵀL) − ½ tr(Δ Q Δᵀ) row-wise via the floored solver
    (ref: sp-matrix.h SolveQuadraticMatrixProblem; the SigmaInv metric
    cancels in the solution and only conditions the auxf value)."""
    S = Q.shape[0]
    w, V = np.linalg.eigh(0.5 * (Q + Q.T))
    wmax = float(w.max(initial=0.0))
    if wmax <= 0.0:
        return np.zeros_like(L), 0.0
    floor = wmax / max_cond
    LV = L @ V                                # [D, S]
    delta = (LV / np.maximum(w, floor)) @ V.T
    impr = float(np.einsum("ds,ds->", L, delta)
                 - 0.5 * np.einsum("ds,st,dt->", delta, Q, delta))
    if impr >= 0.0:
        return delta, impr
    good = w >= floor
    delta = (np.where(good, LV / np.maximum(w, floor), 0.0)) @ V.T
    impr = float(np.einsum("ds,ds->", L, delta)
                 - 0.5 * np.einsum("ds,st,dt->", delta, Q, delta))
    if impr < 0.0:
        return np.zeros_like(L), 0.0
    return delta, impr


def update_sgmm2_ebw(model: AmSgmm2, num_accs: Sgmm2Accs,
                     den_accs: Sgmm2Accs,
                     opts: EbwSgmm2Options = EbwSgmm2Options(),
                     update_flags: str = "vMwSc") -> dict:
    """In-place EBW M-step; returns per-parameter auxf improvements.

    (ref: EbwAmSgmm2Updater::Update — order v, w, c, M, Sigma; Sigma uses
    scatter computed against pre-update means, which our accumulators
    already store centered.)
    """
    I, D, S = model.M.shape
    impr: dict = {}

    gamma_i_num = np.zeros(I)
    gamma_i_den = np.zeros(I)
    for j in range(model.num_states):
        gamma_i_num += num_accs.gamma[j].sum(axis=0)
        gamma_i_den += den_accs.gamma[j].sum(axis=0)

    # --- v: per-substate quadratic step on the num−den auxiliary ---
    if "v" in update_flags:
        tot = 0.0
        for j in range(model.num_states):
            for m in range(len(model.c[j])):
                gn = num_accs.gamma[j][m]
                gd = den_accs.gamma[j][m]
                cnt = float(gn.sum() + gd.sum())
                if cnt == 0.0:
                    continue
                v = model.v[j][m]
                logw = model.w @ v
                w_jm = np.exp(logw - _lse(logw))
                g_n, H_n = _phone_vec_stats(model, gn, num_accs.y[j][m],
                                            w_jm, gn.sum(), v)
                g_d, H_d = _phone_vec_stats(model, gd, den_accs.y[j][m],
                                            w_jm, gd.sum(), v)
                deriv = (g_n - H_n @ v) - (g_d - H_d @ v)
                Q = (H_n + H_d) * ((cnt + opts.tau_v) / (cnt + 1e-10)) \
                    / max(opts.lrate_v, 1e-10)
                delta, im = _solve_quadratic(Q, deriv)
                model.v[j][m] = v + delta
                tot += im
        impr["v"] = tot

    # --- w: one EBW step on the weight projections (weak-sense bound) ---
    if "w" in update_flags:
        grad = np.zeros((I, S))
        Hw = np.zeros((I, S, S))
        cnt_i = gamma_i_num + gamma_i_den
        for j in range(model.num_states):
            V = np.stack(model.v[j])                       # [M, S]
            logw = V @ model.w.T
            w_cur = np.exp(logw - _lse(logw, axis=1, keepdims=True))
            for accs, sign in ((num_accs, 1.0), (den_accs, -1.0)):
                gam = accs.gamma[j]                        # [M, I]
                gm = gam.sum(axis=1, keepdims=True)
                grad += sign * np.einsum("mi,ms->is", gam - gm * w_cur, V)
                q = np.maximum(gam, gm * w_cur)            # [M, I]
                Hw += np.einsum("mi,ms,mt->ist", q, V, V)
        tot = 0.0
        for i in range(I):
            c = cnt_i[i] + 1e-10
            Q = Hw[i] * ((c + opts.tau_w) / c) / max(opts.lrate_w, 1e-10)
            delta, im = _solve_quadratic(Q, grad[i])
            model.w[i] += delta
            tot += im
        impr["w"] = tot

    # --- c: substate weights (eq. 4.32 of the thesis iteration) ---
    if "c" in update_flags:
        for j in range(model.num_states):
            M = len(model.c[j])
            orig = model.c[j].copy()
            num_occs = num_accs.gamma[j].sum(axis=1) + opts.tau_c * orig
            den_occs = den_accs.gamma[j].sum(axis=1)
            w = orig.copy()
            if M > 1:
                for _ in range(50):
                    mx = float(np.max(den_occs / orig))
                    k = mx - den_occs / orig
                    w = num_occs + k * w
                    w = w / w.sum()
            w = np.maximum(w, opts.min_substate_weight)
            model.c[j] = w / w.sum()
        impr["c"] = 0.0

    # --- M: phonetic-subspace projections ---
    if "M" in update_flags:
        # NOTE: our accumulators hold combined Y/Q per acc
        tot = 0.0
        for i in range(I):
            cnt = float(gamma_i_num[i] + gamma_i_den[i])
            if cnt == 0.0:
                continue
            Mi = model.M[i]
            L = (num_accs.Y[i] - Mi @ num_accs.Q[i]) \
                - (den_accs.Y[i] - Mi @ den_accs.Q[i])
            Q = (num_accs.Q[i] + den_accs.Q[i]) \
                * ((cnt + opts.tau_M) / (cnt + 1e-10)) \
                / max(opts.lrate_M, 1e-10)
            delta, im = _solve_quadratic_matrix(Q, L)
            model.M[i] = Mi + delta
            tot += im
        impr["M"] = tot

    # --- Sigma: smoothed num−den scatter with eigenvalue limiting ---
    if "S" in update_flags:
        inv_lrate = 1.0 / max(opts.lrate_Sigma, 1e-10)
        E_den = 1.0 + inv_lrate
        E_num = inv_lrate - 1.0
        for i in range(I):
            n_cnt, d_cnt = float(gamma_i_num[i]), float(gamma_i_den[i])
            if n_cnt + d_cnt == 0.0:
                continue
            stats = num_accs.S_centered[i] - den_accs.S_centered[i]
            Sigma_old = np.linalg.inv(model.Sigma_inv[i])
            smooth = (opts.tau_Sigma * inv_lrate + E_den * d_cnt
                      + E_num * n_cnt + 1e-10)
            stats = stats + smooth * Sigma_old
            count = n_cnt - d_cnt + smooth
            Sigma = stats / count
            Sigma = 0.5 * (Sigma + Sigma.T)
            # eigenvalue floor/ceiling RELATIVE to the old covariance
            # (ref: ApplyFloor(SigmaOld, cov_min_value) + the inverse
            # ceiling): whiten by Sigma_old, clip eigs to
            # [cov_min, 1/cov_min], unwhiten
            Lc = np.linalg.cholesky(Sigma_old)
            Linv = np.linalg.inv(Lc)
            W = Linv @ Sigma @ Linv.T
            w_eig, V_eig = np.linalg.eigh(0.5 * (W + W.T))
            w_eig = np.clip(w_eig, opts.cov_min_value,
                            1.0 / opts.cov_min_value)
            Sigma = Lc @ ((V_eig * w_eig) @ V_eig.T) @ Lc.T
            model.Sigma_inv[i] = np.linalg.inv(Sigma)
        impr["S"] = 0.0

    model._update_derived()
    return impr
