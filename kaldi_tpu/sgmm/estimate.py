"""SGMM2 EM: accumulation and M-step updates.

(ref: sgmm2/estimate-am-sgmm2.h:126 MleAmSgmm2Accs, :253 MleAmSgmm2Updater;
 update equations from Povey et al. 2011 §5 (re-derived):

   v_jm:  (Σ_i γ_jmi H_i + H^(w)_jm) v = y_jm + g^(w)_jm   [phonetic vec]
   M_i :  M_i = Y_i Q_i⁻¹                                  [subspace]
   w_i :  Newton step on the log-linear weight objective    [weights]
   Σ_i :  S_i / γ_i                                        [covariances]
   c_jm:  γ_jm / γ_j                                        [substate wts]
   spk :  (I + Σ_i γ_i(s) H'_i)⁻¹ Σ accumulated projections [speaker vec]
)
"""

from __future__ import annotations

import numpy as np

from kaldi_tpu.sgmm.model import (AmSgmm2, Sgmm2SpeakerState,
                                  _logsumexp as _lse_guarded)


class Sgmm2Accs:
    def __init__(self, model: AmSgmm2):
        I, D, S = model.M.shape
        self.gamma = [np.zeros((len(model.c[j]), I))
                      for j in range(model.num_states)]     # γ_jmi
        self.y = [np.zeros((len(model.c[j]), S))
                  for j in range(model.num_states)]          # Σ γ Mᵀ Σ⁻¹ x
        self.Y = np.zeros((I, D, S))                         # Σ γ x v_jmᵀ
        self.Q = np.zeros((I, S, S))                         # Σ γ v vᵀ
        self.S_centered = np.zeros((I, D, D))  # Σ γ (x−μ)(x−μ)ᵀ, old means
        self.tot_like = 0.0
        self.tot_frames = 0.0

    def accumulate(self, model: AmSgmm2, feats: np.ndarray,
                   state_post, num_gselect: int = 10,
                   spk: Sgmm2SpeakerState | None = None):
        """state_post[t] = [(state j, weight)] (hard alignment or soft).

        (ref: MleAmSgmm2Accs::Accumulate — per frame, component posteriors
        within the aligned state, scattered into the global stats.)
        """
        gsel = model.gselect(feats, num_gselect)
        for t, frame in enumerate(state_post):
            x = feats[t]
            for j, wgt in frame:
                post, ll = model.component_posteriors(j, x, gsel[t], spk)
                post = post * wgt
                self.tot_like += ll * wgt
                self.tot_frames += wgt
                V = np.stack(model.v[j])                   # [M, S]
                self.gamma[j] += post
                # y_jm += Σ_i γ_jmi M_iᵀ Σ_i⁻¹ (x − N_i s)
                zx = np.einsum("ids,d->is", model.SinvM, x)  # [I, S]
                if spk is not None and model.N is not None:
                    off = np.einsum("idt,t->id", model.N, spk.v)  # [I, D]
                    zx = zx - np.einsum("ids,id->is", model.SinvM, off)
                self.y[j] += post @ zx
                # Y accumulates (x − N_i s) vᵀ — the phonetic-subspace
                # stat must not absorb the speaker offset
                if spk is not None and model.N is not None:
                    x_i = x[None, :] - np.einsum("idt,t->id", model.N,
                                                 spk.v)   # [I, D]
                    self.Y += np.einsum("mi,id,ms->ids", post, x_i, V)
                else:
                    self.Y += np.einsum("mi,d,ms->ids", post, x, V)
                self.Q += np.einsum("mi,ms,mt->ist", post, V, V)
                mu = np.einsum("ids,ms->mid", model.M, V)   # [M, I, D]
                if spk is not None and model.N is not None:
                    mu = mu + np.einsum("idt,t->id", model.N, spk.v)[None]
                d = x[None, None, :] - mu
                self.S_centered += np.einsum("mi,mid,mie->ide", post, d, d)

    def accumulate_gpost(self, model: AmSgmm2, feats: np.ndarray,
                         gpost, spk: Sgmm2SpeakerState | None = None):
        """Accumulate from precomputed Gaussian-level posteriors
        (ref: sgmm2bin/sgmm2-acc-stats-gpost.cc — the E-step's component
        posteriors arrive in the gpost archive instead of being
        recomputed): gpost[t] = [(state j, gselect idx [K], post [M, K])].
        """
        I = model.num_gauss
        for t, frame in enumerate(gpost):
            x = feats[t]
            for j, gsel, p in frame:
                post = np.zeros((p.shape[0], I))
                post[:, np.asarray(gsel, np.int64)] = p
                self.tot_frames += float(post.sum())
                V = np.stack(model.v[j])
                self.gamma[j] += post
                zx = np.einsum("ids,d->is", model.SinvM, x)
                if spk is not None and model.N is not None:
                    off = np.einsum("idt,t->id", model.N, spk.v)
                    zx = zx - np.einsum("ids,id->is", model.SinvM, off)
                self.y[j] += post @ zx
                if spk is not None and model.N is not None:
                    x_i = x[None, :] - np.einsum("idt,t->id", model.N,
                                                 spk.v)
                    self.Y += np.einsum("mi,id,ms->ids", post, x_i, V)
                else:
                    self.Y += np.einsum("mi,d,ms->ids", post, x, V)
                self.Q += np.einsum("mi,ms,mt->ist", post, V, V)
                mu = np.einsum("ids,ms->mid", model.M, V)
                if spk is not None and model.N is not None:
                    mu = mu + np.einsum("idt,t->id", model.N, spk.v)[None]
                d = x[None, None, :] - mu
                self.S_centered += np.einsum("mi,mid,mie->ide", post, d, d)

    def state_occs(self):
        return np.array([g.sum() for g in self.gamma])


def update_sgmm2(model: AmSgmm2, accs: Sgmm2Accs,
                 update_flags: str = "vMwSc",
                 min_substate_occ: float = 1.0,
                 w_newton_iters: int = 3,
                 cov_floor: float = 1e-3) -> AmSgmm2:
    """In-place M-step (returns model). Flags as the reference's
    --update-flags: v (substate vectors), M (phonetic subspace),
    w (weight projections), S (covariances), c (substate weights)."""
    I, D, S = model.M.shape

    # --- v update ---
    if "v" in update_flags:
        for j in range(model.num_states):
            Mj = len(model.c[j])
            for m in range(Mj):
                gam = accs.gamma[j][m]                     # [I]
                g_tot = gam.sum()
                if g_tot < min_substate_occ:
                    continue
                v = model.v[j][m]
                logw = model.w @ v                         # [I]
                logw = logw - _lse(logw)
                w_cur = np.exp(logw)
                # quadratic term from means + weight-objective terms
                Hsum = np.einsum("i,ist->st", gam, model.H)
                g_w = model.w.T @ (gam - g_tot * w_cur)
                a = np.maximum(gam, g_tot * w_cur)
                H_w = np.einsum("i,is,it->st", a, model.w, model.w)
                lhs = Hsum + H_w + 1e-6 * np.eye(S)
                rhs = accs.y[j][m] + H_w @ v + g_w
                model.v[j][m] = np.linalg.solve(lhs, rhs)

    # --- M update (Y and Q both accumulated with the E-step's v) ---
    if "M" in update_flags:
        for i in range(I):
            gi = sum(accs.gamma[j][:, i].sum()
                     for j in range(model.num_states))
            if gi < 1.0:
                continue
            model.M[i] = accs.Y[i] @ np.linalg.inv(
                accs.Q[i] + 1e-4 * np.eye(S))

    # --- w update (Newton) ---
    if "w" in update_flags:
        for _ in range(w_newton_iters):
            grad = np.zeros((I, S))
            for j in range(model.num_states):
                V = np.stack(model.v[j])                    # [M, S]
                gam = accs.gamma[j]                         # [M, I]
                logw = V @ model.w.T
                logw = logw - _lse(logw, axis=1, keepdims=True)
                w_cur = np.exp(logw)                        # [M, I]
                gm = gam.sum(axis=1, keepdims=True)         # [M, 1]
                grad += np.einsum("mi,ms->is", gam - gm * w_cur, V)
            # diagonal-ish Hessian step (the reference uses a quadratic
            # bound per i; a damped gradient step is stable here)
            model.w += 0.5 * grad / max(accs.tot_frames, 1.0)

    # --- Sigma update: centered scatter from the E-step (old means; the
    # reference corrects for the new means — one-iteration lag is a
    # stable, always-PSD simplification) ---
    if "S" in update_flags:
        gamma_i = np.zeros(I)
        for j in range(model.num_states):
            gamma_i += accs.gamma[j].sum(axis=0)
        for i in range(I):
            if gamma_i[i] < D:
                continue
            Si = accs.S_centered[i] / gamma_i[i]
            Si = 0.5 * (Si + Si.T)
            w_eig, V_eig = np.linalg.eigh(Si)
            w_eig = np.maximum(w_eig, cov_floor)
            Si = (V_eig * w_eig) @ V_eig.T
            model.Sigma_inv[i] = np.linalg.inv(Si)

    # --- c update ---
    if "c" in update_flags:
        for j in range(model.num_states):
            occ = accs.gamma[j].sum(axis=1)
            tot = occ.sum()
            if tot > 0:
                c = (occ + 0.1) / (tot + 0.1 * len(occ))
                model.c[j] = c / c.sum()

    model._update_derived()
    return model


def estimate_speaker_vector(model: AmSgmm2, feats: np.ndarray,
                            state_post, num_gselect: int = 10,
                            num_iters: int = 2) -> Sgmm2SpeakerState:
    """Per-speaker MAP point estimate of the speaker vector
    (ref: sgmm2/estimate-am-sgmm2.h MleSgmm2SpeakerAccs)."""
    T_dim = model.spk_dim
    if T_dim == 0:
        return Sgmm2SpeakerState(v=np.zeros(0))
    spk = Sgmm2SpeakerState(v=np.zeros(T_dim))
    SinvN = np.einsum("ide,iet->idt", model.Sigma_inv, model.N)
    Hspk = np.einsum("idt,idu->itu", model.N, SinvN)
    gsel = model.gselect(feats, num_gselect)   # model/feats fixed: hoist
    for _ in range(num_iters):
        lhs = np.eye(T_dim)
        rhs = np.zeros(T_dim)
        for t, frame in enumerate(state_post):
            x = feats[t]
            for j, wgt in frame:
                post, _ll = model.component_posteriors(j, x, gsel[t], spk)
                post = post * wgt
                V = np.stack(model.v[j])
                mu = np.einsum("ids,ms->mid", model.M, V)
                gi = post.sum(axis=0)
                resid = np.einsum("mi,mid->id", post, x[None, None, :] - mu)
                rhs += np.einsum("idt,id->t", SinvN, resid)
                lhs += np.einsum("i,itu->tu", gi, Hspk)
        spk = Sgmm2SpeakerState(v=np.linalg.solve(lhs, rhs))
    return spk


def train_sgmm2(model: AmSgmm2, feats: np.ndarray, state_post,
                num_iters: int = 6, num_gselect: int = 10,
                split_substates_to: int | None = None,
                schedule=("vc", "Mc", "vwc", "Sc")):
    """Block-coordinate EM driver (the steps/train_sgmm2.sh loop shape:
    one parameter group per iteration with fresh stats — updating every
    group from a single accumulation can overshoot since the blocks share
    the same auxiliary). Returns (model, per-iteration loglikes)."""
    likes = []
    for it in range(num_iters):
        accs = Sgmm2Accs(model)
        accs.accumulate(model, feats, state_post, num_gselect)
        likes.append(accs.tot_like / max(accs.tot_frames, 1.0))
        model = update_sgmm2(model, accs,
                             update_flags=schedule[it % len(schedule)])
        if split_substates_to and it == num_iters // 2:
            model.split_substates(split_substates_to,
                                  state_occs=accs.state_occs())
    return model, likes


def _lse(a, axis=None, keepdims=False):
    """Shared guarded logsumexp (kaldi_tpu.sgmm.model._logsumexp)."""
    return _lse_guarded(a, axis=axis, keepdims=keepdims)
