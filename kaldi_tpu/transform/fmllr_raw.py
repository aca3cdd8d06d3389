"""Raw-fMLLR: estimate fMLLR on pre-splice/LDA features for a model that
lives in the projected (LDA+MLLT) space.

(ref: transform/fmllr-raw.h FmllrRawAccs — the speaker transform W acts on
 the RAW d-dim frames; the model sees y_t = T·[splice_k(W x̂_{t+k}); 1]
 where T is the fixed lda+mllt projection. The reference builds per-row
 normal equations through T; here the SAME auxiliary

   Q(W) = β·log|det A| + Σ_t Σ_m γ_tm · (-½ (y_t−μ_m)ᵀ Σ_m⁻¹ (y_t−μ_m))

 is maximized directly with autodiff + gradient ascent under jit — exact
 objective, no per-row approximation; the problem is tiny (d×(d+1)
 parameters) so a few dozen steps converge.)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax


class FmllrRawAccs:
    """Frame-level stats: spliced raw windows + per-frame Gaussian stats.

    Keeps (spliced_raw [T, (L+R+1)·d], mu [T_eff...]): we store per-frame
    posteriors against the model compactly as (means, inv_vars, gammas)
    of the DOMINANT aligned pdf components (hard-alignment accumulation,
    like FmllrStats.accumulate_from_alignment)."""

    def __init__(self, raw_dim: int, splice_left: int, splice_right: int):
        self.d = raw_dim
        self.L, self.R = splice_left, splice_right
        self.windows: list = []
        self.means: list = []
        self.inv_vars: list = []
        self.gammas: list = []

    def accumulate_from_alignment(self, am, raw_feats: np.ndarray,
                                  transform_T: np.ndarray,
                                  pdf_ids: np.ndarray):
        """raw_feats [T, d]; transform_T [D_model, (L+R+1)d + 1];
        pdf_ids [T] aligned pdfs."""
        from kaldi_tpu.ops import splice_frames
        import jax.numpy as jnp2
        spliced = np.asarray(splice_frames(jnp2.asarray(raw_feats),
                                           self.L, self.R))
        y = spliced @ transform_T[:, :-1].T + transform_T[:, -1]
        for t, pdf in enumerate(pdf_ids):
            g = am.pdfs[int(pdf)]
            post = g.posteriors(y[t][None])[0]
            self.windows.append(spliced[t])
            self.means.append(g.means)
            self.inv_vars.append(1.0 / g.vars)
            self.gammas.append(post)

    def beta(self) -> float:
        return float(sum(g.sum() for g in self.gammas))


def estimate_fmllr_raw(accs: FmllrRawAccs, transform_T: np.ndarray,
                       num_steps: int = 150, lr: float = 0.02,
                       min_count: float = 100.0):
    """-> (W_raw [d, d+1], objf improvement per frame)."""
    d = accs.d
    n_splice = accs.L + accs.R + 1
    ident = np.concatenate([np.eye(d), np.zeros((d, 1))], axis=1)
    if accs.beta() < min_count or not accs.windows:
        return ident.astype(np.float32), 0.0

    # pad gaussians per frame to a fixed M for stacking
    M = max(m.shape[0] for m in accs.means)
    T = len(accs.windows)
    mu = np.zeros((T, M, transform_T.shape[0]))
    iv = np.ones((T, M, transform_T.shape[0]))
    gam = np.zeros((T, M))
    for t in range(T):
        m = accs.means[t].shape[0]
        mu[t, :m] = accs.means[t]
        iv[t, :m] = accs.inv_vars[t]
        gam[t, :m] = accs.gammas[t]
    X = jnp.asarray(np.stack(accs.windows), jnp.float32)      # [T, n·d]
    Tmat = jnp.asarray(transform_T, jnp.float32)
    mu = jnp.asarray(mu, jnp.float32)
    iv = jnp.asarray(iv, jnp.float32)
    gam = jnp.asarray(gam, jnp.float32)
    beta = float(accs.beta())

    def auxf(W):
        A, b = W[:, :d], W[:, d]
        # apply W to every raw frame inside the spliced windows
        Xw = X.reshape(T, n_splice, d) @ A.T + b
        y = Xw.reshape(T, n_splice * d) @ Tmat[:, :-1].T + Tmat[:, -1]
        diff = y[:, None, :] - mu                              # [T, M, D]
        q = -0.5 * jnp.sum(gam[:, :, None] * iv * diff * diff)
        _sign, logdet = jnp.linalg.slogdet(A)
        return q + beta * logdet

    W = jnp.asarray(ident, jnp.float32)
    base = float(auxf(W))
    tx = optax.adam(lr)
    st = tx.init(W)

    auxf_jit = jax.jit(auxf)

    @jax.jit
    def step(W, st):
        g = jax.grad(lambda w: -auxf(w))(W)
        upd, st = tx.update(g, st)
        return optax.apply_updates(W, upd), st

    best = (W, base)
    for _ in range(num_steps):
        W, st = step(W, st)
        val = float(auxf_jit(W))       # objective of THIS W, not the
        if val > best[1]:              # pre-update one
            best = (W, val)
    W, final = best
    return np.asarray(W), (final - base) / beta
