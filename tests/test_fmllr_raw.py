"""Raw-fMLLR: recover a raw-space distortion through a splice+LDA model.

(ref: transform/fmllr-raw-test.cc — synthesize a known raw transform,
 estimate, check the auxiliary improves and the distortion is undone.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.gmm.am_gmm import AmDiagGmm
from kaldi_tpu.ops import splice_frames
from kaldi_tpu.transform.fmllr_raw import FmllrRawAccs, estimate_fmllr_raw


def test_fmllr_raw_recovers_distortion():
    rng = np.random.RandomState(0)
    d, L, R = 3, 1, 1
    n_splice = L + R + 1
    D_model = 4
    # random (well-conditioned) projection T: spliced raw -> model space
    proj = rng.randn(D_model, n_splice * d) * 0.4
    Tmat = np.concatenate([proj, np.zeros((D_model, 1))], axis=1)

    # model: 2 pdfs in the projected space trained on clean data
    clean = rng.randn(800, d) * 1.5 + rng.randn(d)
    spliced = np.asarray(splice_frames(jnp.asarray(clean), L, R))
    y = spliced @ proj.T
    pdf_ids = (y[:, 0] > np.median(y[:, 0])).astype(int)
    pdfs = []
    for c in (0, 1):
        sel = y[pdf_ids == c]
        pdfs.append(DiagGmm(np.ones(1), sel.mean(0)[None],
                            sel.var(0)[None] + 1e-3))
    am = AmDiagGmm(pdfs)

    # 'speaker': raw features distorted by a known affine map
    A_true = np.eye(d) * 1.3
    b_true = np.array([0.5, -0.3, 0.2])
    distorted = clean @ A_true.T + b_true
    # inverse transform that estimation should approximate
    A_inv = np.linalg.inv(A_true)

    accs = FmllrRawAccs(d, L, R)
    accs.accumulate_from_alignment(am, distorted[:400], Tmat,
                                   pdf_ids[:400])
    W, impr = estimate_fmllr_raw(accs, Tmat, num_steps=300, lr=0.03)
    assert impr > 0.0

    # the auxiliary is invariant to raw directions in T's null space, so W
    # need not equal the true inverse; the estimator's contract is that it
    # scores at least as well as the true inverse does
    from kaldi_tpu.transform.fmllr_raw import estimate_fmllr_raw as _e
    import jax.numpy as jnp2

    def auxf_of(Wx):
        Xw = np.asarray(
            np.stack(accs.windows)).reshape(-1, n_splice, d) @ Wx[:, :d].T \
            + Wx[:, d]
        y2 = Xw.reshape(len(accs.windows), -1) @ proj.T
        tot = 0.0
        for t in range(len(accs.windows)):
            g = am.pdfs[int(pdf_ids[t])]
            diff = y2[t] - g.means[0]
            tot += -0.5 * float((diff * diff / g.vars[0]).sum())
        tot += accs.beta() * np.linalg.slogdet(Wx[:, :d])[1]
        return tot

    W_true = np.concatenate([A_inv, (-A_inv @ b_true)[:, None]], axis=1)
    assert auxf_of(W) >= auxf_of(W_true) - 0.5
    # model-space features after W should match the clean-data stats far
    # better than without W
    def model_mismatch(Wx):
        Xw = clean[:400] @ A_true.T + b_true
        Xw = Xw @ Wx[:, :d].T + Wx[:, d]
        sp = np.asarray(splice_frames(jnp.asarray(Xw), L, R)) @ proj.T
        ref = y[:400]
        return np.abs(sp.mean(0) - ref.mean(0)).max()

    ident = np.concatenate([np.eye(d), np.zeros((d, 1))], axis=1)
    assert model_mismatch(W) < model_mismatch(ident) * 0.5


def test_fmllr_raw_identity_below_min_count():
    accs = FmllrRawAccs(3, 1, 1)
    Tmat = np.zeros((4, 10))
    W, impr = estimate_fmllr_raw(accs, Tmat, min_count=100.0)
    np.testing.assert_allclose(W[:, :3], np.eye(3))
    assert impr == 0.0
