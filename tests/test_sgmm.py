"""SGMM2: init-from-UBM identity, EM convergence, substate splitting,
speaker-vector adaptation, classification.

(ref test strategy: sgmm2/am-sgmm2-test.cc and estimate-am-sgmm2-test.cc —
 randomized likelihood-improvement checks.)
"""

import numpy as np
import pytest

from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.gmm.full_gmm import FullGmm
from kaldi_tpu.gmm.estimation import AccumDiagGmm, mle_diag_gmm_update
from kaldi_tpu.sgmm import (AmSgmm2, Sgmm2Accs, update_sgmm2,
                            estimate_speaker_vector, Sgmm2SpeakerState)


def _make_data(rng, n_states=3, frames=150, dim=4):
    """Class data on a shared low-dim structure + per-class offsets."""
    mu = rng.randn(n_states, dim) * 3.0
    data, post = [], []
    for j in range(n_states):
        x = mu[j] + rng.randn(frames, dim)
        data.append(x)
        post.extend([[(j, 1.0)]] * frames)
    return np.concatenate(data), post, mu


@pytest.fixture(scope="module")
def sgmm_setup():
    rng = np.random.RandomState(0)
    feats, post, mu = _make_data(rng)
    # UBM on pooled data
    ubm = DiagGmm.from_stats(feats.mean(0), feats.var(0)).split(4)
    for _ in range(5):
        acc = AccumDiagGmm(ubm.num_gauss, ubm.dim)
        acc.accumulate(ubm, feats.astype(np.float32))
        ubm = mle_diag_gmm_update(ubm, acc)
    fubm = FullGmm.from_diag(ubm.weights, ubm.means, ubm.vars)
    model = AmSgmm2(fubm, num_states=3, phn_dim=5, spk_dim=2, seed=1)
    return model, feats, post, rng


def test_em_improves_loglike(sgmm_setup):
    """Block-coordinate EM: each iteration updates one parameter group
    with fresh stats (v+weights / subspace+covariances alternating, the
    recipe schedule of steps/train_sgmm2.sh's --update-flags phases)."""
    model, feats, post, _rng = sgmm_setup
    likes = []
    schedule = ["vc", "Mc", "vwc", "Sc", "vc", "Mc"]
    for flags in schedule:
        accs = Sgmm2Accs(model)
        accs.accumulate(model, feats, post, num_gselect=4)
        likes.append(accs.tot_like / accs.tot_frames)
        model = update_sgmm2(model, accs, update_flags=flags)
    accs = Sgmm2Accs(model)
    accs.accumulate(model, feats, post, num_gselect=4)
    likes.append(accs.tot_like / accs.tot_frames)
    assert likes[-1] > likes[0] + 0.1, likes
    assert all(likes[k + 1] >= likes[k] - 0.1 for k in range(len(likes) - 1)), likes


def test_classification_after_training(sgmm_setup):
    model, feats, post, rng = sgmm_setup
    # fresh eval data from the same class means (recover via state index)
    _f2, post2, mu = _make_data(np.random.RandomState(0))
    correct = 0
    total = 0
    eval_rng = np.random.RandomState(42)
    for j in range(3):
        x = mu[j] + eval_rng.randn(30, 4)
        ll = model.loglikes_matrix(x, num_gselect=4)
        pred = np.argmax(ll.sum(axis=0))
        correct += int(pred == j)
        total += 1
    assert correct == total


def test_substate_splitting(sgmm_setup):
    model, feats, post, _rng = sgmm_setup
    n_before = sum(len(c) for c in model.c)
    model.split_substates(n_before + 3)
    n_after = sum(len(c) for c in model.c)
    assert n_after == n_before + 3
    for j in range(model.num_states):
        assert len(model.v[j]) == len(model.c[j])
        assert model.c[j].sum() == pytest.approx(1.0)
    # still trains after splitting
    accs = Sgmm2Accs(model)
    accs.accumulate(model, feats, post, num_gselect=4)
    before = accs.tot_like / accs.tot_frames
    model2 = update_sgmm2(model, accs, update_flags="vc")
    accs2 = Sgmm2Accs(model2)
    accs2.accumulate(model2, feats, post, num_gselect=4)
    assert accs2.tot_like / accs2.tot_frames >= before - 0.05


def test_speaker_vector_adaptation(sgmm_setup):
    model, feats, post, _rng = sgmm_setup
    rng = np.random.RandomState(9)
    # a 'speaker': all frames shifted by a fixed offset
    offset = rng.randn(4) * 0.8
    spk_feats = feats[:100] + offset
    spk_post = post[:100]
    accs0 = Sgmm2Accs(model)
    accs0.accumulate(model, spk_feats, spk_post, num_gselect=4)
    base = accs0.tot_like / accs0.tot_frames
    spk = estimate_speaker_vector(model, spk_feats, spk_post, num_gselect=4)
    assert spk.v.shape == (2,)
    accs1 = Sgmm2Accs(model)
    accs1.accumulate(model, spk_feats, spk_post, num_gselect=4, spk=spk)
    adapted = accs1.tot_like / accs1.tot_frames
    assert adapted > base, (base, adapted)
