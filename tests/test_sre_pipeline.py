"""SRE pipeline drivers: v1 (GMM-UBM) and v2 (posterior-UBM) i-vector/PLDA.

(ref: egs/sre10/v1/run.sh, egs/sre10/v2/run.sh — the fork's specialty;
 expectation mirrors the recipes: v2 (supervised posteriors) beats or
 matches v1 on EER.)
"""

import numpy as np
import pytest

from kaldi_tpu.steps.sre import (SrePipelineOpts, train_sre_system,
                                 evaluate_sre, full_ubm_from_posteriors)


def _make_corpus(rng, n_spk=10, n_utt=5, frames=150, dim=8, n_comp=4):
    comp_means = rng.randn(n_comp, dim) * 4.0
    spk_dirs = rng.randn(2, dim)
    comps_of = {}
    data = {}
    for s in range(n_spk):
        shift = rng.randn(2) @ spk_dirs * 1.2
        utts = []
        for u in range(n_utt):
            comps = rng.randint(0, n_comp, frames)
            # keep a 'phone class' label per frame for the v2 posteriors
            x = comp_means[comps] + shift + rng.randn(frames, dim)
            # C0-like energy col for VAD: all voiced
            utts.append((x.astype(np.float64), comps))
        data[f"spk{s}"] = utts
    return data, comp_means


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(0)
    return _make_corpus(rng)


def _split(data):
    train = {s: [f for (f, _c) in us[:3]] for s, us in data.items()}
    enroll = {s: us[3][0] for s, us in data.items()}
    test = {f"{s}_t": us[4][0] for s, us in data.items()}
    trials = []
    for s in data:
        for t in data:
            trials.append((s, f"{t}_t", s == t))
    return train, enroll, test, trials


def test_sre_v1_pipeline(corpus):
    data, _cm = corpus
    train, enroll, test, trials = _split(data)
    opts = SrePipelineOpts(num_gauss=8, ivector_dim=8, use_vad=False)
    system = train_sre_system(train, opts)
    eer, scores = evaluate_sre(system, enroll, test, trials)
    print(f"v1 EER {eer*100:.2f}%")
    assert eer < 0.15
    assert len(scores) == len(trials)


def test_sre_v2_posterior_ubm(corpus):
    """The v2 recipe: supervised 'senone' posteriors drive both the UBM
    stats and the i-vector stats."""
    data, comp_means = corpus
    train, enroll, test, trials = _split(data)

    def post_fn(feats):
        # oracle 'DNN': soft assignment to the true component means
        d = ((feats[:, None, :] - comp_means[None]) ** 2).sum(-1)
        e = np.exp(-0.5 * (d - d.min(axis=1, keepdims=True)))
        return e / e.sum(axis=1, keepdims=True)

    opts = SrePipelineOpts(num_gauss=4, ivector_dim=8, use_vad=False)
    system = train_sre_system(train, opts, post_fn=post_fn,
                              num_post_classes=4)
    assert system.ubm.num_gauss == 4
    eer, _sc = evaluate_sre(system, enroll, test, trials)
    print(f"v2 EER {eer*100:.2f}%")
    assert eer < 0.15


def test_full_ubm_from_posteriors_stats():
    rng = np.random.RandomState(3)
    feats = [rng.randn(100, 3) + 5.0]
    post = [np.tile([[1.0, 0.0]], (100, 1))]
    ubm = full_ubm_from_posteriors(feats, post, 2)
    np.testing.assert_allclose(ubm.means[0], feats[0].mean(0), atol=1e-8)
    assert ubm.weights[0] > 0.99 - 1e-6
    # empty class gets floored covariance, stays SPD
    w = np.linalg.eigvalsh(ubm.covars[1])
    assert np.all(w > 0)
