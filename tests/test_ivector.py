"""Speaker-recognition stack tests: the sre10/v1 pipeline at miniature
scale — UBM -> T-matrix -> i-vectors -> PLDA -> EER (SURVEY.md §2.10
'speaker-ID recipes')."""

import numpy as np
import pytest

from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.gmm.full_gmm import FullGmm, AccumFullGmm, mle_full_gmm_update
from kaldi_tpu.gmm.estimation import AccumDiagGmm, mle_diag_gmm_update
from kaldi_tpu.ivector.vad import compute_vad, VadOpts, select_voiced_frames
from kaldi_tpu.ivector.extractor import (IvectorExtractor,
                                         train_ivector_extractor)
from kaldi_tpu.ivector.plda import Plda, PldaStats, length_normalize
from kaldi_tpu.ivector.metrics import compute_eer


def test_vad():
    feats = np.zeros((100, 13), np.float32)
    feats[:, 0] = 1.0
    feats[40:60, 0] = 20.0  # loud region
    vad = compute_vad(feats, VadOpts(vad_energy_threshold=5.0,
                                     vad_energy_mean_scale=0.5))
    assert vad[45] and not vad[10]
    sel = select_voiced_frames(feats, vad)
    assert sel.shape[0] == 20


def test_eer():
    t = [2.0, 3.0, 4.0, 5.0]
    n = [0.0, 1.0, 1.5, 2.5]
    eer, thr = compute_eer(t, n)
    assert 0.0 <= eer <= 0.5
    # perfectly separated
    eer2, _ = compute_eer([5, 6, 7], [1, 2, 3])
    assert eer2 == 0.0


def _make_speaker_data(rng, n_spk=12, n_utt=6, frames=120, dim=8,
                       n_comp=4):
    """Synthetic: global UBM-ish mixture; speakers shift means by a
    low-dim latent direction."""
    comp_means = rng.randn(n_comp, dim) * 4.0
    spk_dirs = rng.randn(2, dim)  # 2-dim speaker subspace
    data = {}
    for s in range(n_spk):
        shift = rng.randn(2) @ spk_dirs * 1.2
        utts = []
        for u in range(n_utt):
            comps = rng.randint(0, n_comp, frames)
            x = comp_means[comps] + shift + rng.randn(frames, dim)
            utts.append(x.astype(np.float64))
        data[f"spk{s}"] = utts
    return data


def test_ivector_plda_eer():
    rng = np.random.RandomState(0)
    data = _make_speaker_data(rng)
    all_frames = np.concatenate([u for us in data.values() for u in us])

    # 1. diag UBM from pooled data (train_diag_ubm equivalent)
    ubm = DiagGmm.from_stats(all_frames.mean(0), all_frames.var(0)).split(8)
    for _ in range(8):
        acc = AccumDiagGmm(ubm.num_gauss, ubm.dim)
        acc.accumulate(ubm, all_frames.astype(np.float32))
        ubm = mle_diag_gmm_update(ubm, acc)

    # 2. full-covariance UBM refinement (train_full_ubm equivalent)
    fubm = FullGmm.from_diag(ubm.weights, ubm.means, ubm.vars)
    for _ in range(3):
        facc = AccumFullGmm(fubm.num_gauss, fubm.dim)
        facc.accumulate(fubm, all_frames)
        fubm = mle_full_gmm_update(fubm, facc)

    # 3. i-vector extractor
    train_utts = [u for us in data.values() for u in us[:4]]
    ext = train_ivector_extractor(fubm, train_utts, ivector_dim=8,
                                  num_iters=4)

    def get_ivector(feats):
        post = ext.frame_posteriors(feats)
        gamma, X = ext.utterance_stats(feats, post)
        return ext.extract(gamma, X)[0]

    # 4. PLDA on train ivectors
    stats = PldaStats(8)
    spk_ivecs = {}
    for spk, utts in data.items():
        ivs = np.stack([get_ivector(u) for u in utts[:4]])
        ivs = length_normalize(ivs)
        stats.add_speaker(ivs)
        spk_ivecs[spk] = ivs
    plda = Plda.train(stats, num_iters=8)

    # 5. trials on held-out utterances (last 2 per speaker)
    target, nontarget = [], []
    enroll = {spk: np.stack([get_ivector(u) for u in utts[:4]]).mean(0)
              for spk, utts in data.items()}
    scores = {}
    tests = {}
    for spk, utts in data.items():
        for i, u in enumerate(utts[4:]):
            tests[f"{spk}_t{i}"] = get_ivector(u)
    scores = plda.score_trials(enroll, tests,
                               n_enroll={s: 4 for s in enroll})
    for (espk, tkey), sc in scores.items():
        tspk = tkey.rsplit("_t", 1)[0]
        (target if espk == tspk else nontarget).append(sc)
    eer, _ = compute_eer(target, nontarget)
    print(f"EER = {eer*100:.2f}% ({len(target)} tgt, {len(nontarget)} non)")
    assert eer < 0.10, f"EER too high: {eer}"

    # PLDA should beat plain cosine scoring on the same trials
    def cosine(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-10))
    ct, cn = [], []
    for (espk, tkey), _ in scores.items():
        tspk = tkey.rsplit("_t", 1)[0]
        c = cosine(enroll[espk], tests[tkey])
        (ct if espk == tspk else cn).append(c)
    eer_cos, _ = compute_eer(ct, cn)
    print(f"cosine EER = {eer_cos*100:.2f}%")
    assert eer <= eer_cos + 0.02
