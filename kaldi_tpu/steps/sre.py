"""Speaker-recognition pipeline drivers (the fork's headline recipes).

(ref: egs/sre10/v1/run.sh — MFCC → energy VAD → diag+full UBM → T-matrix
 i-vector extractor → LDA/length-norm → PLDA scoring → EER; and
 egs/sre10/v2 — the DNN-UBM variant: senone posteriors from a supervised
 DNN replace the GMM posteriors in i-vector extraction, with the 'UBM'
 means/covariances computed FROM those posteriors
 (sid/init_full_ubm_from_dnn.sh, sid/extract_ivectors_dnn.sh).)
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from kaldi_tpu.gmm.full_gmm import FullGmm
from kaldi_tpu.steps.ubm import (train_diag_ubm, DiagUbmTrainOpts,
                                 train_full_ubm, FullUbmTrainOpts)
from kaldi_tpu.ivector.extractor import (IvectorExtractor, IvectorStats,
                                         train_ivector_extractor)
from kaldi_tpu.ivector.plda import Plda, PldaStats, length_normalize
from kaldi_tpu.ivector.vad import compute_vad, select_voiced_frames, VadOpts
from kaldi_tpu.ivector.metrics import compute_eer

log = logging.getLogger("kaldi_tpu.sre")


def full_ubm_from_posteriors(feats_list, post_list, num_classes: int,
                             var_floor: float = 1e-3) -> FullGmm:
    """Weighted full-covariance 'UBM' whose components are the posterior
    classes (senones) of a supervised model
    (ref: sid/init_full_ubm_from_dnn.sh / fgmm-global-acc-stats-post)."""
    D = feats_list[0].shape[1]
    occ = np.zeros(num_classes)
    x = np.zeros((num_classes, D))
    x2 = np.zeros((num_classes, D, D))
    for feats, post in zip(feats_list, post_list):
        occ += post.sum(axis=0)
        x += post.T @ feats
        x2 += np.einsum("tc,td,te->cde", post, feats, feats)
    safe = np.maximum(occ, 1e-8)
    means = x / safe[:, None]
    covars = x2 / safe[:, None, None] - np.einsum(
        "cd,ce->cde", means, means)
    # floor eigenvalues for stability
    for c in range(num_classes):
        w, V = np.linalg.eigh(0.5 * (covars[c] + covars[c].T))
        covars[c] = (V * np.maximum(w, var_floor)) @ V.T
    weights = occ / max(occ.sum(), 1e-8)
    return FullGmm(np.maximum(weights, 1e-8), means, covars)


@dataclasses.dataclass
class SrePipelineOpts:
    num_gauss: int = 64
    ivector_dim: int = 32
    ubm_iters: int = 3
    ivector_iters: int = 4
    plda_iters: int = 8
    num_gselect: int = 10
    use_vad: bool = True
    vad: VadOpts = dataclasses.field(default_factory=VadOpts)


@dataclasses.dataclass
class SreSystem:
    ubm: FullGmm
    extractor: IvectorExtractor
    plda: Plda
    opts: SrePipelineOpts
    post_fn: object = None        # optional: feats -> [T, C] posteriors

    def ivector(self, feats: np.ndarray) -> np.ndarray:
        if self.opts.use_vad:
            vad = compute_vad(feats, self.opts.vad)
            if vad.any():
                feats = select_voiced_frames(feats, vad)
        if self.post_fn is not None:
            post = np.asarray(self.post_fn(feats))
        else:
            post = self.extractor.frame_posteriors(
                feats, self.opts.num_gselect)
        gamma, X = self.extractor.utterance_stats(feats, post)
        return self.extractor.extract(gamma, X)[0]


def train_sre_system(
    train_utts: dict,             # spk -> [feats [T, D]]
    opts: SrePipelineOpts = SrePipelineOpts(),
    post_fn=None,                 # DNN posteriors (v2 recipe); None = GMM
    num_post_classes: int | None = None,
) -> SreSystem:
    """The egs/sre10 v1 (post_fn=None) / v2 (post_fn set) pipeline."""
    voiced: dict = {}
    for spk, utts in train_utts.items():
        vs = []
        for f in utts:
            if opts.use_vad:
                vad = compute_vad(f, opts.vad)
                f = select_voiced_frames(f, vad) if vad.any() else f
            vs.append(f)
        voiced[spk] = vs
    pooled = np.concatenate([f for us in voiced.values() for f in us])

    if post_fn is None:
        dubm = train_diag_ubm(pooled, DiagUbmTrainOpts(
            num_gauss=opts.num_gauss, num_iters=opts.ubm_iters))
        ubm = train_full_ubm(dubm, pooled,
                             FullUbmTrainOpts(num_iters=opts.ubm_iters))
    else:
        flat = [f for us in voiced.values() for f in us]
        posts = [np.asarray(post_fn(f)) for f in flat]
        ubm = full_ubm_from_posteriors(flat, posts,
                                       num_post_classes)
        log.info("DNN-UBM: %d classes", ubm.num_gauss)

    flat_utts = [f for us in voiced.values() for f in us]
    if post_fn is None:
        ext = train_ivector_extractor(
            ubm, flat_utts, opts.ivector_dim,
            num_iters=opts.ivector_iters, num_gselect=opts.num_gselect)
    else:
        # EM with externally supplied posteriors (the v2 path)
        ext = IvectorExtractor(ubm, opts.ivector_dim)
        stats_list = []
        for f in flat_utts:
            post = np.asarray(post_fn(f))
            stats_list.append(ext.utterance_stats(f, post))
        for _it in range(opts.ivector_iters):
            st = IvectorStats(ext)
            for (gamma, X) in stats_list:
                st.accumulate(ext, gamma, X)
            st.update(ext)

    system = SreSystem(ubm=ubm, extractor=ext, plda=None, opts=opts,
                       post_fn=post_fn)
    stats = PldaStats(opts.ivector_dim)
    for spk, utts in voiced.items():
        ivs = length_normalize(np.stack(
            [system.ivector(f) for f in utts]))
        stats.add_speaker(ivs)
    system.plda = Plda.train(stats, num_iters=opts.plda_iters)
    return system


def evaluate_sre(system: SreSystem, enroll: dict, test: dict, trials):
    """enroll/test: key -> feats; trials: [(enroll_key, test_key, bool)].
    -> (eer, scores dict) (ref: sre10 scoring + ivectorbin/compute-eer)."""
    e_iv = {k: length_normalize(system.ivector(f)[None])[0]
            for k, f in enroll.items()}
    t_iv = {k: length_normalize(system.ivector(f)[None])[0]
            for k, f in test.items()}
    scores = system.plda.score_trials(
        {k: v for k, v in e_iv.items()}, t_iv,
        n_enroll={k: 1 for k in e_iv})
    target, nontarget = [], []
    out = {}
    for (ek, tk, is_target) in trials:
        s = scores[(ek, tk)]
        out[(ek, tk)] = s
        (target if is_target else nontarget).append(s)
    eer, _th = compute_eer(target, nontarget)
    return eer, out
