"""Flat-start monophone GMM-HMM training.

(ref: egs/wsj/s5/steps/train_mono.sh:72-126 and the binaries it drives:
 gmm-init-mono, compile-train-graphs, align-equal-compiled,
 gmm-acc-stats-ali, gmm-est, gmm-align-compiled.)

The shell pipeline's N-job accumulate/sum/estimate cycle becomes: batch all
utterances into padded tensors, one jit Viterbi alignment + one jit stats
accumulation per iteration, host-side M-step.
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from kaldi_tpu.fst.lang import Lang
from kaldi_tpu.fst.graph import TrainingGraphCompiler
from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.gmm.am_gmm import AmDiagGmm
from kaldi_tpu.gmm.estimation import (AccumAmDiagGmm, mle_diag_gmm_update)
from kaldi_tpu.hmm.transition_model import TransitionModel
from kaldi_tpu.tree.context_dep import MonophoneContextDependency
from kaldi_tpu.decoder.graph_pack import pack_graphs
from kaldi_tpu.decoder.viterbi import viterbi_align, equal_align

log = logging.getLogger("kaldi_tpu.mono")


@dataclasses.dataclass
class MonoTrainOpts:
    num_iters: int = 40
    max_iter_inc: int = 30       # last iter to increase gaussians on
    totgauss: int = 1000
    init_gauss_factor: float = 1.0  # initial = num_pdfs (1 per pdf)
    realign_iters: tuple = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 16, 18,
                            20, 23, 26, 29, 32, 35, 38)
    beam: float = 6.0            # (beam pruning is implicit in dense DP)
    acoustic_scale: float = 0.1  # --acoustic-scale in align (kaldi: 0.1)
    transition_scale: float = 1.0
    self_loop_scale: float = 0.1
    min_gaussian_occupancy: float = 3.0
    perturb_factor: float = 0.01
    power: float = 0.25


@dataclasses.dataclass
class MonoModel:
    am: AmDiagGmm
    trans_model: TransitionModel
    ctx_dep: MonophoneContextDependency
    lang: Lang


def flat_start(lang: Lang, feats_list) -> MonoModel:
    """gmm-init-mono: 1-gauss-per-pdf GMM from global feature moments."""
    ctx = MonophoneContextDependency.from_topo(lang.topo)
    tm = TransitionModel(lang.topo, lambda ph, pc: ctx.compute([ph], pc))
    allf = np.concatenate([np.asarray(f) for f in feats_list], axis=0)
    mean = allf.mean(axis=0)
    var = allf.var(axis=0) + 1e-5
    am = AmDiagGmm([DiagGmm.from_stats(mean, var) for _ in range(ctx.num_pdfs)])
    return MonoModel(am, tm, ctx, lang)


def _accumulate(model: MonoModel, feats, num_frames, align_results):
    """E-step host driver: per-utterance GMM stats + transition counts."""
    am, tm = model.am, model.trans_model
    acc = AccumAmDiagGmm(am)
    trans_counts = np.zeros(tm.num_transition_ids + 1, np.float64)
    tid2pdf = tm.id2pdf_array
    num_aligned = 0
    for b, res in enumerate(align_results):
        if res is None:
            continue
        tids, _words, _cost = res
        Tb = int(num_frames[b])
        pdf_ids = tid2pdf[tids[:Tb]]
        acc.accumulate_from_alignment(am, feats[b, :Tb], pdf_ids)
        np.add.at(trans_counts, tids[:Tb], 1.0)
        num_aligned += 1
    return acc, trans_counts, num_aligned


def _update(model: MonoModel, acc: AccumAmDiagGmm, trans_counts,
            opts: MonoTrainOpts, target_gauss: int | None):
    am, tm = model.am, model.trans_model
    occs = np.array([a.occ.sum() for a in acc.accs])
    for i, a in enumerate(acc.accs):
        am.pdfs[i] = mle_diag_gmm_update(
            am.pdfs[i], a, min_gaussian_occupancy=opts.min_gaussian_occupancy)
    tm.mle_update(trans_counts)
    if target_gauss is not None and target_gauss > am.total_gauss:
        am.split_by_count(target_gauss, opts.perturb_factor, opts.power,
                          occs=occs)
    am.invalidate()


def train_mono(
    lang: Lang,
    utts: list[tuple[str, np.ndarray, list[str]]],  # (utt_id, feats [T,D], words)
    opts: MonoTrainOpts = MonoTrainOpts(),
) -> MonoModel:
    """Full flat-start EM. `utts` must fit in memory (recipe-scale batching
    over shards comes with the data pipeline)."""
    feats_list = [f for (_u, f, _w) in utts]
    model = flat_start(lang, feats_list)
    compiler = TrainingGraphCompiler(
        lang, model.trans_model, model.ctx_dep,
        opts.transition_scale, opts.self_loop_scale)

    # compile graphs (cache per transcript)
    graph_cache: dict = {}
    graphs = []
    for (_u, _f, words) in utts:
        key = tuple(words)
        if key not in graph_cache:
            graph_cache[key] = compiler.compile_transcript(list(words))
        graphs.append(graph_cache[key])

    # pad features into [B, T, D]
    B = len(utts)
    T = max(f.shape[0] for f in feats_list)
    D = feats_list[0].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    num_frames = np.zeros(B, np.int32)
    for b, f in enumerate(feats_list):
        feats[b, : f.shape[0]] = f
        num_frames[b] = f.shape[0]

    batch = pack_graphs(graphs, model.trans_model.id2pdf_array)

    # iteration 0: equal alignment
    align = equal_align(batch, num_frames)
    acc, tcounts, n_ok = _accumulate(model, feats, num_frames, align)
    log.info("iter 0 (equal-align): %d/%d aligned", n_ok, B)
    _update(model, acc, tcounts, opts, None)

    cur_gauss = model.am.total_gauss
    inc = max(0, (opts.totgauss - cur_gauss) // max(opts.max_iter_inc, 1))
    for it in range(1, opts.num_iters):
        if it in opts.realign_iters or it == 1:
            ll = model.am.loglikes_np(feats)
            align = viterbi_align(batch, ll, num_frames, opts.acoustic_scale)
        acc, tcounts, n_ok = _accumulate(model, feats, num_frames, align)
        target = min(opts.totgauss, cur_gauss + inc) if it <= opts.max_iter_inc else None
        _update(model, acc, tcounts, opts, target)
        cur_gauss = model.am.total_gauss
        if it % 5 == 0 or it == 1:
            log.info("iter %d: aligned %d/%d, loglike/frame %.4f, gauss %d",
                     it, n_ok, B,
                     acc.tot_like / max(acc.tot_frames, 1), cur_gauss)
    return model
