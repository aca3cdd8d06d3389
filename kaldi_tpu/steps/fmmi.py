"""fMMI: discriminatively trained feature offsets (fMPE) interleaved with
EBW model updates.

(ref: steps/train_mmi_fmmi.sh — gmm-est-fmmi alternates: odd iterations
 update the fMPE projection from the MMI direct differential with the
 model fixed, even iterations do EBW model updates on the fMPE-transformed
 features; denominator lattices fixed, acoustics rescored per iteration.)
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from kaldi_tpu.gmm.estimation import AccumAmDiagGmm
from kaldi_tpu.gmm.ebw import update_ebw_am_diag_gmm
from kaldi_tpu.transform.fmpe import Fmpe, FmpeOptions
from kaldi_tpu.steps.mmi import MmiTrainOpts, make_denlats, _pad
from kaldi_tpu.fst.graph import TrainingGraphCompiler
from kaldi_tpu.decoder.graph_pack import pack_graphs
from kaldi_tpu.decoder.viterbi import viterbi_align
from kaldi_tpu.lat.posteriors import (rescore_lattice,
                                      lattice_forward_backward_mmi)

log = logging.getLogger("kaldi_tpu.fmmi")


@dataclasses.dataclass
class FmmiTrainOpts(MmiTrainOpts):
    num_iters: int = 6            # alternating fMPE / EBW
    fmpe: FmpeOptions = dataclasses.field(
        default_factory=lambda: FmpeOptions(learning_rate=0.002))
    fmpe_gauss: int = 16          # size of the fMPE posterior GMM


def train_fmmi(model, den_graph, utts, opts: FmmiTrainOpts = FmmiTrainOpts(),
               silence_phones=frozenset()):
    """-> (fmpe, new_am, objf_history). `model` is a MonoModel-like system;
    `utts` = [(utt, feats, words)]."""
    from kaldi_tpu.steps.ubm import train_diag_ubm, DiagUbmTrainOpts
    tm = model.trans_model
    feats_raw, nf = _pad(utts)
    D = feats_raw.shape[2]

    pooled = np.concatenate([f for (_u, f, _w) in utts])
    fmpe_gmm = train_diag_ubm(pooled.astype(np.float64),
                              DiagUbmTrainOpts(num_gauss=opts.fmpe_gauss,
                                               num_iters=2))
    fmpe = Fmpe(fmpe_gmm, D, opts.fmpe)

    compiler = TrainingGraphCompiler(model.lang, tm, model.ctx_dep,
                                     opts.transition_scale,
                                     opts.self_loop_scale)
    cache: dict = {}
    graphs = []
    for (_u, _f, words) in utts:
        key = tuple(words)
        if key not in cache:
            cache[key] = compiler.compile_transcript(list(words))
        graphs.append(cache[key])
    num_batch = pack_graphs(graphs, tm.id2pdf_array)

    _dec, denlats = make_denlats(model, den_graph, feats_raw, nf, opts)

    am = model.am
    hist = []
    for it in range(opts.num_iters):
        # current fMPE-transformed features
        feats = feats_raw.copy()
        for b in range(len(utts)):
            feats[b, : nf[b]] = fmpe.apply(feats_raw[b, : nf[b]])
        ll = am.loglikes_np(feats)
        align = viterbi_align(num_batch, ll, nf, opts.acoustic_scale)

        num_acc = AccumAmDiagGmm(am)
        den_acc = AccumAmDiagGmm(am)
        tot_objf, tot_frames = 0.0, 0
        update_features = (it % 2 == 0)
        for b, lat in enumerate(denlats):
            if lat is None or align[b] is None:
                continue
            tids, _w, num_cost = align[b]
            Tb = int(nf[b])
            rescore_lattice(lat, ll[b], tm, opts.acoustic_scale)
            post, den_like = lattice_forward_backward_mmi(
                lat, tids, tm, opts.drop_frames, opts.cancel)
            tot_objf += (-num_cost) - den_like
            tot_frames += Tb
            if update_features:
                diff = fmpe.direct_differential(am, feats[b, :Tb], post)
                fmpe.train_step(feats_raw[b, :Tb], diff)
            else:
                pos = [[(p, w) for p, w in fr if w > 0] for fr in post]
                neg = [[(p, -w) for p, w in fr if w < 0] for fr in post]
                num_acc.accumulate_from_posteriors(am, feats[b, :Tb], pos)
                den_acc.accumulate_from_posteriors(am, feats[b, :Tb], neg)
        if not update_features:
            am = update_ebw_am_diag_gmm(am, num_acc, den_acc, opts.ebw)
        hist.append(tot_objf / max(tot_frames, 1))
        log.info("fMMI iter %d (%s): objf/frame %.6f", it,
                 "fMPE" if update_features else "EBW", hist[-1])
    return fmpe, am, hist
