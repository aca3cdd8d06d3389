"""Discriminative GMM training: MMI / boosted-MMI / MPE / sMBR.

(ref: egs/wsj/s5/steps/{make_denlats.sh,train_mmi.sh,train_mpe.sh} and the
 binaries gmm-rescore-lattice, lattice-boost-ali, lattice-to-post,
 lattice-to-mpe-post, gmm-acc-stats2, gmm-est-gaussians-ebw. The shell
 pipeline's N-job accumulate/sum-accs round-trip collapses into one batched
 program per iteration; lattices are generated once and acoustically
 rescored in place each iteration.)
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from kaldi_tpu.gmm.estimation import AccumAmDiagGmm
from kaldi_tpu.gmm.ebw import EbwOptions, update_ebw_am_diag_gmm
from kaldi_tpu.decoder.graph_pack import pack_graph, pack_graphs
from kaldi_tpu.decoder.beam_search import BeamSearchDecoder, BeamSearchOpts
from kaldi_tpu.decoder.viterbi import viterbi_align
from kaldi_tpu.fst.graph import TrainingGraphCompiler
from kaldi_tpu.lat.generate import decode_to_lattices
from kaldi_tpu.lat.posteriors import (
    lattice_to_post, posterior_to_pdf_post, rescore_lattice, lattice_boost,
    lattice_forward_backward_mpe_variants, lattice_forward_backward_mmi,
)

log = logging.getLogger("kaldi_tpu.mmi")


@dataclasses.dataclass
class MmiTrainOpts:
    num_iters: int = 4
    acoustic_scale: float = 0.1
    beam: float = 16.0
    lattice_beam: float = 7.0
    max_active: int = 512
    boost: float = 0.0           # bMMI boosting factor b
    drop_frames: bool = True
    cancel: bool = True
    criterion: str = "mmi"       # 'mmi' | 'smbr' | 'mpfe'
    ebw: EbwOptions = dataclasses.field(default_factory=EbwOptions)
    transition_scale: float = 1.0
    self_loop_scale: float = 0.1


def make_denlats(model, den_graph, feats, num_frames, opts: MmiTrainOpts):
    """Decode the training data against the (weak-LM) denominator graph
    (ref: steps/make_denlats.sh — gmm-latgen-faster on train set)."""
    packed = pack_graph(den_graph.fst, model.trans_model.id2pdf_array)
    dec = BeamSearchDecoder(packed, BeamSearchOpts(
        beam=opts.beam, max_active=opts.max_active,
        acoustic_scale=opts.acoustic_scale))
    ll = model.am.loglikes_np(feats)
    return dec, decode_to_lattices(dec, ll, num_frames,
                                   lattice_beam=opts.lattice_beam)


def _pad(utts):
    feats_list = [f for (_u, f, _w) in utts]
    B = len(utts)
    T = max(f.shape[0] for f in feats_list)
    D = feats_list[0].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, f in enumerate(feats_list):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    return feats, nf


def train_discriminative(
    model,                       # MonoModel-like: am, trans_model, ctx_dep, lang
    den_graph,                   # HCLG built with a weakened (e.g. unigram) G
    utts,                        # [(utt_id, feats [T,D], words)]
    opts: MmiTrainOpts = MmiTrainOpts(),
    silence_phones=frozenset(),
):
    """EBW training loop. Returns (new_model_am, objf_history).

    Per iteration (all-in-memory analogue of steps/train_mmi.sh):
      1. numerator: Viterbi-align training graphs with the current model
      2. denominator: acoustically rescore the (fixed) denlats
      3. accumulate num/den stats, EBW update.
    """
    tm = model.trans_model
    feats, nf = _pad(utts)

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

    _dec, denlats = make_denlats(model, den_graph, feats, nf, opts)

    am = model.am
    objf_hist = []
    boosted = False
    for it in range(opts.num_iters):
        ll = am.loglikes_np(feats)
        align = viterbi_align(num_batch, ll, nf, opts.acoustic_scale)

        if opts.boost != 0.0 and not boosted:
            for b, lat in enumerate(denlats):
                if lat is None or align[b] is None:
                    continue
                lattice_boost(lat, align[b][0], tm, opts.boost,
                              silence_phones)
            boosted = True

        num_acc = AccumAmDiagGmm(am)
        den_acc = AccumAmDiagGmm(am)
        tot_objf, tot_frames = 0.0, 0
        for b, lat in enumerate(denlats):
            if lat is None or align[b] is None:
                continue
            tids, _words, num_cost = align[b]
            Tb = int(nf[b])
            rescore_lattice(lat, ll[b], tm, opts.acoustic_scale)
            if opts.criterion == "mmi":
                post, den_like = lattice_forward_backward_mmi(
                    lat, tids, tm, opts.drop_frames, opts.cancel)
                pos = [[(p, w) for p, w in fr if w > 0] for fr in post]
                neg = [[(p, -w) for p, w in fr if w < 0] for fr in post]
                num_acc.accumulate_from_posteriors(am, feats[b, :Tb], pos)
                den_acc.accumulate_from_posteriors(am, feats[b, :Tb], neg)
                tot_objf += (-num_cost) - den_like
            else:
                post, acc_objf = lattice_forward_backward_mpe_variants(
                    lat, tids, tm, opts.criterion, silence_phones)
                pos = [[(p, w) for p, w in fr if w > 0] for fr in post]
                neg = [[(p, -w) for p, w in fr if w < 0] for fr in post]
                num_acc.accumulate_from_posteriors(am, feats[b, :Tb], pos)
                den_acc.accumulate_from_posteriors(am, feats[b, :Tb], neg)
                tot_objf += acc_objf
            tot_frames += Tb
        objf = tot_objf / max(tot_frames, 1)
        objf_hist.append(objf)
        log.info("iter %d: %s objf/frame %.6f", it, opts.criterion, objf)
        am = update_ebw_am_diag_gmm(am, num_acc, den_acc, opts.ebw,
                                    update_weights=False)
    return am, objf_hist
