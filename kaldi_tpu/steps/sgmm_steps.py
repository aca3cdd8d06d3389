"""SGMM2 system training on top of a GMM baseline + hybrid decode adapter.

(ref: egs/rm/s5 steps/train_sgmm2.sh — UBM from the GMM system, SGMM
 initialized from the full UBM with the GMM system's tree/transition
 model, trained on GMM alignments, decoded with the same HCLG;
 sgmm2bin/sgmm2-latgen-faster's decodable is played by the loglikes
 adapter below.)
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from kaldi_tpu.gmm.full_gmm import FullGmm
from kaldi_tpu.sgmm import AmSgmm2, train_sgmm2
from kaldi_tpu.steps.ubm import (train_diag_ubm, DiagUbmTrainOpts,
                                 train_full_ubm, FullUbmTrainOpts)
from kaldi_tpu.steps.tdnn import align_with_gmm

log = logging.getLogger("kaldi_tpu.sgmm")


class SgmmAm:
    """Decoder-facing adapter: loglikes_np like AmDiagGmm/AmNnet."""

    def __init__(self, sgmm: AmSgmm2, num_gselect: int = 8):
        self.sgmm = sgmm
        self.num_gselect = num_gselect

    @property
    def num_pdfs(self):
        return self.sgmm.num_states

    def loglikes_np(self, feats: np.ndarray, scale: float = 1.0):
        """[B, T, D] -> [B, T, num_pdfs]."""
        B, T, D = feats.shape
        out = np.zeros((B, T, self.num_pdfs), np.float32)
        for b in range(B):
            out[b] = self.sgmm.loglikes_matrix(
                feats[b].astype(np.float64), self.num_gselect)
        return out * scale


@dataclasses.dataclass
class SgmmTrainOpts:
    ubm_gauss: int = 16
    phn_dim: int = 10
    spk_dim: int = 0
    num_iters: int = 8
    num_gselect: int = 8
    total_substates: int | None = None


def train_sgmm2_system(gmm_model, utts, opts: SgmmTrainOpts
                       = SgmmTrainOpts()):
    """GMM system -> SGMM2 acoustic model over the SAME tree/transitions.

    utts: [(utt, feats, words)] in the GMM system's feature space.
    -> (SgmmAm adapter, per-iteration loglikes).
    """
    aligned = align_with_gmm(gmm_model, utts)
    pooled = np.concatenate([f for (f, _p) in aligned])
    dubm = train_diag_ubm(pooled.astype(np.float64),
                          DiagUbmTrainOpts(num_gauss=opts.ubm_gauss,
                                           num_iters=3))
    fubm = train_full_ubm(dubm, pooled, FullUbmTrainOpts(num_iters=2))
    sgmm = AmSgmm2(fubm, num_states=gmm_model.am.num_pdfs,
                   phn_dim=opts.phn_dim, spk_dim=opts.spk_dim)
    feats = np.concatenate([f for (f, _p) in aligned])
    post = [[(int(p), 1.0)] for (_f, pdfs) in aligned for p in pdfs]
    sgmm, likes = train_sgmm2(sgmm, feats, post,
                              num_iters=opts.num_iters,
                              num_gselect=opts.num_gselect,
                              split_substates_to=opts.total_substates)
    log.info("SGMM2: loglike/frame %s", [round(x, 3) for x in likes])
    return SgmmAm(sgmm, opts.num_gselect), likes


@dataclasses.dataclass
class SgmmMmiOpts:
    """(ref: steps/train_mmi_sgmm2.sh defaults + EbwAmSgmm2Options)"""

    num_iters: int = 2
    acoustic_scale: float = 0.1
    beam: float = 16.0
    lattice_beam: float = 7.0
    max_active: int = 256
    boost: float = 0.1           # bMMI boosting factor b
    update_flags: str = "vMc"    # Sigma/w EBW optional (tau-heavy)


def train_sgmm2_bmmi(gmm_model, sgmm_am: SgmmAm, den_graph, utts,
                     opts: SgmmMmiOpts = SgmmMmiOpts()):
    """Boosted-MMI EBW training of an SGMM2 system.

    (ref: steps/train_mmi_sgmm2.sh — sgmm2-rescore-lattice +
     lattice-boost-ali + sgmm2-acc-stats2 + sgmm2-est-ebw. Numerator
     stats from forced alignments, denominator stats from lattice
     posteriors on a weak-LM graph decoded with the SGMM itself,
     boosted by phone-accuracy as in bMMI.)

    -> (SgmmAm, per-iteration MMI objective (num−den loglike/frame)).
    """
    from kaldi_tpu.sgmm.ebw import update_sgmm2_ebw, EbwSgmm2Options
    from kaldi_tpu.sgmm.estimate import Sgmm2Accs
    from kaldi_tpu.decoder.graph_pack import pack_graph
    from kaldi_tpu.decoder.beam_search import (BeamSearchDecoder,
                                               BeamSearchOpts)
    from kaldi_tpu.lat.generate import decode_to_lattices
    from kaldi_tpu.lat.posteriors import (lattice_to_post,
                                          posterior_to_pdf_post,
                                          lattice_boost)

    from kaldi_tpu.fst.graph import TrainingGraphCompiler
    from kaldi_tpu.decoder.graph_pack import pack_graphs
    from kaldi_tpu.decoder.viterbi import viterbi_align

    tm = gmm_model.trans_model
    B = len(utts)
    feats_list = [f for (_u, f, _w) in utts]
    T = max(f.shape[0] for f in feats_list)
    D = feats_list[0].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, f in enumerate(feats_list):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    # numerator alignments (tids kept for lattice boosting)
    compiler = TrainingGraphCompiler(gmm_model.lang, tm, gmm_model.ctx_dep)
    cache: dict = {}
    graphs = []
    for (_u, _f, words) in utts:
        key = tuple(words)
        if key not in cache:
            cache[key] = compiler.compile_transcript(list(words))
        graphs.append(cache[key])
    batch = pack_graphs(graphs, tm.id2pdf_array)
    ali = viterbi_align(batch, gmm_model.am.loglikes_np(feats), nf,
                        opts.acoustic_scale)
    assert all(r is not None for r in ali), "alignment failure in bMMI"
    tid2pdf = tm.id2pdf_array
    num_tids = [np.asarray(r[0], np.int64) for r in ali]
    num_posts = [tid2pdf[t] for t in num_tids]   # pdf ids per frame

    packed = pack_graph(den_graph.fst, tm.id2pdf_array)
    dec = BeamSearchDecoder(packed, BeamSearchOpts(
        beam=opts.beam, max_active=opts.max_active,
        acoustic_scale=opts.acoustic_scale))

    sgmm = sgmm_am.sgmm
    objs = []
    for it in range(opts.num_iters):
        ll = sgmm_am.loglikes_np(feats)
        lats = decode_to_lattices(dec, ll, nf,
                                  lattice_beam=opts.lattice_beam)
        num = Sgmm2Accs(sgmm)
        den = Sgmm2Accs(sgmm)
        obj_num = obj_den = frames = 0.0
        for b in range(B):
            f = feats_list[b].astype(np.float64)
            state_post_num = [[(int(p), 1.0)] for p in num_posts[b]]
            num.accumulate(sgmm, f, state_post_num,
                           sgmm_am.num_gselect)
            if lats[b] is None:
                continue
            lat = lats[b]
            if opts.boost > 0:
                lat = lattice_boost(lat, num_tids[b], tm, b=opts.boost)
            post, tot = lattice_to_post(lat)
            pdf_post = posterior_to_pdf_post(post, tm)
            state_post_den = [[(int(p), float(w)) for (p, w) in fr]
                              for fr in pdf_post[: nf[b]]]
            den.accumulate(sgmm, f[: len(state_post_den)],
                           state_post_den, sgmm_am.num_gselect)
        obj_num, obj_den = num.tot_like, den.tot_like
        frames = max(num.tot_frames, 1.0)
        objs.append((obj_num - obj_den) / frames)
        update_sgmm2_ebw(sgmm, num, den, EbwSgmm2Options(),
                         update_flags=opts.update_flags)
    # final objective after the last update
    ll = sgmm_am.loglikes_np(feats)
    lats = decode_to_lattices(dec, ll, nf, lattice_beam=opts.lattice_beam)
    num = Sgmm2Accs(sgmm)
    den = Sgmm2Accs(sgmm)
    for b in range(B):
        f = feats_list[b].astype(np.float64)
        num.accumulate(sgmm, f, [[(int(p), 1.0)] for p in num_posts[b]],
                       sgmm_am.num_gselect)
        if lats[b] is None:
            continue
        post, _tot = lattice_to_post(lats[b])
        pdf_post = posterior_to_pdf_post(post, tm)
        den.accumulate(sgmm, f[: len(pdf_post)],
                       [[(int(p), float(w)) for (p, w) in fr]
                        for fr in pdf_post[: nf[b]]],
                       sgmm_am.num_gselect)
    objs.append((num.tot_like - den.tot_like) / max(num.tot_frames, 1.0))
    return sgmm_am, objs
