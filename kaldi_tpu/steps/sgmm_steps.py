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
