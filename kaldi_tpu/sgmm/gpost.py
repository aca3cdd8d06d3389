"""Gaussian-level posteriors for SGMM training (the gpost archive).

(ref: sgmm2/am-sgmm2.h Sgmm2GauPost / sgmm2bin/sgmm2-post-to-gpost.cc —
 per frame, the within-state component posteriors [substates x selected
 Gaussians] plus the gselect indices they are restricted to. Downstream
 accumulators (acc-stats-gpost, est-spkvecs-gpost, est-fmllr-gpost) then
 skip the E-step's posterior computation.

 Container: a pickle file {utt: [frame -> [(state j, gselect [K],
 post [M, K] float32)]]} — the role of the reference's binary Table of
 Sgmm2GauPost objects.)
"""

from __future__ import annotations

import pickle

import numpy as np

from kaldi_tpu.sgmm.model import AmSgmm2, Sgmm2SpeakerState


def compute_gpost(model: AmSgmm2, feats: np.ndarray, state_post,
                  num_gselect: int = 10,
                  spk: Sgmm2SpeakerState | None = None):
    """state_post[t] = [(state j, weight)] ->
    gpost[t] = [(j, gsel [K], post [M, K])], post scaled by the state
    weight (ref: sgmm2-post-to-gpost.cc main loop)."""
    gsel = model.gselect(feats, num_gselect)
    out = []
    for t, frame in enumerate(state_post):
        row = []
        for j, wgt in frame:
            post, _ll = model.component_posteriors(j, feats[t],
                                                   gsel[t], spk)
            row.append((int(j), gsel[t].astype(np.int32),
                        (post[:, gsel[t]] * wgt).astype(np.float32)))
        out.append(row)
    return out


def write_gpost_ark(path: str, gposts: dict) -> None:
    with open(path, "wb") as f:
        pickle.dump(gposts, f, protocol=pickle.HIGHEST_PROTOCOL)


def read_gpost_ark(path: str):
    with open(path, "rb") as f:
        d = pickle.load(f)
    return d.items()
