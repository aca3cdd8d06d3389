"""Subspace GMM acoustic models (SGMM2).

(ref: src/sgmm2 — AmSgmm2 sgmm2/am-sgmm2.h:425-431, EM estimation
 sgmm2/estimate-am-sgmm2.h:126,253; Povey et al., "The subspace Gaussian
 mixture model — a structured model for speech recognition", 2011.)
"""

from kaldi_tpu.sgmm.model import AmSgmm2, Sgmm2SpeakerState
from kaldi_tpu.sgmm.estimate import (Sgmm2Accs, update_sgmm2,
                                     estimate_speaker_vector, train_sgmm2)

__all__ = ["AmSgmm2", "Sgmm2SpeakerState", "Sgmm2Accs", "update_sgmm2",
           "estimate_speaker_vector", "train_sgmm2"]
