"""Feature-space & model-space transforms (ref: src/transform):
CMVN, LDA, MLLT/STC, fMLLR (CMLLR)."""

from kaldi_tpu.transform.cmvn import CmvnStats, apply_cmvn
from kaldi_tpu.transform.lda import LdaStats, estimate_lda
from kaldi_tpu.transform.mllt import MlltStats, update_mllt
from kaldi_tpu.transform.fmllr import (FmllrStats, estimate_fmllr,
                                       apply_affine_transform)
