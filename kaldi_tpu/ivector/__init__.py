"""Speaker/language recognition stack (ref: src/ivector, the fork's
specialty): energy VAD, i-vector extractor (T-matrix factor analysis over a
UBM), PLDA scoring, EER metric."""

from kaldi_tpu.ivector.vad import compute_vad, VadOpts
from kaldi_tpu.ivector.extractor import IvectorExtractor, IvectorStats
from kaldi_tpu.ivector.plda import Plda, PldaStats
from kaldi_tpu.ivector.metrics import compute_eer
