"""Language models: ARPA parsing, G construction, const-ARPA rescoring
(ref: src/lm, bin/arpa2fst.cc)."""

from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
