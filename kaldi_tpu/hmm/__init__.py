"""HMM layer: topology, transition model, posteriors (ref: src/hmm)."""

from kaldi_tpu.hmm.topology import HmmTopology, HmmState
from kaldi_tpu.hmm.transition_model import TransitionModel
