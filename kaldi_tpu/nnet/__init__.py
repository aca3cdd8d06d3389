"""DNN acoustic models (ref: src/nnet2, src/nnet3).

The reference's component-stack (nnet2) and computation-compiler (nnet3)
both collapse into ordinary functional JAX here: a model is a pytree of
parameters + a pure `apply(params, feats)` function; jax.jit plays the role
of nnet3's Compiler/NnetComputer pipeline (SURVEY.md §3.4), and pjit over a
mesh replaces the shell-level parallel-SGD-with-averaging loop
(SURVEY.md §2.11) with true synchronous data-parallel SGD.
"""

from kaldi_tpu.nnet.tdnn import Tdnn, TdnnConfig
from kaldi_tpu.nnet.am_nnet import AmNnet
