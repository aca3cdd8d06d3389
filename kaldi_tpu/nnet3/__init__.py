"""nnet3-equivalent: declarative, config-defined computation-graph nets.

(ref: src/nnet3 — named nodes nnet3/nnet-nnet.h:81, the Descriptor
 language nnet3/nnet-descriptor.h:41-54, config parsing
 nnet3/nnet-parse.h:145. The reference's compiler pipeline
 (ComputationGraphBuilder → Compiler → Optimize → NnetComputer,
 nnet3/nnet-compile.h:44) is played by jax.jit tracing + XLA: we evaluate
 the node graph once over jnp tensors and let XLA do scheduling, fusion,
 memory reuse, and the computation cache keyed by shapes.)
"""

from kaldi_tpu.nnet3.descriptors import Descriptor, parse_descriptor
from kaldi_tpu.nnet3.network import Nnet3, parse_config

__all__ = ["Descriptor", "parse_descriptor", "Nnet3", "parse_config"]
