"""Lattice processing (ref: src/lat): lattice container, forward-backward,
pruning, best path, determinization to word level, LM rescoring, MBR."""

from kaldi_tpu.lat.lattice import Lattice, LatticeArc
from kaldi_tpu.lat.functions import (
    lattice_forward_backward, prune_lattice, lattice_best_path,
    lattice_scale, add_word_ins_penalty,
)
