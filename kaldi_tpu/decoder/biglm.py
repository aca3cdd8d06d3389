"""Big-LM decoding: decode with a small-LM graph, swap in the big LM.

(ref: decoder/biglm-faster-decoder.h / lattice-biglm-faster-decoder.h —
 the reference composes HCLG(small G) with ΔG = G_small⁻¹ ∘ G_big as a
 DeterministicOnDemandFst during search. The TPU-native equivalent keeps
 the search program fixed-shape: decode against the small-LM HCLG to
 lattices, then exactly rescore (subtract the small G along lattice paths,
 add the big LM via the on-demand ConstArpaLm) — the steps/lmrescore*.sh
 pipeline fused into one call, mathematically the same posteriors over the
 retained lattice paths.)
"""

from __future__ import annotations

import numpy as np

from kaldi_tpu.lat.generate import decode_to_lattices
from kaldi_tpu.lat.functions import compose_lattice_with_lm, lattice_best_path
from kaldi_tpu.lm.const_arpa import ConstArpaLm, lattice_lmrescore_const_arpa


def decode_biglm(
    decoder,                 # BeamSearchDecoder (lattice-capable)
    loglikes, num_frames,
    old_g, backoff_label: int,
    new_lm: ConstArpaLm,
    lm_scale: float = 1.0,
    lattice_beam: float = 8.0,
):
    """-> list of (words, total_cost) per utterance, decoded under the big
    LM. old_g: the G FST the decoding graph was built with."""
    lats = decode_to_lattices(decoder, loglikes, num_frames,
                              lattice_beam=lattice_beam)
    out = []
    for lat in lats:
        if lat is None:
            out.append(None)
            continue
        # remove the small LM's scores, add the big LM's
        no_old = compose_lattice_with_lm(lat, old_g, backoff_label,
                                         lm_scale=-1.0)
        rescored = lattice_lmrescore_const_arpa(no_old, new_lm, lm_scale)
        res = lattice_best_path(rescored)
        out.append((res[0], res[2]) if res else None)
    return out
