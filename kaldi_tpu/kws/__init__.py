"""Keyword search: lattice factor index, search, TWV scoring, proxies.

(ref: src/kws — lattice-to-kws-index over a (prob, t_start, t_end)
 lexicographic semiring kws/kaldi-kws.h:44-46, factor handling
 kws/kws-functions.h:89-97, ATWV kws/kws-scoring.h:188-236.)
"""

from kaldi_tpu.kws.index import (KwsIndex, lattice_to_kws_index,
                                 search_index, save_kws_index,
                                 load_kws_index, union_kws_indexes)
from kaldi_tpu.kws.scoring import TwvOptions, compute_twv, align_hits
from kaldi_tpu.kws.proxy import generate_proxy_keywords

__all__ = [
    "KwsIndex", "lattice_to_kws_index", "search_index",
    "TwvOptions", "compute_twv", "align_hits",
    "generate_proxy_keywords",
]
