"""Batched Viterbi alignment & beam-search decoding as TPU tensor programs
(ref: src/decoder)."""

from kaldi_tpu.decoder.graph_pack import PackedGraph, pack_graph, pack_graphs
from kaldi_tpu.decoder.viterbi import viterbi_align, equal_align
