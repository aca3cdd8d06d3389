"""Phonetic context & decision trees (ref: src/tree)."""

from kaldi_tpu.tree.context_dep import ContextDependency, MonophoneContextDependency
