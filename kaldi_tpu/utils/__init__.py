"""Shared utilities: scoring, config, logging (ref: src/util + src/bin)."""

from kaldi_tpu.utils.wer import levenshtein_alignment, compute_wer, WerStats
