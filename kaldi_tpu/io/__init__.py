"""I/O layer: wave files, Kaldi-compatible ark/scp tables, HTK features.

The Table abstraction (ref: util/kaldi-table.h) is realized as plain Python
iterators/dicts over (key, ndarray) pairs; the on-disk format is
read/write-compatible with the reference's binary ark/scp so that features,
alignments, and lattices can be exchanged with it for differential testing.
"""

from kaldi_tpu.io.wave import read_wave, write_wave
from kaldi_tpu.io.htk import read_htk
from kaldi_tpu.io.kaldi_io import (
    read_ark,
    write_ark,
    read_scp,
    read_matrix_ark,
    write_matrix_ark,
    open_rspecifier,
    open_wspecifier,
)
