"""Data-dir convention: read/validate/fix/write.

(ref: utils/validate_data_dir.sh, utils/fix_data_dir.sh.)
"""

import os

import pytest

from kaldi_tpu.utils.data_dir import (read_data_dir, validate_data_dir,
                                      fix_data_dir, write_data_dir, DataDir)


def _mkdir(tmp_path, files):
    d = tmp_path / "data"
    d.mkdir()
    for name, content in files.items():
        (d / name).write_text(content)
    return str(d)


def test_valid_dir(tmp_path):
    p = _mkdir(tmp_path, {
        "wav.scp": "u1 /a.wav\nu2 /b.wav\n",
        "text": "u1 HELLO WORLD\nu2 BYE\n",
        "utt2spk": "u1 s1\nu2 s2\n",
    })
    d = read_data_dir(p)
    assert validate_data_dir(d) == []
    assert d.spk2utt == {"s1": ["u1"], "s2": ["u2"]}


def test_validation_catches_problems(tmp_path):
    p = _mkdir(tmp_path, {
        "wav.scp": "u2 /b.wav\nu1 /a.wav\n",      # unsorted
        "text": "u1 HI\n",                         # missing u2
        "utt2spk": "u1 s1\nu2 s2\n",
    })
    d = read_data_dir(p)
    probs = validate_data_dir(d)
    assert any("sorted" in s for s in probs)
    assert any("text keys" in s for s in probs)


def test_fix_keeps_intersection(tmp_path):
    p = _mkdir(tmp_path, {
        "wav.scp": "u1 /a.wav\nu2 /b.wav\nu3 /c.wav\n",
        "text": "u1 HI\nu2 YO\n",
        "utt2spk": "u1 s1\nu2 s1\nu3 s2\n",
    })
    d = fix_data_dir(read_data_dir(p))
    assert set(d.utt2spk) == {"u1", "u2"}
    assert validate_data_dir(d) == []
    out = str(tmp_path / "fixed")
    write_data_dir(d, out)
    d2 = read_data_dir(out)
    assert d2.utt2spk == d.utt2spk and d2.text == d.text
    assert os.path.exists(os.path.join(out, "spk2utt"))


def test_segments_validation(tmp_path):
    p = _mkdir(tmp_path, {
        "wav.scp": "rec1 /a.wav\n",
        "segments": "u1 rec1 0.0 1.5\nu2 rec1 2.0 1.0\n",
        "text": "u1 A\nu2 B\n",
        "utt2spk": "u1 s1\nu2 s1\n",
    })
    probs = validate_data_dir(read_data_dir(p))
    assert any("t_end" in s for s in probs)
    assert not any("wav.scp keys" in s for s in probs)
